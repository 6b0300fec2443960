"""GIF codec (kernel/gif.py, public GIF89a spec): LZW round-trips
including the adversarial decoder paths (KwKwK, 12-bit width growth,
dictionary reset), animation semantics, and the Spark surfaces
(decode_stats over gif rows, animated-frame sampling)."""

import numpy as np
import pytest

from zellige_spark import synth
from zellige_spark.kernel import gif

RNG = np.random.default_rng(77)


@pytest.mark.parametrize("compress", [False, True],
                         ids=["fixed-width", "dict-lzw"])
def test_roundtrip_single_frame(compress):
    pal = RNG.integers(0, 256, (16, 3)).astype(np.uint8)
    im = RNG.integers(0, 16, (33, 47)).astype(np.uint8)
    fr, _ = gif.decode_gif(gif.encode_gif([im], pal, compress=compress))
    assert np.array_equal(fr[0], pal[im])


def test_roundtrip_adversarial_lzw_paths():
    pal = RNG.integers(0, 256, (256, 3)).astype(np.uint8)
    cases = [
        np.zeros((40, 40), np.uint8),                       # KwKwK runs
        np.tile(np.array([[1, 1, 1, 2]], np.uint8), (30, 25)),
        RNG.integers(0, 256, (200, 200)).astype(np.uint8),  # 12-bit + reset
        (np.arange(200 * 200) % 256).reshape(200, 200).astype(np.uint8),
    ]
    for im in cases:
        fr, _ = gif.decode_gif(gif.encode_gif([im], pal, compress=True))
        assert np.array_equal(fr[0], pal[im])


def test_animation_frames_and_delays():
    pal = RNG.integers(0, 256, (4, 3)).astype(np.uint8)
    idxs = [RNG.integers(0, 4, (10, 12)).astype(np.uint8) for _ in range(5)]
    frames, delays = gif.decode_gif(
        gif.encode_gif(idxs, pal, delays=[2, 4, 6, 8, 10], compress=True))
    assert delays == [2, 4, 6, 8, 10]
    for got, idx in zip(frames, idxs):
        assert np.array_equal(got, pal[idx])


def test_transparency_composites_over_previous_frame():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]],
                   dtype=np.uint8)
    base = np.zeros((6, 6), np.uint8)          # all red
    overlay = np.full((6, 6), 3, np.uint8)     # transparent index 3
    overlay[2, 2] = 1                          # one green pixel
    data = gif.encode_gif([base, overlay], pal, transparent=3)
    frames, _ = gif.decode_gif(data)
    want = np.tile(pal[0], (6, 6, 1)).astype(np.uint8)
    assert np.array_equal(frames[0], want)
    want[2, 2] = pal[1]
    assert np.array_equal(frames[1], want)     # only the green pixel lands


def test_interlaced_image_decodes():
    # hand-build an interlaced frame: rows stored in pass order
    pal = RNG.integers(0, 256, (4, 3)).astype(np.uint8)
    im = RNG.integers(0, 4, (16, 8)).astype(np.uint8)
    order = ([r for r in range(0, 16, 8)] + [r for r in range(4, 16, 8)]
             + [r for r in range(2, 16, 4)] + [r for r in range(1, 16, 2)])
    stored = im[order]
    data = bytearray(gif.encode_gif([stored], pal))
    # set the interlace bit in the image descriptor's packed byte
    pos = data.index(0x2C, 13 + 3 * 4)
    data[pos + 9] |= 0x40
    frames, _ = gif.decode_gif(bytes(data))
    assert np.array_equal(frames[0], pal[im])


def test_garbage_rejected():
    with pytest.raises(gif.GifError):
        gif.decode_gif(b"NOTAGIF" * 4)
    with pytest.raises(gif.GifError):
        gif.decode_gif(b"GIF89a" + b"\x00" * 4)


def test_synth_codec_roundtrip_lossless():
    # posterized RGB (<=256 colors) survives encode/decode exactly ->
    # the PSNR invariant is infinite-dB for gif
    px = (RNG.integers(0, 6, (24, 24, 3)) * 51).astype(np.uint8)
    data = synth.encode_image(px, "gif")
    back = synth.decode_image(data, "gif", 24, 24)
    assert np.array_equal(back, px)
    with pytest.raises(ValueError, match="256 distinct"):
        synth.encode_image(RNG.integers(0, 256, (64, 64, 3)).astype(np.uint8),
                           "gif")


def test_spark_decode_stats_over_gif_rows(spark):
    from zellige_spark.operators import images as IMG

    rows = []
    for i in range(6):
        # values on the 5-bit quantizer's reconstruction points so the
        # lossy_reencode PSNR invariant reads lossless for gif
        px = (RNG.integers(0, 4, (16, 16, 3)) * 80 + 4).astype(np.uint8)
        lon, lat = 1.5 * i, -2.5 * i
        rows.append((f"img{i:012d}", synth.encode_image(px, "gif"), 16, 16,
                     "gif", f"caption of img{i} at ({lon:.5f},{lat:.5f})",
                     synth.average_phash(px), lon, lat))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long, lon double, lat double")
    out = IMG.decode_stats(df).toPandas()
    assert len(out) == 6
    assert out.phash_ok.all() and out.caption_ok.all() and out.psnr_ok.all()


def test_spark_animated_gif_frame_sampling(spark):
    from zellige_spark.operators import images as IMG

    pal = RNG.integers(0, 256, (8, 3)).astype(np.uint8)
    idxs = [RNG.integers(0, 8, (12, 10)).astype(np.uint8) for _ in range(7)]
    data = gif.encode_gif(idxs, pal, compress=True)
    df = spark.createDataFrame([("v0", data, "gif")],
                               "video_id string, bytes binary, fmt string")
    out = (IMG.sample_video_frames(df, every_n=3)
           .orderBy("frame_idx").toPandas())
    assert list(out.frame_idx) == [0, 3, 6]
    for _, r in out.iterrows():
        frame = np.frombuffer(r["bytes"], np.uint8).reshape(r.h, r.w, 3)
        assert np.array_equal(frame, pal[idxs[r.frame_idx]])


def test_truncated_second_sub_block_rejected():
    pal = RNG.integers(0, 256, (256, 3)).astype(np.uint8)
    im = RNG.integers(0, 256, (64, 64)).astype(np.uint8)
    data = gif.encode_gif([im], pal)  # big enough for 2+ sub-blocks
    with pytest.raises(gif.GifError):
        gif.decode_gif(data[:len(data) - 300])  # cut inside a later block
