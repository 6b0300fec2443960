"""Pure-numpy baseline JPEG codec (kernel/jpeg.py, public ITU-T T.81 /
JFIF spec): round-trip PSNR invariants across subsampling modes,
restart intervals, grayscale, non-multiple-of-8 dims; marker-level
container checks; and the Spark decode_stats pipeline over fmt="jpeg"
rows (retires the jpeg leg of the multimodal codec stub)."""

import numpy as np
import pytest

from zellige_spark import synth
from zellige_spark.kernel import jpeg


def _img(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
                   128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)], axis=-1)
    return np.clip(px, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("dims", [(64, 64), (48, 80), (33, 41), (17, 23)])
@pytest.mark.parametrize("subsample", ["444", "420"])
def test_roundtrip_psnr(dims, subsample):
    px = _img(*dims)
    data = jpeg.encode_jpeg(px, 90, subsample=subsample)
    out = jpeg.decode_jpeg(data)
    assert out.shape == px.shape
    floor = 40.0 if subsample == "444" else 30.0
    assert synth.psnr(px, out) >= floor


def test_quality_monotone():
    px = _img(64, 64)
    p = [synth.psnr(px, jpeg.decode_jpeg(jpeg.encode_jpeg(px, q)))
         for q in (30, 60, 90)]
    assert p[0] < p[1] < p[2]
    assert p[2] >= 40.0


def test_flat_image_lossless():
    px = np.full((24, 24, 3), 77, dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 85))
    assert int(np.max(np.abs(px.astype(int) - out.astype(int)))) == 0


def test_restart_interval_roundtrip():
    px = _img(64, 48)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 90))
    with_rst = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px, 90, restart_interval=2))
    # restart markers change the container, not the pixels
    assert (base == with_rst).all()


def test_grayscale_single_component():
    g = _img(40, 56)[..., 0]
    data = jpeg.encode_jpeg(g, 90)
    out = jpeg.decode_jpeg(data)
    assert out.shape == (40, 56, 3)
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert synth.psnr(np.stack([g] * 3, axis=-1), out) >= 45.0


def test_container_markers():
    data = jpeg.encode_jpeg(_img(16, 16), 85)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    assert b"JFIF\x00" in data[:32]
    assert bytes([0xFF, 0xC0]) in data          # SOF0: baseline
    assert data.count(bytes([0xFF, 0xC4])) == 4  # 4 Huffman tables


def test_progressive_rejected():
    data = bytearray(jpeg.encode_jpeg(_img(16, 16), 85))
    i = data.index(bytes([0xFF, 0xC0]))
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2
    with pytest.raises(NotImplementedError):
        jpeg.decode_jpeg(bytes(data))


def test_entropy_ff_stuffing_roundtrip():
    # high-entropy noise maximizes the chance of 0xFF bytes in the
    # entropy stream; round-trip must survive the stuffing
    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(px, 95))
    assert out.shape == px.shape
    assert synth.psnr(px, out) >= 30.0


def test_synth_dispatch_jpeg():
    px = _img(32, 32)
    data = synth.encode_image(px, "jpeg")
    out = synth.decode_image(data, "jpeg", 32, 32)
    assert synth.psnr(px, out) >= 40.0


def test_decode_stats_over_jpeg_rows(spark):
    """The Spark multimodal pipeline runs REAL jpeg decode end-to-end:
    phash recomputed from decoded pixels matches the stored phash
    (computed on the same decode — determinism), PSNR invariant holds."""
    from zellige_spark.operators import images as IM

    rows = []
    for i in range(24):
        w, h = [(16, 16), (32, 32), (64, 64)][i % 3]
        px = _img(h, w, seed=i)
        px = np.clip(px.astype(int) + i, 0, 255).astype(np.uint8)
        data = jpeg.encode_jpeg(px, 90)
        decoded = jpeg.decode_jpeg(data)
        lon, lat = 1.0 + i, 2.0 + i
        rows.append((f"img{i}", data, w, h, "jpeg",
                     f"caption of img{i} ({lon:.5f},{lat:.5f})",
                     synth.average_phash(decoded), lon, lat))
    df = spark.createDataFrame(rows, synth.IMAGES_SCHEMA)
    out = IM.decode_stats(df).toPandas()
    assert len(out) == 24
    assert out["phash_ok"].all()
    assert out["caption_ok"].all()
    assert out["psnr_ok"].all()


def test_ff_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: markers may be preceded by any number of FF fill
    # bytes; inject padding before DQT/SOF/SOS and decode unchanged
    import numpy as np

    from zellige_spark.kernel import jpeg as kjpeg

    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    data = kjpeg.encode_jpeg(px)
    base = kjpeg.decode_jpeg(data)
    padded = bytearray()
    i = 0
    while i < len(data):
        if (data[i] == 0xFF and i + 1 < len(data)
                and data[i + 1] in (0xDB, 0xC0, 0xC4, 0xDA)):
            padded += b"\xff\xff\xff"  # fill bytes ahead of the marker
        padded.append(data[i])
        i += 1
    out = kjpeg.decode_jpeg(bytes(padded))
    assert np.array_equal(out, base)
