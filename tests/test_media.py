"""WAV + Y4M pure-numpy parsers (kernel/media.py) and the Spark
audio-window / video-frame-sampling operators over them — the formats
a no-codec sandbox genuinely CAN decode from public specs."""

import numpy as np
import pytest

from zellige_spark.kernel import media


def _tone(rate=16000, secs=1.25, hz=440.0):
    t = np.arange(int(rate * secs)) / rate
    return 0.5 * np.sin(2 * np.pi * hz * t)


# ---------------------------------------------------------------------------
# WAV kernel
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [16, 32])
def test_wav_roundtrip(bits):
    x = _tone()
    data = media.encode_wav(x, 16000, bits=bits)
    y, rate = media.decode_wav(data)
    assert rate == 16000 and y.shape == (len(x), 1)
    tol = 1e-4 if bits == 16 else 1e-7
    assert np.max(np.abs(y[:, 0] - x)) < tol


def test_wav_stereo_and_foreign_chunks():
    x = np.stack([_tone(hz=440), _tone(hz=220)], axis=1)
    data = bytearray(media.encode_wav(x, 8000))
    # splice a foreign LIST chunk between fmt and data (RIFF walk must
    # skip it); chunk sits right after fmt: RIFF(12) + fmt hdr(8+16)
    insert_at = 12 + 8 + 16
    foreign = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    data = bytes(data[:insert_at]) + foreign + bytes(data[insert_at:])
    fixed = bytearray(data)
    fixed[4:8] = (len(data) - 8).to_bytes(4, "little")
    y, rate = media.decode_wav(bytes(fixed))
    assert rate == 8000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) < 1e-4


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        media.decode_wav(b"not a wav")


# ---------------------------------------------------------------------------
# Y4M kernel
# ---------------------------------------------------------------------------

def _frames(n=7, h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        px = np.stack([(xx * 8 + i * 16) % 256, (yy * 8) % 256,
                       np.full((h, w), 64 + i)], axis=-1)
        out.append(px.astype(np.uint8))
    return np.stack(out)


def test_y4m_roundtrip_c444():
    frames = _frames()
    data = media.encode_y4m(frames)
    dec, meta = media.decode_y4m(data)
    assert meta["n_frames"] == 7 and (meta["w"], meta["h"]) == (32, 24)
    # YCbCr 601 round-trip is lossy by rounding only
    assert np.max(np.abs(dec.astype(int) - frames.astype(int))) <= 2


def test_y4m_frame_seek_is_selective():
    frames = _frames(n=10)
    data = media.encode_y4m(frames)
    dec, meta = media.decode_y4m(data, frame_indices=[0, 4, 9])
    assert dec.shape[0] == 3
    full, _ = media.decode_y4m(data)
    assert (dec[1] == full[4]).all() and (dec[2] == full[9]).all()
    with pytest.raises(IndexError):
        media.decode_y4m(data, frame_indices=[10])


def test_y4m_rejects_garbage():
    with pytest.raises(ValueError):
        media.decode_y4m(b"MPEG4???\nxx")


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def test_audio_windows_spark(spark):
    from zellige_spark.operators import images as IM

    rows = [(f"a{i}",
             media.encode_wav(_tone(rate=8000, secs=1.0 + i * 0.5), 8000),
             "wav")
            for i in range(4)]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    out = IM.sample_audio_windows(df, window_ms=500).toPandas()
    # clip i has 1.0 + 0.5i seconds -> ceil(dur/0.5) windows
    expect = sum(int(np.ceil((1.0 + 0.5 * i) / 0.5)) for i in range(4))
    assert len(out) == expect
    assert (out["sample_rate"] == 8000).all()
    full = out[out["n_samples"] == 4000]
    # a 440 Hz half-amp sine has rms ~ 0.354, peak ~ 0.5
    assert np.allclose(full["rms"], 0.3536, atol=0.01)
    assert (full["peak"] <= 0.51).all()
    # pcm payload round-trips
    r0 = out[(out["audio_id"] == "a0") & (out["window_idx"] == 0)].iloc[0]
    seg = np.frombuffer(bytes(r0["pcm_bytes"]), dtype=np.float32)
    assert len(seg) == r0["n_samples"]


def test_video_frames_spark(spark):
    from zellige_spark.operators import images as IM

    clips = [(f"v{i}", media.encode_y4m(_frames(n=9 + i)), "y4m")
             for i in range(3)]
    df = spark.createDataFrame(clips, "video_id string, bytes binary, fmt string")
    out = IM.sample_video_frames(df, every_n=4).toPandas()
    # clip i has 9+i frames -> samples at 0,4,8 (+12 never reached)
    assert len(out) == 9
    assert set(out["frame_idx"]) == {0, 4, 8}
    r = out[(out["video_id"] == "v0") & (out["frame_idx"] == 4)].iloc[0]
    px = np.frombuffer(bytes(r["bytes"]), dtype=np.uint8).reshape(r["h"], r["w"], 3)
    expected = _frames(n=9)[4]
    assert np.max(np.abs(px.astype(int) - expected.astype(int))) <= 2


def test_wav_extensible_float32_uses_subformat_guid():
    # WAVE_FORMAT_EXTENSIBLE with an IEEE-float subformat: the format
    # code lives in the GUID's leading 16 bits, not bits-per-sample
    import struct

    import numpy as np

    from zellige_spark.kernel import media

    x = (np.sin(np.linspace(0, 20, 480)) * 0.5).astype(np.float32)
    sub_guid = struct.pack("<H", 3) + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71])
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000 * 4, 4, 32)
           + struct.pack("<HHI", 22, 32, 0x4) + sub_guid)
    data = x.tobytes()
    riff = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", 4 + len(riff)) + b"WAVE" + riff
    out, rate = media.decode_wav(wav)
    assert rate == 8000
    assert np.allclose(out[:, 0], x.astype(np.float64), atol=1e-7)
