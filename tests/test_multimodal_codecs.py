"""Real pure-stdlib multimodal codecs (operators/multimodal.py): netpbm
P5/P6 images, PCM WAV audio, YUV4MPEG2 video with frame sampling —
payloads synthesized with struct/bytes, decodes checked against the
arrays they were built from."""

import struct

import numpy as np
import pytest

from light_curve_python_spark.operators.multimodal import (
    decode_and_featurize,
    decode_netpbm,
    decode_wav,
    decode_y4m_frames,
    resize_nearest,
)


def _p6(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return (f"P6\n# comment\n{w} {h}\n255\n".encode()
            + img.astype(np.uint8).tobytes())


def _p5(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5 {w} {h} 255\n".encode() + img.astype(np.uint8).tobytes()


def _wav(x: np.ndarray, rate: int) -> bytes:
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _y4m(frames: np.ndarray) -> bytes:
    nf, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()]
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    for f in frames:
        out.append(b"FRAME\n" + f.astype(np.uint8).tobytes()
                   + chroma + chroma)
    return b"".join(out)


def test_netpbm_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_netpbm(_p6(rgb)), rgb)
    gray = rng.integers(0, 256, (5, 9), dtype=np.uint8)
    np.testing.assert_array_equal(decode_netpbm(_p5(gray)), gray)
    with pytest.raises(ValueError):
        decode_netpbm(b"JFIF....")


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    got, got_rate = decode_wav(_wav(x, rate))
    assert got_rate == rate
    # encoder scales by 32767, decoder by 32768: up to ~1.5 LSB apart
    np.testing.assert_allclose(got, x, atol=2.0 / 32768)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")


def test_y4m_frame_sampling():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (6, 4, 8), dtype=np.uint8)
    got = decode_y4m_frames(_y4m(frames), every=1)
    np.testing.assert_array_equal(got, frames)
    sampled = decode_y4m_frames(_y4m(frames), every=3)
    np.testing.assert_array_equal(sampled, frames[[0, 3]])


def test_resize_nearest():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = resize_nearest(img, 6, 2)
    assert out.shape == (6, 2)
    np.testing.assert_array_equal(out[0], img[0, [0, 2]])
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert resize_nearest(rgb, 4, 8).shape == (4, 8, 3)


def test_real_codec_pipeline_mixed_kinds(spark):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 10, 3), dtype=np.uint8)
    rate = 4000
    x = 0.25 * np.sin(2 * np.pi * 100.0 * np.arange(rate) / rate)
    frames = rng.integers(0, 256, (4, 6, 8), dtype=np.uint8)
    rows = [("img", bytearray(_p6(img))),
            ("aud", bytearray(_wav(x, rate))),
            ("vid", bytearray(_y4m(frames)))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = decode_and_featurize(df, codec="real", frame_every=2) \
        .toPandas().set_index("media_id")
    assert out.loc["img", "kind"] == "image"
    fi = out.loc["img", "feature"]
    assert (fi[0], fi[1]) == (10.0, 6.0)                # w, h
    assert fi[2] == pytest.approx(img.mean(axis=2).mean(), rel=1e-6)
    assert out.loc["aud", "kind"] == "audio"
    fa = out.loc["aud", "feature"]
    assert (fa[0], fa[1]) == (float(rate), float(rate))  # n, rate
    assert fa[2] == pytest.approx(0.25 / np.sqrt(2), rel=1e-3)  # sine rms
    assert 90.0 < fa[5] < 1200.0                         # centroid near 100Hz
    assert out.loc["vid", "kind"] == "video"
    fv = out.loc["vid", "feature"]
    assert (fv[0], fv[1], fv[2]) == (8.0, 6.0, 2.0)      # w, h, sampled


def test_multimodal_golden_matches_fresh_computation(spark):
    """MULTIMODAL_GOLDEN (the driver oracle's pinned VALUES twin) must
    equal a fresh run of the real codec path on the deterministic
    payloads — a codec/featurization change fails HERE, loudly, not just
    in the driver's hash gate."""
    import __spark_entry__ as E
    rows = E.q_multimodal_features(spark, None).collect()
    got = sorted((r.media_id, r.kind, r.n_bytes, r.pos, r.sha256, r.feat)
                 for r in rows)
    assert got == sorted(E.MULTIMODAL_GOLDEN)
