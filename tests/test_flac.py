"""FLAC codec: lossless round-trip through every subframe type, stereo
mode, Rice partitioning/escape, UTF-8 frame numbering, and the CRC /
corruption guards. The encoder (ops/multimodal.encode_flac) is the
equivalence oracle: FLAC is lossless, so _parse_flac must reproduce the
encoder's input PCM bit-for-bit — the same oracle structure the JPEG
codec uses (tests/test_jpeg.py)."""

from __future__ import annotations

import numpy as np
import pytest

from lamapi_spark.ops.multimodal import _parse_flac, encode_flac


def pcm(seed: int, n: int, ch: int = 1) -> np.ndarray:
    return np.array(
        [((seed * 7919 + j * 104729) % 65521) - 32760 for j in range(n * ch)],
        dtype=np.int64,
    ).reshape(n, ch)


@pytest.mark.parametrize("name,arr,kw", [
    ("fixed0", pcm(2, 300), dict(subframe="fixed0")),
    ("fixed1", pcm(13, 300), dict(subframe="fixed1")),
    ("fixed2", pcm(1, 300), dict(subframe="fixed2")),
    ("fixed3", pcm(14, 300), dict(subframe="fixed3")),
    ("fixed4", pcm(3, 500), dict(subframe="fixed4")),
    ("verbatim", pcm(4, 44), dict(subframe="verbatim")),
    ("constant", np.full((100, 1), -123, np.int64), dict(subframe="constant")),
    ("lpc", pcm(5, 460), dict(subframe="lpc")),
    # short last frame (300 % 256 = 44) is covered by every n=300 case
    ("rice_partitions_escape", pcm(6, 384),
     dict(subframe="fixed3", porder=2, escape_part=1)),
    ("bps8", (pcm(12, 200) % 200) - 100, dict(bps=8)),
])
def test_mono_roundtrip(name, arr, kw):
    fmt, ch, rate, out = _parse_flac(encode_flac(arr, **kw))
    assert (fmt, ch, rate) == ("FLAC", 1, 8000)
    assert out.shape == arr.shape and (out == arr).all()


@pytest.mark.parametrize("mode,kind", [
    ("indep", "fixed2"), ("left-side", "lpc"),
    ("right-side", "fixed1"), ("mid-side", "fixed2"),
])
def test_stereo_modes_roundtrip(mode, kind):
    arr = pcm(8, 300, 2)
    fmt, ch, rate, out = _parse_flac(encode_flac(arr, mode=mode, subframe=kind))
    assert ch == 2 and (out == arr).all()


def test_multiframe_utf8_frame_numbers():
    # 9000 samples / block 64 = 141 frames: frame numbers >= 128 take the
    # multi-byte UTF-8-style path on both encode and decode
    arr = pcm(11, 9000)
    fmt, ch, rate, out = _parse_flac(encode_flac(arr, block=64))
    assert (out == arr).all()


def test_constant_fallback_to_verbatim():
    # subframe='constant' on non-constant data must not corrupt: the
    # encoder silently falls back to verbatim
    arr = pcm(9, 64)
    fmt, ch, rate, out = _parse_flac(encode_flac(arr, subframe="constant"))
    assert (out == arr).all()


def test_corruption_raises_valueerror():
    b = encode_flac(pcm(1, 300))
    for mutated in [
        b[:len(b) // 2],                               # truncated frame
        b[:43] + bytes([b[43] ^ 0xFF]) + b[44:],        # frame-header bits
        b[:-30] + bytes([b[-30] ^ 0x01]) + b[-29:],     # payload bits (CRC-16)
        b"XXXX" + b[4:],                                # magic
        b[:20],                                         # truncated metadata
    ]:
        with pytest.raises(ValueError):
            _parse_flac(mutated)


def test_decode_audio_dispatches_flac(spark):
    from pyspark.sql import functions as F

    from lamapi_spark.ops.multimodal import decode_audio

    arr = pcm(21, 300)
    good = encode_flac(arr)
    df = spark.createDataFrame(
        [(1, bytearray(good), "audio"), (2, bytearray(good[:40]), "audio")],
        "id long, payload binary, modality string")
    rows = {r.id: r for r in decode_audio(df).collect()}
    assert rows[1].format == "FLAC"
    assert rows[1].channels == 1 and rows[1].sample_rate == 8000
    assert rows[1].n_samples == 300
    assert rows[1].peak_abs == int(np.abs(arr).max())
    assert rows[2].format == "unknown" and rows[2].peak_abs is None
