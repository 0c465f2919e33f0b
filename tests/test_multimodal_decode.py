"""Real image decoding (NetPBM / BMP, numpy-only) + perceptual aHash."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from lamapi_spark.ops.multimodal import decode_image


def ppm_p6(w, h, rgb_rows):  # rgb_rows: list of rows of (r,g,b)
    body = bytes(c for row in rgb_rows for px in row for c in px)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + body


def pgm_p5(w, h, vals):
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(v for row in vals for v in row)


def pgm_p2(w, h, vals):
    body = "\n".join(" ".join(str(v) for v in row) for row in vals)
    return ("P2\n%d %d\n255\n%s\n" % (w, h, body)).encode()


def bmp24(w, h, rgb_rows):
    stride = (w * 3 + 3) // 4 * 4
    pad = stride - w * 3
    body = b""
    for row in reversed(rgb_rows):              # bottom-up
        body += bytes(c for (r, g, b) in row for c in (b, g, r)) + b"\0" * pad
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    return header + body


def _gradient(w, h, shift=0):
    return [[((x * 16 + shift) % 256, (y * 16) % 256, 128)
             for x in range(w)] for y in range(h)]


def test_decode_image_formats(spark):
    grad = _gradient(16, 16)
    gray = [[(x * 13 + y) % 256 for x in range(16)] for y in range(16)]
    rows = [
        (1, bytearray(ppm_p6(16, 16, grad)), "image"),
        (2, bytearray(bmp24(16, 16, grad)), "image"),
        (3, bytearray(pgm_p5(16, 16, gray)), "image"),
        (4, bytearray(pgm_p2(16, 16, gray)), "image"),
        (5, bytearray(b"\x89PNG not actually decodable"), "image"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}

    assert out[1].format == "P6" and (out[1].width, out[1].height, out[1].channels) == (16, 16, 3)
    assert out[2].format == "BMP" and (out[2].width, out[2].height, out[2].channels) == (16, 16, 3)
    # SAME pixels through PPM and BMP -> identical luma and identical aHash
    assert out[1].mean_luma == pytest.approx(out[2].mean_luma)
    assert out[1].ahash == out[2].ahash
    # ascii and binary PGM agree too
    assert out[3].format == "P5" and out[4].format == "P2"
    assert out[3].ahash == out[4].ahash and out[3].channels == 1
    assert out[3].mean_luma == out[4].mean_luma
    # compressed/unknown payloads degrade gracefully, never fail the batch
    assert out[5].format == "unknown" and out[5].ahash is None


def test_ahash_perceptual_locality(spark):
    base = _gradient(32, 32)
    near = _gradient(32, 32, shift=4)       # slightly brighter red channel
    far = [[(255 - r, 255 - g, 255 - b) for (r, g, b) in row] for row in base]
    df = spark.createDataFrame(
        [(1, bytearray(ppm_p6(32, 32, base)), "image"),
         (2, bytearray(ppm_p6(32, 32, near)), "image"),
         (3, bytearray(ppm_p6(32, 32, far)), "image")],
        "id bigint, payload binary, modality string")
    h = {r.id: r.ahash for r in decode_image(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[2]) <= 8            # near-duplicate: close in Hamming
    assert ham(h[1], h[3]) >= 24           # inverted image: far
    # the same banded Hamming pairing as SimHash applies via bit_count(xor)
    near_pairs = (
        decode_image(df).alias("a")
        .join(decode_image(df).alias("b"), F.col("a.id") < F.col("b.id"))
        .filter(F.bit_count(F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))) <= 8)
        .select("a.id", "b.id").collect()
    )
    assert [(r[0], r[1]) for r in near_pairs] == [(1, 2)]
