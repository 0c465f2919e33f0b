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


# ------------------------------------------------------------- video (Y4M)

def y4m(w, h, luma_frames, chroma="C420jpeg", fps=b"F25:1"):
    """Assemble a YUV4MPEG2 clip from per-frame luma byte rows."""
    div = {"C420jpeg": 4, "C422": 2, "C444": 1}.get(chroma)
    hdr = b"YUV4MPEG2 W%d H%d " % (w, h) + fps + b" Ip A1:1 " + chroma.encode() + b"\n"
    out = [hdr]
    for fr in luma_frames:
        y = bytes(v for row in fr for v in row)
        n_chroma = 0 if chroma == "Cmono" else 2 * (w * h) // div
        out.append(b"FRAME\n" + y + bytes([128]) * n_chroma)
    return b"".join(out)


def test_parse_y4m_colorspaces_and_failures():
    import numpy as np

    from lamapi_spark.ops.multimodal import _parse_y4m

    fr = [[[(f * 31 + (y * 8 + x) * 13) % 256 for x in range(8)]
           for y in range(8)] for f in range(3)]
    for cs in ("C420jpeg", "C422", "C444"):
        w, h, fps, planes = _parse_y4m(y4m(8, 8, fr, chroma=cs))
        assert (w, h, fps, len(planes)) == (8, 8, 25.0, 3)
        assert planes[1].tolist() == fr[1]
    # mono: no chroma planes at all
    hdr = b"YUV4MPEG2 W4 H2 F30000:1001 Cmono\n"
    clip = hdr + b"FRAME\n" + bytes(range(8)) + b"FRAME\n" + bytes(range(8))
    w, h, fps, planes = _parse_y4m(clip)
    assert (w, h, len(planes)) == (4, 2, 2) and abs(fps - 30000 / 1001) < 1e-9
    for bad in (
        b"RIFF not video",
        b"YUV4MPEG2 W8 F25:1\nFRAME\n" + bytes(96),      # missing H
        b"YUV4MPEG2 W8 H8 C999x\nFRAME\n" + bytes(96),   # unknown colorspace
        b"YUV4MPEG2 W8 H8 F25:1\nFRAME\n" + bytes(10),   # truncated frame
        b"YUV4MPEG2 W8 H8 F25:1\nBLAH\n" + bytes(96),    # bad marker
        b"YUV4MPEG2 W8 H8 F25:1\n",                      # no frames
    ):
        try:
            _parse_y4m(bad)
            raise AssertionError(f"accepted {bad[:24]!r}")
        except ValueError:
            pass


def test_decode_video_sampling_stats_and_neardup(spark):
    from lamapi_spark.ops.multimodal import decode_video, image_neardup_pairs

    base = [[[(f * 31 + (y * 8 + x) * 13) % 256 for x in range(8)]
             for y in range(8)] for f in range(6)]
    # clip 2 = clip 1 with one pixel nudged per frame (near-dup frames);
    # clip 3 = inverted (far)
    near = [[[min(v + (1 if (y, x) == (0, 0) else 0), 255) for x, v in enumerate(row)]
             for y, row in enumerate(fr)] for fr in base]
    far = [[[255 - v for v in row] for row in fr] for fr in base]
    rows = spark.createDataFrame(
        [(1, bytearray(y4m(8, 8, base)), "video"),
         (2, bytearray(y4m(8, 8, near)), "video"),
         (3, bytearray(y4m(8, 8, far)), "video"),
         (4, bytearray(b"\x00\x00\x01\xba not y4m"), "video")],
        "id bigint, payload binary, modality string")
    out = decode_video(rows, every_n=2).collect()
    ok = [r for r in out if r.format == "Y4M"]
    bad = [r for r in out if r.format == "unknown"]
    # 3 clips x frames {0,2,4}; the non-video payload degrades to one null row
    assert len(ok) == 9 and [r.frame_idx for r in ok if r.id == 1] == [0, 2, 4]
    assert len(bad) == 1 and bad[0].id == 4 and bad[0].ahash is None
    r0 = next(r for r in ok if r.id == 1 and r.frame_idx == 0)
    assert (r0.width, r0.height, r0.fps, r0.n_frames) == (8, 8, 25.0, 6)
    exact = sum((0 * 31 + i * 13) % 256 for i in range(64)) / 64
    assert r0.mean_y == exact
    # frame aHashes feed the SAME pairing operator as still images:
    # per-frame near-dups pair, inverted frames don't
    frames = decode_video(rows, every_n=2).filter(F.col("ahash").isNotNull()).select(
        (F.col("id") * 100 + F.col("frame_idx")).alias("id"), "ahash")
    pairs = {(r.id_a, r.id_b)
             for r in image_neardup_pairs(frames, max_hamming=3).collect()}
    assert {(100 + f, 200 + f) for f in (0, 2, 4)} <= pairs
    assert not any(a // 100 == 3 or b // 100 == 3 for a, b in pairs)


# ---------------------------------------------------------------- png


def test_decode_png_all_filters_matches_netpbm(spark):
    """PNG pixels round-trip through DEFLATE + the r%5 filter schedule
    (all five scanline filters per image) and must land on the SAME
    luma and the SAME aHash as the identical pixels through NetPBM —
    decoder-independence of the downstream perceptual pipeline."""
    from lamapi_spark.queries_ops import _png_encode

    grad = _gradient(16, 16)
    gray = [[(x * 13 + y) % 256 for x in range(16)] for y in range(16)]
    rgb_flat = [[c for px in row for c in px] for row in grad]
    rows = [
        (1, bytearray(_png_encode(gray, channels=1)), "image"),
        (2, bytearray(pgm_p2(16, 16, gray)), "image"),
        (3, bytearray(_png_encode(rgb_flat, channels=3)), "image"),
        (4, bytearray(ppm_p6(16, 16, grad)), "image"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}

    assert out[1].format == "PNG"
    assert (out[1].width, out[1].height, out[1].channels) == (16, 16, 1)
    assert out[1].mean_luma == out[2].mean_luma
    assert out[1].ahash == out[2].ahash

    assert out[3].format == "PNG" and out[3].channels == 3
    assert out[3].mean_luma == out[4].mean_luma
    assert out[3].ahash == out[4].ahash


def test_decode_png_alpha_channels_ignored_in_luma(spark):
    """RGBA (type 6) and gray+alpha (type 4): channel counts are real,
    alpha NEVER contributes to luma/aHash — an opaque and a transparent
    copy of the same color data hash identically."""
    from lamapi_spark.queries_ops import _png_encode

    grad = _gradient(12, 12)
    rgb_flat = [[c for px in row for c in px] for row in grad]
    rgba_opaque = [[c for px in row for c in (*px, 255)] for row in grad]
    rgba_vary = [[c for (x, px) in enumerate(row) for c in (*px, (x * 31) % 256)]
                 for row in grad]
    gray = [[(x * 13 + y) % 256 for x in range(12)] for y in range(12)]
    ga = [[c for x, v in enumerate(row) for c in (v, (x * 17) % 256)]
          for row in gray]
    rows = [
        (1, bytearray(_png_encode(rgb_flat, channels=3)), "image"),
        (2, bytearray(_png_encode(rgba_opaque, channels=4)), "image"),
        (3, bytearray(_png_encode(rgba_vary, channels=4)), "image"),
        (4, bytearray(_png_encode(gray, channels=1)), "image"),
        (5, bytearray(_png_encode(ga, channels=2)), "image"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}

    assert out[2].channels == 4 and out[3].channels == 4
    assert out[1].mean_luma == out[2].mean_luma == out[3].mean_luma
    assert out[1].ahash == out[2].ahash == out[3].ahash
    assert out[5].channels == 2
    assert out[5].mean_luma == out[4].mean_luma
    assert out[5].ahash == out[4].ahash


def test_decode_png_unsupported_degrades_to_unknown(spark):
    """PNGs outside the decoder's profile (PLTE-less palette, 1/2/4-bit
    depths, 16-bit palette) and truncated streams hit the ValueError
    paths and emit format 'unknown' nulls — never fail the batch.
    (16-bit depth and Adam7 interlacing are SUPPORTED since round 4 —
    covered by test_png_adam7_and_16bit_roundtrip — so they no longer
    belong here; short-IDAT truncation covers the malformed-stream
    path for any header.)"""
    import struct
    import zlib

    from lamapi_spark.queries_ops import _png_encode

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"

    def png_hdr(depth=8, color=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, color, 0, 0, interlace)
        body = zlib.compress(bytes([0] + [1, 2, 3, 4]) * 4)
        return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", body) + chunk(b"IEND", b"")

    good = _png_encode([[10, 20], [30, 40]], channels=1)
    truncated = good[:len(good) // 2]
    rows = [
        (1, bytearray(png_hdr(color=3)), "image"),        # palette, NO PLTE
        (2, bytearray(png_hdr(depth=4)), "image"),        # sub-byte depth
        (3, bytearray(png_hdr(depth=16, color=3)), "image"),  # 16-bit palette
        (4, bytearray(truncated), "image"),               # cut mid-IDAT
        (6, bytearray(png_hdr(depth=16)), "image"),       # 16-bit, IDAT too short
        (7, bytearray(png_hdr(interlace=1)), "image"),    # Adam7, IDAT too short
        (5, bytearray(good), "image"),                    # control
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}
    for i in (1, 2, 3, 4, 6, 7):
        assert out[i].format == "unknown" and out[i].ahash is None, i
    assert out[5].format == "PNG" and out[5].mean_luma == 25.0


def test_decode_png_palette_resolves_to_rgb(spark):
    """Color type 3: filters run on the INDEX bytes, then PLTE lookup
    yields RGB — a palette image of the same colors as a truecolor PNG
    must produce identical luma and aHash."""
    import struct
    import zlib

    from lamapi_spark.queries_ops import _png_encode

    grad = _gradient(8, 8)
    # palette = the distinct colors of grad, index rows into it
    colors = sorted({px for row in grad for px in row})
    cidx = {c: i for i, c in enumerate(colors)}
    idx_rows = [[cidx[px] for px in row] for row in grad]
    rgb_flat = [[c for px in row for c in px] for row in grad]

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # filtered index scanlines, one filter type per row (r % 5) — the
    # filters operate on the index bytes, exactly per spec
    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 3, 0, 0, 0)
    raw = bytearray()
    prev = [0] * 8
    for r, row in enumerate(idx_rows):
        ft = r % 5
        raw.append(ft)
        for x, v in enumerate(row):
            a = row[x - 1] if x >= 1 else 0
            up = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            pred = (0 if ft == 0 else a if ft == 1 else up if ft == 2
                    else (a + up) >> 1 if ft == 3
                    else (a if (abs(a + up - c - a) <= abs(a + up - c - up)
                                and abs(a + up - c - a) <= abs(a + up - c - c))
                          else (up if abs(a + up - c - up) <= abs(a + up - c - c)
                                else c)))
            raw.append((v - pred) % 256)
        prev = row
    plte = bytes(c for col in colors for c in col)
    pal_png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))

    rows = [
        (1, bytearray(pal_png), "image"),
        (2, bytearray(_png_encode(rgb_flat, channels=3)), "image"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}
    assert out[1].format == "PNG" and out[1].channels == 3
    assert out[1].mean_luma == out[2].mean_luma
    assert out[1].ahash == out[2].ahash


def test_decode_jpeg_through_arrow_stage(spark):
    """JPEG through decode_image's parser chain: constant-block
    grayscale decodes bit-exactly (so PGM, baseline JPEG, and
    PROGRESSIVE JPEG of the same pixels agree on luma AND aHash), 4:2:0
    color converts through BT.601, and a malformed stream (SOF2 frame
    with a sequential scan header — a DC+AC mixed progressive scan)
    null-degrades to 'unknown'."""
    from lamapi_spark.ops.jpeg import (
        constant_block, encode_jpeg, encode_jpeg_progressive,
    )

    vals = [30, 100, 180, 250]
    blocks = [constant_block(v) for v in vals]
    jb = encode_jpeg(16, 16, [blocks])
    # same pixels as a PGM: 4 constant 8x8 quadrants
    gray = [[vals[(y // 8) * 2 + (x // 8)] for x in range(16)]
            for y in range(16)]
    color = encode_jpeg(16, 16,
                        [[constant_block(120)] * 4, [constant_block(100)],
                         [constant_block(150)]],
                        sampling=[(2, 2), (1, 1), (1, 1)])
    i = jb.index(b"\xff\xc0")
    malformed = jb[:i + 1] + b"\xc2" + jb[i + 2:]
    rows = [
        (1, bytearray(jb), "image"),
        (2, bytearray(pgm_p5(16, 16, gray)), "image"),
        (3, bytearray(color), "image"),
        (4, bytearray(malformed), "image"),
        (5, bytearray(encode_jpeg_progressive(16, 16, [blocks])), "image"),
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_image(df).collect()}

    assert out[1].format == "JPEG"
    assert (out[1].width, out[1].height, out[1].channels) == (16, 16, 1)
    assert out[1].mean_luma == sum(vals) / 4
    # bit-exact pixels -> identical luma and aHash across formats
    assert out[2].format == "P5"
    assert out[1].mean_luma == out[2].mean_luma
    assert out[1].ahash == out[2].ahash
    assert out[3].format == "JPEG" and out[3].channels == 3
    r, g, b = (round(120 + 1.402 * 22), round(120 - 0.344136 * -28
               - 0.714136 * 22), round(120 + 1.772 * -28))
    lum = 0.299 * r + 0.587 * g + 0.114 * b
    assert out[3].mean_luma == pytest.approx(round(lum, 3))
    assert out[4].format == "unknown" and out[4].ahash is None
    # real progressive stream: identical pixels -> identical luma + hash
    assert out[5].format == "JPEG"
    assert out[5].mean_luma == out[1].mean_luma
    assert out[5].ahash == out[1].ahash


def _wav(fmt, channels, rate, bits, data, block_align=None):
    ba = block_align if block_align is not None else max(1, channels * bits // 8)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                    rate * ba, ba, bits)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_g711_expand_full_byte_range():
    """Vectorized mu-law/A-law vs independent per-byte reference loops
    over all 256 codes, plus the canonical anchor values."""
    import numpy as np

    from lamapi_spark.ops.multimodal import _alaw_expand, _ulaw_expand

    def ulaw_ref(u):
        u = ~u & 0xFF
        t = ((((u & 15) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
        return -t if u & 0x80 else t

    def alaw_ref(a):
        a ^= 0x55
        e, m = (a >> 4) & 7, a & 15
        t = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        return t if a & 0x80 else -t

    allb = np.arange(256, dtype=np.uint8)
    assert np.array_equal(_ulaw_expand(allb),
                          [ulaw_ref(int(x)) for x in allb])
    assert np.array_equal(_alaw_expand(allb),
                          [alaw_ref(int(x)) for x in allb])
    # anchors: mu-law silence is 0xFF; A-law 0xD5 is +8; extremes
    assert _ulaw_expand(np.array([0xFF, 0x00, 0x80], np.uint8)).tolist() == \
        [0, -32124, 32124]
    assert _alaw_expand(np.array([0xD5, 0x55, 0xAA, 0x2A], np.uint8)).tolist() == \
        [8, -8, 32256, -32256]


def test_ima_adpcm_state_machine():
    """Hand-computed nibble walk, step-table advance, int16 clamping,
    and multi-block predictor reset."""
    from lamapi_spark.ops.multimodal import _ima_adpcm_decode

    # step index 0 (step 7): nibbles 0,1,9,9 -> +0,+1,-1,-1
    blk = struct.pack("<hBB", 1000, 0, 0) + bytes([0x10, 0x99])
    assert _ima_adpcm_decode(blk, 6).tolist() == [1000, 1000, 1001, 1000, 999]
    # nibble 7 at index 0: diff = 0+7+3+1 = 11, index -> +8
    # then nibble 7 at index 8 (step 16): diff = 2+16+8+4 = 30
    blk2 = struct.pack("<hBB", 0, 0, 0) + bytes([0x77])
    assert _ima_adpcm_decode(blk2, 5).tolist() == [0, 11, 41]
    # clamp at the positive rail from near-max predictor at max step
    blk3 = struct.pack("<hBB", 32000, 88, 0) + bytes([0x77])
    assert _ima_adpcm_decode(blk3, 5).max() == 32767
    # two blocks: second block's header resets predictor and index
    two = (struct.pack("<hBB", 100, 0, 0) + bytes([0x00])
           + struct.pack("<hBB", -200, 0, 0) + bytes([0x11]))
    assert _ima_adpcm_decode(two, 5).tolist() == [100, 100, 100, -200, -199, -198]


def test_decode_audio_codec_formats(spark):
    """All four WAV variants through the Arrow stage, plus degrade on a
    format that genuinely needs a codec library (MP3-marked)."""
    import numpy as np

    from lamapi_spark.ops.multimodal import _ulaw_expand, decode_audio

    pcm = _wav(1, 1, 8000, 16, struct.pack("<4h", 100, -200, 300, -400))
    ulaw_bytes = bytes(range(0, 256, 2))
    ulaw = _wav(7, 1, 8000, 8, ulaw_bytes)
    alaw = _wav(6, 1, 8000, 8, bytes([0xD5, 0x55, 0xAA, 0x2A]))
    adpcm = _wav(0x11, 1, 8000, 4,
                 struct.pack("<hBB", 1000, 0, 0) + bytes([0x10, 0x99]),
                 block_align=6)
    mp3ish = _wav(0x55, 1, 8000, 0, b"\xff\xfb" + b"\x00" * 30)
    rows = [(1, bytearray(pcm), "audio"), (2, bytearray(ulaw), "audio"),
            (3, bytearray(alaw), "audio"), (4, bytearray(adpcm), "audio"),
            (5, bytearray(mp3ish), "audio")]
    df = spark.createDataFrame(rows, "id bigint, payload binary, modality string")
    out = {r.id: r for r in decode_audio(df).collect()}

    assert out[1].format == "WAV" and out[1].peak_abs == 400
    exp = np.abs(_ulaw_expand(np.frombuffer(ulaw_bytes, dtype=np.uint8)))
    assert out[2].format == "WAV-ULAW"
    assert out[2].peak_abs == int(exp.max())
    assert out[2].mean_abs == float(int(exp.sum()) / exp.size)
    assert out[3].format == "WAV-ALAW" and out[3].peak_abs == 32256
    assert out[4].format == "WAV-ADPCM" and out[4].n_samples == 5
    assert out[4].peak_abs == 1001
    assert out[5].format == "unknown" and out[5].peak_abs is None


def test_png_adam7_and_16bit_roundtrip():
    """Adam7 deinterlace + 16-bit byte-pair combine (+ both together),
    with all five filters cycling inside every pass, on non-multiple-
    of-8 dimensions — against the known source pixels."""
    import numpy as np

    from lamapi_spark.ops.multimodal import _parse_png
    from lamapi_spark.queries_ops import _png_encode_gray

    img8 = [[(r * 31 + c * 17) % 256 for c in range(10)] for r in range(9)]
    fmt, w, h, arr = _parse_png(_png_encode_gray(img8, interlace=1))
    assert (fmt, w, h) == ("PNG", 10, 9)
    assert np.array_equal(arr[:, :, 0], np.array(img8))

    img16 = [[(r * 4099 + c * 257 + 13) % 65536 for c in range(6)]
             for r in range(7)]
    for interlace in (0, 1):
        fmt, w, h, arr = _parse_png(
            _png_encode_gray(img16, depth=16, interlace=interlace))
        assert (w, h) == (6, 7)
        assert np.array_equal(arr[:, :, 0], np.array(img16)), interlace
    # 1-bit depth still degrades
    import pytest as _pytest
    bad = bytearray(_png_encode_gray(img8))
    bad[24] = 1  # IHDR bit depth byte
    with _pytest.raises(ValueError):
        _parse_png(bytes(bad))


def test_gif_lzw_and_interlace():
    """GIF decode: trivial CLEAR-per-literal streams, 4-pass interlace
    restore, REAL dictionary growth (greedy LZW encoder with width
    bumps), and degrade paths."""
    import numpy as np

    from lamapi_spark.ops.multimodal import _gif_lzw_decode, _parse_gif
    from lamapi_spark.queries_ops import _gif_encode_gray

    w, h = 10, 6
    idxs = [(r * 37 + c * 11) % 256 for r in range(h) for c in range(w)]
    exp = np.array(idxs).reshape(h, w)
    fmt, gw, gh, px = _parse_gif(_gif_encode_gray(w, h, idxs))
    assert (fmt, gw, gh) == ("GIF", 10, 6) and px.shape == (6, 10, 3)
    for ch in range(3):  # identity grayscale palette
        assert np.array_equal(px[:, :, ch], exp)

    # interlaced: rows stored in 4-pass order, restored to raster
    order = [r for (s, st) in [(0, 8), (4, 8), (2, 4), (1, 2)]
             for r in range(s, h, st)]
    inter = [idxs[r * w + c] for r in order for c in range(w)]
    _, _, _, px2 = _parse_gif(_gif_encode_gray(w, h, inter, interlace=True))
    assert np.array_equal(px2[:, :, 0], exp)

    # greedy LZW with dictionary growth + width bumps + repeats
    def lzw_encode(vals, mcs=8):
        clear, eoi = 1 << mcs, (1 << mcs) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code, width = eoi + 1, mcs + 1
        codes = [(clear, width)]
        cur = b""
        for v in vals:
            nxt = cur + bytes([v])
            if nxt in table:
                cur = nxt
                continue
            codes.append((table[cur], width))
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            cur = bytes([v])
        codes.append((table[cur], width))
        codes.append((eoi, width))
        return codes

    def pack(codes):
        acc = nbits = 0
        out = bytearray()
        for c, cw in codes:
            acc |= c << nbits
            nbits += cw
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    rep = ([5, 5, 5, 5, 7, 7, 5, 5, 7, 7] * 40)[:320]
    assert _gif_lzw_decode(pack(lzw_encode(rep)), 8, len(rep)) == rep

    import pytest as _pytest
    for bad in (b"notagif", b"GIF89a" + b"\x00" * 5,
                _gif_encode_gray(4, 4, [0] * 16)[:25]):
        with _pytest.raises(ValueError):
            _parse_gif(bad)


def test_audio_fingerprint_invariants(spark):
    from lamapi_spark.ops.multimodal import audio_fingerprint, audio_neardup_pairs

    def pcm16(samples):
        return _wav(1, 1, 8000, 16,
                    b"".join(struct.pack("<h", s) for s in samples))

    base = [((i * 37) % 901) - 450 for i in range(260)]
    rows = [
        (0, pcm16(base)),
        (1, pcm16([s * 2 for s in base])),            # amplitude-scaled
        (2, pcm16(base[::-1])),                       # time-reversed
        (3, pcm16(base[:64])),                        # shorter than 65 windows
        (4, b"not audio at all"),                     # undecodable
    ]
    df = spark.createDataFrame(rows, "id bigint, payload binary")
    out = {r.id: r for r in audio_fingerprint(df).collect()}
    # scaling preserves every energy comparison -> identical fingerprint
    assert out[1].afp == out[0].afp
    # time reversal reverses the energy sequence -> different fingerprint
    assert out[2].afp != out[0].afp and out[2].format == "WAV"
    # short clip keeps its format with a null fingerprint
    assert out[3].format == "WAV" and out[3].afp is None
    assert out[4].format == "unknown" and out[4].afp is None
    # exact dup pairs at hamming 0; null rows never pair
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in audio_neardup_pairs(audio_fingerprint(df)).collect()}
    assert pairs[(0, 1)] == 0
    assert not any({a, b} & {3, 4} for a, b in pairs)


def test_ima_adpcm_stereo_interleaving():
    """Stereo IMA ADPCM: per-channel 4-byte headers, then alternating
    4-byte nibble groups per channel; verified against an independent
    Python state machine and frame interleaving."""
    import struct

    from lamapi_spark.ops.multimodal import _ima_adpcm_decode, _parse_wav

    # one block: ch0 pred=1000 idx=10, ch1 pred=-500 idx=3;
    # 8 bytes body = 4 bytes (8 nibbles) ch0 then 4 bytes ch1
    nibs0 = [0, 1, 2, 3, 4, 5, 6, 7]
    nibs1 = [8, 9, 10, 11, 12, 13, 14, 15]
    def pack(nibs):
        return bytes((nibs[i] | (nibs[i + 1] << 4)) for i in range(0, 8, 2))
    block = (struct.pack("<hBB", 1000, 10, 0) + struct.pack("<hBB", -500, 3, 0)
             + pack(nibs0) + pack(nibs1))

    STEPS = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
             34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
             143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
             449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
             1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
             3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
             9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
             22385, 24623, 27086, 29794, 32767]
    IDX = [-1, -1, -1, -1, 2, 4, 6, 8]

    def ref(pred, index, nibs):
        out = [pred]
        for n in nibs:
            st = STEPS[index]
            d = st >> 3
            if n & 4: d += st
            if n & 2: d += st >> 1
            if n & 1: d += st >> 2
            pred = pred - d if n & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + IDX[n & 7]))
            out.append(pred)
        return out

    want0, want1 = ref(1000, 10, nibs0), ref(-500, 3, nibs1)
    got = _ima_adpcm_decode(block, len(block), channels=2)
    assert got.tolist() == [v for fr in zip(want0, want1) for v in fr]

    # through the WAV container: 2 channels, fmt 0x11, bits=4
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(block)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 0x11, 2, 8000, 8000, len(block), 4)
           + b"data" + struct.pack("<I", len(block)) + block)
    name, ch, rate, samples = _parse_wav(hdr)
    assert (name, ch, rate) == ("WAV-ADPCM", 2, 8000)
    assert samples.shape == (9, 2)
    assert samples[:, 0].tolist() == want0 and samples[:, 1].tolist() == want1
