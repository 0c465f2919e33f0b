"""Property-based (hypothesis) tests over the pure-Python codec cores.

The fixed-profile round-trip suites (tests/test_flac.py,
tests/test_webp.py, tests/test_multimodal_decode.py) pin every decoder
surface on hand-picked inputs; these sweep RANDOM inputs through random
valid profile combinations so encoder/decoder disagreements hiding
between the hand-picked points get found. All lossless codecs, so the
property is always exact equality. No SparkSession — pure numpy, runs
in milliseconds per example.
"""

from __future__ import annotations

import os

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# committed default keeps CI fast; deep one-off fuzz runs set e.g.
# HYP_EXAMPLES=1500 (how the WebP CTE packing bug was found)
_N = int(os.environ.get("HYP_EXAMPLES", "30"))

# ----------------------------------------------------------------- FLAC

_SUBFRAMES = ["constant", "verbatim", "fixed0", "fixed1", "fixed2",
              "fixed3", "fixed4", "lpc"]


@settings(max_examples=_N, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=1, max_value=700),
    ch=st.integers(min_value=1, max_value=2),
    block=st.sampled_from([64, 256]),
    subframe=st.sampled_from(_SUBFRAMES),
    porder=st.integers(min_value=0, max_value=2),
)
def test_flac_roundtrip_random(data, n, ch, block, subframe, porder):
    from lamapi_spark.ops.multimodal import _parse_flac, encode_flac

    if subframe == "constant":
        v = data.draw(st.integers(min_value=-30000, max_value=30000))
        arr = np.full((n, ch), v, dtype=np.int64)
    else:
        flat = data.draw(st.lists(
            st.integers(min_value=-30000, max_value=30000),
            min_size=n * ch, max_size=n * ch))
        arr = np.array(flat, dtype=np.int64).reshape(n, ch)
    mode = data.draw(st.sampled_from(
        ["indep", "left-side", "right-side", "mid-side"])) if ch == 2 else "indep"
    # porder partitions need block % 2**porder == 0 on full blocks; the
    # encoder handles short tails itself, so any porder is valid here.
    fmt, och, orate, out = _parse_flac(
        encode_flac(arr, block=block, mode=mode, subframe=subframe,
                    porder=porder))
    assert (fmt, och, orate) == ("FLAC", ch, 8000)
    assert out.shape == arr.shape and (out == arr).all()


# ----------------------------------------------------------------- WebP

_WEBP_PROFILES = [
    dict(),
    dict(sub_green=True),
    dict(cache_bits=2),
    dict(lz77="dist1"),
    dict(lz77="above"),
    dict(lz77="both", cache_bits=3),
    dict(sub_green=True, color_cte=(3, -2, 5)),
    dict(palette=True),
    dict(meta_bits=2),
]


@settings(max_examples=_N, deadline=None)
@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    profile=st.sampled_from(range(len(_WEBP_PROFILES))),
    pred_mode=st.one_of(st.none(), st.integers(min_value=0, max_value=13)),
)
def test_webp_roundtrip_random(data, h, w, seed, profile, pred_mode):
    from lamapi_spark.ops.webp import encode_webp, parse_webp

    kw = dict(_WEBP_PROFILES[profile])
    if not kw.get("palette") and pred_mode is not None:
        kw["pred_mode"] = pred_mode
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    if kw.get("palette"):
        # palette path needs <= 256 distinct colors; quantize to 8
        arr = (arr // 32) * 32
        arr[:, :, 3] = 255
    fmt, ow, oh, out = parse_webp(encode_webp(arr, **kw))
    assert (fmt, ow, oh) == ("WEBP", w, h)
    assert (out.astype(np.uint8) == arr).all()


# -------------------------------------------------------------- GIF LZW


def _lzw_encode(vals, mcs=8):
    """Greedy spec LZW encoder (same as test_multimodal_decode's) —
    kept independent of the decoder under test."""
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


@settings(max_examples=max(_N, 50), deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=255),
                     min_size=1, max_size=600))
def test_gif_lzw_roundtrip_random(vals):
    from lamapi_spark.ops.multimodal import _gif_lzw_decode

    assert _gif_lzw_decode(_lzw_encode(vals), 8, len(vals)) == vals


# ---------------------------------------------- PNG (gray, every filter)


@settings(max_examples=_N, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    depth=st.sampled_from([8, 16]),
    interlace=st.booleans(),
)
def test_png_gray_roundtrip_random(h, w, seed, depth, interlace):
    from lamapi_spark.ops.multimodal import _parse_png
    from lamapi_spark.queries_ops import _png_encode_gray

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << depth, (h, w), dtype=np.uint16 if depth == 16
                       else np.uint8)
    fmt, ow, oh, px = _parse_png(
        _png_encode_gray(img.tolist(), depth=depth,
                         interlace=1 if interlace else 0))
    assert (fmt, ow, oh) == ("PNG", w, h)
    # the decoder emits native-depth samples (16-bit grays stay 16-bit)
    assert np.array_equal(px[:, :, 0], img)


# ------------------------------------- JPEG baseline == progressive


@settings(max_examples=_N, deadline=None)
@given(
    data=st.data(),
    n_blocks=st.integers(min_value=1, max_value=6),
)
def test_jpeg_progressive_equals_baseline_random(data, n_blocks):
    """Differential oracle: the baseline and progressive encoders emit
    the SAME quantized coefficients, so the two decode paths (Huffman
    sequential vs Annex-G spectral selection + successive
    approximation) must produce bit-identical pixels for ANY
    coefficient content."""
    from lamapi_spark.ops.jpeg import (
        encode_jpeg, encode_jpeg_progressive, parse_jpeg,
    )

    blocks = []
    for _ in range(n_blocks):
        blk = {0: data.draw(st.integers(min_value=-140, max_value=140))}
        n_ac = data.draw(st.integers(min_value=0, max_value=8))
        for _ in range(n_ac):
            pos = data.draw(st.integers(min_value=1, max_value=63))
            blk[pos] = data.draw(st.integers(min_value=-120, max_value=120)
                                 .filter(lambda v: v != 0))
        blocks.append(blk)
    base = parse_jpeg(encode_jpeg(8 * n_blocks, 8, [blocks]))
    prog = parse_jpeg(encode_jpeg_progressive(8 * n_blocks, 8, [blocks]))
    assert base[0] == prog[0] == "JPEG" and base[1:3] == prog[1:3]
    assert np.array_equal(base[3], prog[3])
