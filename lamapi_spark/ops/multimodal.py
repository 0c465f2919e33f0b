"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDF
stages over ``mapInPandas``.

Decode paths:

- ``decode_image`` — a REAL decoder (stdlib + numpy, no image
  libraries): NetPBM P2/P3/P5/P6, uncompressed 24-bit BMP, 8-bit
  PNG (gray/RGB/gray+alpha/RGBA — DEFLATE via stdlib zlib plus the five
  scanline filters unfiltered in numpy), GIF87a/89a (a direct LZW
  implementation — variable-width LSB-first codes — plus palettes and
  4-pass interlacing), and JPEG — baseline AND
  progressive/SOF2 (canonical-Huffman entropy decode incl. Annex-G
  successive approximation + dequant + exact float64 IDCT + chroma
  upsampling + BT.601 YCbCr->RGB, in ops/jpeg.py), emitting true
  width/height/channels/mean luminance plus a 64-bit average-hash (8x8
  block-mean grayscale thresholded at its mean — the classic aHash),
  which feeds perceptual image dedup exactly like SimHash feeds text
  dedup (pair on bit_count(xor) <= d).
- ``decode_audio`` — a REAL audio decoder (struct/numpy): RIFF/WAVE
  with PCM 8/16-bit, G.711 mu-law/A-law companding, IMA ADPCM mono
  (a genuinely compressed 4:1 codec — per-block predictor/step-index
  state machine), and native FLAC (lossless — fixed/LPC subframes,
  Rice partitions, all stereo modes, CRC-checked), emitting
  channels/rate/frames/duration and integer-exact amplitude stats.
  Perceptual codecs (MP3/OGG) stay behind the codec-library boundary,
  like lossy WebP/VP8.
- ``decode_video`` — a REAL video decoder + frame sampler (numpy):
  YUV4MPEG2 (.y4m) header + raw luma planes, emitting per-sampled-frame
  dimensions/fps/frame-count/mean-luma plus the same 64-bit aHash as
  images, so video frames feed ``image_neardup_pairs`` directly.
  Compressed video (H.264/VP9/AV1) is the same codec boundary.
- ``image_neardup_pairs`` — perceptual near-dup pairing on the aHash
  via the shared banded Hamming stage (ops/dedup.hamming_pairs).
- ``decode_image_meta`` — deterministic metadata-only pass for opaque
  payloads of ANY format (byte length, md5, hash-derived stand-in dims).
- ``decode_image_real`` — the integration point for the formats that
  genuinely need a codec library (lossy WebP/VP8, arithmetic-coded
  JPEG) — still NotImplementedError, with the same mapInPandas shape.
  PNG moved OUT of it in round 4 (zlib inflate + integer filters);
  baseline AND progressive JPEG moved out the same round (Huffman +
  Annex-G bit arithmetic + IDCT, ops/jpeg.py); lossless WebP/VP8L
  moved out too (prefix codes + LZ77 + color cache + the four
  transforms, ops/webp.py).

Scale notes: binary payloads dominate partition size — repartition by a
content-hash bucket before the UDF stage so Arrow batches stay bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows, not bytes;
for multi-MB blobs drop it per-stage).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = ("id bigint, n_bytes int, content_md5 string, "
               "fake_width int, fake_height int, modality string")


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Testdata adapter: treat utf-8 text bytes as an opaque payload so
    the binary pipeline is exercisable on the sandbox tables."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image").alias("modality"),
    )


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    Fake-decode semantics (deterministic): width/height are the first
    two bytes of the md5 digest (1..256) — stands in for a real header
    parse; n_bytes/md5 are real.
    """
    import hashlib

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            digests = [hashlib.md5(b).hexdigest() for b in pdf["payload"]]
            yield pd.DataFrame({
                "id": pdf["id"],
                "n_bytes": [len(b) for b in pdf["payload"]],
                "content_md5": digests,
                "fake_width": [int(d[0:2], 16) + 1 for d in digests],
                "fake_height": [int(d[2:4], 16) + 1 for d in digests],
                "modality": pdf["modality"],
            })

    return df.mapInPandas(batches, schema=META_SCHEMA)


DECODE_SCHEMA = ("id bigint, format string, width int, height int, "
                 "channels int, mean_luma double, ahash bigint")


def _parse_netpbm(b: bytes):
    """P2/P3 (ascii) / P5/P6 (binary) gray/RGB images -> (fmt, w, h,
    float64 HxWxC array). Raises ValueError on anything else."""
    import numpy as np

    if len(b) < 2 or b[0:1] != b"P" or b[1:2] not in b"2356":
        raise ValueError("not netpbm")
    fmt = b[:2].decode()
    # header tokens: magic, width, height, maxval — comments (#...) skipped
    tokens, i, n = [], 2, len(b)
    while len(tokens) < 3 and i < n:
        c = b[i:i + 1]
        if c == b"#":
            while i < n and b[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not b[j:j + 1].isspace():
                j += 1
            tokens.append(b[i:j])
            i = j
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    i += 1  # single whitespace after maxval
    ch = 3 if fmt in ("P3", "P6") else 1
    count = w * h * ch
    if fmt in ("P5", "P6"):
        if maxval > 255:
            raise ValueError("16-bit netpbm unsupported")
        px = np.frombuffer(b, dtype=np.uint8, count=count, offset=i)
    else:
        px = np.array(b[i:].split()[:count], dtype=np.int64)
    return fmt, w, h, px.reshape(h, w, ch).astype(np.float64)


def _parse_bmp(b: bytes):
    """Uncompressed 24-bit BI_RGB BMP -> ('BMP', w, h, HxWx3 float64)."""
    import struct

    import numpy as np

    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not bmp")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return "BMP", w, h, rows[:, :, ::-1].astype(np.float64)  # BGR -> RGB


# Adam7 pass origins/steps: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(lines, h, stride, bpp):
    """Filtered scanlines (h, stride+1 uint8; first byte = filter type)
    -> unfiltered bytes (h, stride int64). The five PNG filters; Sub is
    a per-channel cumulative sum, Up one vectorized add, Average/Paeth
    carry a true sequential left-dependency (byte-at-a-time)."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(lines[r, 0])
        line = lines[r, 1:].astype(np.int64)
        if ft == 0:                                   # None
            cur = line
        elif ft == 1:                                 # Sub
            cur = np.cumsum(line.reshape(stride // bpp, bpp), axis=0,
                            dtype=np.int64).reshape(stride) % 256
        elif ft == 2:                                 # Up
            cur = (line + prev) % 256
        elif ft in (3, 4):                            # Average / Paeth
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 3:
                    pred = (a + up) >> 1
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad filter type {ft}")
        out[r] = cur
        prev = cur
    return out


def _parse_png(b: bytes):
    """8- or 16-bit PNG (gray / RGB / gray+alpha / RGBA / palette),
    non-interlaced OR Adam7-interlaced ->
    ('PNG', w, h, HxWxC float64) via stdlib ``zlib`` + numpy.

    PNG is NOT behind the codec boundary the compressed formats sit
    behind: the pixel stream is DEFLATE (stdlib zlib) of per-scanline
    filtered bytes, and the five filters (None/Sub/Up/Average/Paeth)
    are plain integer arithmetic — so this is a REAL decoder, same
    contract as the NetPBM/BMP/WAV/Y4M parsers. Filter notes: Sub
    unfilters as a per-channel cumulative sum; Up is one vectorized row
    add; Average/Paeth carry a true sequential left-dependency, decoded
    byte-at-a-time (clarity-first reference implementation — the Arrow
    stage amortizes it per batch, and a columns-with-stride vectorization
    or a codec library drops in behind the same signature). Palette
    (type 3, 8-bit) resolves indices through PLTE to RGB after
    unfiltering. 16-bit channels combine big-endian byte pairs AFTER
    unfiltering (filters operate on bytes per spec, bpp = 2*channels);
    samples keep their native 0..65535 range (downstream luma/aHash are
    scale-invariant). Adam7 interlacing decodes the seven
    independently-filtered sub-images and scatters them back with
    strided assignment. Unsupported (raises ValueError -> null-degrade
    upstream): 1/2/4-bit depths, 16-bit palette, missing/invalid
    PLTE."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not png")
    pos, n = 8, len(b)
    ihdr, idat, plte = None, [], None
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", b, pos)
        if ctype == b"IHDR":
            ihdr = struct.unpack_from(">IIBBBBB", b, pos + 8)
        elif ctype == b"IDAT":
            idat.append(b[pos + 8: pos + 8 + length])
        elif ctype == b"PLTE":
            plte = b[pos + 8: pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("only 8/16-bit depth, interlace 0/1 supported")
    if color == 3 and depth != 8:
        raise ValueError("palette PNG must be 8-bit")
    # color type 3 (palette): 1 byte/pixel of PLTE indices; resolved to
    # RGB after unfiltering (filters operate on the INDEX bytes per spec)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported color type {color}")
    if color == 3 and (plte is None or len(plte) % 3 != 0 or not plte):
        raise ValueError("palette PNG missing/invalid PLTE")
    if not w or not h:
        raise ValueError("empty image")
    raw = zlib.decompress(b"".join(idat))
    sample_bytes = depth // 8
    bpp = channels * sample_bytes  # filters operate on BYTES (PNG spec)

    def read_pass(pos, pw, ph):
        stride = pw * bpp
        need = ph * (stride + 1)
        if len(raw) < pos + need:
            raise ValueError("truncated scanlines")
        lines = np.frombuffer(raw, dtype=np.uint8, count=need,
                              offset=pos).reshape(ph, stride + 1)
        return _png_unfilter(lines, ph, stride, bpp), pos + need

    def to_samples(bytes2d, pw, ph):
        if sample_bytes == 1:
            return bytes2d.reshape(ph, pw, channels)
        b2 = bytes2d.reshape(ph, pw, channels, 2)
        return (b2[..., 0] << 8) | b2[..., 1]  # 16-bit is big-endian

    if interlace == 0:
        block, _pos = read_pass(0, w, h)
        out = to_samples(block, w, h)
    else:
        # Adam7: seven independently-filtered sub-images scattered back
        # by (x_start, y_start, x_step, y_step); empty passes carry no
        # bytes. Strided numpy assignment is the whole deinterlace.
        out = np.zeros((h, w, channels), dtype=np.int64)
        pos = 0
        for (xs, ys, xstep, ystep) in _ADAM7:
            pw = (w - xs + xstep - 1) // xstep
            ph = (h - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            block, pos = read_pass(pos, pw, ph)
            out[ys::ystep, xs::xstep, :] = to_samples(block, pw, ph)
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idxs = out[:, :, 0]
        if int(idxs.max()) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        return "PNG", w, h, pal[idxs].astype(np.float64)
    return "PNG", w, h, out.astype(np.float64)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-flavor LZW: variable-width codes (min+1 .. 12 bits) packed
    LSB-FIRST, CLEAR resets the dictionary, EOI ends the stream. Pure
    bit arithmetic — the same no-library claim as DEFLATE-via-zlib,
    except LZW is small enough to implement directly."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader state (LSB-first within each byte)
    acc = nbits = pos = 0

    def read_code(width: int):
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    width = min_code_size + 1
    table: list[bytes] = []
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW code before clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError("LZW stream short of pixel count")
    return out[:n_pixels]


# GIF interlace passes: (row_start, row_step)
_GIF_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _parse_gif(b: bytes):
    """GIF87a/GIF89a -> ('GIF', w, h, HxWx3 float64): logical screen +
    color tables + LZW-compressed indices of the FIRST image frame
    (later frames of an animation are ignored — the decode contract
    emits one stats/hash row per payload), with 4-pass interlacing
    supported. Pure stdlib/numpy: LZW is implemented directly
    (_gif_lzw_decode). Raises ValueError on non-GIF/malformed input ->
    null-degrade upstream."""
    import struct

    import numpy as np

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not gif")
    if len(b) < 14:
        raise ValueError("truncated gif header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    global_table = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        global_table = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                                     offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("truncated image descriptor")
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            table = global_table
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                table = np.frombuffer(b, dtype=np.uint8, count=3 * n,
                                      offset=pos).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("no color table")
            if not w or not h:
                raise ValueError("empty image")
            min_code_size = b[pos]
            pos += 1
            if not 2 <= min_code_size <= 11:
                raise ValueError("bad LZW min code size")
            chunks = []
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunks.append(b[pos + 1: pos + 1 + ln])
                pos += 1 + ln
            idxs = np.array(
                _gif_lzw_decode(b"".join(chunks), min_code_size, w * h),
                dtype=np.int64)
            if int(idxs.max()) >= table.shape[0]:
                raise ValueError("color index out of range")
            rows = idxs.reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                out = np.empty_like(rows)
                src = 0
                for (start, step) in _GIF_PASSES:
                    n_rows = len(range(start, h, step))
                    out[start::step] = rows[src:src + n_rows]
                    src += n_rows
                rows = out
            return "GIF", w, h, table[rows].astype(np.float64)
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError("bad GIF block")
    raise ValueError("no image data")


def _parse_jpeg(b: bytes):
    """Baseline or progressive JPEG -> ('JPEG', w, h, HxWxC float64)
    via the stdlib + numpy codec in ops/jpeg.py (canonical Huffman incl.
    Annex-G successive approximation + dequant + exact IDCT + chroma
    upsampling + BT.601 YCbCr->RGB). Raises ValueError on non-JPEG or
    unsupported profiles (arithmetic/hierarchical/12-bit/CMYK) ->
    null-degrade upstream, same contract as the other parsers."""
    from lamapi_spark.ops.jpeg import parse_jpeg

    return parse_jpeg(b)


def _parse_webp(b: bytes):
    """Lossless WebP (VP8L) -> ('WEBP', w, h, HxWx4 float64 RGBA) via
    the stdlib + numpy codec in ops/webp.py (canonical prefix codes,
    LZ77 over pixels with the 2D distance map, color cache, meta
    prefix codes, and all four inverse transforms). Lossy 'VP8 '
    chunks raise ValueError -> null-degrade upstream."""
    from lamapi_spark.ops.webp import parse_webp

    return parse_webp(b)


def _ahash64(gray) -> int:
    """Average hash: block-mean the grayscale to 8x8, threshold at the
    mean, pack row-major into 64 bits (bit 63 = top-left)."""
    import numpy as np

    h, w = gray.shape
    ys = (np.arange(8 + 1) * h) // 8
    xs = (np.arange(8 + 1) * w) // 8
    cells = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            cells[r, c] = gray[ys[r]:max(ys[r + 1], ys[r] + 1),
                               xs[c]:max(xs[c + 1], xs[c] + 1)].mean()
    bits = (cells >= cells.mean()).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF Compression 32773): control byte n —
    0..127 copies n+1 literals, -127..-1 repeats the next byte 1-n
    times, -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n >= 0:
            out += data[i:i + n + 1]
            if len(data) - i < n + 1:
                raise ValueError("packbits literal overrun")
            i += n + 1
        elif n != -128:
            if i >= len(data):
                raise ValueError("packbits run overrun")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    return bytes(out)


def _parse_tiff(b: bytes):
    """Baseline TIFF 6.0 -> ('TIFF', w, h, HxWxC float64): both byte
    orders (II/MM), 8-bit samples, grayscale (PhotometricInterpretation
    0/1 — WhiteIsZero inverts so luminance semantics match) and RGB
    (photometric 2), strip-organized, Compression 1 (none) or 32773
    (PackBits). Tiles, LZW/JPEG-in-TIFF, and non-8-bit depths raise
    ValueError into decode_image's null-degrade path."""
    import struct

    import numpy as np

    if len(b) < 8 or b[:2] not in (b"II", b"MM"):
        raise ValueError("not tiff")
    bo = "<" if b[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(bo + "HI", b[2:8])
    if magic != 42:
        raise ValueError("not tiff")
    if ifd_off + 2 > len(b):
        raise ValueError("truncated ifd")
    n = struct.unpack(bo + "H", b[ifd_off:ifd_off + 2])[0]
    tags = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(b):
            raise ValueError("truncated ifd entry")
        tag, typ, cnt = struct.unpack(bo + "HHI", b[off:off + 8])
        tags[tag] = (typ, cnt, off + 8)
    fmts = {1: "B", 3: "H", 4: "I"}

    def vals(tag):
        typ, cnt, voff = tags[tag]
        if typ not in fmts:
            raise ValueError("unsupported tag type")
        sz = struct.calcsize(fmts[typ])
        total = sz * cnt
        if total <= 4:
            data = b[voff:voff + total]
        else:
            ptr = struct.unpack(bo + "I", b[voff:voff + 4])[0]
            data = b[ptr:ptr + total]
        if len(data) != total:
            raise ValueError("truncated tag data")
        return list(struct.unpack(bo + str(cnt) + fmts[typ], data))

    def val1(tag, default=None):
        if tag not in tags:
            if default is None:
                raise ValueError(f"missing tag {tag}")
            return default
        return vals(tag)[0]

    w, h = val1(256), val1(257)
    comp, photo, spp = val1(259, 1), val1(262), val1(277, 1)
    bps = vals(258) if 258 in tags else [8]
    if (any(x != 8 for x in bps) or spp not in (1, 3)
            or photo not in (0, 1, 2) or comp not in (1, 32773)
            or w <= 0 or h <= 0):
        raise ValueError("unsupported tiff variant")
    offs, cnts = vals(273), vals(279)
    if len(offs) != len(cnts):
        raise ValueError("strip offset/count mismatch")
    raw = bytearray()
    for o, c in zip(offs, cnts):
        chunk = b[o:o + c]
        if len(chunk) != c:
            raise ValueError("truncated strip")
        raw += _packbits_decode(chunk) if comp == 32773 else chunk
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("short pixel data")
    px = (np.frombuffer(bytes(raw[:need]), dtype=np.uint8)
          .reshape(h, w, spp).astype(np.float64))
    if photo == 0:  # WhiteIsZero
        px = 255.0 - px
    return "TIFF", w, h, px


def decode_image(df: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads (Arrow-batched, stdlib +
    numpy only): NetPBM (P2/P3/P5/P6), uncompressed 24-bit BMP, 8-bit
    non-interlaced PNG, GIF (direct LZW + palette + interlacing),
    baseline + progressive JPEG (gray + YCbCr 4:4:4/4:2:2/4:2:0,
    ops/jpeg.py), and lossless WebP/VP8L (prefix codes + LZ77 + color
    cache + all four transforms, ops/webp.py), and baseline TIFF (both
    byte orders, strips, none/PackBits compression, gray incl.
    WhiteIsZero + RGB). Emits true dimensions,
    channel count,
    mean luminance (ITU-R 601 for RGB/RGBA; alpha never contributes) and a
    64-bit average-hash. Unrecognized/corrupt payloads emit format
    'unknown' with null fields instead of failing the batch (P6-style
    null guard). Pair near-duplicate images downstream with
    bit_count(ahash_a ^ ahash_b) <= d — same banding machinery as
    ops/dedup.simhash_pairs."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k: [] for k in
                    ("id", "format", "width", "height", "channels",
                     "mean_luma", "ahash")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    for parser in (_parse_netpbm, _parse_bmp, _parse_png,
                                   _parse_gif, _parse_webp, _parse_tiff,
                                   _parse_jpeg):
                        try:
                            fmt, w, h, px = parser(b)
                            break
                        except ValueError:
                            if parser is _parse_jpeg:
                                raise
                    if px.shape[2] >= 3:
                        # RGB / RGBA: ITU-R 601 luma over the color
                        # channels (alpha never contributes)
                        gray = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                                + 0.114 * px[:, :, 2])
                    else:
                        # gray / gray+alpha: the luma IS channel 0
                        gray = px[:, :, 0]
                    # keep the hash in signed-64 range for Spark's bigint
                    ah = _ahash64(gray)
                    if ah >= 1 << 63:
                        ah -= 1 << 64
                    rows["id"].append(i); rows["format"].append(fmt)
                    rows["width"].append(w); rows["height"].append(h)
                    rows["channels"].append(px.shape[2])
                    rows["mean_luma"].append(float(np.round(gray.mean(), 3)))
                    rows["ahash"].append(ah)
                except Exception:
                    rows["id"].append(i); rows["format"].append("unknown")
                    rows["width"].append(None); rows["height"].append(None)
                    rows["channels"].append(None)
                    rows["mean_luma"].append(None); rows["ahash"].append(None)
            # nullable Int64, NOT object/float: a mixed batch (decoded +
            # unknown rows) would otherwise coerce the hash column to
            # float64 and silently round 64-bit hashes past the 53-bit
            # mantissa (observed: ...095 -> ...080)
            rows["ahash"] = pd.array(rows["ahash"], dtype="Int64")
            rows["width"] = pd.array(rows["width"], dtype="Int32")
            rows["height"] = pd.array(rows["height"], dtype="Int32")
            rows["channels"] = pd.array(rows["channels"], dtype="Int32")
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=DECODE_SCHEMA)


AUDIO_SCHEMA = ("id bigint, format string, channels int, sample_rate int, "
                "n_samples int, duration_s double, peak_abs int, mean_abs double")


def _ulaw_expand(u8):
    """G.711 mu-law bytes -> int16-range samples, vectorized numpy.
    Silence byte 0xFF decodes to 0; sign bit set (after the bitwise
    complement) means negative."""
    import numpy as np

    u = (~u8.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    t = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -t, t)


def _alaw_expand(a8):
    """G.711 A-law bytes -> int16-range samples, vectorized numpy.
    Even bits are inverted on the wire (xor 0x55); sign bit SET means
    positive (opposite of mu-law) — 0xD5 decodes to +8."""
    import numpy as np

    u = a8.astype(np.int64) ^ 0x55
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    t = np.where(exp == 0, (mant << 4) + 8,
                 ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, t, -t)


_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(state: list, nib: int) -> int:
    """One IMA state-machine step; mutates [pred, index], returns the
    new sample."""
    pred, index = state
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = min(max(pred, -32768), 32767)
    state[0] = pred
    state[1] = min(max(index + _IMA_INDEX[nib & 7], 0), 88)
    return pred


def _ima_adpcm_decode(data: bytes, block_align: int, channels: int = 1):
    """IMA/DVI ADPCM (WAV format 0x11, mono or stereo) -> int64
    interleaved sample array.

    Block layout: ONE 4-byte header PER CHANNEL (int16 predictor —
    emitted as that channel's first sample — uint8 step index,
    reserved), then 4-bit nibbles LOW-first; mono nibbles run
    sequentially, stereo data alternates 4-byte (8-nibble) groups per
    channel — the WAV interleaving rule. A real ~4:1 compressed audio
    codec decoded with no library — the audio analogue of the JPEG
    move."""
    import struct

    import numpy as np

    if channels not in (1, 2):
        raise ValueError("ADPCM channels must be 1 or 2")
    if block_align < 4 * channels + 1:
        raise ValueError("bad ADPCM block align")
    out = []
    for off in range(0, len(data) - (len(data) % block_align), block_align):
        states, chans = [], []
        for c in range(channels):
            pred, index = struct.unpack_from("<hB", data, off + 4 * c)
            states.append([pred, min(max(index, 0), 88)])
            chans.append([pred])
        body = data[off + 4 * channels: off + block_align]
        if channels == 1:
            for byte in body:
                for nib in (byte & 0x0F, byte >> 4):
                    chans[0].append(_ima_step(states[0], nib))
        else:
            # complete 4-byte-per-channel groups only (a truncated
            # trailing group has no partner-channel data)
            group = 4 * channels
            for g in range(0, len(body) - (len(body) % group), group):
                for c in range(channels):
                    for byte in body[g + 4 * c: g + 4 * c + 4]:
                        for nib in (byte & 0x0F, byte >> 4):
                            chans[c].append(_ima_step(states[c], nib))
        for frame in zip(*chans):
            out.extend(frame)
    if not out:
        raise ValueError("empty ADPCM stream")
    return np.array(out, dtype=np.int64)


def _parse_wav(b: bytes):
    """RIFF/WAVE -> (format_name, channels, rate, int64 samples[n, ch]).

    REAL decoders, no codec library (same contract as the image path):
    - PCM 8/16-bit (format 1)            -> 'WAV'
    - G.711 A-law companding (format 6)  -> 'WAV-ALAW'
    - G.711 mu-law companding (format 7) -> 'WAV-ULAW'
    - IMA/DVI ADPCM mono/stereo (0x11)   -> 'WAV-ADPCM' (a genuinely
      compressed ~4:1 codec: per-block predictor + step-index state
      machine over 4-bit nibbles)
    Raises ValueError on anything else. Native FLAC is handled by
    :func:`_parse_flac` (dispatched on magic in decode_audio); only
    perceptual codecs (MP3/OGG) stay behind the codec-library
    boundary."""
    import struct

    import numpy as np

    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not wav")
    pos, n = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _brate, balign, bits = fmt
    if audio_fmt == 1 and bits in (8, 16):
        name = "WAV"
        if bits == 16:
            samples = np.frombuffer(data, dtype="<i2",
                                    count=len(data) // 2).astype(np.int64)
        else:
            samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif audio_fmt == 7 and bits == 8:
        name = "WAV-ULAW"
        samples = _ulaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif audio_fmt == 6 and bits == 8:
        name = "WAV-ALAW"
        samples = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    elif audio_fmt == 0x11 and bits == 4 and channels in (1, 2):
        name = "WAV-ADPCM"
        samples = _ima_adpcm_decode(data, balign, channels)
    else:
        raise ValueError("unsupported WAV format "
                         f"{audio_fmt}/{bits}-bit/{channels}ch")
    frames = len(samples) // channels
    return (name, channels, rate,
            samples[: frames * channels].reshape(frames, channels))


class _FlacBits:
    """MSB-first bit reader over bytes (FLAC is big-endian bit-packed,
    unlike the LSB-first GIF LZW reader)."""

    __slots__ = ("d", "pos")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v, pos, d = 0, self.pos, self.d
        if pos + n > len(d) * 8:
            raise ValueError("flac: truncated bitstream")
        while n:
            byte = d[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (FLAC whole-frame CRC)."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# frame-header lookup tables (FLAC format spec §9.1)
_FLAC_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_FLAC_SSIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_utf8(r: _FlacBits) -> int:
    """FLAC's UTF-8-style extended coded number (frame/sample index)."""
    v = r.bits(8)
    if v < 0x80:
        return v
    n_cont = 0
    mask = 0x40
    while v & mask:
        n_cont += 1
        mask >>= 1
    if n_cont < 1 or n_cont > 6:
        raise ValueError("flac: bad utf8 coded number")
    val = v & (mask - 1)
    for _ in range(n_cont):
        c = r.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad utf8 continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _flac_residual(r: _FlacBits, bsize: int, order: int) -> list[int]:
    """Rice-coded residual section: 2-bit method (4- or 5-bit params),
    4-bit partition order, per-partition Rice parameter with the
    all-ones escape to fixed-width raw samples."""
    method = r.bits(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.bits(4)
    n_part = 1 << porder
    if bsize % n_part:
        raise ValueError("flac: block size not divisible by partitions")
    psize = bsize >> porder
    res: list[int] = []
    for p in range(n_part):
        cnt = psize - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than predictor order")
        param = r.bits(pbits)
        if param == escape:
            raw = r.bits(5)
            if raw == 0:
                res.extend([0] * cnt)
            else:
                res.extend(r.sbits(raw) for _ in range(cnt))
        else:
            for _ in range(cnt):
                u = (r.unary() << param) | (r.bits(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))  # zigzag unfold
    return res


_FLAC_FIXED = {
    0: lambda s, i: 0,
    1: lambda s, i: s[i - 1],
    2: lambda s, i: 2 * s[i - 1] - s[i - 2],
    3: lambda s, i: 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3],
    4: lambda s, i: 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4],
}


def _flac_subframe(r: _FlacBits, bsize: int, bps: int) -> list[int]:
    if r.bits(1):
        raise ValueError("flac: subframe padding bit set")
    t = r.bits(6)
    wasted = 0
    if r.bits(1):
        wasted = r.unary() + 1
    eb = bps - wasted
    if eb <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if t == 0:
        s = [r.sbits(eb)] * bsize
    elif t == 1:
        s = [r.sbits(eb) for _ in range(bsize)]
    elif 8 <= t <= 12:
        order = t & 7
        if order > bsize:
            raise ValueError("flac: order exceeds block size")
        s = [r.sbits(eb) for _ in range(order)]
        res = _flac_residual(r, bsize, order)
        pred = _FLAC_FIXED[order]
        for i in range(order, bsize):
            s.append(res[i - order] + pred(s, i))
    elif t >= 32:
        order = (t & 31) + 1
        if order > bsize:
            raise ValueError("flac: order exceeds block size")
        s = [r.sbits(eb) for _ in range(order)]
        prec = r.bits(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = r.sbits(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [r.sbits(prec) for _ in range(order)]
        res = _flac_residual(r, bsize, order)
        for i in range(order, bsize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * s[i - 1 - j]
            s.append(res[i - order] + (acc >> shift))  # arithmetic shift
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        s = [v << wasted for v in s]
    return s


def _parse_flac(b: bytes):
    """Native FLAC -> ('FLAC', channels, rate, int64 samples[n, ch]).

    A REAL decoder in the PNG/JPEG mold (stdlib + numpy, no codec
    library): STREAMINFO metadata, frame sync + CRC-8-checked headers,
    UTF-8-coded frame numbers, constant / verbatim / fixed-predictor /
    LPC subframes, Rice-partitioned residuals (4- and 5-bit parameters,
    raw-bits escape), wasted-bits shift, all four stereo decorrelation
    modes (independent, left-side, right-side, mid-side), CRC-16-checked
    frame footers. FLAC is LOSSLESS, so decoded PCM equals the encoder
    input bit-for-bit — the equivalence oracle the contract query and
    tests/test_flac.py exploit. Reference analogue: none (the reference
    is text-only); this extends the builder's-brief multimodal surface,
    leaving only perceptual codecs (MP3/OGG) behind the library
    boundary."""
    import numpy as np

    if len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not flac")
    pos, n = 4, len(b)
    info = None
    while True:
        if pos + 4 > n:
            raise ValueError("flac: truncated metadata")
        last, btype = b[pos] >> 7, b[pos] & 0x7F
        length = int.from_bytes(b[pos + 1:pos + 4], "big")
        if pos + 4 + length > n:
            raise ValueError("flac: truncated metadata block")
        if btype == 0:
            body = b[pos + 4:pos + 4 + length]
            if length < 34:
                raise ValueError("flac: short STREAMINFO")
            raw = int.from_bytes(body[10:18], "big")
            info = {
                "rate": raw >> 44,
                "channels": ((raw >> 41) & 0x7) + 1,
                "bps": ((raw >> 36) & 0x1F) + 1,
                "total": raw & ((1 << 36) - 1),
            }
        pos += 4 + length
        if last:
            break
    if info is None or info["rate"] == 0:
        raise ValueError("flac: missing STREAMINFO")
    channels, bps = info["channels"], info["bps"]
    chans: list[list[int]] = [[] for _ in range(channels)]
    decoded = 0
    while decoded < info["total"]:
        frame_start = pos
        r = _FlacBits(b)
        r.pos = pos * 8
        if r.bits(14) != 0x3FFE:
            raise ValueError("flac: lost frame sync")
        r.bits(1)  # reserved
        r.bits(1)  # blocking strategy
        bs_code, sr_code = r.bits(4), r.bits(4)
        ch_code, ss_code = r.bits(4), r.bits(3)
        r.bits(1)  # reserved
        _flac_utf8(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 1:
            bsize = 192
        elif bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsize = r.bits(8) + 1
        elif bs_code == 7:
            bsize = r.bits(16) + 1
        else:
            bsize = 256 << (bs_code - 8)
        if sr_code == 12:
            r.bits(8)
        elif sr_code in (13, 14):
            r.bits(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        fbps = _FLAC_SSIZE.get(ss_code, bps) if ss_code else bps
        header_end = r.pos >> 3  # header is byte-aligned here
        crc8 = r.bits(8)
        if _crc8(b[frame_start:header_end]) != crc8:
            raise ValueError("flac: frame header CRC mismatch")
        if ch_code < 8:
            n_sub = ch_code + 1
            if n_sub != channels:
                raise ValueError("flac: channel count mismatch")
            subs = [_flac_subframe(r, bsize, fbps) for _ in range(n_sub)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("flac: stereo mode in non-stereo stream")
            left_extra = 1 if ch_code == 9 else 0
            right_extra = 1 if ch_code in (8, 10) else 0
            c0 = _flac_subframe(r, bsize, fbps + left_extra)
            c1 = _flac_subframe(r, bsize, fbps + right_extra)
            if ch_code == 8:      # left-side: c1 = L - R
                subs = [c0, [l - s for l, s in zip(c0, c1)]]
            elif ch_code == 9:    # right-side: c0 = L - R
                subs = [[rr + s for s, rr in zip(c0, c1)], c1]
            else:                 # mid-side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                subs = [left, right]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        payload_end = r.pos >> 3
        crc16 = r.bits(16)
        if _crc16(b[frame_start:payload_end]) != crc16:
            raise ValueError("flac: frame CRC mismatch")
        take = min(bsize, info["total"] - decoded)
        for c in range(channels):
            chans[c].extend(subs[c][:take])
        decoded += take
        pos = r.pos >> 3
    out = np.empty((decoded, channels), dtype=np.int64)
    for c in range(channels):
        out[:, c] = chans[c]
    return ("FLAC", channels, info["rate"], out)


class _FlacWBits:
    """MSB-first bit writer (the encoder-side twin of _FlacBits)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def w(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            self.nb -= 8
            self.out.append((self.acc >> self.nb) & 0xFF)
        self.acc &= (1 << self.nb) - 1

    def sw(self, v: int, n: int) -> None:
        self.w(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self.nb:
            self.w(0, 8 - self.nb)

    def data(self) -> bytes:
        return bytes(self.out)


def _flac_utf8_enc(w: _FlacWBits, val: int) -> None:
    if val < 0x80:
        w.w(val, 8)
        return
    nbytes = 2
    while val >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    lead = (0xFF ^ ((1 << (8 - nbytes)) - 1)) | (val >> (6 * (nbytes - 1)))
    w.w(lead, 8)
    for k in range(nbytes - 2, -1, -1):
        w.w(0x80 | ((val >> (6 * k)) & 0x3F), 8)


def _flac_enc_residual(w: _FlacWBits, res: list[int], bsize: int, order: int,
                       porder: int, escape_part) -> None:
    if bsize % (1 << porder):
        porder = 0
    # spec (RFC 9639): block size >> partition order MUST be LARGER
    # than the predictor order (a zero-residual first partition is
    # forbidden — libFLAC clamps with <=), so shrink porder until the
    # first partition holds >= 1 residual — bites on short TAIL frames
    # (e.g. 4 samples, porder 2, order 2; hypothesis-found,
    # tests/test_property.py). Halving preserves divisibility.
    while porder > 0 and (bsize >> porder) <= order:
        porder -= 1
    w.w(0, 2)       # method 0: 4-bit Rice parameters
    w.w(porder, 4)
    psize = bsize >> porder
    idx = 0
    for p in range(1 << porder):
        cnt = psize - (order if p == 0 else 0)
        part = res[idx:idx + cnt]
        idx += cnt
        if escape_part is not None and p == escape_part:
            raw = max([1] + [(v if v >= 0 else ~v).bit_length() + 1 for v in part])
            w.w(15, 4)
            w.w(raw, 5)
            for v in part:
                w.sw(v, raw)
            continue
        us = [(v << 1) if v >= 0 else ((-v) << 1) - 1 for v in part]
        best_p = min(range(15),
                     key=lambda pp: sum((u >> pp) + 1 + pp for u in us))
        w.w(best_p, 4)
        for u in us:
            w.w(1, (u >> best_p) + 1)        # unary quotient: q zeros + 1
            w.w(u & ((1 << best_p) - 1), best_p)


def _flac_enc_subframe(w: _FlacWBits, s: list[int], bps: int, kind: str,
                       porder: int, escape_part) -> None:
    bsize = len(s)
    if kind == "constant" and len(set(s)) != 1:
        kind = "verbatim"
    if kind.startswith("fixed") and int(kind[5:]) >= bsize:
        kind = "verbatim"
    if kind == "lpc" and bsize <= 2:
        kind = "verbatim"
    w.w(0, 1)  # padding
    if kind == "constant":
        w.w(0, 6)
        w.w(0, 1)
        w.sw(s[0], bps)
    elif kind == "verbatim":
        w.w(1, 6)
        w.w(0, 1)
        for v in s:
            w.sw(v, bps)
    elif kind.startswith("fixed"):
        order = int(kind[5:])
        w.w(8 | order, 6)
        w.w(0, 1)
        for v in s[:order]:
            w.sw(v, bps)
        res = [s[i] - _FLAC_FIXED[order](s, i) for i in range(order, bsize)]
        _flac_enc_residual(w, res, bsize, order, porder, escape_part)
    elif kind == "lpc":
        order, prec, shift, coefs = 2, 5, 1, [2, -1]
        w.w(32 | (order - 1), 6)
        w.w(0, 1)
        for v in s[:order]:
            w.sw(v, bps)
        w.w(prec - 1, 4)
        w.sw(shift, 5)
        for c in coefs:
            w.sw(c, prec)
        res = [s[i] - ((coefs[0] * s[i - 1] + coefs[1] * s[i - 2]) >> shift)
               for i in range(order, bsize)]
        _flac_enc_residual(w, res, bsize, order, porder, escape_part)
    else:
        raise ValueError(f"unknown subframe kind {kind}")


def encode_flac(samples, rate: int = 8000, bps: int = 16, block: int = 256,
                mode: str = "indep", subframe: str = "fixed2",
                porder: int = 0, escape_part=None) -> bytes:
    """Test-side FLAC encoder (the equivalence-oracle pattern the JPEG
    codec uses: encode_jpeg in ops/jpeg.py): emits spec-conformant
    streams — STREAMINFO, CRC-8 frame headers, UTF-8 frame numbers,
    constant/verbatim/fixed/LPC subframes, Rice partitions with
    optional raw-bits escape, all four stereo modes, CRC-16 footers —
    and since FLAC is lossless, _parse_flac MUST reproduce the input
    PCM bit-for-bit. ``mode``: indep | left-side | right-side |
    mid-side (stereo only); ``subframe``: constant | verbatim |
    fixed0..fixed4 | lpc; ``escape_part`` forces that partition index
    onto the raw-bits escape path."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    total, ch = arr.shape
    if mode != "indep" and ch != 2:
        raise ValueError("stereo modes need 2 channels")
    w = _FlacWBits()
    w.out += b"fLaC"
    w.w(1, 1)        # last metadata block
    w.w(0, 7)        # STREAMINFO
    w.w(34, 24)
    w.w(min(block, total) if total else block, 16)   # min blocksize
    w.w(block, 16)                                   # max blocksize
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(ch - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    w.out += b"\x00" * 16                            # md5 unset
    frame_no = 0
    for start in range(0, total, block):
        blk = arr[start:start + block]
        bsize = blk.shape[0]
        fw = _FlacWBits()
        fw.w(0x3FFE, 14)
        fw.w(0, 1)
        fw.w(0, 1)       # fixed-blocksize strategy
        fw.w(7, 4)       # blocksize: 16-bit at end of header
        fw.w(0, 4)       # sample rate: from STREAMINFO
        ch_code = {"indep": ch - 1, "left-side": 8,
                   "right-side": 9, "mid-side": 10}[mode]
        fw.w(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        fw.w(ss_code, 3)
        fw.w(0, 1)
        _flac_utf8_enc(fw, frame_no)
        fw.w(bsize - 1, 16)
        fw.w(_crc8(fw.data()), 8)
        if mode == "indep":
            subs = [(list(blk[:, c]), bps) for c in range(ch)]
        else:
            left, right = list(blk[:, 0]), list(blk[:, 1])
            side = [l - r for l, r in zip(left, right)]
            if mode == "left-side":
                subs = [(left, bps), (side, bps + 1)]
            elif mode == "right-side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        for s, sbps in subs:
            _flac_enc_subframe(fw, [int(v) for v in s], sbps, subframe,
                               porder, escape_part)
        fw.align()
        fw.w(_crc16(fw.data()), 16)
        w.out += fw.data()
        frame_no += 1
    return w.data()


def _parse_aiff(b: bytes):
    """AIFF (big-endian PCM) -> ('AIFF', channels, rate, frames x ch
    int64): FORM/AIFF container, COMM (channels, frame count, 8/16-bit
    sample size, sample rate as an 80-bit IEEE 754 extended float —
    parsed exactly: mantissa * 2^(exp-16383-63)) + SSND with its
    offset field honored. AIFF 8-bit audio is SIGNED, unlike WAVE's
    unsigned 8-bit — the one cross-container trap, pinned by test.
    Compressed AIFF-C raises into the null-degrade path."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("not aiff")
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack(">I", b[pos + 4:pos + 8])[0]
        data = b[pos + 8:pos + 8 + sz]
        if len(data) != sz:
            raise ValueError("truncated chunk")
        if cid == b"COMM":
            comm = data
        elif cid == b"SSND":
            ssnd = data
        pos += 8 + sz + (sz & 1)
    if comm is None or len(comm) < 18 or ssnd is None or len(ssnd) < 8:
        raise ValueError("missing COMM/SSND")
    ch, nframes, ssize = struct.unpack(">HIH", comm[:8])
    se = struct.unpack(">H", comm[8:10])[0]
    mant = struct.unpack(">Q", comm[10:18])[0]
    if mant == 0:
        raise ValueError("zero sample rate")
    rate = mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)
    if se & 0x8000:
        rate = -rate
    rate = int(round(rate))
    if rate <= 0 or ch < 1 or ssize not in (8, 16):
        raise ValueError("unsupported aiff")
    off = struct.unpack(">I", ssnd[:4])[0]
    pcm = ssnd[8 + off:]
    if ssize == 16:
        n = len(pcm) // 2 // ch
        samples = (np.frombuffer(pcm[:n * 2 * ch], dtype=">i2")
                   .astype(np.int64).reshape(n, ch))
    else:
        n = len(pcm) // ch
        samples = (np.frombuffer(pcm[:n * ch], dtype=np.int8)
                   .astype(np.int64).reshape(n, ch))
    if n < nframes:
        raise ValueError("SSND shorter than COMM frame count")
    return "AIFF", ch, rate, samples[:nframes]


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads (Arrow-batched, numpy
    only): RIFF/WAVE with PCM 8/16-bit, G.711 mu-law/A-law companding,
    or IMA ADPCM mono (a genuinely compressed 4:1 codec — see
    _parse_wav). Emits the format name, channel count, sample rate,
    frame count, duration, and integer-exact amplitude stats (peak and
    mean absolute sample value — sums of int64s, so engine-portable
    with no float accumulation order issues). Unrecognized/corrupt
    payloads emit format 'unknown' with null fields (same null-degrade
    contract as decode_image). AIFF (big-endian PCM, 80-bit\n    extended sample rate, signed 8-bit) too. Native FLAC (lossless: constant /
    verbatim / fixed / LPC subframes, Rice partitions, all stereo
    modes, CRC-checked) decodes for real too — see _parse_flac; only
    perceptual codecs (MP3/OGG) stay behind the codec-library
    boundary, like WebP in decode_image_real."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k: [] for k in ("id", "format", "channels", "sample_rate",
                                    "n_samples", "duration_s", "peak_abs",
                                    "mean_abs")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    pb = bytes(payload)
                    if pb[:4] == b"fLaC":
                        name, ch, rate, samples = _parse_flac(pb)
                    elif pb[:4] == b"FORM":
                        name, ch, rate, samples = _parse_aiff(pb)
                    else:
                        name, ch, rate, samples = _parse_wav(pb)
                    frames = samples.shape[0]
                    absv = np.abs(samples)
                    rows["id"].append(i); rows["format"].append(name)
                    rows["channels"].append(ch)
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(frames)
                    rows["duration_s"].append(frames / rate)
                    rows["peak_abs"].append(int(absv.max()) if frames else None)
                    # integer sum / count — exact, no float order issues
                    rows["mean_abs"].append(
                        float(int(absv.sum()) / absv.size) if frames else None)
                except Exception:
                    rows["id"].append(i); rows["format"].append("unknown")
                    for k in ("channels", "sample_rate", "n_samples",
                              "duration_s", "peak_abs", "mean_abs"):
                        rows[k].append(None)
            rows["channels"] = pd.array(rows["channels"], dtype="Int32")
            rows["sample_rate"] = pd.array(rows["sample_rate"], dtype="Int32")
            rows["n_samples"] = pd.array(rows["n_samples"], dtype="Int32")
            rows["peak_abs"] = pd.array(rows["peak_abs"], dtype="Int32")
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=AUDIO_SCHEMA)


def image_neardup_pairs(
    decoded: DataFrame, max_hamming: int = 3, n_bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Perceptual image near-duplicate pairs (id_a < id_b) by aHash
    Hamming distance <= ``max_hamming`` — the image twin of text SimHash
    dedup, sharing the banded-prefix pairing stage
    (ops/dedup.hamming_pairs, lossless for d <= n_bands - 1). Input is
    ``decode_image`` output; undecodable rows (format 'unknown', null
    ahash) are excluded from pairing."""
    from lamapi_spark.ops.dedup import hamming_pairs

    sig = (decoded.filter(F.col("ahash").isNotNull())
           .select("id", F.col("ahash").alias("sim")))
    return hamming_pairs(sig, bits=64, max_hamming=max_hamming,
                         n_bands=n_bands, max_bucket=max_bucket)


AUDIO_FP_SCHEMA = "id bigint, format string, n_samples int, afp bigint"


def audio_fingerprint(df: DataFrame, n_windows: int = 65) -> DataFrame:
    """Acoustic fingerprint over binary audio payloads (Arrow-batched,
    numpy only) — the audio member of the near-dup family (text SimHash,
    image/video aHash). Decodes like :func:`decode_audio` (WAV PCM /
    G.711 / ADPCM + native FLAC), takes channel 0, splits the frames
    into ``n_windows`` contiguous windows, and computes each window's
    ENERGY as the integer sum of |sample| (exact — no float accumulation
    order). Bit b is 1 iff E[b] > E[b+1] — the sign-of-energy-delta
    shape of the classic Haitsma/Kalker energy-difference fingerprint,
    time axis only — packed MSB-first into a signed 64-bit int exactly
    like aHash (n_windows=65 -> 64 comparisons). Amplitude scaling and
    lossless re-encodes (e.g. WAV -> FLAC) preserve every comparison,
    so they collide exactly; near-identical clips land within a small
    Hamming distance and pair via the shared banded stage.

    Undecodable payloads emit format 'unknown'; decodable clips shorter
    than ``n_windows`` frames keep their format but a null afp (no
    non-empty-window guarantee) — same null-degrade contract as
    decode_image.
    """
    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k: [] for k in ("id", "format", "n_samples", "afp")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    pb = bytes(payload)
                    if pb[:4] == b"fLaC":
                        name, _ch, _rate, samples = _parse_flac(pb)
                    elif pb[:4] == b"FORM":
                        name, _ch, _rate, samples = _parse_aiff(pb)
                    else:
                        name, _ch, _rate, samples = _parse_wav(pb)
                    n = samples.shape[0]
                    rows["id"].append(i); rows["format"].append(name)
                    rows["n_samples"].append(n)
                    if n < n_windows:
                        rows["afp"].append(None)
                        continue
                    a = np.abs(samples[:, 0].astype(np.int64))
                    ys = (np.arange(n_windows + 1) * n) // n_windows
                    e = np.add.reduceat(a, ys[:-1])
                    fp = 0
                    for b in range(n_windows - 1):
                        fp = (fp << 1) | int(e[b] > e[b + 1])
                    if fp >= 1 << 63:
                        fp -= 1 << 64
                    rows["afp"].append(fp)
                except Exception:
                    rows["id"].append(i); rows["format"].append("unknown")
                    rows["n_samples"].append(None); rows["afp"].append(None)
            rows["n_samples"] = pd.array(rows["n_samples"], dtype="Int32")
            # Int64, not object/float: a mixed batch would round 64-bit
            # fingerprints past the float53 mantissa (same guard as ahash)
            rows["afp"] = pd.array(rows["afp"], dtype="Int64")
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


def audio_neardup_pairs(
    fingerprinted: DataFrame, max_hamming: int = 3, n_bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Acoustic near-duplicate pairs (id_a < id_b) by fingerprint
    Hamming distance <= ``max_hamming`` — the audio twin of image
    near-dup, sharing the banded-prefix pairing stage
    (ops/dedup.hamming_pairs, lossless for d <= n_bands - 1). Input is
    ``audio_fingerprint`` output; undecodable/short rows (null afp) are
    excluded from pairing."""
    from lamapi_spark.ops.dedup import hamming_pairs

    sig = (fingerprinted.filter(F.col("afp").isNotNull())
           .select("id", F.col("afp").alias("sim")))
    return hamming_pairs(sig, bits=64, max_hamming=max_hamming,
                         n_bands=n_bands, max_bucket=max_bucket)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Integration point for the formats that genuinely need a codec
    library (lossy WebP/VP8 — intra prediction + boolean arithmetic
    coder; arithmetic-coded JPEG): same mapInPandas shape as
    ``decode_image``. Everything whose pixel stream is reachable with
    stdlib + numpy decodes FOR REAL via ``decode_image``: NetPBM,
    24-bit BMP, 8-bit PNG (zlib inflate + the five scanline filters),
    GIF (direct LZW), baseline + progressive JPEG (canonical Huffman +
    Annex-G + IDCT, ops/jpeg.py), and lossless WebP/VP8L (prefix codes
    + LZ77 + color cache + all four transforms, ops/webp.py)."""
    raise NotImplementedError(
        "lossy WebP (VP8) and arithmetic-coded JPEG require a codec "
        "library not present in this environment; decode_image handles "
        "NetPBM/BMP/PNG/GIF/JPEG/lossless-WebP for real, and a "
        "PIL-based batch fn drops into this mapInPandas shape")


VIDEO_SCHEMA = ("id bigint, format string, width int, height int, "
                "fps double, n_frames int, frame_idx int, mean_y double, "
                "ahash bigint")

_Y4M_CHROMA_DIV = {
    # colorspace tag prefix -> (x_div, y_div) for the U/V planes
    "420": (2, 2), "422": (2, 1), "444": (1, 1),
}


def _parse_y4m(b: bytes):
    """YUV4MPEG2 (.y4m) uncompressed video -> (w, h, fps, [Y planes]).

    Y4M is raw planar YUV with a plain-text header — the video analogue
    of NetPBM/WAV: no codec library needed, so this is a REAL decoder.
    Stream header: ``YUV4MPEG2 W<w> H<h> F<num>:<den> [C<cs>] ...\\n``;
    each frame: ``FRAME[ params]\\n`` + Y plane (w*h bytes) + U + V
    planes (subsampled per colorspace; absent for Cmono). Only the luma
    plane is decoded into arrays — chroma is skipped by offset, which
    is all the downstream stats/hash need. Raises ValueError on
    anything else (compressed video — H.264/VP9/AV1 — is the same
    codec-library boundary as JPEG/WebP/MP3)."""
    import numpy as np

    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not y4m")
    nl = b.index(b"\n")
    w = h = None
    num, den = 30, 1
    chroma = "420"
    for tok in b[9:nl].split():
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(":"))
        elif tag == b"C":
            chroma = val
    if not w or not h or den <= 0:
        raise ValueError("bad y4m header")
    if chroma.startswith("mono"):
        chroma_bytes = 0
    else:
        div = next((d for p, d in _Y4M_CHROMA_DIV.items()
                    if chroma.startswith(p)), None)
        if div is None:
            raise ValueError(f"unsupported colorspace {chroma}")
        chroma_bytes = 2 * ((w + div[0] - 1) // div[0]) * ((h + div[1] - 1) // div[1])
    y_bytes = w * h
    planes, pos, n = [], nl + 1, len(b)
    while pos < n:
        if b[pos:pos + 5] != b"FRAME":
            raise ValueError("bad frame marker")
        fnl = b.index(b"\n", pos)
        pos = fnl + 1
        if pos + y_bytes + chroma_bytes > n:
            raise ValueError("truncated frame")
        planes.append(np.frombuffer(b, dtype=np.uint8, count=y_bytes,
                                    offset=pos).reshape(h, w))
        pos += y_bytes + chroma_bytes
    if not planes:
        raise ValueError("no frames")
    return w, h, num / den, planes


def decode_video(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video decode + frame sampling over binary payloads
    (Arrow-batched, numpy only): YUV4MPEG2 header + raw luma planes.
    Emits one row per SAMPLED frame (``frame_idx % every_n == 0``) with
    true dimensions, fps, total frame count, the frame's integer-exact
    mean luma (int sum / (w*h)) and its 64-bit aHash — so video frames
    feed the same perceptual near-dup pairing as still images
    (``image_neardup_pairs`` over any (id, ahash) frame set).
    Unrecognized/corrupt payloads emit one format-'unknown' null row
    (same null-degrade contract as decode_image/decode_audio).

    Replaces the round-2 ``frame_sample_stub`` (fake frame counts from
    payload length) with actual frame extraction; reference analogue:
    none (the reference is text-only) — this is part of the
    training-data-pipeline surface."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = {k: [] for k in ("id", "format", "width", "height", "fps",
                                    "n_frames", "frame_idx", "mean_y",
                                    "ahash")}
            for i, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, fps, planes = _parse_y4m(bytes(payload))
                    for fi in range(0, len(planes), max(every_n, 1)):
                        y = planes[fi]
                        ah = _ahash64(y.astype("float64"))
                        if ah >= 1 << 63:
                            ah -= 1 << 64
                        rows["id"].append(i); rows["format"].append("Y4M")
                        rows["width"].append(w); rows["height"].append(h)
                        rows["fps"].append(fps)
                        rows["n_frames"].append(len(planes))
                        rows["frame_idx"].append(fi)
                        # integer sum / pixel count — exact, portable
                        rows["mean_y"].append(float(int(y.sum(dtype="int64"))
                                                    / (w * h)))
                        rows["ahash"].append(ah)
                except Exception:
                    rows["id"].append(i); rows["format"].append("unknown")
                    for k in ("width", "height", "fps", "n_frames",
                              "frame_idx", "mean_y", "ahash"):
                        rows[k].append(None)
            for k in ("width", "height", "n_frames", "frame_idx"):
                rows[k] = pd.array(rows[k], dtype="Int32")
            rows["ahash"] = pd.array(rows["ahash"], dtype="Int64")
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=VIDEO_SCHEMA)
