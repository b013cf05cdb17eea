"""Multimodal column handling (SURVEY.md §2.10 L5): opaque binary
payloads + typed metadata structs, processed with Arrow-batched
`mapInPandas`.

Decode status: every format whose byte stream stdlib+numpy can
honestly own decodes FOR REAL — complete netpbm (P1-P6), 24/32-bit
BMP, COMPLETE PNG (zlib IS stdlib; all five color types, all five
scanline filters, bit depths 1-16, palette+tRNS, Adam7
interlacing, CRC-verified), GIF (pure-Python LZW, first frame,
interlace+transparency), baseline TIFF (both byte orders,
strips, PackBits/LZW+predictor/Deflate, palette, bilevel scans),
QOI (full 1.0 op set), TGA 2.0 (footer-signed; uncompressed + RLE),
and farbfeld via `decode_image`; WAV (integer PCM, IEEE-float,
G.711 μ-law/A-law, EXTENSIBLE), AIFF/AIFF-C, Sun AU, and Apple CAF
LPCM via `decode_audio`;
uncompressed Y4M video (all standard chroma modes, per-frame luma)
via `decode_video` — each with a distributed decode→featurize path
(`image_stats` / `audio_stats` / `video_stats`, one shared
Arrow-batched mapInPandas wrapper) pytest-verified against
independently serialized payloads. What's left genuinely needs a
transform codec this container lacks (JPEG/WebP/MP3/AAC/H.264 —
DCT/MDCT pipelines, not just bit-stream work): images dispatch to
PIL when importable; otherwise a clearly-marked
NotImplementedError. Everything Spark-side — schema, binary
columns, metadata structs, batch iteration, output schema — is
real and oracle-checked regardless.

100 TB posture: binary payloads ride in their own column so column
pruning drops them unless the UDF needs them; `mapInPandas` streams
Arrow batches (bounded memory regardless of per-file blob sizes);
partition count should target ~128 MB of blobs per task.
"""

from __future__ import annotations

import functools

import hashlib
import re
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import (
    load_table,
    memo_constant_column,
    parallelize_small_scan,
)
from flink_hiveorc_spark.functions.flac import decode_flac
from flink_hiveorc_spark.functions.jpeg import decode_jpeg
from flink_hiveorc_spark.functions.probe import probe_media, riff_chunks
from flink_hiveorc_spark.registry import query

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _parse_pnm_header(data: bytes, n_fields: int = 3) -> tuple[list[int], int]:
    """Parse the netpbm header: `n_fields` ASCII integers (width,
    height[, maxval]) separated by whitespace, '#' comments allowed.
    Returns ([w, h(, maxval)], offset_of_first_pixel_byte)."""
    pos, vals = 2, []
    while len(vals) < n_fields:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return vals, pos + 1  # exactly ONE whitespace byte after the last field


def _decode_pnm(data: bytes):
    """Complete netpbm: binary P4 (packed bilevel) / P5 (gray) /
    P6 (RGB) and ASCII P1/P2/P3 twins. Bilevel follows the PBM spec's
    ink convention (1 = black) and widens to 0/255 grayscale so
    mean_byte stays comparable across formats."""
    import numpy as np

    kind = data[:2]
    if kind in (b"P1", b"P4"):  # bilevel: no maxval field
        (w, h), off = _parse_pnm_header(data, n_fields=2)
        if w < 1 or h < 1:
            raise ValueError(f"bad PBM dimensions {w}x{h}")
        if kind == b"P4":  # packed MSB-first, rows padded to byte edges
            stride = (w + 7) // 8
            raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
            bits = np.unpackbits(raw.reshape(h, stride), axis=1)[:, :w]
        else:  # ASCII: digits MAY pack without whitespace ("0110\n")
            digits = b"".join(data[off - 1 :].split())
            if len(digits) < w * h:
                raise ValueError("truncated P1 pixel data")
            arr = np.frombuffer(digits[: w * h], dtype=np.uint8)
            if not np.isin(arr, (0x30, 0x31)).all():
                raise ValueError("P1 pixel value out of range")
            bits = (arr - 0x30).reshape(h, w)
        return ((1 - bits) * 255).astype(np.uint8).reshape(h, w, 1)
    channels = 3 if kind in (b"P3", b"P6") else 1
    (w, h, maxval), off = _parse_pnm_header(data)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    if w < 1 or h < 1 or maxval < 1:
        raise ValueError(f"bad netpbm header {w}x{h} maxval={maxval}")
    n = w * h * channels
    if kind in (b"P2", b"P3"):  # ASCII sample tokens
        toks = data[off - 1 :].split()
        if len(toks) < n:
            raise ValueError(f"truncated {kind.decode('latin1')} pixel data")
        px = np.array([int(t) for t in toks[:n]], dtype=np.int64)
        if px.min(initial=0) < 0 or px.max(initial=0) > maxval:
            raise ValueError("ASCII netpbm sample out of range")
        px = px.astype(np.uint8)
    else:
        px = np.frombuffer(data, dtype=np.uint8, count=n, offset=off)
    return px.reshape(h, w, channels)


def _decode_qoi(data: bytes):
    """QOI (Quite OK Image, qoiformat.org spec 1.0): byte-oriented
    ops — RGB/RGBA literals, 6-bit index into a 64-slot seen-pixel
    hash, 2-bit channel diffs, luma diffs, runs — no entropy coder,
    so it decodes natively. Returns HxWx3 or HxWx4 uint8."""
    import struct

    import numpy as np

    if len(data) < 22:
        raise ValueError(f"truncated QOI header ({len(data)} bytes)")
    w, h = struct.unpack_from(">II", data, 4)
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4) or colorspace > 1:
        raise ValueError(
            f"bad QOI header (channels={channels}, colorspace={colorspace})"
        )
    if w < 1 or h < 1:
        raise ValueError(f"bad QOI dimensions {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(f"QOI dimensions {w}x{h} exceed the decode guard")
    n_px = w * h
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    end = len(data) - 8  # 8-byte end marker
    while i < n_px:
        if pos >= end:
            raise ValueError("truncated QOI stream")
        op = data[pos]
        pos += 1
        if op == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                raise ValueError("truncated QOI_OP_RGBA")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        elif op >> 6 == 0:  # QOI_OP_INDEX
            r, g, b, a = index[op & 0x3F]
        elif op >> 6 == 1:  # QOI_OP_DIFF (bias 2)
            r = (r + ((op >> 4) & 3) - 2) & 0xFF
            g = (g + ((op >> 2) & 3) - 2) & 0xFF
            b = (b + (op & 3) - 2) & 0xFF
        elif op >> 6 == 2:  # QOI_OP_LUMA (bias 32 / 8)
            if pos + 1 > end:
                raise ValueError("truncated QOI_OP_LUMA")
            dg = (op & 0x3F) - 32
            rb = data[pos]
            pos += 1
            r = (r + dg - 8 + ((rb >> 4) & 0x0F)) & 0xFF
            g = (g + dg) & 0xFF
            b = (b + dg - 8 + (rb & 0x0F)) & 0xFF
        else:  # QOI_OP_RUN (bias -1); 0xFE/0xFF already taken above
            run = (op & 0x3F) + 1
            if i + run > n_px:
                raise ValueError("QOI run overflows the pixel count")
            out[i : i + run] = (r, g, b, a)
            i += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[end:] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad QOI end marker")
    img = out.reshape(h, w, 4)
    return img[:, :, :3].copy() if channels == 3 else img


def _decode_farbfeld(data: bytes):
    """farbfeld (suckless.org): 8-byte magic, u32 BE width/height,
    then RGBA with 16 bits per channel big-endian. Samples reduce to
    their high byte — the module's 16-bit convention (PNG depth-16
    does the same)."""
    import struct

    import numpy as np

    if len(data) < 16:
        raise ValueError(f"truncated farbfeld header ({len(data)} bytes)")
    w, h = struct.unpack_from(">II", data, 8)
    if w < 1 or h < 1:
        raise ValueError(f"bad farbfeld dimensions {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(f"farbfeld dimensions {w}x{h} exceed the decode guard")
    n = w * h * 4 * 2
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=16)
    return px.reshape(h, w, 4, 2)[:, :, :, 0].copy()  # BE high byte


_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def _decode_tga(data: bytes):
    """TGA (Truevision Targa 2.0): uncompressed and RLE truecolor /
    grayscale / color-mapped, 8/24/32-bit pixels, both row orders.
    TGA has NO header magic — this decoder requires the TGA 2.0
    footer signature, which is also how the dispatcher routes here
    (a signature-less legacy TGA is indistinguishable from noise in
    a magic-dispatch architecture, so it stays PIL-gated)."""
    import struct

    import numpy as np

    if len(data) < 18 + 26:
        raise ValueError(f"truncated TGA ({len(data)} bytes)")
    id_len, cmap_type, img_type = data[0], data[1], data[2]
    cmap_first, cmap_len, cmap_bits = struct.unpack_from("<HHB", data, 3)
    w, h = struct.unpack_from("<HH", data, 12)
    depth, desc = data[16], data[17]
    rle = bool(img_type & 8)
    base_type = img_type & ~8
    if base_type not in (1, 2, 3):
        raise NotImplementedError(f"TGA image type {img_type} unsupported")
    if w < 1 or h < 1:
        raise ValueError(f"bad TGA dimensions {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(f"TGA dimensions {w}x{h} exceed the decode guard")
    if base_type == 1:
        if cmap_type != 1 or depth != 8 or cmap_bits not in (24, 32):
            raise NotImplementedError(
                f"TGA color map variant unsupported (cmap_type={cmap_type}, "
                f"depth={depth}, cmap_bits={cmap_bits})"
            )
    elif base_type == 2 and depth not in (24, 32):
        raise NotImplementedError(f"{depth}-bit truecolor TGA unsupported")
    elif base_type == 3 and depth != 8:
        raise NotImplementedError(f"{depth}-bit grayscale TGA unsupported")
    px_bytes = depth // 8
    pos = 18 + id_len
    cmap = None
    if cmap_type == 1:
        entry_bytes = cmap_bits // 8
        cmap_size = cmap_len * entry_bytes
        raw_cmap = data[pos : pos + cmap_size]
        if len(raw_cmap) != cmap_size:
            raise ValueError("truncated TGA color map")
        cmap = np.frombuffer(raw_cmap, dtype=np.uint8).reshape(cmap_len, entry_bytes)
        pos += cmap_size
    n_bytes = w * h * px_bytes
    if rle:
        out = bytearray()
        end = len(data) - 26  # footer block
        while len(out) < n_bytes:
            if pos >= end:
                raise ValueError("truncated TGA RLE stream")
            packet = data[pos]
            pos += 1
            count = (packet & 0x7F) + 1
            if packet & 0x80:  # run: one pixel repeated
                px = data[pos : pos + px_bytes]
                if len(px) != px_bytes:
                    raise ValueError("truncated TGA RLE run pixel")
                pos += px_bytes
                out += px * count
            else:  # raw: count literal pixels
                chunk = data[pos : pos + count * px_bytes]
                if len(chunk) != count * px_bytes:
                    raise ValueError("truncated TGA raw packet")
                pos += count * px_bytes
                out += chunk
        if len(out) > n_bytes:
            raise ValueError("TGA RLE packet crosses the image boundary")
        raw = bytes(out)
    else:
        raw = data[pos : pos + n_bytes]
        if len(raw) != n_bytes:
            raise ValueError("truncated TGA pixel data")
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, px_bytes)
    if not desc & 0x20:  # bit 5 clear = bottom-up row order
        px = px[::-1]
    if desc & 0x10:  # bit 4 set = right-to-left pixel order
        px = px[:, ::-1]
    if base_type == 1:
        idx = px.reshape(h, w).astype(np.int64) - cmap_first
        if idx.min() < 0 or idx.max() >= len(cmap):
            raise ValueError("TGA color-map index out of range")
        px = cmap[idx]  # (h, w, entry_bytes) BGR(A)
    if px.shape[2] == 1:
        return px.copy()
    if px.shape[2] == 3:
        return px[:, :, [2, 1, 0]].copy()  # BGR → RGB
    return px[:, :, [2, 1, 0, 3]].copy()  # BGRA → RGBA


def _bmp_rle_decode(stream: bytes, w: int, h: int, four_bit: bool):
    """RLE8/RLE4 (MS BMP spec): encoded runs, absolute mode (padded to
    even byte counts; RLE4 packs two hi-first nibbles per byte), and
    the three escapes (0=end of line, 1=end of bitmap, 2=delta skip).
    Rows are bottom-up by spec (top-down RLE is invalid). Pixels never
    written (short lines, delta-skipped spans) default to palette
    index 0 — the Windows behavior. Returns an (h, w) index array in
    BOTTOM-UP storage order (caller flips)."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    n = len(stream)
    while pos + 2 <= n:
        count, val = stream[pos], stream[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if y >= h or x + count > w:
                raise ValueError(f"BMP RLE run crosses the row boundary at ({x},{y})")
            if four_bit:
                pair = np.tile(
                    np.array([val >> 4, val & 0x0F], dtype=np.uint8),
                    (count + 1) // 2,
                )[:count]
                out[y, x : x + count] = pair
            else:
                out[y, x : x + count] = val
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta: skip right/up
            if pos + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            dx, dy = stream[pos], stream[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError(f"BMP RLE delta skips outside the bitmap ({x},{y})")
        else:  # absolute mode: val literal pixels
            if y >= h or x + val > w:
                raise ValueError(f"BMP RLE absolute run crosses the row at ({x},{y})")
            nbytes = ((val + 1) // 2 + 1) & ~1 if four_bit else (val + 1) & ~1
            chunk = stream[pos : pos + nbytes]
            if len(chunk) != nbytes:
                raise ValueError("truncated BMP RLE absolute block")
            pos += nbytes
            b = np.frombuffer(chunk, dtype=np.uint8)
            if four_bit:
                px = np.stack([b >> 4, b & 0x0F], axis=-1).reshape(-1)[:val]
            else:
                px = b[:val]
            out[y, x : x + val] = px
            x += val
    raise ValueError("BMP RLE stream ended without an end-of-bitmap escape")


def _mask_to_shift_width(mask: int) -> tuple[int, int]:
    """A BI_BITFIELDS channel mask → (shift, bit width); masks must be
    contiguous (every DIB Windows writes is)."""
    if mask == 0:
        return 0, 0
    shift = (mask & -mask).bit_length() - 1
    width = (mask >> shift).bit_length()
    if (mask >> shift) != (1 << width) - 1:
        raise ValueError(f"non-contiguous BMP channel mask {mask:#x}")
    return shift, width


def _decode_bmp(data: bytes):
    """BMP (Windows DIB), BITMAPINFOHEADER and the V4/V5 extensions —
    decoded natively in full: nothing in the classic BMP family is
    entropy-coded (fixed layouts + run-length only), so stdlib+numpy
    owns all of it:

    - 24/32-bit BI_RGB BGR(A), bottom-up or top-down (32-bit's 4th
      byte returned as alpha — the de-facto BGRA convention)
    - 1/4/8-bit paletted (BGRX color table; biClrUsed=0 means the
      full 2^bpp table) → RGB through the palette
    - RLE8/RLE4 (biCompression 1/2) — runs, absolute mode, EOL/EOF/
      delta escapes, unwritten pixels defaulting to index 0; RLE is
      bottom-up only per spec (a top-down RLE header is malformed)
    - 16-bit BI_RGB (the spec's implicit 555 layout) and
      BI_BITFIELDS (3) at 16/32 bpp with arbitrary CONTIGUOUS masks
      (555/565 and alpha-bearing 8888 as Windows writes them);
      sub-8-bit channels scale by exact integer rounding
      v8 = (v·255 + m//2) // m over the channel max m; an alpha mask
      of 0 yields RGB, nonzero yields RGBA.
    OS/2 BITMAPCOREHEADER (12-byte header) raises NotImplementedError.
    """
    import struct

    import numpy as np

    if len(data) < 54:
        raise ValueError(f"truncated BMP header ({len(data)} bytes)")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError(
            f"OS/2 BITMAPCOREHEADER ({hdr_size} bytes) unsupported"
        )
    w, h_signed = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    clr_used = struct.unpack_from("<I", data, 46)[0]
    top_down = h_signed < 0
    h = abs(h_signed)
    if w < 1 or h < 1:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"BMP {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )

    def _palette() -> "np.ndarray":
        n_colors = clr_used or (1 << bpp)
        if n_colors > 1 << bpp:
            raise ValueError(f"BMP biClrUsed {clr_used} exceeds 2^{bpp}")
        off = 14 + hdr_size
        raw = data[off : off + 4 * n_colors]
        if len(raw) != 4 * n_colors:
            raise ValueError("truncated BMP color table")
        # BGRX quads → RGB
        return np.frombuffer(raw, dtype=np.uint8).reshape(-1, 4)[:, [2, 1, 0]]

    if compression in (1, 2):  # RLE8 / RLE4
        if bpp != (8 if compression == 1 else 4):
            raise ValueError(f"BMP RLE{8 if compression == 1 else 4} with bpp={bpp}")
        if top_down:
            raise ValueError("top-down RLE BMP is invalid per spec")
        pal = _palette()
        idx = _bmp_rle_decode(data[pix_off:], w, h, four_bit=compression == 2)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP RLE palette index out of range")
        return pal[idx][::-1]  # RLE storage is bottom-up

    if compression == 3:  # BI_BITFIELDS
        if bpp not in (16, 32):
            raise NotImplementedError(f"BI_BITFIELDS at bpp={bpp} unsupported")
        # masks: 3 DWORDs right after the 40-byte header (hdr 40), or
        # the V4/V5 in-header fields — the SAME byte offsets either way
        rm, gm, bm = struct.unpack_from("<III", data, 54)
        am = struct.unpack_from("<I", data, 66)[0] if hdr_size >= 56 else 0
        masks = [rm, gm, bm] + ([am] if am else [])
    elif compression == 0 and bpp == 16:
        masks = [0x7C00, 0x03E0, 0x001F]  # the spec's implicit 555
    elif compression != 0:
        raise NotImplementedError(
            f"BMP biCompression={compression} requires a decoder this "
            "container lacks (JPEG/PNG-embedded DIB)"
        )
    else:
        masks = None

    if bpp in (1, 4, 8) and compression == 0:
        pal = _palette()
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=pix_off
        ).reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            nib = np.stack([rows >> 4, rows & 0x0F], axis=-1).reshape(h, -1)
            idx = nib[:, :w]
        else:
            idx = np.unpackbits(rows, axis=1)[:, :w]  # MSB-first
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("BMP palette index out of range")
        px = pal[idx]
        return px[::-1] if not top_down else px

    if bpp == 16 or (bpp == 32 and masks is not None):
        itemsize = bpp // 8
        stride = (w * itemsize + 3) & ~3
        rows = np.frombuffer(
            data, dtype=np.uint8, count=stride * h, offset=pix_off
        ).reshape(h, stride)[:, : w * itemsize]
        vals = (
            rows.reshape(h, w, itemsize)
            .astype(np.uint32)
            .dot(np.array([1 << (8 * i) for i in range(itemsize)], dtype=np.uint32))
        )
        chans = []
        for mask in masks:
            shift, width = _mask_to_shift_width(mask)
            m = (1 << width) - 1
            v = (vals >> np.uint32(shift)) & np.uint32(m)
            chans.append(
                ((v * 255 + m // 2) // m).astype(np.uint8)
                if m
                else np.zeros_like(v, dtype=np.uint8)
            )
        px = np.stack(chans, axis=-1)
        return px[::-1] if not top_down else px

    if bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} unsupported")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, [2, 1, 0]] if nch == 3 else rows[:, :, [2, 1, 0, 3]]  # BGR(A)→RGB(A)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _cur_plausible(data: bytes) -> bool:
    """Whether a 00 00 02 00 payload has a VALID-shaped ICONDIR —
    the disambiguation against footer-less truecolor TGA, whose
    header reads as entry count 0 (colormap origin) here. Checks
    count ≥ 1 and every directory entry's blob lying inside the
    file past the directory itself."""
    import struct

    if len(data) < 6 + 16:
        return False
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0 or count > 256 or len(data) < 6 + 16 * count:
        return False
    dir_end = 6 + 16 * count
    for i in range(count):
        size, off = struct.unpack_from("<II", data, 6 + 16 * i + 8)
        if off < dir_end or size < 8 or off + size > len(data):
            return False
    return True


def _decode_ico(data: bytes):
    """ICO/CUR (Windows icon resource — favicon corpora ship these in
    volume): ICONDIR + 16-byte entries; each image is either an
    embedded PNG (Vista+ convention, routed to the native PNG
    decoder) or a DIB whose biHeight is DOUBLED to cover the 1-bit
    AND transparency mask below the XOR image. Decodes the BEST entry
    (largest area, then deepest bpp) — the same choice a browser
    makes. DIB entries reuse the full `_decode_bmp` engine through a
    synthesized BITMAPFILEHEADER with the height patched back to the
    real value; the AND mask becomes the alpha channel (result is
    always RGBA for DIB entries). 32-bit entries whose alpha plane is
    entirely zero fall back to the AND mask — the legacy-encoder
    convention every real renderer honors."""
    import struct

    import numpy as np

    if len(data) < 6:
        raise ValueError("truncated ICO header")
    count = struct.unpack_from("<H", data, 4)[0]
    if count == 0:
        raise ValueError("ICO directory declares zero images")
    if len(data) < 6 + 16 * count:
        raise ValueError("truncated ICO directory")
    best = None
    for i in range(count):
        off = 6 + 16 * i
        ew, eh, _pal, _res = data[off], data[off + 1], data[off + 2], data[off + 3]
        bpp = struct.unpack_from("<H", data, off + 6)[0]
        size, img_off = struct.unpack_from("<II", data, off + 8)
        ew = ew or 256
        eh = eh or 256
        if img_off + size > len(data) or size < 8:
            raise ValueError(f"ICO entry {i} overflows the file")
        key = (ew * eh, bpp)
        if best is None or key > best[0]:
            best = (key, img_off, size)
    _, img_off, size = best
    blob = data[img_off : img_off + size]
    if blob[:8] == _PNG_MAGIC:
        return _decode_png(blob)
    # DIB: header + palette + XOR image + AND mask, biHeight doubled
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size = struct.unpack_from("<I", blob, 0)[0]
    if hdr_size < 40:
        raise NotImplementedError("ICO with OS/2 core DIB unsupported")
    w, h2 = struct.unpack_from("<ii", blob, 4)
    bpp = struct.unpack_from("<H", blob, 14)[0]
    compression = struct.unpack_from("<I", blob, 16)[0]
    clr_used = struct.unpack_from("<I", blob, 32)[0]
    if compression != 0:
        raise NotImplementedError(
            f"ICO DIB compression {compression} unsupported (BI_RGB only)"
        )
    if h2 <= 0 or h2 % 2:
        raise ValueError(f"ICO DIB height {h2} is not a positive double")
    h = h2 // 2
    if w <= 0:
        raise ValueError(f"bad ICO DIB width {w}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"ICO {w}x{h} exceeds max pixels {MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    n_pal = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    pix_off_in_blob = hdr_size + 4 * n_pal
    xor_stride = (w * bpp + 31) // 32 * 4
    and_stride = (w + 31) // 32 * 4
    if pix_off_in_blob + xor_stride * h + and_stride * h > len(blob):
        raise ValueError("ICO DIB pixel/mask data truncated")
    # synthesize a BMP file around the DIB with the height unfolded
    dib = bytearray(blob[: pix_off_in_blob + xor_stride * h])
    struct.pack_into("<i", dib, 8, h)
    struct.pack_into("<I", dib, 20, xor_stride * h)  # biSizeImage
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + len(dib), 0, 0, 14 + pix_off_in_blob)
        + bytes(dib)
    )
    px = _decode_bmp(bmp)
    mask_raw = np.frombuffer(
        blob, dtype=np.uint8, count=and_stride * h,
        offset=pix_off_in_blob + xor_stride * h,
    ).reshape(h, and_stride)
    bits = np.unpackbits(mask_raw, axis=1)[:, :w][::-1]  # bottom-up
    mask_alpha = np.where(bits == 1, 0, 255).astype(np.uint8)
    if px.shape[2] == 4:
        if (px[:, :, 3] == 0).all():  # legacy 32-bit: alpha lives in
            px = px.copy()  # the AND mask
            px[:, :, 3] = mask_alpha
        return px
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    return np.concatenate([px, mask_alpha[:, :, np.newaxis]], axis=2)


def _png_unfilter(rows, stride: int, bpp: int):
    """Reverse the five PNG scanline filters (spec §9, 'Filtering').

    Filters None/Up are whole-row numpy-vectorized; Sub is a per-lane
    cumulative sum mod 256 (recon[x] = filt[x] + recon[x-bpp] is
    exactly a prefix sum over each byte lane); Average and Paeth
    carry a true left-to-right data dependency that no vectorization
    removes, so they run a flat per-byte loop over plain Python
    lists — measured 9-12× faster than per-pixel numpy slice
    stepping (numpy dispatch overhead ≫ the arithmetic; 256×256 RGB:
    all-Paeth 617 → 51 ms, all-Average 241 → 28 ms, mixed filters
    190 → 19 ms ≈ 10 MB/s/core). Decode throughput is a per-core
    cost the Spark task parallelism multiplies; a cluster with a
    real codec swaps PIL in above this for transform formats.
    """
    import numpy as np

    h = rows.shape[0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    prevl = None  # lazily-converted list twin of `prev` for filters 3/4
    for y in range(h):
        ftype = rows[y, 0]
        if ftype == 0:
            rec = rows[y, 1:].astype(np.int64)
        elif ftype == 1:  # Sub
            cur = rows[y, 1:].astype(np.int64)
            rec = np.empty(stride, dtype=np.int64)
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif ftype == 2:  # Up
            rec = (rows[y, 1:] + prev) % 256
        elif ftype in (3, 4):
            curl = rows[y, 1:].tolist()
            if prevl is None:
                prevl = prev.tolist()
            recl = [0] * stride
            if ftype == 3:  # Average
                for x in range(bpp):
                    recl[x] = (curl[x] + (prevl[x] >> 1)) & 0xFF
                for x in range(bpp, stride):
                    recl[x] = (curl[x] + ((recl[x - bpp] + prevl[x]) >> 1)) & 0xFF
            else:  # Paeth; first pixel: a=c=0 ⇒ predictor is always b
                for x in range(bpp):
                    recl[x] = (curl[x] + prevl[x]) & 0xFF
                for x in range(bpp, stride):
                    a = recl[x - bpp]
                    b = prevl[x]
                    c = prevl[x - bpp]
                    p = a + b - c
                    pa = abs(p - a)
                    pb = abs(p - b)
                    pc = abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    recl[x] = (curl[x] + pred) & 0xFF
            rec = np.array(recl, dtype=np.int64)
            prev = rec
            prevl = recl
            out[y] = rec
            continue
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = rec
        prevl = None
        out[y] = rec
    return out


# Decompression-bomb guard (the PIL MAX_IMAGE_PIXELS convention):
# IHDR dimensions are attacker-controlled, and the output raster is
# allocated from them BEFORE any pixel data is validated — without a
# cap, a 10 KB payload claiming 50000×50000 RGBA allocates gigabytes
# and OOMs the executor instead of raising the quarantine-catchable
# ValueError. 2^26 ≈ 67M pixels (8192×8192); raise it deliberately
# for corpora with genuinely larger rasters.
MAX_IMAGE_PIXELS = 1 << 26

# Animated-GIF total-output guard: the compositor materializes one
# full logical-screen RGBA canvas per frame, so the amplification
# bound is frames × screen pixels, not any single frame's size.
# 4× the still-image guard ≈ 1 GiB of RGBA output.
MAX_GIF_TOTAL_PIXELS = 4 * (1 << 26)

# Absolute frame-count cap alongside the pixel-product guard: a tiny
# logical screen (1×1) would otherwise admit MAX_GIF_TOTAL_PIXELS
# frames, each costing a canvas-copy numpy object (~hundreds of bytes)
# the pixel accounting never sees. ~20 input bytes buy one frame
# block, so 65536 frames still needs a >1 MiB payload — amplification
# stays input-bounded. No real animation approaches this (a 30 min
# cartoon at 50 fps is 90k frames of NON-trivial size).
MAX_GIF_FRAMES = 1 << 16

# Adam7 pass geometry: (x0, y0, dx, dy) per pass, spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_read_subimage(
    raw: bytes,
    off: int,
    w: int,
    h: int,
    depth: int,
    channels: int,
    full16: bool = False,
):
    """Unfilter one (sub-)image of `h` scanlines × `w` pixels starting
    at byte `off` of the inflated stream; returns (per-sample value
    array of shape (h, w·channels), bytes consumed). Sub-byte depths
    unpack MSB-first; 16-bit samples reduce to their high byte (the
    standard 16→8 conversion — the low byte carries sub-1/257
    precision no uint8 output can keep) unless `full16`, which keeps
    the uint16 samples — the tRNS key match must see all 16 bits
    (spec 11.3.2 compares raw samples; libpng/PIL agree)."""
    import numpy as np

    stride = (w * depth * channels + 7) // 8
    need = (stride + 1) * h
    if off + need > len(raw):
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, expected >= {off + need}"
        )
    bpp = max(1, depth * channels // 8)
    recon = _png_unfilter(
        np.frombuffer(raw, dtype=np.uint8, count=need, offset=off).reshape(
            h, stride + 1
        ),
        stride,
        bpp,
    )
    if depth < 8:
        bits = np.unpackbits(recon, axis=1)  # MSB-first per spec
        samples = (
            bits[:, : (stride * 8 // depth) * depth]
            .reshape(h, -1, depth)
            .dot(1 << np.arange(depth - 1, -1, -1))
            .astype(np.uint8)[:, : w * channels]
        )
    elif depth == 16:
        pairs = recon.reshape(h, w * channels, 2)
        if full16:
            samples = (pairs[:, :, 0].astype(np.uint16) << 8) | pairs[:, :, 1]
        else:
            samples = pairs[:, :, 0]  # big-endian high byte
    else:
        samples = recon.reshape(h, w * channels)
    return samples, need


def _decode_png(data: bytes):
    """Complete PNG decode in pure stdlib-zlib + numpy — every color
    type, bit depth, and interlace mode the spec defines:

    chunk walk with CRC-32 verification, IHDR validation, multi-IDAT
    concatenation, all five scanline filters, bit depths 1/2/4/8/16
    (grayscale sub-byte scaled to full 0..255, the PIL 'L'-mode
    convention; 16-bit reduced to the high byte), color types 0 gray
    / 2 RGB / 3 palette (PLTE + optional tRNS alpha → RGB(A)) / 4
    gray+alpha / 6 RGBA — tRNS honored for types 0/2 too (key-color
    pixels → alpha 0; at depth 16 the key is matched on its high
    byte, the module's reduction convention) — and both interlace
    methods (Adam7 passes
    unfiltered independently and scattered by stride into the output
    raster). Everything structurally wrong raises through the
    caller's ValueError wrapper. No entropy coding beyond zlib
    exists in PNG, so nothing here needs a codec."""
    import struct
    import zlib

    import numpy as np

    pos, ihdr, plte, trns, idat = 8, None, None, None, []
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype.decode('latin1')} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or w == 0 or h == 0:
        raise ValueError(f"bad IHDR (compression={comp}, filter={filt}, {w}x{h})")
    if interlace not in (0, 1):
        raise ValueError(f"bad IHDR interlace {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    if (
        depth not in (1, 2, 4, 8, 16)
        or (depth not in (8, 16) and color not in (0, 3))
        or (depth == 16 and color == 3)
    ):
        raise ValueError(f"bad PNG bit depth {depth} for color type {color}")
    # (sub-)image geometry: the whole raster for progressive order, or
    # the non-empty Adam7 passes (empty passes contribute NO scanlines)
    geom, expected = [], 0
    for x0, y0, dx, dy in (((0, 0, 1, 1),) if interlace == 0 else _ADAM7):
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp > 0 and hp > 0:
            geom.append((x0, y0, dx, dy, wp, hp))
            expected += ((wp * depth * channels + 7) // 8 + 1) * hp
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"PNG {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard; raise the module constant for "
            "corpora with genuinely larger rasters)"
        )
    # DEFLATE's maximum expansion is 1032:1, so IHDR dimensions a real
    # encoder produced can never need more output than the IDAT bytes
    # could encode — reject the bomb BEFORE inflating anything
    idat_len = sum(len(b) for b in idat)
    if expected > 1032 * idat_len + 4096:
        raise ValueError(
            f"IDAT ({idat_len} bytes) cannot encode the {expected}-byte "
            "pixel stream IHDR claims"
        )
    # decompressobj + max_length caps the inflate at expected+1 bytes:
    # a decompression bomb (tiny IDAT, huge stream) fails the length
    # check below instead of materializing executor-memory-sized junk
    raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError(f"PNG pixel stream is {len(raw)}+ bytes, expected {expected}")
    # depth-16 gray/RGB with a tRNS key needs the FULL 16-bit samples
    # for the key match (spec 11.3.2 compares raw samples; a high-byte
    # match would falsely blank every pixel sharing only the key's
    # high bytes); the output samples still reduce to the high byte
    keep16 = depth == 16 and trns is not None and color in (0, 2)
    samples = np.zeros((h, w, channels), dtype=np.uint16 if keep16 else np.uint8)
    off = 0
    for x0, y0, dx, dy, wp, hp in geom:
        sub, used = _png_read_subimage(
            raw, off, wp, hp, depth, channels, full16=keep16
        )
        samples[y0::dy, x0::dx] = sub.reshape(hp, wp, channels)
        off += used
    samples16 = None
    if keep16:
        samples16 = samples
        samples = (samples >> 8).astype(np.uint8)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG missing/odd PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG palette index out of range")
        if trns is not None:
            alpha = np.full(len(pal), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([pal[idx], alpha[idx][:, :, None]])
        return pal[idx]
    if trns is not None and color in (0, 2):
        # tRNS for gray (one 2-byte key) / RGB (3×2-byte key), spec
        # 11.3.2: pixels whose RAW samples equal the key become fully
        # transparent. Comparison happens pre-scaling on the raw
        # samples — at depth 16 against the full 16-bit values
        # (libpng/PIL semantics), only the OUTPUT reduces to the high
        # byte.
        n_fields = 1 if color == 0 else 3
        if len(trns) != 2 * n_fields:
            raise ValueError(
                f"bad tRNS length {len(trns)} for PNG color type {color}"
            )
        key = np.array(
            struct.unpack(f">{n_fields}H", trns), dtype=np.uint16
        )
        if depth < 16 and bool((key > (1 << depth) - 1).any()):
            # spec: upper key bits are zero at depth < 16. A key
            # outside the sample range can match NOTHING (libpng/PIL
            # behavior) — masking it instead would invent false
            # transparency on a malformed file
            matched = np.zeros(samples.shape[:2], dtype=bool)
        elif depth == 16:
            matched = (samples16 == key.reshape(1, 1, n_fields)).all(axis=2)
        else:
            key8 = key.astype(np.uint8)
            matched = (samples == key8.reshape(1, 1, n_fields)).all(axis=2)
        alpha = np.where(matched, 0, 255).astype(np.uint8)
        base = (
            samples * (255 // ((1 << depth) - 1)) if depth < 8 else samples
        )
        return np.dstack([base, alpha])
    if depth < 8:  # grayscale: scale 2^depth-1 → 255 (exact: 255 = 3·5·17)
        return samples * (255 // ((1 << depth) - 1))
    return samples


def _gif_lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF-variant LZW decompression in pure Python (spec appendix F):
    LSB-first bit packing, clear/end codes, code width growing from
    min+1 to 12 bits, dictionary frozen at 4096 entries until the
    next clear. Output is capped at `expected` pixels — the bomb
    guard analog of the PNG decompressobj max_length."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    # base table built ONCE: clear-heavy streams ("uncompressed GIF",
    # a common encoder strategy) would otherwise rebuild 2^m+2 bytes
    # objects per pixel
    base: list = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base.copy()
    width = min_code_size + 1
    out = bytearray()
    buf = nbits = pos = 0
    prev = None
    while True:
        while nbits < width and pos < len(data):
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < width:
            break  # stream exhausted without an end code: caller length-checks
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = base.copy()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code} (table size {len(table)})")
        out += entry
        if len(out) >= expected:
            return out[:expected]  # cap: trailing junk can't balloon memory
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(f"GIF pixel stream is {len(out)} px, expected {expected}")
    return out


def _decode_gif(data: bytes):
    """First frame of a GIF87a/89a in pure stdlib Python + numpy —
    LZW is dictionary coding, fully specified in the GIF spec, so no
    codec library is needed (just slower than a C one).

    Handles global and local color tables, the GIF89a graphic-control
    transparency index (→ RGBA output; opaque frames → RGB),
    interlaced row order (4-pass de-interlace), and sub-block
    reassembly. Animated GIFs decode their FIRST frame (the standard
    thumbnail/featurize semantics); the frame's own w×h is returned
    (no compositing onto the logical screen). Structural damage —
    truncated blocks, out-of-range LZW codes, pixel count mismatch —
    raises through the caller's ValueError wrapper."""
    import struct

    import numpy as np

    if len(data) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    transparent = None
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF has no image descriptor")
        if block == 0x21:  # extension: label + size-prefixed sub-blocks
            label = data[pos + 1] if pos + 1 < len(data) else None
            pos += 2
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension")
                size = data[pos]
                if size == 0:
                    pos += 1
                    break
                if label == 0xF9 and size >= 4 and data[pos + 1] & 0x01:
                    transparent = data[pos + 4]  # GCE transparency index
                pos += 1 + size
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        break
    else:
        raise ValueError("GIF has no image descriptor")
    _left, _top, w, h, idx, colors, pos = _gif_image_block(data, pos, gct)
    if transparent is not None:
        alpha = np.full(len(colors), 255, dtype=np.uint8)
        if transparent < len(colors):
            alpha[transparent] = 0
        return np.dstack([colors[idx], alpha[idx][:, :, None]])
    return colors[idx]


def _gif_image_block(data: bytes, pos: int, gct):
    """Parse one image block (descriptor 0x2C at `pos`): returns
    (left, top, w, h, index array (h, w), colors (n, 3), pos after
    the block terminator). Handles local color tables, interlacing,
    sub-block reassembly, and range validation — shared by the
    first-frame decoder and the animation compositor."""
    import struct

    import numpy as np

    if pos + 10 > len(data):
        raise ValueError("truncated GIF image descriptor")
    left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
    pos += 10
    if w == 0 or h == 0:
        raise ValueError(f"bad GIF frame size {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"GIF {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    pal = gct
    if ipacked & 0x80:  # local color table wins
        n = 2 << (ipacked & 0x07)
        pal = data[pos : pos + 3 * n]
        if len(pal) != 3 * n:
            raise ValueError("truncated local color table")
        pos += 3 * n
    if pal is None:
        raise ValueError("GIF frame has no color table")
    if pos >= len(data):
        raise ValueError("truncated GIF image data")
    min_code_size = data[pos]
    pos += 1
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        size = data[pos]
        if size == 0:
            pos += 1
            break
        chunk = data[pos + 1 : pos + 1 + size]
        if len(chunk) != size:
            raise ValueError("truncated GIF image sub-block")
        chunks.append(chunk)
        pos += 1 + size
    idx = np.frombuffer(
        _gif_lzw_decode(b"".join(chunks), min_code_size, w * h), dtype=np.uint8
    ).reshape(h, w)
    if ipacked & 0x40:  # interlaced: rows arrive in the four GIF passes
        order = np.concatenate(
            [np.arange(o, h, s) for o, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        deinterlaced = np.empty_like(idx)
        deinterlaced[order] = idx
        idx = deinterlaced
    colors = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    if int(idx.max(initial=0)) >= len(colors):
        raise ValueError("GIF pixel index out of color-table range")
    return left, top, w, h, idx, colors, pos


def decode_gif_frames(data: bytes):
    """Full animated-GIF decode → (frames array (n, H, W, 4) uint8
    RGBA composited on the logical screen, delays list in
    centiseconds — one per frame, 0 when no GCE set one).

    Compositing per GIF89a + the universal renderer conventions:
    the canvas starts fully transparent; each frame draws its
    rectangle (transparent-index pixels leave the canvas unchanged),
    the snapshot after drawing IS that frame; then disposal runs —
    0/1 leave the canvas, 2 clears the frame's rectangle back to
    transparent (the browser convention; no renderer actually paints
    the background color), 3 restores the canvas as it was before
    the frame drew. Each GCE applies to exactly one following image
    block. A frame rectangle outside the logical screen, or a
    missing trailer mid-stream, is malformed.

    Bomb guard: every composited frame is a full logical-screen RGBA
    copy, so the TOTAL output is n_frames × screen pixels — a tiny
    LZW payload with thousands of 1×1 frame rectangles would amplify
    unboundedly even though each single frame passes MAX_IMAGE_PIXELS.
    Decoding raises ValueError once the cumulative output would
    exceed MAX_GIF_TOTAL_PIXELS (quarantine-catchable, unlike the
    MemoryError it prevents)."""
    import struct

    import numpy as np

    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError(f"bad GIF logical screen {sw}x{sh}")
    if sw * sh > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"GIF screen {sw}x{sh} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    frames, delays = [], []
    transparent, disposal, delay = None, 0, 0
    saw_trailer = False
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            label = data[pos + 1] if pos + 1 < len(data) else None
            pos += 2
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension")
                size = data[pos]
                if size == 0:
                    pos += 1
                    break
                if pos + 1 + size > len(data):
                    raise ValueError("truncated GIF extension sub-block")
                if label == 0xF9 and size >= 4:
                    flags = data[pos + 1]
                    disposal = (flags >> 2) & 0x07
                    delay = data[pos + 2] | (data[pos + 3] << 8)
                    transparent = data[pos + 4] if flags & 0x01 else None
                pos += 1 + size
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, w, h, idx, colors, pos = _gif_image_block(data, pos, gct)
        if left + w > sw or top + h > sh:
            raise ValueError(
                f"GIF frame {w}x{h}@({left},{top}) exceeds the "
                f"{sw}x{sh} logical screen"
            )
        if (len(frames) + 1) * sw * sh > MAX_GIF_TOTAL_PIXELS:
            raise ValueError(
                f"GIF animation output ({len(frames) + 1} frames of "
                f"{sw}x{sh}) exceeds MAX_GIF_TOTAL_PIXELS="
                f"{MAX_GIF_TOTAL_PIXELS} (decompression-bomb guard)"
            )
        if len(frames) >= MAX_GIF_FRAMES:
            # the pixel-product guard alone lets a tiny logical screen
            # (e.g. 1x1) admit 2^28 frames whose per-frame OBJECT
            # overhead (numpy canvas copies, list cells) dwarfs the
            # pixel accounting — cap the frame count absolutely
            raise ValueError(
                f"GIF animation exceeds MAX_GIF_FRAMES={MAX_GIF_FRAMES} "
                "(decompression-bomb guard)"
            )
        prev = canvas.copy() if disposal == 3 else None
        rgba = np.dstack(
            [colors[idx], np.full((h, w, 1), 255, dtype=np.uint8)]
        )
        region = canvas[top : top + h, left : left + w]
        if transparent is None:
            region[:] = rgba
        else:
            mask = idx != transparent
            region[mask] = rgba[mask]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + h, left : left + w] = 0
        elif disposal == 3:
            canvas = prev
        transparent, disposal, delay = None, 0, 0
    if not frames:
        raise ValueError("GIF has no image descriptor")
    if not saw_trailer:
        # a stream cut after a complete frame would otherwise decode
        # SILENTLY short — the same silent-data-loss class the chunk
        # walkers reject everywhere else
        raise ValueError("GIF stream ended without a trailer")
    return np.stack(frames), delays


def _rgba_of(arr):
    """HxWxC decoded raster → RGBA (gray replicated, missing alpha
    opaque) — the compositing canvas element type."""
    import numpy as np

    c = arr.shape[2]
    if c == 1:
        rgb, a = np.repeat(arr, 3, axis=2), None
    elif c == 2:
        rgb, a = np.repeat(arr[:, :, :1], 3, axis=2), arr[:, :, 1:]
    elif c == 3:
        rgb, a = arr, None
    else:
        rgb, a = arr[:, :, :3], arr[:, :, 3:]
    if a is None:
        a = np.full(rgb.shape[:2] + (1,), 255, dtype=np.uint8)
    return np.concatenate([rgb, a], axis=2)


def decode_apng_frames(data: bytes):
    """Animated PNG (APNG) decode → (frames array (n, H, W, 4) uint8
    RGBA composited on the canvas, delays list in MILLISECONDS).

    Frame regions are independent PNG image streams (fdAT data — or
    the IDAT for a first frame whose fcTL precedes it), decoded by
    synthesizing a still PNG around each region with the parent's
    IHDR properties / PLTE / tRNS and routing it through the full
    `_decode_png` engine; a hidden default image (IDAT before any
    fcTL) is not part of the animation. Compositing per the APNG
    spec: blend_op 0 replaces the region, 1 alpha-composites OVER it
    (straight alpha); dispose_op 0 keeps the canvas, 1 clears the
    region to transparent, 2 restores the pre-frame region (2 on the
    first frame degrades to 1 per spec). Sequence numbers (shared by
    fcTL/fdAT) must count 0..n-1 in stream order; acTL must precede
    IDAT and match the fcTL count; the IDAT-bearing frame must cover
    the full canvas; regions must lie inside it. Total-output bomb
    guard shares MAX_GIF_TOTAL_PIXELS with the GIF compositor."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = plte = trns = None
    actl = None
    frames_meta: list[dict] = []
    idat = bytearray()
    seqs: list[int] = []
    saw_idat = False
    saw_end = False
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype.decode('latin1')} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"acTL":
            if saw_idat:
                raise ValueError("acTL after IDAT is not animated per spec")
            if len(body) != 8:
                raise ValueError("bad acTL size")
            actl = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            if len(body) != 26:
                raise ValueError("bad fcTL size")
            (seq, fw, fh, fx, fy, dnum, dden, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            seqs.append(seq)
            frames_meta.append(
                {
                    "w": fw, "h": fh, "x": fx, "y": fy,
                    "dnum": dnum, "dden": dden,
                    "dispose": dispose, "blend": blend,
                    "data": bytearray(), "uses_idat": not saw_idat,
                }
            )
        elif ctype == b"fdAT":
            if not frames_meta:
                raise ValueError("fdAT before any fcTL")
            if len(body) < 4:
                raise ValueError("bad fdAT size")
            seqs.append(struct.unpack_from(">I", body, 0)[0])
            frames_meta[-1]["data"] += body[4:]
        elif ctype == b"IDAT":
            saw_idat = True
            idat += body
        elif ctype == b"IEND":
            saw_end = True
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG has no IHDR")
    if not saw_end:
        raise ValueError("PNG stream ended without IEND")
    if actl is None:
        raise NotImplementedError(
            "PNG has no acTL chunk (a still image, not an animation)"
        )
    W, H, depth, ct, comp, filt, interlace = ihdr
    if seqs != list(range(len(seqs))):
        raise ValueError(f"APNG sequence numbers out of order: {seqs}")
    if len(frames_meta) != actl[0]:
        raise ValueError(
            f"acTL declares {actl[0]} frames, stream carries {len(frames_meta)}"
        )
    if not frames_meta:
        raise ValueError("APNG with zero frames")
    if actl[0] * W * H > MAX_GIF_TOTAL_PIXELS:
        raise ValueError(
            f"APNG composited output {actl[0]}x{W}x{H} exceeds "
            f"{MAX_GIF_TOTAL_PIXELS} pixels (decompression-bomb guard)"
        )

    def chunk(t: bytes, b: bytes) -> bytes:
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    canvas = np.zeros((H, W, 4), dtype=np.uint8)
    out = []
    delays = []
    for i, fm in enumerate(frames_meta):
        uses_idat = i == 0 and fm["uses_idat"]
        raw = bytes(idat) if uses_idat else bytes(fm["data"])
        if uses_idat and (fm["w"], fm["h"], fm["x"], fm["y"]) != (W, H, 0, 0):
            raise ValueError("the IDAT frame must cover the full canvas")
        if (
            fm["w"] == 0 or fm["h"] == 0
            or fm["x"] + fm["w"] > W or fm["y"] + fm["h"] > H
        ):
            raise ValueError("APNG frame region outside the canvas")
        if not raw:
            raise ValueError(f"APNG frame {i} has no image data")
        # Pass the parent's compression/filter methods through unchanged
        # so _decode_png rejects an APNG whose IHDR declares invalid
        # methods instead of silently decoding it as if they were 0/0.
        mini = _PNG_MAGIC + chunk(
            b"IHDR",
            struct.pack(
                ">IIBBBBB", fm["w"], fm["h"], depth, ct, comp, filt, interlace
            ),
        )
        if plte is not None:
            mini += chunk(b"PLTE", plte)
        if trns is not None:
            mini += chunk(b"tRNS", trns)
        mini += chunk(b"IDAT", raw) + chunk(b"IEND", b"")
        rgba = _rgba_of(_decode_png(mini))
        region = (
            slice(fm["y"], fm["y"] + fm["h"]),
            slice(fm["x"], fm["x"] + fm["w"]),
        )
        dispose = fm["dispose"]
        if dispose > 2:
            raise ValueError(f"bad APNG dispose_op {dispose}")
        if i == 0 and dispose == 2:
            dispose = 1  # spec: APNG_DISPOSE_OP_PREVIOUS on frame 0
        prev = canvas[region].copy() if dispose == 2 else None
        if fm["blend"] == 0:
            canvas[region] = rgba
        elif fm["blend"] == 1:
            dst = canvas[region].astype(np.float64)
            src = rgba.astype(np.float64)
            sa = src[:, :, 3:4] / 255.0
            da = dst[:, :, 3:4] / 255.0
            oa = sa + da * (1.0 - sa)
            rgb = np.where(
                oa > 0,
                (src[:, :, :3] * sa + dst[:, :, :3] * da * (1.0 - sa))
                / np.maximum(oa, 1e-12),
                0.0,
            )
            canvas[region] = np.clip(
                np.rint(np.concatenate([rgb, oa * 255.0], axis=2)), 0, 255
            ).astype(np.uint8)
        else:
            raise ValueError(f"bad APNG blend_op {fm['blend']}")
        out.append(canvas.copy())
        delays.append(1000.0 * fm["dnum"] / (fm["dden"] or 100))
        if dispose == 1:
            canvas[region] = 0
        elif dispose == 2:
            canvas[region] = prev
    return np.stack(out), delays


def _packbits_decode(data: bytes, expected: int) -> bytearray:
    """Apple PackBits RLE (TIFF compression 32773): control byte n in
    0..127 copies n+1 literals, 129..255 (-1..-127 signed) repeats the
    next byte 257-n times, 128 is a noop. Output capped at `expected`
    (bomb guard)."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1
            chunk = data[pos : pos + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += chunk
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    return out[:expected]


def _tiff_lzw_decode(data: bytes, expected: int) -> bytearray:
    """TIFF-variant LZW (spec §13): 8-bit codes, MSB-first bit
    packing (GIF is LSB-first), clear=256/end=257, and the
    'EarlyChange' convention — the code width grows one code EARLIER
    than GIF's schedule (at table size 2^width − 1, because the
    encoder counts the entry it is about to create). Output capped
    at `expected` (bomb guard)."""
    clear, end = 256, 257
    base: list = [bytes([i]) for i in range(256)] + [b"", b""]
    table = base.copy()
    width = 9
    out = bytearray()
    buf = nbits = pos = 0
    prev = None
    while True:
        while nbits < width and pos < len(data):
            buf = (buf << 8) | data[pos]  # MSB-first: append at the low end
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        buf &= (1 << nbits) - 1
        if code == clear:
            table = base.copy()
            width = 9
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < 256 or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"bad TIFF-LZW code {code} (table size {len(table)})")
        out += entry
        if len(out) >= expected:
            return out[:expected]
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) - 1 and width < 12:  # EarlyChange
            width += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(
            f"TIFF-LZW stream is {len(out)} bytes, expected {expected}"
        )
    return out


def _decode_tiff(data: bytes):
    """Baseline TIFF in pure struct+numpy: both byte orders (II/MM),
    IFD walk with inline-or-offset values, multi-strip assembly AND
    tiled layout (spec §15: full-size edge-padded tiles trimmed
    after assembly, the horizontal predictor reset at each tile's
    left edge — 8-bit tiles, every strip codec), compressions 1
    (none), 5 (LZW, EarlyChange + optional horizontal-differencing
    predictor), 8/32946 (Deflate), and 32773 (PackBits); bit depths
    1 and 8; photometric WhiteIsZero/BlackIsZero/RGB/Palette (16-bit
    ColorMap reduced to its high byte, 8-bit-valued ColorMaps — a
    known writer bug — used as-is); FillOrder 2 (LSB-first rows)
    honored; 1/3/4 samples per pixel (RGBA via ExtraSamples). First
    IFD only (multi-page TIFFs decode their first page — the
    thumbnail/featurize semantics, same as GIF). CCITT/JPEG
    compressions, CMYK/YCbCr photometrics, sub-byte tiled layouts,
    and planar configuration raise NotImplementedError (unsupported
    features, not damage); structural damage raises through the
    caller's ValueError wrapper."""
    import struct

    import numpy as np

    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise ValueError("truncated TIFF IFD")
    _SIZES = {1: 1, 2: 1, 3: 2, 4: 4}  # BYTE ASCII SHORT LONG

    def values(entry_off):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, entry_off)
        size = _SIZES.get(typ)
        if size is None:  # RATIONAL etc. — not needed for any tag we read
            return tag, None
        total = size * cnt
        off = entry_off + 8 if total <= 4 else struct.unpack_from(bo + "I", data, entry_off + 8)[0]
        if off + total > len(data):
            raise ValueError(f"truncated TIFF tag {tag}")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        return tag, list(struct.unpack_from(bo + fmt * cnt, data, off))

    tags = {}
    for i in range(n_entries):
        tag, vals = values(ifd_off + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals
    tiled = any(t in tags for t in (322, 323, 324, 325))
    if tags.get(284, [1])[0] != 1:  # PlanarConfiguration
        raise NotImplementedError(
            "planar-configuration TIFF not supported (chunky only)"
        )
    try:
        w = tags[256][0]
        h = tags[257][0]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    if w <= 0 or h <= 0:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"TIFF {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    compression = tags.get(259, [1])[0]
    if compression not in (1, 5, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} needs a codec; "
            "none/LZW/Deflate/PackBits decode natively"
        )
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [1] * spp)
    photometric = tags.get(262, [1])[0]
    if photometric not in (0, 1, 2, 3):
        # CMYK (5) / YCbCr (6) / CIELab (8): samples exist but mean
        # something else — decoding them as RGB would be silently
        # wrong, the worst failure class. Unsupported, not malformed.
        raise NotImplementedError(
            f"TIFF photometric {photometric} not supported (gray/RGB/palette only)"
        )
    if len(set(bits)) != 1 or bits[0] not in (1, 8) or (bits[0] == 1 and spp != 1):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    depth = bits[0]
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF samples-per-pixel {spp} not supported")
    predictor = tags.get(317, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")

    def palette_lookup(idx):
        """ColorMap: 3·2^depth SHORTs, R plane then G then B. Spec
        values are value<<8; a well-known writer bug stores plain
        8-bit values — detected (max ≤ 255) and used as-is, the
        libtiff/PIL compensation."""
        cmap = tags.get(320)
        n = 1 << depth
        if not cmap or len(cmap) != 3 * n:
            raise ValueError("paletted TIFF missing/odd ColorMap")
        pal16 = np.array(cmap, dtype=np.uint16).reshape(3, n).T
        pal = (pal16 if pal16.max(initial=0) <= 255 else pal16 >> 8).astype(np.uint8)
        return pal[idx]

    def _decode_segment(seg: bytes, share: int, what: str):
        """One strip/tile through the shared codec set, validated to
        its exact pixel share."""
        if compression == 32773:
            piece = bytes(_packbits_decode(seg, share))
        elif compression == 5:
            piece = bytes(_tiff_lzw_decode(seg, share))
        elif compression in (8, 32946):  # Adobe/old Deflate: zlib per segment
            import zlib

            piece = zlib.decompressobj().decompress(seg, share + 1)
            if len(piece) != share:
                raise ValueError(
                    f"TIFF Deflate {what} is {len(piece)}+ bytes, expected {share}"
                )
        else:
            # uncompressed segments must be trimmed to their share:
            # word-aligning writers pad the byte counts, and appending
            # the padding would shift every later segment
            piece = seg
        if len(piece) < share:
            raise ValueError(
                f"TIFF {what} is {len(piece)} bytes, expected {share}"
            )
        return piece[:share]

    if tiled:
        # Tile layout (spec §15): the raster is a grid of FULL-SIZE
        # tiles (right/bottom edge tiles are padded, trimmed after
        # assembly); each tile compresses independently with the same
        # codec set as strips, and the horizontal predictor resets at
        # every tile's left edge — undone per tile BEFORE placement.
        if depth != 8:
            raise NotImplementedError(
                "tiled TIFF supported at 8-bit depth only"
            )
        for t in (322, 323, 324, 325):
            if t not in tags:
                raise ValueError(
                    "tiled TIFF missing TileWidth/Length/Offsets/ByteCounts"
                )
        tw, th = tags[322][0], tags[323][0]
        if tw <= 0 or th <= 0:
            raise ValueError(f"bad TIFF tile size {tw}x{th}")
        offs, cnts = tags[324], tags[325]
        across, down = -(-w // tw), -(-h // th)
        if len(offs) != across * down or len(cnts) != len(offs):
            raise ValueError(
                f"TIFF tile tables hold {len(offs)}/{len(cnts)} entries "
                f"for a {across}x{down} grid"
            )
        if across * tw * down * th > 4 * MAX_IMAGE_PIXELS:
            # grossly oversized tile dims vs the raster: bomb guard on
            # the PADDED canvas, not just the trimmed raster
            raise ValueError("TIFF tile grid exceeds the bomb guard")
        tile_bytes = tw * th * spp
        canvas = np.zeros((down * th, across * tw, spp), dtype=np.uint8)
        for t, (off, cnt) in enumerate(zip(offs, cnts)):
            if off + cnt > len(data):
                raise ValueError("truncated TIFF tile")
            piece = _decode_segment(data[off : off + cnt], tile_bytes, f"tile {t}")
            tile = np.frombuffer(piece, dtype=np.uint8).reshape(th, tw, spp)
            if predictor == 2:
                tile = (np.cumsum(tile.astype(np.int64), axis=1) % 256).astype(
                    np.uint8
                )
            ty, tx = divmod(t, across)
            canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = tile
        samples = canvas[:h, :w]
        if photometric == 3:
            if spp != 1:
                raise ValueError(f"paletted TIFF with {spp} samples per pixel")
            return palette_lookup(samples[:, :, 0])
        if photometric == 0 and spp == 1:  # WhiteIsZero grayscale
            return 255 - samples
        return samples

    try:
        strip_offs = tags[273]
        strip_counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    if len(strip_offs) != len(strip_counts):
        raise ValueError("TIFF strip offset/count tables disagree")
    stride = (w * spp * depth + 7) // 8  # rows are byte-aligned per spec
    expected = stride * h
    rps = tags.get(278, [h])[0]
    if rps <= 0:
        raise ValueError(f"bad TIFF RowsPerStrip {rps}")
    raw = bytearray()
    for k, (off, cnt) in enumerate(zip(strip_offs, strip_counts)):
        if off + cnt > len(data):
            raise ValueError("truncated TIFF strip")
        # each strip holds its own whole rows: share = rows-in-strip ×
        # stride (the LZW stream per strip ends exactly there)
        share = min(rps, h - k * rps) * stride
        if share <= 0:
            raise ValueError("more TIFF strips than rows")
        raw += _decode_segment(data[off : off + cnt], share, f"strip {k}")
    if len(raw) < expected:
        raise ValueError(f"TIFF pixel data is {len(raw)} bytes, expected {expected}")
    arr = np.frombuffer(bytes(raw[:expected]), dtype=np.uint8).reshape(h, stride)

    if depth == 1:
        bitorder = "little" if tags.get(266, [1])[0] == 2 else "big"  # FillOrder
        bitsarr = np.unpackbits(arr, axis=1, bitorder=bitorder)[:, :w]
        if photometric == 3:  # 1-bit paletted: bits ARE palette indices
            return palette_lookup(bitsarr)
        samples = (bitsarr * 255).astype(np.uint8)
        if photometric == 0:  # WhiteIsZero: 0 bit = white
            samples = 255 - samples
        return samples[:, :, None]
    samples = arr[:, : w * spp].reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: stored = px − left,
        # per channel per row; undo with a per-row cumulative sum mod
        # 256 (vectorized over the whole raster — strips hold whole
        # raster rows, so per-raster-row equals per-strip-row)
        samples = (np.cumsum(samples.astype(np.int64), axis=1) % 256).astype(
            np.uint8
        )
    if photometric == 3:
        if spp != 1:
            raise ValueError(f"paletted TIFF with {spp} samples per pixel")
        return palette_lookup(samples[:, :, 0])
    if photometric == 0 and spp == 1:  # WhiteIsZero grayscale
        return 255 - samples
    return samples


def _pil_decode(payload: bytes):
    """Codec-backed fallback for transform-coded formats the native
    decoders can't own (JPEG, WebP, ...). Import-gated: the swap-in
    point for a cluster with PIL/cv2 installed."""
    try:
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "transform-coded image decoding requires a codec (PIL/cv2) not "
            "present in this container; PPM/PGM/BMP/PNG/GIF/TIFF decode natively"
        ) from None
    import numpy as np

    try:
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception as e:  # UnidentifiedImageError etc. — keep the contract
        raise ValueError(f"undecodable image payload: {e}") from e


def decode_image(payload: bytes):
    """Decode an image payload → HxWxC uint8 numpy array.

    REAL for every format stdlib+numpy can honestly own: complete
    netpbm (P1-P4 bilevel/ASCII + P5 PGM → HxWx1, P3/P6 PPM → HxWx3,
    8-bit), uncompressed 24/32-bit BMP (bottom-up or top-down, row
    padding handled, BGR(A)→RGB(A)), and COMPLETE PNG (zlib inflate +
    all five scanline filters + every bit depth/color type +
    palette/tRNS + Adam7 interlacing, chunk CRCs verified) — no image
    library, pytest-verified round-trip against independently built
    pixel arrays — plus GIF (pure-Python LZW, first frame, interlace
    and GCE transparency), baseline TIFF (II/MM byte orders, strip
    assembly, PackBits RLE, LZW with the EarlyChange schedule and
    horizontal-differencing predictor, Adobe Deflate,
    gray/RGB/RGBA/palette/bilevel), QOI (the full spec-1.0 op set),
    and TGA 2.0 (uncompressed + RLE truecolor/gray/color-mapped,
    routed by the footer signature since TGA has no header magic).
    Formats that genuinely need a transform codec (JPEG, WebP, ...)
    dispatch to PIL when importable and stay a clearly-marked
    NotImplementedError otherwise (this container has no codec —
    swap-in point documented).

    Error contract (what a DLQ-style caller can rely on):
    NotImplementedError = the FORMAT needs a codec/feature this
    build lacks; ValueError = the payload claims a supported format
    but is malformed (truncated body, corrupt header, undecodable
    by PIL). Nothing else escapes."""
    if payload[:2] in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        try:
            return _decode_pnm(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed netpbm payload: {e}") from e
    if payload[:2] == b"BM":
        try:
            return _decode_bmp(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed BMP payload: {e}") from e
    if payload[:4] == b"\x00\x00\x01\x00":
        # unambiguous: a TGA cannot start 00 00 01 00 (image type 1
        # requires colormap type 1 in byte 1)
        try:
            return _decode_ico(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed ICO payload: {e}") from e
    if payload[:8] == _PNG_MAGIC:
        try:
            return _decode_png(payload)
        except Exception as e:
            raise ValueError(f"malformed PNG payload: {e}") from e
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        try:
            return _decode_gif(payload)
        except Exception as e:
            raise ValueError(f"malformed GIF payload: {e}") from e
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        try:
            return _decode_tiff(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed TIFF payload: {e}") from e
    if payload[:4] == b"qoif":
        try:
            return _decode_qoi(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed QOI payload: {e}") from e
    if payload[:8] == b"farbfeld":
        try:
            return _decode_farbfeld(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed farbfeld payload: {e}") from e
    if payload[:4] == struct.pack(">I", 0x59A66A95):
        from flink_hiveorc_spark.functions.rasters import decode_sun_raster

        try:
            return decode_sun_raster(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed Sun raster payload: {e}") from e
    if payload[:2] == b"\x01\xda":
        from flink_hiveorc_spark.functions.rasters import decode_sgi

        try:
            return decode_sgi(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed SGI payload: {e}") from e
    if payload[:4] == b"DDS ":
        from flink_hiveorc_spark.functions.rasters import decode_dds

        try:
            return decode_dds(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed DDS payload: {e}") from e
    if (
        len(payload) >= 128
        and payload[0] == 0x0A
        and payload[1] in (0, 2, 3, 4, 5)
        and payload[2] in (0, 1)
        and payload[3] in (1, 2, 4, 8)
    ):
        from flink_hiveorc_spark.functions.rasters import decode_pcx

        try:
            return decode_pcx(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed PCX payload: {e}") from e
    if (
        re.search(rb"#define\s+\S*width\s+\d+", payload[:512])
        and re.search(rb"#define\s+\S*height\s+\d+", payload[:512])
        and b"{" in payload
    ):
        # a bare '#define' prefix also matches arbitrary C source —
        # require the width/height defines plus a bits brace list
        # before claiming the payload as XBM (r12 advice), so C-like
        # text blobs fall through to the codec gate instead of
        # rebranding as 'malformed XBM'
        from flink_hiveorc_spark.functions.rasters import decode_xbm

        try:
            return decode_xbm(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed XBM payload: {e}") from e
    if payload[:2] == b"\x00\x00" and payload[2:4] not in (
        b"\x01\x00", b"\x02\x00"
    ):
        # WBMP type 0 has NO signature (00 00 w h ...), so — like the
        # footer-less-TGA precedent — it routes only when a full
        # plausibility decode succeeds; anything else falls to the
        # codec gate rather than risking a noise mis-classification
        from flink_hiveorc_spark.functions.rasters import decode_wbmp

        try:
            return decode_wbmp(payload, max_pixels=MAX_IMAGE_PIXELS)
        except Exception:
            pass  # fall through to the PIL gate
    if payload[-18:] == _TGA_FOOTER:
        try:
            return _decode_tga(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed TGA payload: {e}") from e
    if payload[:4] == b"\x00\x00\x02\x00" and _cur_plausible(payload):
        # CUR shares its magic with a footer-less truecolor TGA header
        # (00=no id, 00=no cmap, 02=truecolor, 00=cmap spec), so this
        # pattern routes to the icon decoder only when the ICONDIR
        # actually validates; otherwise it falls through to the PIL
        # gate exactly like any other signature-less TGA
        try:
            return _decode_ico(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed CUR payload: {e}") from e
    if payload[:2] == b"\xff\xd8":
        # baseline + progressive Huffman JPEG decodes natively (pure
        # numpy — DCT is not entropy coding); features outside that
        # envelope (arithmetic, lossless, 12-bit, CMYK) go to PIL
        # when importable and keep the native gap message otherwise
        try:
            return decode_jpeg(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError as native_gap:
            try:
                return _pil_decode(payload)
            except NotImplementedError:
                raise native_gap from None
        except Exception as e:
            raise ValueError(f"malformed JPEG payload: {e}") from e
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        # lossless VP8L decodes natively (prefix codes + LZ77 + the
        # four reversible transforms — pure numpy); lossy VP8 is a
        # transform codec and keeps the PIL gate
        from flink_hiveorc_spark.functions.webp import decode_webp

        try:
            return decode_webp(payload, max_pixels=MAX_IMAGE_PIXELS)
        except NotImplementedError as native_gap:
            try:
                return _pil_decode(payload)
            except NotImplementedError:
                raise native_gap from None
        except Exception as e:
            raise ValueError(f"malformed WebP payload: {e}") from e
    # formats needing a transform codec (AVIF/...): PIL only
    return _pil_decode(payload)


_IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)
_ERROR_FIELD = T.StructField("error", T.StringType())


def _quarantine_error(e: Exception) -> str:
    """Error-channel encoding for quarantine mode: the decode contract's
    two classes keep their identity so downstream can split 'needs a
    codec' (reprocess on a codec-equipped cluster) from 'corrupt blob'
    (true DLQ)."""
    kind = "unsupported" if isinstance(e, NotImplementedError) else "malformed"
    return f"{kind}: {e}"


def _stats_batches(
    batches: Iterator[pd.DataFrame], cols: tuple, featurize, quarantine: bool
) -> Iterator[pd.DataFrame]:
    """Shared decode→featurize iterator for every payload modality:
    `featurize(payload_bytes)` returns the feature dict keyed by
    cols[1:]; decode-contract failures (NotImplementedError =
    unsupported format, ValueError = malformed payload) either
    propagate (fail-fast default) or become a NULL-feature row with a
    classified `error` column (quarantine). One implementation holds
    the quarantine behavior for image/audio/any future modality."""
    for pdf in batches:
        out = {k: [] for k in cols + (("error",) if quarantine else ())}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            try:
                if payload is None:
                    # bytes(None) is a TypeError — outside the
                    # contract, so a NULL payload (outer join,
                    # pre-quarantined upstream) would escape the
                    # quarantine catch and kill the task
                    raise ValueError("null payload")
                feats = featurize(bytes(payload))
            except (NotImplementedError, ValueError) as e:
                if not quarantine:
                    raise
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(None)
                out["error"].append(_quarantine_error(e))
                continue
            out["doc_id"].append(doc_id)
            for k in cols[1:]:
                out[k].append(feats[k])
            if quarantine:
                out["error"].append(None)
        yield pd.DataFrame(out)


def _stats_df(
    payloads: DataFrame, schema: T.StructType, featurize, quarantine: bool
) -> DataFrame:
    cols = tuple(f.name for f in schema.fields)
    out_schema = (
        T.StructType(schema.fields + [_ERROR_FIELD]) if quarantine else schema
    )
    # The decode pass is the compute-heavy stage of every payload
    # modality; a small input (few files / one row group) otherwise
    # lands it on fewer tasks than the cluster has cores (the
    # unsplittable-input case — repartition right after the read). At
    # real scale the scan already carries >= defaultParallelism
    # partitions and this is a literal no-op; streaming frames pass
    # through untouched.
    narrowed = parallelize_small_scan(payloads.select("doc_id", "payload"))
    return narrowed.mapInPandas(
        lambda batches: _stats_batches(batches, cols, featurize, quarantine),
        out_schema,
    )


def _encoded_stats_df(
    src: DataFrame,
    payload_of,
    schema: T.StructType,
    featurize,
    quarantine: bool = False,
) -> DataFrame:
    """Fused encode→featurize for the fixture-encoder queries
    (office/CFB/EPUB/RTF): ONE mapInPandas pass computes
    ``featurize(payload_of(doc_id, source, text))`` per row instead
    of chaining an encoder pass and a `_stats_df` pass (guide §4:
    every Python stage pays a full JVM→worker→JVM round trip; the
    intermediate payload column only existed to be re-shipped to the
    next Python stage). Same builders, same parser, composed per
    row — bit-identical output (A/B'd rows-equal) at ~1.4× less wall
    (office 0.71–0.91 → 0.56–0.62 s at sf0.1) and half the exposure
    to Python-worker scheduling variance (the office bench median's
    documented bimodality). The standalone `*_stats` operators keep
    the (doc_id, payload) contract for real payload frames; this
    path is for queries that synthesize their own payloads row-wise.
    Quarantine contract identical to `_stats_df`."""
    cols = tuple(f.name for f in schema.fields)
    out_schema = (
        T.StructType(schema.fields + [_ERROR_FIELD]) if quarantine else schema
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols + (("error",) if quarantine else ())}
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                try:
                    feats = featurize(
                        bytes(payload_of(doc_id, source, text))
                    )
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    for k in cols[1:]:
                        out[k].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(feats[k])
                if quarantine:
                    out["error"].append(None)
            yield pd.DataFrame(out)

    narrowed = parallelize_small_scan(
        src.select("doc_id", "source", "text")
    )
    return narrowed.mapInPandas(run, out_schema)


def _image_features(payload: bytes) -> dict:
    """REAL decode → features: shape plus mean pixel byte from the
    decoded array — the actual resize/embed/feature step, exercised
    end-to-end on genuinely decoded pixels (not the fake). Exact
    mean: integer pixel sum / count, one final double division."""
    arr = decode_image(payload)
    return {
        "height": arr.shape[0],
        "width": arr.shape[1],
        "channels": arr.shape[2],
        "mean_byte": int(arr.sum(dtype="int64")) / arr.size,
    }


def image_stats(images: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed decode+featurize over an (doc_id, payload) frame of
    real image payloads. Column pruning keeps the blob column out of
    every plan that doesn't call this; Arrow streams the batches.

    ``quarantine=True`` is the 100 TB posture: one corrupt blob among
    billions must not kill the job, so decode failures become rows
    with NULL features and an `error` column ('unsupported: ...' /
    'malformed: ...' per the decode contract) — filter them into a
    DLQ table and keep going. Default raises (fail-fast for curated
    inputs)."""
    return _stats_df(images, _IMAGE_STATS_SCHEMA, _image_features, quarantine)


def decode_audio(payload: bytes):
    """Decode a WAV / AIFF(-C) / AU payload → (samples array of shape
    (n_frames, n_channels), sample_rate_hz).

    REAL for every entropy-free flavor stdlib+numpy can honestly own —
    pure struct/numpy chunk walking, no audio library, pytest-verified
    round-trip against independently serialized waveforms:
    - WAV: WAVE_FORMAT_EXTENSIBLE (0xFFFE) unwrapped to the SubFormat
      GUID's real format — multichannel/high-bit WAVs in the wild;
      format 1 integer PCM, 8/16/24/32-bit, any channel count (8-bit
      is unsigned per spec → uint8; 16/32 signed little-endian;
      24-bit 3-byte frames sign-extended → int32); format 3 IEEE
      float, 32/64-bit; formats 6/7 G.711 A-law/μ-law (expanded
      through the ITU G.711 decode tables → int16 linear); formats
      2/0x11 Microsoft/IMA ADPCM (fixed-table delta prediction, not
      entropy coding — block-parallel native expansion, 'fact'-chunk
      final-block trim).
    - AIFF / AIFF-C: big-endian signed PCM 8/16/24/32 (compression
      NONE/twos), 'sowt' (little-endian 16-bit, how Macs actually
      shipped AIFC), fl32/fl64 IEEE float, ulaw/alaw G.711, 'ima4'
      QuickTime IMA ADPCM (34-byte self-contained packets → 64
      samples); the COMM sample rate is the 80-bit IEEE extended
      float the format mandates, parsed natively.
    - AU (Sun/NeXT .snd): encodings 1 (μ-law), 2/3/4/5 (signed
      big-endian PCM 8/16/24/32), 6/7 (IEEE float 32/64), 27 (A-law).
    - CAF (Apple Core Audio Format): LPCM at 8/16/24/32-bit signed
      integer and 32/64-bit float, both endians per the desc flag
      bits, unsized read-to-EOF data chunks handled.
    FLAC decodes natively too (flac.py, r11): Rice-coded linear
    prediction is integer arithmetic, not a transform codec.
    Genuinely transform-coded formats (MP3, AAC, Vorbis, Opus...)
    raise a clearly-marked NotImplementedError — those need a codec
    this container lacks; a torchaudio/soundfile dispatch drops in
    here on a cluster that has one."""
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(payload)
    if payload[:4] == b".snd":
        return _decode_au(payload)
    if payload[:4] == b"caff":
        return _decode_caf(payload)
    if payload[:4] == b"fLaC":
        # FLAC is Rice-coded linear prediction — integer arithmetic,
        # not a transform codec, so it decodes natively (flac.py, r11)
        try:
            return decode_flac(payload)
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"malformed FLAC payload: {e}") from e
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed-audio decoding requires a codec not present in this "
            "container; uncompressed PCM WAV/AIFF/AU decodes natively"
        )
    return _decode_wav(payload)


def _decode_wav(payload: bytes):
    """RIFF/WAVE chunk walk (see decode_audio for the format matrix)."""
    import struct

    import numpy as np

    pos, fmt, data = 12, None, None
    fmt_body, fact, was_extensible = None, None, False
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # a declared size past EOF is silent data loss if sliced
            # short (wrong n_frames/duration/rms with no error) — the
            # image twin classifies this as malformed; so does audio
            raise ValueError(f"truncated WAV chunk {cid.decode('latin1')!r}")
        if cid == b"fmt ":
            if size < 16:  # struct.error is NOT a ValueError — check
                raise ValueError(f"truncated WAV fmt chunk ({size} bytes)")
            fmt_body = body
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: the real
                # format is the first two bytes of the SubFormat GUID
                # at offset 24 (cbSize≥22) — how multichannel and
                # high-bit-depth WAVs actually ship
                if size < 26:
                    raise ValueError(
                        f"truncated WAVE_FORMAT_EXTENSIBLE fmt chunk ({size} bytes)"
                    )
                sub = struct.unpack_from("<H", body, 24)[0]
                fmt = (sub,) + fmt[1:]
                was_extensible = True
        elif cid == b"data":
            data = body
        elif cid == b"fact" and size >= 4:
            # per-channel sample-frame count — authoritative for
            # block-coded formats whose final block carries padding
            fact = struct.unpack_from("<I", body, 0)[0]
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format in (0x0002, 0x0011):
        # Microsoft / IMA ADPCM: fixed-table delta prediction (NOT
        # entropy coding) — decoded natively below
        if was_extensible:
            # the 22-byte EXTENSIBLE extension cannot carry the ADPCM
            # coefficient/samples-per-block fields; no real encoder
            # emits this wrapping
            raise NotImplementedError(
                "ADPCM inside WAVE_FORMAT_EXTENSIBLE unsupported"
            )
        return _decode_adpcm_wav(audio_format, fmt_body, data, fact)
    supported = {
        (1, 8): np.dtype(np.uint8),
        (1, 16): np.dtype("<i2"),
        (1, 24): None,  # 3-byte packed: assembled below, not a numpy dtype
        (1, 32): np.dtype("<i4"),
        (3, 32): np.dtype("<f4"),
        (3, 64): np.dtype("<f8"),
        (6, 8): np.dtype(np.uint8),  # G.711 A-law
        (7, 8): np.dtype(np.uint8),  # G.711 μ-law
    }
    if (audio_format, bits) not in supported:
        raise NotImplementedError(
            f"only PCM/IEEE-float/G.711 WAV supported (format={audio_format}, "
            f"bits={bits})"
        )
    if n_ch < 1 or rate < 1:
        # malformed, not unsupported: 0 channels would ZeroDivide the
        # frame math and 0 Hz the duration downstream
        raise ValueError(f"malformed WAV fmt chunk (channels={n_ch}, rate={rate})")
    frame_bytes = n_ch * bits // 8
    if len(data) % frame_bytes:
        # a trailing partial frame means the data chunk was cut (or
        # the fmt header lies about channels/width); flooring it would
        # report wrong n_frames/duration with no error — the same
        # silent-data-loss class the truncated-chunk check above exists
        # to catch, so classify it malformed too
        raise ValueError(
            f"WAV data chunk is {len(data)} bytes, not a multiple of the "
            f"{frame_bytes}-byte frame (trailing partial frame)"
        )
    n_frames = len(data) // frame_bytes
    if bits == 24:  # 3-byte little-endian two's complement → int32
        b = np.frombuffer(data, dtype=np.uint8, count=n_frames * n_ch * 3)
        b = b.reshape(-1, 3).astype(np.int32)
        vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = vals - ((vals & 0x800000) << 1)  # sign-extend bit 23
        return samples.reshape(n_frames, n_ch), rate
    samples = np.frombuffer(data, dtype=supported[(audio_format, bits)], count=n_frames * n_ch)
    if audio_format in (6, 7):
        samples = _g711_table(audio_format)[samples]  # log-companded → int16
    return samples.reshape(n_frames, n_ch), rate


# IMA ADPCM reference constants (IMA Digital Audio Focus Group
# "Recommended Practices for Enhancing Digital Audio Compatibility",
# the same tables every DVI/IMA implementation ships): 89-entry step
# table and the 16-entry step-index adjustment.
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

# Microsoft ADPCM adaptation table (the MS "ADPCM" WAVE format
# specification's AdaptationTable) — scales iDelta after each nibble.
_MS_ADAPT_TABLE = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)


def _ima_expand(nibbles, predictor, index):
    """Sequential IMA ADPCM expansion — the reference algorithm: per
    nibble, diff = step/8 (+step/4 if bit0)(+step/2 if bit1)(+step if
    bit2), sign from bit3, predictor clamped to int16, step index
    moved by the adjust table and clamped to [0, 88] — vectorized
    across streams: `nibbles` is (n_streams, n_samples) uint8,
    `predictor`/`index` are (n_streams,) initial states. The python
    loop runs over SAMPLE POSITIONS ONLY; every block×channel stream
    advances in lockstep as one numpy vector, so cost is
    O(samples_per_block) iterations regardless of corpus size —
    blocks/packets are self-contained by design, which is exactly
    what makes the format decodable in parallel at 100 TB.

    Small payloads take a plain-scalar path instead: with few
    streams, numpy dispatch overhead dominates the arithmetic (the
    same measurement that drove the PNG unfilter's list path —
    here a 16-packet ima4 clip dropped ~4×), and per-sample numpy
    ops on a 16-wide vector are slower than 16·64 scalar steps.
    Both paths compute the identical integer recurrence
    (scalar-pin + hypothesis tests assert exact equality)."""
    import numpy as np

    if nibbles.size <= 4096:  # numpy-dispatch-bound regime
        out = np.empty(nibbles.shape, dtype=np.int16)
        nib_rows = nibbles.tolist()
        preds = [int(p) for p in predictor]
        idxs = [int(i) for i in index]
        for r, row in enumerate(nib_rows):
            pred = preds[r]
            idx = idxs[r]
            orow = out[r]
            for s, n in enumerate(row):
                step = _IMA_STEP_TABLE[idx]
                diff = step >> 3
                if n & 1:
                    diff += step >> 2
                if n & 2:
                    diff += step >> 1
                if n & 4:
                    diff += step
                pred = pred - diff if n & 8 else pred + diff
                if pred > 32767:
                    pred = 32767
                elif pred < -32768:
                    pred = -32768
                idx += _IMA_INDEX_ADJUST[n]
                if idx < 0:
                    idx = 0
                elif idx > 88:
                    idx = 88
                orow[s] = pred
        return out

    step_t = np.asarray(_IMA_STEP_TABLE, dtype=np.int32)
    adj_t = np.asarray(_IMA_INDEX_ADJUST, dtype=np.int32)
    predictor = predictor.astype(np.int32).copy()
    index = index.astype(np.int32).copy()
    out = np.empty(nibbles.shape, dtype=np.int16)
    for s in range(nibbles.shape[1]):
        n = nibbles[:, s].astype(np.int32)
        step = step_t[index]
        diff = (
            (step >> 3)
            + np.where(n & 1, step >> 2, 0)
            + np.where(n & 2, step >> 1, 0)
            + np.where(n & 4, step, 0)
        )
        predictor = predictor + np.where(n & 8, -diff, diff)
        np.clip(predictor, -32768, 32767, out=predictor)
        index = np.clip(index + adj_t[n], 0, 88)
        out[:, s] = predictor
    return out


def _ms_adpcm_expand(nibbles, coefs, s1, s2, delta):
    """Microsoft ADPCM expansion (the MS WAVE spec's pseudo-code):
    predictor = trunc((sample1·coeff1 + sample2·coeff2) / 256) +
    signed_nibble · iDelta, clamped to int16; iDelta rescaled by the
    adaptation table with a floor of 16. Integer division truncates
    toward zero (the spec's C `/ 256`), implemented as
    sign·(|x| >> 8). Same stream-vectorized shape as _ima_expand."""
    import numpy as np

    adapt = np.asarray(_MS_ADAPT_TABLE, dtype=np.int64)
    c1 = coefs[:, 0].astype(np.int64)
    c2 = coefs[:, 1].astype(np.int64)
    s1 = s1.astype(np.int64).copy()
    s2 = s2.astype(np.int64).copy()
    delta = delta.astype(np.int64).copy()
    out = np.empty(nibbles.shape, dtype=np.int16)
    for i in range(nibbles.shape[1]):
        raw = nibbles[:, i].astype(np.int64)
        signed = raw - ((raw & 8) << 1)  # 4-bit two's complement
        base = s1 * c1 + s2 * c2
        pred = np.sign(base) * (np.abs(base) >> 8) + signed * delta
        np.clip(pred, -32768, 32767, out=pred)
        s2 = s1
        s1 = pred
        t = adapt[raw] * delta
        delta = np.maximum(16, np.sign(t) * (np.abs(t) >> 8))
        out[:, i] = pred
    return out


def _decode_adpcm_wav(tag: int, fmt_body: bytes, data: bytes, fact):
    """WAV IMA/DVI (0x0011) and Microsoft (0x0002) ADPCM → (int16
    samples (n_frames, n_ch), rate). Fixed-table delta prediction is
    NOT entropy coding — stdlib+numpy owns it exactly like G.711.

    Block layout (both formats pad the stream to whole nBlockAlign
    blocks; every block header carries the complete predictor state,
    so blocks decode independently/in parallel):
    - IMA: per channel a 4-byte header (int16 initial sample, step
      index, reserved), then 4-byte-per-channel groups of
      low-nibble-first codes; wSamplesPerBlock counts the header
      sample plus expanded nibbles.
    - MS: per channel uint8 coefficient-pair index, int16 iDelta,
      int16 sample1, int16 sample2 (sample2 is the OLDER sample and
      is emitted first), then high-nibble-first codes alternating
      channels per nibble; the coefficient pairs come from the fmt
      extension's aCoef table.
    The 'fact' chunk's per-channel frame count trims final-block
    padding. A SHORT final block (whole state header + whole nibble
    groups) is accepted when a fact chunk bounds the frame count —
    how ffmpeg and many encoders actually ship streams whose length
    isn't a block multiple; without a fact chunk it stays classified
    malformed (indistinguishable from a cut stream)."""
    import struct

    import numpy as np

    _, n_ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt_body, 0
    )
    # bits first: a non-4-bit "ADPCM" header is an unsupported-format
    # classification (codec contract), regardless of how much of the
    # ADPCM fmt extension the chunk carries
    if bits != 4:
        raise NotImplementedError(
            f"{bits}-bit ADPCM unsupported (both WAV ADPCM formats are 4-bit)"
        )
    if len(fmt_body) < 20:
        raise ValueError(f"truncated ADPCM fmt chunk ({len(fmt_body)} bytes)")
    if n_ch < 1 or rate < 1:
        raise ValueError(f"malformed WAV fmt chunk (channels={n_ch}, rate={rate})")
    spb = struct.unpack_from("<H", fmt_body, 18)[0]
    if block_align < 1:
        raise ValueError(f"ADPCM nBlockAlign {block_align} invalid")
    rem = len(data) % block_align
    if rem:
        # Common encoders emit a SHORT final block, with the fact
        # chunk carrying the real frame count. Accept it when (a) a
        # fact chunk bounds the frames, (b) the tail still holds the
        # complete per-channel state header plus whole nibble groups,
        # and (c) fact fits inside what the tail actually carries —
        # then zero-pad to a whole block (the padding decodes junk
        # samples that the fact trim provably discards). Without a
        # fact chunk a partial block is indistinguishable from a cut
        # stream, and flooring it would silently report wrong
        # n_frames/duration — that stays malformed.
        hdr_b = (4 if tag == 0x0011 else 7) * n_ch
        if fact is None:
            raise ValueError(
                f"ADPCM data is {len(data)} bytes, not a multiple of the "
                f"{block_align}-byte block, and no fact chunk bounds the "
                "frame count (trailing partial block)"
            )
        group_ok = (
            (rem - hdr_b) % (4 * n_ch) == 0
            if tag == 0x0011
            else ((rem - hdr_b) * 2) % n_ch == 0
        )
        if rem < hdr_b or not group_ok:
            raise ValueError(
                f"ADPCM trailing block of {rem} bytes is not a state "
                f"header plus whole nibble groups for {n_ch} channel(s)"
            )
        if tag == 0x0011:
            tail_avail = (rem - hdr_b) // (4 * n_ch) * 8 + 1
        else:
            tail_avail = (rem - hdr_b) * 2 // n_ch + 2
        full_avail = (len(data) // block_align) * spb
        if fact > full_avail + min(tail_avail, spb):
            raise ValueError(
                f"WAV fact declares {fact} frames but the ADPCM blocks "
                f"(final block partial) hold only "
                f"{full_avail + min(tail_avail, spb)}"
            )
        data = data + b"\x00" * (block_align - rem)
    n_blocks = len(data) // block_align
    arr = np.frombuffer(data, dtype=np.uint8).reshape(n_blocks, block_align)
    if tag == 0x0011:
        header_bytes = 4 * n_ch
        if block_align <= header_bytes or (block_align - header_bytes) % (4 * n_ch):
            raise ValueError(
                f"IMA ADPCM nBlockAlign {block_align} invalid for "
                f"{n_ch} channel(s)"
            )
        avail = (block_align - header_bytes) // (4 * n_ch) * 8 + 1
        if not 1 <= spb <= avail:
            raise ValueError(
                f"IMA ADPCM wSamplesPerBlock {spb} outside 1..{avail}"
            )
        hdr = arr[:, :header_bytes].reshape(n_blocks, n_ch, 4).astype(np.int32)
        predictor = hdr[:, :, 0] | (hdr[:, :, 1] << 8)
        predictor -= (predictor & 0x8000) << 1  # sign-extend int16
        index = hdr[:, :, 2]
        if int(index.max(initial=0)) > 88:
            raise ValueError("IMA ADPCM step index out of range")
        body = arr[:, header_bytes:].reshape(n_blocks, -1, n_ch, 4)
        # low nibble first within each byte (the IMA WAV order)
        nib = np.stack([body & 0x0F, body >> 4], axis=-1).reshape(
            n_blocks, body.shape[1], n_ch, 8
        )
        nib = nib.transpose(0, 2, 1, 3).reshape(n_blocks * n_ch, -1)
        expanded = _ima_expand(
            nib[:, : spb - 1], predictor.reshape(-1), index.reshape(-1)
        ).reshape(n_blocks, n_ch, spb - 1)
        block_samples = np.concatenate(
            [predictor.astype(np.int16)[:, :, None], expanded], axis=2
        )
    else:  # 0x0002 Microsoft ADPCM
        header_bytes = 7 * n_ch
        if len(fmt_body) < 22:
            raise ValueError(
                f"truncated MS ADPCM fmt chunk ({len(fmt_body)} bytes)"
            )
        n_coef = struct.unpack_from("<H", fmt_body, 20)[0]
        if n_coef < 1 or len(fmt_body) < 22 + 4 * n_coef:
            raise ValueError(
                f"MS ADPCM fmt declares {n_coef} coefficient pairs in a "
                f"{len(fmt_body)}-byte chunk"
            )
        coefs = (
            np.frombuffer(fmt_body, dtype="<i2", count=2 * n_coef, offset=22)
            .reshape(n_coef, 2)
            .astype(np.int64)
        )
        nib_total = (block_align - header_bytes) * 2
        if block_align <= header_bytes or nib_total % n_ch:
            raise ValueError(
                f"MS ADPCM nBlockAlign {block_align} invalid for "
                f"{n_ch} channel(s)"
            )
        avail = nib_total // n_ch + 2
        if not 2 <= spb <= avail:
            raise ValueError(
                f"MS ADPCM wSamplesPerBlock {spb} outside 2..{avail}"
            )
        bpred = arr[:, :n_ch].astype(np.int64)
        if int(bpred.max(initial=0)) >= n_coef:
            raise ValueError("MS ADPCM predictor index out of range")
        h = arr[:, n_ch:header_bytes].astype(np.int32).reshape(
            n_blocks, 3, n_ch, 2
        )
        vals = h[..., 0] | (h[..., 1] << 8)
        vals -= (vals & 0x8000) << 1  # sign-extend int16
        idelta, s1, s2 = vals[:, 0], vals[:, 1], vals[:, 2]
        body = arr[:, header_bytes:]
        # high nibble first (the MS order), alternating channels
        nib = np.stack([body >> 4, body & 0x0F], axis=-1).reshape(n_blocks, -1)
        per_ch = (
            nib.reshape(n_blocks, -1, n_ch)
            .transpose(0, 2, 1)
            .reshape(n_blocks * n_ch, -1)
        )
        expanded = _ms_adpcm_expand(
            per_ch[:, : spb - 2],
            coefs[bpred.reshape(-1)],
            s1.reshape(-1),
            s2.reshape(-1),
            idelta.reshape(-1),
        ).reshape(n_blocks, n_ch, spb - 2)
        block_samples = np.concatenate(
            [
                s2.astype(np.int16)[:, :, None],
                s1.astype(np.int16)[:, :, None],
                expanded,
            ],
            axis=2,
        )
    samples = block_samples.transpose(0, 2, 1).reshape(-1, n_ch)
    if fact is not None:
        if fact > len(samples):
            raise ValueError(
                f"WAV fact declares {fact} frames but the ADPCM blocks "
                f"hold only {len(samples)}"
            )
        samples = samples[:fact]
    return samples, rate


def _decode_ima4(sound: bytes, n_ch: int, n_frames: int, rate: int):
    """AIFF-C 'ima4' (Apple QuickTime IMA): 34-byte packets per
    channel — a 2-byte big-endian state header (top 9 bits: the
    predictor's high bits, sign-extended; low 7 bits: step index) +
    32 bytes of low-nibble-first IMA codes → exactly 64 samples (the
    header state is NOT emitted as a sample, unlike WAV IMA). Packets
    are channel-interleaved and self-contained, so the whole stream
    decodes as one vectorized sample-position loop over
    packets×channels. COMM numSampleFrames trims the final packet's
    padding."""
    import numpy as np

    pkt_frame = 34 * n_ch
    if len(sound) % pkt_frame:
        raise ValueError(
            f"AIFC ima4 SSND is {len(sound)} bytes, not a multiple of the "
            f"{pkt_frame}-byte packet frame"
        )
    n_pkts = len(sound) // pkt_frame
    avail = n_pkts * 64
    if n_frames > avail:
        raise ValueError(
            f"AIFC ima4 SSND holds {avail} frames but COMM declares {n_frames}"
        )
    arr = np.frombuffer(sound, dtype=np.uint8).reshape(n_pkts, n_ch, 34)
    h = (arr[:, :, 0].astype(np.int32) << 8) | arr[:, :, 1]
    predictor = h & 0xFF80
    predictor -= (predictor & 0x8000) << 1  # sign-extend
    index = h & 0x7F
    if int(index.max(initial=0)) > 88:
        raise ValueError("AIFC ima4 step index out of range")
    body = arr[:, :, 2:]
    nib = np.stack([body & 0x0F, body >> 4], axis=-1).reshape(n_pkts * n_ch, 64)
    samples = _ima_expand(nib, predictor.reshape(-1), index.reshape(-1))
    frames = samples.reshape(n_pkts, n_ch, 64).transpose(0, 2, 1).reshape(-1, n_ch)
    return frames[:n_frames], rate


def _parse_f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF COMM sampleRate): 1 sign +
    15 exponent bits, then a 64-bit mantissa with an EXPLICIT integer
    bit. value = (-1)^s · m · 2^(e − 16383 − 63)."""
    import struct

    if len(b) != 10:
        raise ValueError(f"AIFF sample rate field is {len(b)} bytes, not 10")
    se, m = struct.unpack(">HQ", b)
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0x7FFF:
        raise ValueError("AIFF sample rate is infinity/NaN")
    if exp > 16500:
        # 2.0**(exp-16446) would OverflowError (not a contract error);
        # any such rate is absurd for audio — classify it malformed
        raise ValueError(f"AIFF sample rate exponent {exp} out of range")
    if m == 0:
        return 0.0
    return sign * m * 2.0 ** (exp - 16383 - 63)


def _decode_aiff(payload: bytes):
    """AIFF / AIFF-C IFF chunk walk: COMM (channels, frames, bits,
    80-bit-float rate, AIFC compression tag) + SSND (offset/blockSize
    header, then big-endian signed PCM). See decode_audio for the
    supported compression matrix ('ima4' included via _decode_ima4);
    genuinely entropy-coded AIFC variants (MACE, QDM2...) raise
    NotImplementedError."""
    import struct

    import numpy as np

    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from(">I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            # same silent-data-loss class as the WAV truncated-chunk
            # check: a declared size past EOF is malformed, not short
            raise ValueError(f"truncated AIFF chunk {cid.decode('latin1')!r}")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # IFF chunks pad to even offsets
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if len(comm) < 18:
        raise ValueError(f"truncated AIFF COMM chunk ({len(comm)} bytes)")
    n_ch, n_frames, bits = struct.unpack_from(">hIh", comm, 0)
    rate_f = _parse_f80(comm[8:18])
    comp = b"NONE"
    if payload[8:12] == b"AIFC":
        if len(comm) < 22:
            raise ValueError(f"truncated AIFC COMM chunk ({len(comm)} bytes)")
        comp = comm[18:22]
    if n_ch < 1 or rate_f < 1 or bits < 1:
        raise ValueError(
            f"malformed AIFF COMM chunk (channels={n_ch}, rate={rate_f}, "
            f"bits={bits})"
        )
    rate = int(round(rate_f))
    comp = comp.upper()
    if comp in (b"ULAW", b"ALAW"):
        sample_bytes = 1  # 8-bit log-companded codes regardless of COMM bits
    elif comp in (b"FL32", b"FL64"):
        sample_bytes = 4 if comp == b"FL32" else 8
    elif comp in (b"NONE", b"TWOS", b"SOWT"):
        if bits > 32:
            raise NotImplementedError(f"AIFF sampleSize {bits} unsupported")
        sample_bytes = (bits + 7) // 8
    elif comp == b"IMA4":
        sample_bytes = None  # packetized: handled right after SSND parse
    else:
        raise NotImplementedError(
            f"AIFC compression {comp.decode('latin1')!r} requires a codec "
            "not present in this container"
        )
    if len(ssnd) < 8:
        raise ValueError(f"truncated AIFF SSND chunk ({len(ssnd)} bytes)")
    offset, _block = struct.unpack_from(">II", ssnd, 0)
    sound = ssnd[8 + offset :]
    if comp == b"IMA4":
        return _decode_ima4(sound, n_ch, n_frames, rate)
    frame_bytes = n_ch * sample_bytes
    if len(sound) < n_frames * frame_bytes:
        raise ValueError(
            f"AIFF SSND holds {len(sound)} bytes but COMM declares "
            f"{n_frames} frames of {frame_bytes} bytes"
        )
    sound = sound[: n_frames * frame_bytes]
    if comp in (b"ULAW", b"ALAW"):
        codes = np.frombuffer(sound, dtype=np.uint8)
        samples = _g711_table(7 if comp == b"ULAW" else 6)[codes]
    elif comp in (b"FL32", b"FL64"):
        dt = ">f4" if comp == b"FL32" else ">f8"
        samples = np.frombuffer(sound, dtype=dt).astype(dt[1:])
    elif sample_bytes == 3:  # 24-bit big-endian two's complement
        b = np.frombuffer(sound, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        vals = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = vals - ((vals & 0x800000) << 1)
    else:
        dt = ("<" if comp == b"SOWT" else ">") + f"i{sample_bytes}"
        samples = np.frombuffer(sound, dtype=dt).astype(f"i{sample_bytes}")
    return samples.reshape(n_frames, n_ch), rate


def _decode_caf(payload: bytes):
    """Apple CAF container, LPCM only: 'caff' header, then 4cc + i64
    BE sized chunks — 'desc' (f64 sample rate, format 4cc, flag bits
    0=float/1=little-endian, layout fields) and 'data' (u32 edit
    count + samples). Integer LPCM is SIGNED at every width (8-bit
    included, unlike WAV); a 'data' size of -1 means read-to-EOF (how
    streaming writers leave it). Compressed CAF payloads ('aac ',
    'alac', ...) raise NotImplementedError."""
    import struct

    import numpy as np

    if len(payload) < 8:
        raise ValueError(f"truncated CAF header ({len(payload)} bytes)")
    pos, desc, data = 8, None, None
    while pos + 12 <= len(payload):
        ctype = payload[pos : pos + 4]
        size = struct.unpack_from(">q", payload, pos + 4)[0]
        pos += 12
        if size == -1:  # audio-data chunk may be unsized: rest of file
            if ctype != b"data":
                raise ValueError(f"unsized CAF chunk {ctype.decode('latin1')!r}")
            size = len(payload) - pos
        if size < 0 or pos + size > len(payload):
            raise ValueError(f"truncated CAF chunk {ctype.decode('latin1')!r}")
        body = payload[pos : pos + size]
        if ctype == b"desc":
            desc = body
        elif ctype == b"data":
            data = body
        pos += size
    if desc is None or data is None:
        raise ValueError("CAF missing desc/data chunk")
    if len(desc) < 32:
        raise ValueError(f"truncated CAF desc chunk ({len(desc)} bytes)")
    rate_f, fmt_id, flags, _bpp, _fpp, n_ch, bits = struct.unpack(
        ">d4sIIIII", desc[:32]
    )
    if fmt_id != b"lpcm":
        raise NotImplementedError(
            f"CAF format {fmt_id.decode('latin1')!r} requires a codec not "
            "present in this container"
        )
    if n_ch < 1 or not (1 <= rate_f <= 1e9):  # also rejects NaN/inf —
        # int(round(inf)) would OverflowError past the contract
        raise ValueError(
            f"malformed CAF desc (channels={n_ch}, rate={rate_f})"
        )
    is_float = bool(flags & 1)
    endian = "<" if flags & 2 else ">"
    if is_float and bits not in (32, 64):
        raise ValueError(f"CAF float LPCM with {bits} bits")
    if not is_float and bits not in (8, 16, 24, 32):
        raise NotImplementedError(f"CAF integer LPCM {bits}-bit unsupported")
    if len(data) < 4:
        raise ValueError("truncated CAF data chunk")
    sound = data[4:]  # u32 edit count precedes the samples
    frame_bytes = n_ch * bits // 8
    if len(sound) % frame_bytes:
        raise ValueError(
            f"CAF data is {len(sound)} bytes, not a multiple of the "
            f"{frame_bytes}-byte frame (trailing partial frame)"
        )
    n_frames = len(sound) // frame_bytes
    rate = int(round(rate_f))
    if bits == 24:
        b = np.frombuffer(sound, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        if endian == "<":
            vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        else:
            vals = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = vals - ((vals & 0x800000) << 1)
        return samples.reshape(n_frames, n_ch), rate
    kind = "f" if is_float else "i"
    dt = f"{endian}{kind}{bits // 8}"
    samples = np.frombuffer(sound, dtype=dt).astype(f"{kind}{bits // 8}")
    return samples.reshape(n_frames, n_ch), rate


# AU encoding → (bytes per sample, numpy dtype or None for 24-bit/G.711)
_AU_ENCODINGS = {
    1: (1, None),  # G.711 μ-law
    2: (1, "i1"),
    3: (2, ">i2"),
    4: (3, None),  # 24-bit packed big-endian
    5: (4, ">i4"),
    6: (4, ">f4"),
    7: (8, ">f8"),
    27: (1, None),  # G.711 A-law
}


def _decode_au(payload: bytes):
    """Sun/NeXT .snd: 24-byte big-endian header (magic, data offset,
    data size, encoding, rate, channels), then raw samples. See
    decode_audio for the encoding matrix; compressed encodings
    (ADPCM 23-26...) raise NotImplementedError."""
    import struct

    import numpy as np

    if len(payload) < 24:
        raise ValueError(f"truncated AU header ({len(payload)} bytes)")
    _, off, size, enc, rate, n_ch = struct.unpack_from(">6I", payload, 0)
    if enc not in _AU_ENCODINGS:
        raise NotImplementedError(
            f"AU encoding {enc} requires a codec not present in this container"
        )
    if off < 24 or n_ch < 1 or rate < 1:
        raise ValueError(
            f"malformed AU header (offset={off}, channels={n_ch}, rate={rate})"
        )
    data = payload[off:]
    if size != 0xFFFFFFFF:  # all-ones means "unknown, read to EOF"
        if len(data) < size:
            raise ValueError(
                f"AU header declares {size} data bytes but {len(data)} remain"
            )
        data = data[:size]
    sample_bytes, dt = _AU_ENCODINGS[enc]
    frame_bytes = n_ch * sample_bytes
    if len(data) % frame_bytes:
        raise ValueError(
            f"AU data is {len(data)} bytes, not a multiple of the "
            f"{frame_bytes}-byte frame (trailing partial frame)"
        )
    n_frames = len(data) // frame_bytes
    if enc in (1, 27):
        codes = np.frombuffer(data, dtype=np.uint8)
        samples = _g711_table(7 if enc == 1 else 6)[codes]
    elif enc == 4:  # 24-bit big-endian two's complement
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        vals = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        samples = vals - ((vals & 0x800000) << 1)
    else:
        samples = np.frombuffer(data, dtype=dt).astype(dt.lstrip(">"))
    return samples.reshape(n_frames, n_ch), rate


_G711_TABLES: dict = {}


def _g711_table(audio_format: int):
    """256-entry G.711 expansion table (byte code → int16 linear),
    built vectorized from the ITU-T G.711 bit-field definition.

    μ-law (format 7): complement the byte, then
    linear = ((mantissa·8 + 0x84) << exponent) − 0x84, negative when
    the complemented sign bit is set (max magnitude 32124).
    A-law (format 6): XOR 0x55, mantissa·16 (+8 in segment 0, +0x108
    then << seg−1 above), POSITIVE when bit 0x80 is set — A-law's
    sign convention is inverted vs μ-law (max magnitude 32256).
    Spot-pinned in tests against a scalar transliteration of the
    CCITT reference decoder and the silence codes (μ 0xFF → 0,
    A 0xD5 → +8)."""
    import numpy as np

    tab = _G711_TABLES.get(audio_format)
    if tab is not None:
        return tab
    codes = np.arange(256, dtype=np.int32)
    if audio_format == 7:  # μ-law
        u = codes ^ 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
        lin = np.where(u & 0x80, -mag, mag)
    else:  # A-law
        a = codes ^ 0x55
        seg = (a >> 4) & 0x07
        t = (a & 0x0F) << 4
        mag = np.where(seg == 0, t + 8, (t + 0x108) << (np.maximum(seg, 1) - 1))
        lin = np.where(a & 0x80, mag, -mag)
    tab = lin.astype(np.int16)
    _G711_TABLES[audio_format] = tab
    return tab


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _sum_of_squares_exact(samples) -> int:
    """Exact Σx² over an integer sample array, as a Python int.

    A plain int64 ``(x**2).sum()`` overflows for 32-bit PCM — one
    full-scale sample squares to 2^62, so TWO of them wrap the
    accumulator (observed: negative sums → complex RMS). Same cure as
    agg_corr_regr_battery's moment sums: hi/lo split x = q·2^16 + r,
    so Σx² = 2^32·Σq² + 2^17·Σqr + Σr², where every partial stays
    safely inside int64 (|q| ≤ 2^15 ⇒ q² ≤ 2^30; qr ≤ 2^31; r² < 2^32
    — headroom for > 2^30 samples per clip), and the three partials
    recombine in arbitrary-precision Python ints."""
    import numpy as np

    x = samples.astype("int64").ravel()
    q, r = np.divmod(x, 1 << 16)  # r in [0, 2^16) even for negative x
    return (
        (int((q * q).sum()) << 32)
        + (int((q * r).sum()) << 17)
        + int((r * r).sum())
    )


def _audio_features(payload: bytes) -> dict:
    """REAL decode → per-clip features: shape, duration, RMS amplitude
    from the decoded samples — the windowing/embedding step on
    genuinely decoded audio. RMS from an exact integer
    sum-of-squares, one final sqrt/divide; 8-bit PCM is centered
    (−128) first, because its zero level is 0x80 per spec — raw
    unsigned squaring would report rms=128 for digital silence and
    make the feature incomparable across bit depths."""
    import numpy as np

    samples, rate = decode_audio(payload)
    n, ch = samples.shape
    if samples.dtype.kind == "f":  # IEEE-float WAV: no exact integer
        # sum exists; float64 accumulation is the honest best
        # (error ~n·ulp, documented not hidden)
        x = samples.astype("float64").ravel()
        sq = float((x * x).sum())
    else:
        centered = (
            samples.astype(np.int16) - 128
            if samples.dtype == np.uint8
            else samples
        )
        sq = _sum_of_squares_exact(centered)
    # math.sqrt, NOT ** 0.5: pow(x, 0.5) is a libm pow call with no
    # correct-rounding guarantee and diverges from sqrt in the last
    # ulp (measured: 2/500 digest-payload clips, 1.4e-14), while
    # sqrt is IEEE-correctly-rounded everywhere — including the
    # oracle engine
    import math

    return {
        "sample_rate": rate,
        "n_frames": n,
        "n_channels": ch,
        "duration_s": n / rate,
        "rms": math.sqrt(sq / (n * ch)) if n else 0.0,
    }


def audio_stats(clips: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed decode+featurize over (doc_id, payload) audio clips
    (WAV/AIFF/AU/CAF — see decode_audio);
    same Arrow-batched mapInPandas shape as image_stats, including the
    opt-in `quarantine=True` error channel (NULL features + `error`
    column instead of a task-killing raise — see image_stats)."""
    return _stats_df(clips, _AUDIO_STATS_SCHEMA, _audio_features, quarantine)


_MEDIA_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("container", T.StringType()),
        T.StructField("brand", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_video", T.LongType()),
        T.StructField("n_audio", T.LongType()),
        T.StructField("codecs", T.StringType()),
    ]
)


def media_probe(assets: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed STRUCTURAL probe over (doc_id, payload) media
    assets (probe.py: ISO BMFF / Matroska-WebM) — container, brand,
    duration, dimensions, track layout, codec fourccs WITHOUT
    decoding any frame. This is the routing step a 100 TB video
    corpus runs before touching a codec: keep/drop decisions, GPU
    decode-pool dispatch by codec, duration budgeting. Same
    mapInPandas + quarantine contract as image/audio/video_stats."""
    return _stats_df(assets, _MEDIA_PROBE_SCHEMA, probe_media, quarantine)


_DECOMPRESS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("out_len", T.LongType()),
        T.StructField("in_len", T.LongType()),
        T.StructField("sum_byte", T.LongType()),
    ]
)

MAX_DECOMPRESSED_BYTES = 1 << 26


def _decompress_route(payload: bytes, max_out: int) -> tuple[str, bytes]:
    """Magic-routed decompression through the stdlib codecs, with an
    incremental output cap so a crafted bomb can never materialize
    more than `max_out` bytes (zlib/bz2/lzma all support max_length
    streaming)."""
    import bz2 as _bz2
    import lzma as _lzma
    import zlib as _zlib

    if payload[:2] == b"\x1f\x8b":
        out = bytearray()
        rest = bytes(payload)
        while rest:
            if rest[:2] != b"\x1f\x8b":
                raise ValueError("trailing garbage after a gzip member")
            d = _zlib.decompressobj(wbits=31)
            out += d.decompress(rest, max_out - len(out) + 1)
            if len(out) > max_out:
                raise ValueError(
                    f"decompressed output exceeds {max_out} bytes "
                    "(decompression-bomb guard)"
                )
            if not d.eof:
                raise ValueError("truncated gzip member")
            rest = d.unused_data
        return "gzip", bytes(out)
    if (
        len(payload) >= 2
        and (payload[0] & 0x0F) == 8
        and ((payload[0] << 8) | payload[1]) % 31 == 0
    ):
        d = _zlib.decompressobj(wbits=15)
        out = d.decompress(bytes(payload), max_out + 1)
        if len(out) > max_out:
            raise ValueError(
                f"decompressed output exceeds {max_out} bytes "
                "(decompression-bomb guard)"
            )
        if not d.eof:
            raise ValueError("truncated zlib stream")
        if d.unused_data:
            raise ValueError("trailing garbage after the zlib stream")
        return "zlib", out
    if payload[:3] == b"BZh":
        d = _bz2.BZ2Decompressor()
        out = bytearray(d.decompress(bytes(payload), max_out + 1))
        if len(out) > max_out:
            raise ValueError(
                f"decompressed output exceeds {max_out} bytes "
                "(decompression-bomb guard)"
            )
        if not d.eof:
            raise ValueError("truncated bzip2 stream")
        if d.unused_data:
            raise ValueError("trailing garbage after the bzip2 stream")
        return "bz2", bytes(out)
    if payload[:6] == b"\xfd7zXZ\x00":
        d = _lzma.LZMADecompressor(format=_lzma.FORMAT_XZ)
        out = bytearray(d.decompress(bytes(payload), max_out + 1))
        if len(out) > max_out:
            raise ValueError(
                f"decompressed output exceeds {max_out} bytes "
                "(decompression-bomb guard)"
            )
        if not d.eof:
            raise ValueError("truncated xz stream")
        if d.unused_data:
            raise ValueError("trailing garbage after the xz stream")
        return "xz", bytes(out)
    if payload[:4] in (b"\x28\xb5\x2f\xfd", b"\x04\x22\x4d\x18"):
        raise NotImplementedError(
            "zstd/lz4 payloads need a codec library this build lacks "
            "(stdlib covers gzip/zlib/bz2/xz)"
        )
    raise ValueError("unrecognized compressed payload magic")


def decompress_payload(
    payload: bytes, max_out: int = MAX_DECOMPRESSED_BYTES
) -> bytes:
    """Decompress a blob column value: gzip (incl. concatenated
    multi-member files, per RFC 1952 §2.2), zlib, bzip2, and xz via
    the stdlib codecs — each of which VERIFIES its integrity trailer
    (gzip CRC-32 + ISIZE, zlib Adler-32, bz2 stream CRC, xz check),
    so corruption classifies as ValueError, never silent garbage.
    zstd/lz4 are honestly codec-gated (NotImplementedError). At
    100 TB: compressed text shards arrive as binary columns
    (jsonl.gz in object storage, zlib-framed API payloads); this is
    the decode step in front of every text operator, map-only and
    bomb-guarded per blob."""
    try:
        return _decompress_route(payload, max_out)[1]
    except (NotImplementedError, ValueError):
        raise
    except Exception as e:  # stdlib codec errors (zlib.error, ...)
        raise ValueError(f"malformed compressed payload: {e}") from e


def _decompress_features(payload: bytes) -> dict:
    try:
        codec, out = _decompress_route(payload, MAX_DECOMPRESSED_BYTES)
    except (NotImplementedError, ValueError):
        raise
    except Exception as e:
        raise ValueError(f"malformed compressed payload: {e}") from e
    import numpy as _np

    return {
        "codec": codec,
        "out_len": len(out),
        "in_len": len(payload),
        "sum_byte": int(
            _np.frombuffer(out, dtype=_np.uint8).sum(dtype=_np.int64)
        ),
    }


def decompress_stats(blobs: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed decompress+featurize over (doc_id, payload) blobs —
    same mapInPandas + quarantine contract as the decode featurizers."""
    return _stats_df(blobs, _DECOMPRESS_SCHEMA, _decompress_features, quarantine)


def _crc32_tables(msg_len: int) -> tuple[int, list[bytes]]:
    """CRC-32 of an `msg_len`-byte message as a GF(2)-linear form:
    crc(m) = base ⊕ ⊕_i T_i[m_i] with base = crc(zeros) — the same
    wire-byte table construction as the Ogg page CRC legs."""
    import zlib as _zlib

    base = _zlib.crc32(bytes(msg_len))
    tables = []
    for i in range(msg_len):
        tbl = bytearray()
        for v in range(256):
            m = bytearray(msg_len)
            m[i] = v
            tbl += struct.pack(">I", _zlib.crc32(bytes(m)) ^ base)
        tables.append(bytes(tbl))
    return base, tables


def _stored_deflate(length: int) -> bytes:
    """One final DEFLATE stored block header for `length` content
    bytes: BFINAL=1/BTYPE=00 (3 bits, byte-aligned) + LEN + NLEN."""
    return bytes([0x01]) + struct.pack("<HH", length, length ^ 0xFFFF)


_GZIP_HDR = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"
_BZ2_CONTENT = b"bzip2 constant leg: decompress_stats external oracle"
_XZ_CONTENT = b"xz constant leg: decompress_stats external oracle!"


def _bz2_leg() -> bytes:
    import bz2 as _bz2

    return _bz2.compress(_BZ2_CONTENT, 1)


def _xz_leg() -> bytes:
    import lzma as _lzma

    return _lzma.compress(_XZ_CONTENT, format=_lzma.FORMAT_XZ)


_BZ2_PAYLOAD = _bz2_leg()
_XZ_PAYLOAD = _xz_leg()


@query(
    "multimodal_decompress_stats",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, doc_id % 5 AS m, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id, m, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    )
    SELECT doc_id,
           CASE m WHEN 0 THEN 'gzip' WHEN 1 THEN 'zlib' WHEN 2 THEN 'gzip'
                WHEN 3 THEN 'bz2' ELSE 'xz' END AS codec,
           CAST(CASE WHEN m <= 2 THEN 16
                     WHEN m = 3 THEN {len(_BZ2_CONTENT)}
                     ELSE {len(_XZ_CONTENT)} END AS BIGINT) AS out_len,
           CAST(CASE m WHEN 0 THEN 39 WHEN 1 THEN 27 WHEN 2 THEN 62
                     WHEN 3 THEN {len(_BZ2_PAYLOAD)}
                     ELSE {len(_XZ_PAYLOAD)} END AS BIGINT) AS in_len,
           CAST(CASE WHEN m <= 2 THEN sum(byte)
                     WHEN m = 3 THEN {sum(_BZ2_CONTENT)}
                     ELSE {sum(_XZ_CONTENT)} END AS BIGINT) AS sum_byte
    FROM b GROUP BY doc_id, m
    """,
)
def multimodal_decompress_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob decompression under the external oracle, doc_id % 5:
    0 gzip, one member whose DEFLATE body is a final STORED block
      carrying the 16 digest bytes — the trailer CRC-32 ships as a
      GF(2)-linear form of the digest (16 wire-byte table lookups
      XORed onto the zero-message CRC, the same construction as the
      Ogg page legs) and the stdlib VERIFIES it, so a wrong CRC
      table, stored-block header, or ISIZE kills the row;
    1 zlib, same stored block, Adler-32 trailer as MOD-FREE linear
      arithmetic (s1 = 1 + Σb ≤ 4081, s2 = 16 + Σ(16−i)·bᵢ ≤ 34696,
      both under 65521 — no modulus needed), big-endian per RFC 1950;
    2 gzip MULTI-MEMBER (RFC 1952 §2.2 concatenation): two members of
      8 digest bytes each with their own 8-position CRC tables;
    3 bzip2 and 4 xz: constant literal payloads compressed at build
      time (no stored mode exists in either format), pinning the
      stdlib decode path, integrity check, and length/sum accounting.
    All legs run through decompress_stats' REAL mapInPandas
    featurizer. Reference has no blob surface (SURVEY.md §0); need:
    100 TB text corpora arrive as compressed blobs (jsonl.gz shards,
    zlib API payloads) — decompression is the step in front of every
    text operator."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    base16, t16 = _crc32_tables(16)
    base8, t8 = _crc32_tables(8)

    def crc_le(base: int, tables: list, dvals: list):
        crc = F.lit(base).cast("long")
        for i, d in enumerate(dvals):
            lut = F.lit(tables[i]).substr(d * 4 + 1, F.lit(4))
            crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
        return F.concat(
            *(
                _int_byte(F.shiftright(crc, 8 * k).bitwiseAND(F.lit(255)))
                for k in range(4)
            )
        )

    content16 = F.concat(*db)
    gz0 = F.concat(
        F.lit(_GZIP_HDR + _stored_deflate(16)),
        content16,
        crc_le(base16, t16, dv),
        F.lit(struct.pack("<I", 16)),
    )
    s1 = F.lit(1)
    s2 = F.lit(16)
    for i in range(16):
        s1 = s1 + dv[i]
        s2 = s2 + dv[i] * (16 - i)
    zl1 = F.concat(
        F.lit(b"\x78\x01" + _stored_deflate(16)),
        content16,
        _int_be32(s2 * 65536 + s1),
    )
    mem_a = F.concat(
        F.lit(_GZIP_HDR + _stored_deflate(8)),
        F.concat(*db[:8]),
        crc_le(base8, t8, dv[:8]),
        F.lit(struct.pack("<I", 8)),
    )
    mem_b = F.concat(
        F.lit(_GZIP_HDR + _stored_deflate(8)),
        F.concat(*db[8:]),
        crc_le(base8, t8, dv[8:]),
        F.lit(struct.pack("<I", 8)),
    )
    m = F.col("doc_id") % 5
    payload = (
        F.when(m == 0, gz0)
        .when(m == 1, zl1)
        .when(m == 2, F.concat(mem_a, mem_b))
        .when(m == 3, F.lit(_BZ2_PAYLOAD))
        .otherwise(F.lit(_XZ_PAYLOAD))
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return decompress_stats(payloads)


def _raster_segments() -> dict[str, bytes]:
    """Constant header/trailer bytes for the legacy-raster rotation
    (r12), built from the published layouts independently of
    functions/rasters.py: a PCX header (8-bit, RLE, 4x4, identity
    gray VGA palette trailer), a Sun raster header (8-bit standard,
    4x4, no colormap -> gray), an SGI header (verbatim, 1 channel,
    8x2), the XBM text skeleton, the WBMP 8x4 prefix, and a DDS
    DXT1 4x4 header."""
    pcx_hdr = bytearray(128)
    pcx_hdr[0], pcx_hdr[1], pcx_hdr[2], pcx_hdr[3] = 0x0A, 5, 1, 8
    struct.pack_into("<4H", pcx_hdr, 4, 0, 0, 3, 3)
    pcx_hdr[65] = 1
    struct.pack_into("<H", pcx_hdr, 66, 4)
    gray_pal = bytes(v for v in range(256) for _ in range(3))
    sun_hdr = struct.pack(">8I", 0x59A66A95, 4, 4, 8, 16, 1, 0, 0)
    sgi_hdr = bytearray(512)
    struct.pack_into(">HBB", sgi_hdr, 0, 474, 0, 1)
    struct.pack_into(">4H", sgi_hdr, 4, 3, 8, 2, 1)
    dds_hdr = bytearray(128)
    dds_hdr[0:4] = b"DDS "
    struct.pack_into("<I", dds_hdr, 4, 124)
    struct.pack_into("<II", dds_hdr, 12, 4, 4)
    struct.pack_into("<I", dds_hdr, 76, 32)
    struct.pack_into("<I", dds_hdr, 80, 0x4)
    dds_hdr[84:88] = b"DXT1"
    return {
        "pcx_hdr": bytes(pcx_hdr),
        "pcx_tail": b"\x0c" + gray_pal,
        "sun_hdr": sun_hdr,
        "sgi_hdr": bytes(sgi_hdr),
        "xbm_pre": b"#define r_width 8\n#define r_height 4\n"
        b"static unsigned char r_bits[] = {0x",
        "xbm_sep": b",0x",
        "xbm_tail": b"};\n",
        "wbmp_pre": b"\x00\x00\x08\x04",
        "dds_hdr": bytes(dds_hdr),
    }


@query(
    "multimodal_raster_decode_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 6 AS m, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id, m, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    a AS (
      SELECT doc_id, m,
             sum(byte) AS s,
             sum(CASE WHEN i < 4 THEN bit_count(byte) ELSE 0 END) AS bc03,
             sum(CASE WHEN i BETWEEN 4 AND 7
                      THEN bit_count(byte & 85) ELSE 0 END) AS n1,
             max(CASE WHEN i = 0 THEN byte END)
               + 256 * max(CASE WHEN i = 1 THEN byte END) AS c0,
             max(CASE WHEN i = 2 THEN byte END)
               + 256 * max(CASE WHEN i = 3 THEN byte END) AS c1
      FROM b GROUP BY doc_id, m
    )
    SELECT doc_id,
           CAST(CASE m WHEN 2 THEN 2 ELSE 4 END AS BIGINT) AS height,
           CAST(CASE WHEN m IN (2, 3, 4) THEN 8 ELSE 4 END
                AS BIGINT) AS width,
           CAST(CASE WHEN m IN (0, 5) THEN 3 ELSE 1 END
                AS BIGINT) AS channels,
           CASE m
             WHEN 0 THEN CAST(s AS DOUBLE) / 16
             WHEN 1 THEN CAST(s AS DOUBLE) / 16
             WHEN 2 THEN CAST(s AS DOUBLE) / 16
             WHEN 3 THEN CAST(255 * (32 - bc03) AS DOUBLE) / 32
             WHEN 4 THEN CAST(255 * bc03 AS DOUBLE) / 32
             ELSE CAST(
               (16 - n1) * ((c0 // 2048) * 8 + (c0 // 2048) // 4
                          + ((c0 // 32) % 64) * 4 + ((c0 // 32) % 64) // 16
                          + (c0 % 32) * 8 + (c0 % 32) // 4)
               + n1 * ((c1 // 2048) * 8 + (c1 // 2048) // 4
                     + ((c1 // 32) % 64) * 4 + ((c1 // 32) % 64) // 16
                     + (c1 % 32) * 8 + (c1 % 32) // 4)
               AS DOUBLE) / 48 END AS mean_byte
    FROM a
    """,
)
def multimodal_raster_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The legacy/texture raster decoders (functions/rasters.py, r12)
    under the external oracle, doc_id % 6:
    0 PCX 8-bit RLE: every digest byte ships in the 2-byte run form
      (0xC1, v — mandatory for values >= 0xC0, legal for all), with
      an identity-gray VGA palette trailer -> RGB mean = sum/16;
    1 Sun raster, 8-bit standard, no colormap -> gray plane;
    2 SGI verbatim, 1 channel, 8x2, bottom-up rows (sum-invariant);
    3 XBM — a TEXT payload: the digest bytes render as lowercase hex
      literals inside the C source (wrong hex rendering, bit order,
      or ink convention flips the hash); set bit = 0 gray, LSB-first;
    4 WBMP type 0: same 4 digest bytes, MSB-first, 1 = 255 — legs 3/4
      share geometry but opposite conventions, so a bit-order or
      polarity swap between them cannot cancel;
    5 DDS DXT1: endpoint colors c0/c1 ARE digest bytes (RGB565 LE)
      and the 2-bit selectors are digest bytes masked to 0x55 (every
      texel picks an exact endpoint, so no oracle row depends on the
      S3TC interpolation rounding choice); mean from the bit-
      replicated 565 expansion weighted by selector popcount.
    Reference has no media surface (SURVEY.md §0); need: legacy web
    archives and game-asset corpora carry these formats, and DXT
    textures are the canonical GPU asset payload."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(8)
    ]
    seg = _raster_segments()
    pcx_parts = [F.lit(seg["pcx_hdr"])]
    for i in range(16):
        pcx_parts += [F.lit(b"\xc1"), db[i]]
    pcx_parts.append(F.lit(seg["pcx_tail"]))
    pcx = F.concat(*pcx_parts)
    sun = F.concat(F.lit(seg["sun_hdr"]), *db)
    sgi = F.concat(F.lit(seg["sgi_hdr"]), *db)
    hex2 = [
        F.lpad(F.lower(F.hex(dv[i])), 2, "0") for i in range(4)
    ]
    xbm_txt = F.concat(
        F.lit(seg["xbm_pre"].decode("latin1")),
        hex2[0],
        *[
            part
            for i in range(1, 4)
            for part in (F.lit(seg["xbm_sep"].decode("latin1")), hex2[i])
        ],
        F.lit(seg["xbm_tail"].decode("latin1")),
    )
    xbm = F.encode(xbm_txt, "UTF-8")
    wbmp = F.concat(F.lit(seg["wbmp_pre"]), *db[:4])
    dds = F.concat(
        F.lit(seg["dds_hdr"]),
        *db[:4],
        *[_int_byte(dv[i].bitwiseAND(F.lit(0x55))) for i in range(4, 8)],
    )
    m = F.col("doc_id") % 6
    payload = (
        F.when(m == 0, pcx)
        .when(m == 1, sun)
        .when(m == 2, sgi)
        .when(m == 3, xbm)
        .when(m == 4, wbmp)
        .otherwise(dds)
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return image_stats(payloads)


_BLOCKHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("blockhash", T.StringType()),
        T.StructField("n_dark_blocks", T.LongType()),
    ]
)


def blockhash_bits(payload: bytes, grid: int = 8) -> tuple[str, int]:
    """Perceptual image fingerprint, blockhash-class (Yang/Weng/
    Preneel, "Robust image hashing", blockhash.io family): decode →
    integer BT.601 luma → grid×grid block sums with floor(i·H/g)
    boundaries → bit i = (block i is brighter than the median block)
    — all integer arithmetic, no floats, so the hash is engine- and
    platform-exact. Median of the g² block VALUES uses the
    even-count convention 2·s > (m_lo + m_hi) (strict >, ties dark),
    keeping everything in integers. Returns (hex string of g² bits
    MSB-first, number of dark blocks).

    Near-dup use: Hamming-close hashes ⇒ visually-close images; pair
    generation buckets hash BANDS exactly like the MinHash LSH path
    (no all-pairs scan). 100 TB posture: map-only per blob, 16-byte
    output per image."""
    import numpy as np

    arr = decode_image(payload)
    h, w = arr.shape[:2]
    if h < grid or w < grid:
        raise ValueError(f"image {h}x{w} smaller than the {grid}x{grid} grid")
    if arr.shape[2] >= 3:
        r = arr[:, :, 0].astype(np.int64)
        g = arr[:, :, 1].astype(np.int64)
        b = arr[:, :, 2].astype(np.int64)
        luma = 299 * r + 587 * g + 114 * b  # BT.601 ×1000, exact
    else:
        luma = arr[:, :, 0].astype(np.int64) * 1000
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    sums = np.empty(grid * grid, dtype=np.int64)
    for by in range(grid):
        for bx in range(grid):
            block = luma[ys[by] : ys[by + 1], xs[bx] : xs[bx + 1]]
            # normalize by block area ×LCM so unequal blocks compare
            # fairly in exact integers: sum × (total/area)
            area = block.shape[0] * block.shape[1]
            sums[by * grid + bx] = int(block.sum()) * (h * w) // area
    order = np.sort(sums)
    n = grid * grid
    m_lo = int(order[(n - 1) // 2])
    m_hi = int(order[n // 2])
    bits = [(1 if 2 * int(v) > m_lo + m_hi else 0) for v in sums]
    val = 0
    for bit in bits:
        val = (val << 1) | bit
    hex_len = (n + 3) // 4
    return format(val, f"0{hex_len}x"), n - sum(bits)


def _blockhash_features(payload: bytes) -> dict:
    hx, dark = blockhash_bits(payload)
    return {"blockhash": hx, "n_dark_blocks": dark}


def image_blockhash(images: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed blockhash over (doc_id, payload) images — the
    image-side near-dup fingerprint (the dedup battery's text/
    embedding ops don't see pixels). Same quarantine contract."""
    return _stats_df(images, _BLOCKHASH_SCHEMA, _blockhash_features, quarantine)


@query(
    "multimodal_image_blockhash",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    blocks AS (
      -- 8x8 PGM, grid 8: every block is ONE pixel; pixel (r, c) for
      -- r in 0..7 is digest byte (2r + c div 4) bit-sliced? No — the
      -- payload repeats each digest byte 4 times per row pair: pixel
      -- value at (r, c) = byte[(r div 2) * 4 + (c div 2)] — a 4x4
      -- digest grid doubled to 8x8, so block sums equal byte*1000
      -- with the doubled grid collapsing back to the byte value.
      SELECT doc_id, i, byte * 1000 AS s FROM b
    ),
    med AS (
      SELECT doc_id,
             max(CASE WHEN rk = 8 THEN s END) AS m_lo,
             max(CASE WHEN rk = 9 THEN s END) AS m_hi
      FROM (
        SELECT doc_id, s,
               row_number() OVER (PARTITION BY doc_id ORDER BY s, i) AS rk
        FROM blocks
      ) GROUP BY doc_id
    ),
    bits AS (
      SELECT blocks.doc_id, blocks.i,
             CASE WHEN 2 * blocks.s > med.m_lo + med.m_hi
                  THEN 1 ELSE 0 END AS bit
      FROM blocks JOIN med ON med.doc_id = blocks.doc_id
    ),
    g AS (
      -- 16 digest positions -> 64 pixels: position i covers the four
      -- grid cells (2*(i div 4) + dr, 2*(i mod 4) + dc); emit each
      -- bit at its bit index 63 - cell
      SELECT doc_id,
             sum(bit * power_of_two) AS hash_val,
             64 - sum(bit) AS dark
      FROM (
        SELECT bits.doc_id, bits.bit,
               CAST(pow(2.0, 63 - ((2 * (bits.i // 4) + u.dr) * 8
                                  + 2 * (bits.i % 4) + u.dc))
                    AS HUGEINT) AS power_of_two
        FROM bits, (VALUES (0,0),(0,1),(1,0),(1,1)) AS u(dr, dc)
      ) GROUP BY doc_id
    )
    SELECT doc_id,
           lpad(lower(hex(CAST(hash_val AS HUGEINT))), 16, '0') AS blockhash,
           CAST(dark AS BIGINT) AS n_dark_blocks
    FROM g
    """,
)
def multimodal_image_blockhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blockhash fingerprint under the external oracle: each doc
    ships an 8×8 P5 PGM whose pixels are the 16 digest bytes each
    doubled 2×2 (pixel (r,c) = byte[(r div 2)·4 + (c div 2)]), so
    with the default 8×8 grid every block is one pixel and the block
    sums collapse to byte·1000 — the median rank logic, strict-
    greater tie convention, bit order (MSB-first row-major), and hex
    rendering are all pinned by pure digest arithmetic. A luma-
    weight, boundary, median, or endianness divergence flips the
    hash."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    db = [
        F.unhex(F.substring(F.col("hx"), 2 * i + 1, 2)) for i in range(16)
    ]
    parts = [F.lit(b"P5\n8 8\n255\n")]
    for r in range(8):
        for c in range(8):
            parts.append(db[(r // 2) * 4 + (c // 2)])
    payloads = docs.select(
        "doc_id", F.concat(*parts).alias("payload")
    )
    return image_blockhash(payloads)


def image_blockhash_pairs(
    hashes: DataFrame,
    bands: int = 4,
    max_hamming: int = 8,
    band_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate IMAGE pairs from blockhash fingerprints:
    banded-bucket candidate generation (split the 16-hex-char hash
    into `bands` substrings; only docs sharing at least one exact
    band ever meet — the MinHash-LSH shape, never all-pairs) then an
    exact Hamming filter computed nibble-wise on the hex strings
    (engine-portable: no 64-bit unsigned arithmetic). Input:
    (doc_id, blockhash). Output: (doc_a, doc_b, hamming).

    `band_cap` is the hot-band guard (r12 verdict; the df_cap
    semantics from the shingle path, dedup.py): a degenerate corpus —
    thousands of identical or near-black images — puts every doc in
    the same (band_idx, band_val) bucket and the band self-join
    degenerates to all-pairs WITHIN that bucket (k docs → k²/2
    candidate rows per hot band). With band_cap=c, bands shared by
    more than c docs are dropped before the join, bounding candidates
    at bands·c²/2 per bucket. Loss bound: a pair is missed only if
    EVERY band both docs share is hot — for genuinely distinct
    near-dups that is the boilerplate-only-pair case (a band carried
    by >c docs identifies nothing); for exact-duplicate floods the
    dropped pairs are precisely the quadratic duplicate×duplicate
    grid a downstream exact-dedup pass (L1) already removes at linear
    cost. The oracle-checked query runs uncapped, like the shingle
    precedent."""
    width = 16 // bands
    ex = hashes.select(
        "doc_id",
        F.col("blockhash").alias("h"),
        F.posexplode(
            F.array(
                *[
                    F.substring("blockhash", i * width + 1, width)
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if band_cap is not None:
        from pyspark.sql.window import Window as _W

        # repartition puts the frame on the join key so the window
        # count adds NO extra shuffle and both self-join sides reuse
        # the same exchange (the shingle df_cap plan shape)
        ex = ex.repartition(F.col("band_idx"), F.col("band_val"))
        n_docs = F.count("*").over(_W.partitionBy("band_idx", "band_val"))
        ex = (
            ex.select("*", n_docs.alias("_bf"))
            .filter(F.col("_bf") <= band_cap)
            .drop("_bf")
        )
    a = ex.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h").alias("ha"),
        "band_idx",
        "band_val",
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h").alias("hb"),
        "band_idx",
        "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    ham = None
    for i in range(16):
        na = F.conv(F.substring("ha", i + 1, 1), 16, 10).cast("int")
        nb = F.conv(F.substring("hb", i + 1, 1), 16, 10).cast("int")
        term = F.bit_count(na.bitwiseXOR(nb))
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


@query(
    "dedup_image_blockhash_pairs",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 4 < 2
                      THEN CAST(doc_id - (doc_id % 2) AS VARCHAR)
                      ELSE CAST(doc_id AS VARCHAR) END) AS hx
      FROM documents
    ),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM base, UNNEST(range(0, 16)) AS t(i)
    ),
    med AS (
      SELECT doc_id,
             max(CASE WHEN rk = 8 THEN s END) AS m_lo,
             max(CASE WHEN rk = 9 THEN s END) AS m_hi
      FROM (
        SELECT doc_id, byte * 1000 AS s,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY byte * 1000, i) AS rk
        FROM b
      ) GROUP BY doc_id
    ),
    g AS (
      SELECT b.doc_id,
             sum(CASE WHEN 2 * b.byte * 1000 > med.m_lo + med.m_hi
                      THEN CAST(pow(2.0, 63 - ((2 * (b.i // 4) + u.dr) * 8
                                             + 2 * (b.i % 4) + u.dc))
                           AS HUGEINT) ELSE 0 END) AS hash_val
      FROM b JOIN med ON med.doc_id = b.doc_id,
           (VALUES (0,0),(0,1),(1,0),(1,1)) AS u(dr, dc)
      GROUP BY b.doc_id
    ),
    hx AS (
      SELECT doc_id,
             lpad(lower(hex(CAST(hash_val AS HUGEINT))), 16, '0') AS h
      FROM g
    ),
    ex AS (
      SELECT doc_id, h, k AS band_idx, substr(h, k * 4 + 1, 4) AS band_val
      FROM hx, UNNEST(range(0, 4)) AS r(k)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
             a.h AS ha, b2.h AS hb
      FROM ex a JOIN ex b2
        ON a.band_idx = b2.band_idx AND a.band_val = b2.band_val
       AND a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b,
           CAST((
             SELECT sum(bit_count(
               xor(strpos('0123456789abcdef', substr(ha, j, 1)) - 1,
                   strpos('0123456789abcdef', substr(hb, j, 1)) - 1)))
             FROM UNNEST(range(1, 17)) AS n(j)
           ) AS BIGINT) AS hamming
    FROM cand
    WHERE (
      SELECT sum(bit_count(
        xor(strpos('0123456789abcdef', substr(ha, j, 1)) - 1,
            strpos('0123456789abcdef', substr(hb, j, 1)) - 1)))
      FROM UNNEST(range(1, 17)) AS n(j)
    ) <= 8
    """,
)
def dedup_image_blockhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs end-to-end under the external oracle:
    every doc ships an 8×8 PGM derived from md5 of its PAIR KEY
    (docs with doc_id % 4 < 2 share the key doc_id−(doc_id%2) —
    guaranteed exact-duplicate images at Hamming 0; the rest hash
    their own id — random 64-bit fingerprints whose band collisions,
    if any, are filtered by the Hamming cut), decodes through the
    real blockhash path, and pairs via 4-band buckets + nibble-wise
    Hamming ≤ 8. The oracle replicates decode-free digest arithmetic
    for the hash AND the full pair pipeline."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    key = F.when(
        F.col("doc_id") % 4 < 2,
        (F.col("doc_id") - F.col("doc_id") % 2).cast("string"),
    ).otherwise(F.col("doc_id").cast("string"))
    hx = F.md5(key)
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    parts = [F.lit(b"P5\n8 8\n255\n")]
    for r in range(8):
        for c in range(8):
            parts.append(db[(r // 2) * 4 + (c // 2)])
    payloads = docs.select("doc_id", F.concat(*parts).alias("payload"))
    hashes = image_blockhash(payloads).select("doc_id", "blockhash")
    return image_blockhash_pairs(hashes)


@query(
    "multimodal_webp_animation_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 12)) AS t(i)
    ),
    f AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS frame_idx, sum(byte) AS sb
      FROM b WHERE i < 8 GROUP BY doc_id
      UNION ALL
      SELECT doc_id, CAST(1 AS BIGINT) AS frame_idx,
             sum(CASE WHEN i IN (0, 1, 4, 5, 8, 9, 10, 11) THEN byte
                      ELSE 0 END) AS sb
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, frame_idx,
           CAST(2 AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS channels,
           CAST(sb AS DOUBLE) / 8 AS mean_byte
    FROM f
    """,
)
def multimodal_webp_animation_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANIMATED-WEBP compositing under the external oracle (r12) —
    the VP8X/ANIM/ANMF twin of the GIF and APNG animation queries,
    SAME oracle, same expected canvases: per document a 2-frame
    lossless animation on a 4×2 canvas — frame 1 the full rect of
    digest bytes 0..7, frame 2 a 2×2 sub-rect at (2,0) of bytes
    8..11, both with blending method 1 (overwrite) so the composite
    is integer-exact. Frames are the subtract-green VP8L
    construction (gray: r = b = g after the inverse), each pixel one
    bit-reversed stream byte; the ANMF even-offset rule (stored
    x = 1 → pixel x = 2), frame-geometry cross-check against the
    VP8L header, chunk padding, and the VP8X animation flag are all
    on the decode path. The payload fans out through
    `gif_frame_sample` (which routes RIFF/WEBP to
    decode_webp_frames) into `image_stats`. A placement, blend-flag,
    offset-doubling, chunk-walk, or compositing divergence flips the
    hash."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    seg = _vp8l_segments()
    rev = F.lit(seg["rev"])
    dv = [
        F.conv(F.substring(F.col("hx"), 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(12)
    ]

    def lk(i):
        return rev.substr(dv[i] + 1, F.lit(1))

    def anmf_const(x_px, y_px, w_, h_, hdr: bytes, n_units: int) -> tuple:
        """(constant ANMF prefix through the VP8L header, pad bytes
        after the digest units)."""
        chunk_len = 1 + len(hdr) + n_units
        sub_pad = b"\x00" if chunk_len & 1 else b""
        body_len = 16 + 8 + chunk_len
        anmf_pad = b"\x00" if body_len & 1 else b""
        prefix = (
            b"ANMF" + struct.pack("<I", body_len)
            + (x_px // 2).to_bytes(3, "little")
            + (y_px // 2).to_bytes(3, "little")
            + (w_ - 1).to_bytes(3, "little")
            + (h_ - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")
            + bytes([0x02])  # blending method 1 (overwrite)
            + b"VP8L" + struct.pack("<I", chunk_len) + b"\x2f" + hdr
        )
        return prefix, sub_pad + anmf_pad

    pre1, pad1 = anmf_const(0, 0, 4, 2, seg["anim1_hdr"], 8)
    pre2, pad2 = anmf_const(2, 0, 2, 2, seg["anim2_hdr"], 4)
    # total chunk bytes after "WEBP": VP8X(8+10) + ANIM(8+6) + both
    # ANMF chunks (prefix already includes their VP8L headers)
    chunks_len = (
        8 + 10 + 8 + 6
        + len(pre1) + 8 + len(pad1)
        + len(pre2) + 4 + len(pad2)
    )
    vp8x = (
        b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 3
        + (3).to_bytes(3, "little") + (1).to_bytes(3, "little")
    )
    anim = b"ANIM" + struct.pack("<I", 6) + b"\x00" * 4 + struct.pack("<H", 0)
    riff = b"RIFF" + struct.pack("<I", 4 + chunks_len) + b"WEBP"
    payload = F.concat(
        F.lit(riff + vp8x + anim + pre1),
        *[lk(i) for i in range(8)],
        F.lit(pad1 + pre2),
        *[lk(i) for i in range(8, 12)],
        F.lit(pad2),
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    frames = gif_frame_sample(payloads)
    packed = frames.select(
        (F.col("doc_id") * 2 + F.col("frame_idx")).alias("doc_id"), "payload"
    )
    stats = image_stats(packed)
    return stats.select(
        (F.col("doc_id") / 2).cast("long").alias("doc_id"),
        (F.col("doc_id") % 2).alias("frame_idx"),
        "height",
        "width",
        "channels",
        "mean_byte",
    )


# RIFF chunk iteration is shared with the structural AVI probe —
# one walker, one set of size-validation semantics (probe.riff_chunks).
_avi_chunks = riff_chunks


def _decode_avi(payload: bytes):
    """Uncompressed AVI: RIFF('AVI ') → LIST hdrl (avih + per-stream
    LIST strl: strh/strf) → LIST movi ('00db'/'00dc' frame chunks,
    'rec ' groups descended). Streams supported without a codec:
    BI_RGB device-independent bitmaps at 24/32 bpp (bottom-up rows
    padded to 4 bytes; luma derived as the exact-integer BT.601 sum
    (299R+587G+114B+500)//1000, documented since AVI RGB has no Y
    plane to return) and planar 4:2:0 fourccs I420/IYUV/YV12 (the Y
    plane returned as-is — YV12 differs from I420 only in chroma
    order). Compressed fourccs (MJPG/XVID/H264...) raise
    NotImplementedError; fps comes from strh dwRate/dwScale with the
    avih frame interval as fallback, zero/negative classified
    malformed."""
    import struct

    import numpy as np

    strh = strf = None
    fps = None
    movi = None
    for fourcc, body, size in _avi_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST":
            ltype = payload[body : body + 4]
            if ltype == b"hdrl":
                for f2, b2, s2 in _avi_chunks(payload, body + 4, body + size):
                    if f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                        sh = sf = None
                        for f3, b3, s3 in _avi_chunks(payload, b2 + 4, b2 + s2):
                            if f3 == b"strh":
                                sh = payload[b3 : b3 + s3]
                            elif f3 == b"strf":
                                sf = payload[b3 : b3 + s3]
                        if sh is not None and sh[:4] == b"vids" and strh is None:
                            strh, strf = sh, sf
            elif ltype == b"movi":
                movi = (body + 4, body + size)
    if strh is None or strf is None:
        raise ValueError("AVI has no video stream header (strh/strf)")
    if movi is None:
        raise ValueError("AVI has no movi list")
    if len(strh) >= 28:
        scale, rate = struct.unpack_from("<II", strh, 20)
        if scale and rate:
            fps = rate / scale
    if fps is None or fps <= 0:
        raise ValueError("AVI video stream has no usable frame rate")
    if len(strf) < 40:
        raise ValueError(f"truncated AVI BITMAPINFOHEADER ({len(strf)} bytes)")
    w, h_signed = struct.unpack_from("<ii", strf, 4)
    bpp = struct.unpack_from("<H", strf, 14)[0]
    compression = strf[16:20]
    top_down = h_signed < 0
    h = abs(h_signed)
    if w < 1 or h < 1:
        raise ValueError(f"bad AVI dimensions {w}x{h_signed}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"AVI {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    comp_int = struct.unpack("<I", compression)[0]
    if comp_int == 0:  # BI_RGB
        if bpp not in (24, 32):
            raise NotImplementedError(f"{bpp}-bit BI_RGB AVI unsupported")
        cspace = f"rgb{bpp}"
        stride = (w * bpp // 8 + 3) & ~3
        frame_bytes = stride * h
    elif compression in (b"I420", b"IYUV", b"YV12"):
        cspace = compression.decode("ascii").lower()
        frame_bytes = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    else:
        raise NotImplementedError(
            f"AVI fourcc {compression.decode('latin1')!r} requires a codec "
            "not present in this container"
        )
    lumas = []

    def eat(pos: int, end: int) -> None:
        for fourcc, body, size in _avi_chunks(payload, pos, end):
            if fourcc == b"LIST" and payload[body : body + 4] == b"rec ":
                eat(body + 4, body + size)
                continue
            if fourcc not in (b"00db", b"00dc"):
                continue  # other streams ('01wb' audio), 'JUNK', indexes
            if size < frame_bytes:
                raise ValueError(
                    f"truncated AVI frame {len(lumas)} ({size} of "
                    f"{frame_bytes} bytes)"
                )
            if comp_int == 0:
                nch = bpp // 8
                rows = np.frombuffer(
                    payload, dtype=np.uint8, count=stride * h, offset=body
                ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
                if not top_down:
                    rows = rows[::-1]
                b16 = rows.astype(np.int32)
                # DIB byte order is BGR(A); exact-integer BT.601 luma
                y = (
                    299 * b16[:, :, 2] + 587 * b16[:, :, 1] + 114 * b16[:, :, 0] + 500
                ) // 1000
                lumas.append(y.astype(np.uint8))
            else:
                lumas.append(
                    np.frombuffer(
                        payload, dtype=np.uint8, count=w * h, offset=body
                    ).reshape(h, w)
                )

    eat(*movi)
    if not lumas:
        raise ValueError("AVI movi list has no video frames")
    return np.stack(lumas), fps, cspace


def decode_video(payload: bytes):
    """Decode a YUV4MPEG2 (.y4m) or uncompressed AVI payload → (luma
    frames array of shape (n_frames, h, w) uint8, fps float,
    colorspace str).

    Y4M is the standard UNCOMPRESSED video interchange container
    (yuv4mpeg, mjpegtools lineage): an ASCII stream header
    ``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<space>\\n`` followed by
    ``FRAME[ params]\\n`` + raw planar YUV per frame — no entropy
    coding anywhere, so stdlib+numpy owns it completely. Supported
    colorspaces (matched EXACTLY, so C420p10 ≠ C420 and C444alpha ≠
    C444): the four 8-bit 4:2:0 chroma-siting variants, C422, C444,
    C444alpha (4 planes), Cmono; 10/12-bit variants raise
    NotImplementedError. The luma plane is
    returned per frame (chroma is sampling-variant and rarely
    feature-relevant); frames must be complete or the payload is
    malformed. Compressed video (MP4/H.264, WebM/VP9, MKV...)
    raises NotImplementedError — those genuinely need a transform
    codec; a PyAV/ffmpeg dispatch drops in here on a cluster that
    has one."""
    import numpy as np

    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _decode_avi(payload)
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "compressed-video decoding requires a codec (PyAV/ffmpeg) not "
            "present in this container; uncompressed Y4M and BI_RGB/"
            "I420/YV12 AVI decode natively"
        )
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    w = h = None
    fps = 30.0
    cspace = "420"
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            if int(num) <= 0 or int(den) <= 0:
                # fps=0 would ZeroDivide duration downstream (escaping
                # the decode contract); negative is nonsense
                raise ValueError(f"bad Y4M frame rate {val.decode('latin1')!r}")
            fps = int(num) / int(den)
        elif tag == b"C":
            cspace = val.decode("ascii", "replace")
    if w is None or h is None or w <= 0 or h <= 0:
        # the ASCII header can carry SIGNED ints: W-1 passes a
        # truthiness check, makes frame_bytes negative, and walks the
        # frame cursor BACKWARDS — an unkillable infinite loop, not an
        # exception. Reject explicitly.
        raise ValueError(f"bad Y4M dimensions W={w} H={h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"Y4M {w}x{h} exceeds MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS} "
            "(decompression-bomb guard)"
        )
    # exact colorspace table: startswith would misframe C444alpha as
    # C444 (classifying a valid file malformed) and 10/12-bit C420p10
    # as 8-bit C420. The 420 chroma-siting variants genuinely share
    # one byte layout; nothing else generalizes by prefix.
    if cspace in ("420", "420jpeg", "420paldv", "420mpeg2"):
        frame_bytes = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cspace == "422":
        frame_bytes = w * h + 2 * ((w + 1) // 2) * h
    elif cspace == "444":
        frame_bytes = 3 * w * h
    elif cspace == "444alpha":
        frame_bytes = 4 * w * h  # Y U V A planes; luma still first
    elif cspace == "mono":
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"Y4M colorspace C{cspace} not supported")
    pos, lumas = nl + 1, []
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad Y4M frame marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        start = fnl + 1
        if start + frame_bytes > len(payload):
            raise ValueError(
                f"truncated Y4M frame {len(lumas)} ({len(payload) - start} of "
                f"{frame_bytes} bytes)"
            )
        lumas.append(
            np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=start).reshape(
                h, w
            )
        )
        pos = start + frame_bytes
    if not lumas:
        raise ValueError("Y4M stream has no frames")
    return np.stack(lumas), fps, cspace


_VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("mean_frame_delta", T.DoubleType()),
    ]
)


def _video_features(payload: bytes) -> dict:
    """REAL decode → per-clip features: geometry, duration, mean luma
    (exposure/black-clip signal), and mean absolute inter-frame luma
    delta (temporal activity — the standard static-clip/slideshow
    filter signal). Exact integer sums, final double divisions."""
    import numpy as np

    frames, fps, _ = decode_video(payload)
    n, h, w = frames.shape
    total = int(frames.sum(dtype="int64"))
    if n > 1:
        a = frames[1:].astype("int16") - frames[:-1].astype("int16")
        delta = int(np.abs(a, out=a).sum(dtype="int64")) / ((n - 1) * h * w)
    else:
        delta = 0.0
    return {
        "n_frames": n,
        "height": h,
        "width": w,
        "fps": fps,
        "duration_s": n / fps,
        "mean_luma": total / (n * h * w),
        "mean_frame_delta": delta,
    }


def video_stats(clips: DataFrame, quarantine: bool = False) -> DataFrame:
    """Distributed decode+featurize over (doc_id, payload) Y4M clips —
    the third modality through the SAME `_stats_df` wrapper as
    image/audio (Arrow-batched mapInPandas, opt-in quarantine error
    channel)."""
    return _stats_df(clips, _VIDEO_STATS_SCHEMA, _video_features, quarantine)


_FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def video_frame_sample(
    clips: DataFrame, every_n: int = 1, quarantine: bool = False
) -> DataFrame:
    """REAL one→many frame sampling: each (doc_id, payload) Y4M clip
    fans out to one row per every_n-th luma frame, re-encoded as a
    P5 PGM payload — so the output column IS an image column and
    composes directly with `image_stats` (video → frames → image
    featurize, the standard video-corpus pipeline). `frame_idx` is
    the ORIGINAL frame index (0, n, 2n, ...), preserving temporal
    addressing for frame-level dedup/captioning joins.

    The frame manifest (`multimodal_frame_manifest`) proved the
    fan-out SHAPE with a deterministic fake chunker; this is the
    same shape on genuinely decoded video. Quarantine mode mirrors
    the stats featurizers: a rejected clip becomes ONE row with
    NULL frame fields and the classified error.

    100 TB posture: map-only (no shuffle); output rows carry
    frame-sized payloads, so size `every_n` to the downstream
    budget — the fan-out multiplies bytes, not just rows."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    schema = (
        T.StructType(_FRAME_SAMPLE_SCHEMA.fields + [_ERROR_FIELD])
        if quarantine
        else _FRAME_SAMPLE_SCHEMA
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "payload")}
            if quarantine:
                out["error"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    frames, _, _ = decode_video(bytes(payload))
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(None)
                    out["payload"].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                _, fh, fw = frames.shape
                header = f"P5\n{fw} {fh}\n255\n".encode()
                for idx in range(0, len(frames), every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["payload"].append(header + frames[idx].tobytes())
                    if quarantine:
                        out["error"].append(None)
            yield pd.DataFrame(out)

    return parallelize_small_scan(clips.select("doc_id", "payload")).mapInPandas(
        gen, schema
    )


def _gif_frames_checked(raw: bytes):
    """decode_gif_frames behind the decode contract: non-GIF payloads
    are NotImplementedError (format routing, same as decode_image's
    dispatcher), and any exception class the GIF parser leaks beyond
    the contract's two becomes ValueError — without this shim an
    unanticipated IndexError/struct.error would escape the quarantine
    catch in gif_frame_sample and kill the executor task (the same
    catch-all decode_image applies to its GIF branch)."""
    if raw[:8] == _PNG_MAGIC:
        # APNG rides the same sampler (r11): identical frames/delays
        # contract, identical quarantine classes
        try:
            return decode_apng_frames(raw)
        except (NotImplementedError, ValueError):
            raise
        except Exception as e:
            raise ValueError(f"malformed APNG payload: {e}") from e
    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
        # animated lossless WebP rides the same sampler (r12):
        # identical frames/delays contract, identical quarantine
        # classes; lossy-frame animations gate as unsupported
        from flink_hiveorc_spark.functions.webp import decode_webp_frames

        try:
            return decode_webp_frames(
                raw,
                max_pixels=MAX_IMAGE_PIXELS,
                max_total_pixels=MAX_GIF_TOTAL_PIXELS,
            )
        except (NotImplementedError, ValueError):
            raise
        except Exception as e:
            raise ValueError(f"malformed animated WebP payload: {e}") from e
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "gif_frame_sample requires a GIF, APNG, or WebP payload"
        )
    try:
        return decode_gif_frames(raw)
    except (NotImplementedError, ValueError):
        raise
    except Exception as e:
        raise ValueError(f"malformed GIF payload: {e}") from e


def gif_frame_sample(
    gifs: DataFrame, every_n: int = 1, quarantine: bool = False
) -> DataFrame:
    """Animated-GIF analog of `video_frame_sample`: each (doc_id,
    payload) GIF fans out to one row per every_n-th COMPOSITED frame
    (decode_gif_frames — full disposal/transparency semantics on the
    logical screen), re-encoded as a P6 PPM of the canvas RGB
    channels (pixels never painted carry black — the canvas starts
    transparent) so the output composes directly with `image_stats`.
    `frame_idx` is the original frame index; single-frame GIFs yield
    exactly one row, so the operator is safe to run over a mixed
    still/animated column. Quarantine mode mirrors the featurizers:
    one NULL row with the classified error per rejected payload.

    100 TB posture: map-only, no shuffle; the fan-out multiplies
    BYTES (each row carries a full logical-screen frame), so size
    every_n to the downstream budget."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    schema = (
        T.StructType(_FRAME_SAMPLE_SCHEMA.fields + [_ERROR_FIELD])
        if quarantine
        else _FRAME_SAMPLE_SCHEMA
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "payload")}
            if quarantine:
                out["error"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    frames, _ = _gif_frames_checked(bytes(payload))
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(None)
                    out["payload"].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                _, fh, fw, _ = frames.shape
                header = f"P6\n{fw} {fh}\n255\n".encode()
                for idx in range(0, len(frames), every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["payload"].append(header + frames[idx][:, :, :3].tobytes())
                    if quarantine:
                        out["error"].append(None)
            yield pd.DataFrame(out)

    return parallelize_small_scan(gifs.select("doc_id", "payload")).mapInPandas(
        gen, schema
    )


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic feature extraction over binary payloads: byte
    length, first-4-bytes hex, md5 digest. Stands in for a real
    embed/resize/frame-sample step; identical batch shape."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_hex": payloads.map(lambda b: b[:4].hex().upper()),
                "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal shape: opaque binary payload + typed
    metadata struct (the L5 column model: binary + sidecar struct)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("language"),
            F.lit("text/plain").alias("mime"),
            F.length("text").alias("declared_len"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           -- first 4 BYTES of the utf-8 payload (hex-then-substr), not
           -- the first 4 CHARACTERS: multi-byte text would diverge from
           -- the byte-oriented Spark side otherwise.
           substr(upper(hex(encode(text))), 1, 8) AS head_hex,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-column pipeline — build payload+meta columns, run
    Arrow-batched mapInPandas feature extraction. The extraction is a
    deterministic fake (hash/length) so the oracle can verify the
    whole binary plumbing end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return parallelize_small_scan(mm.select("doc_id", "payload")).mapInPandas(
        _fake_features, FEATURE_SCHEMA
    )


def _image_container_segments() -> dict[str, bytes]:
    """Constant byte segments for the 8-way image decode-stats
    rotation: every container carries the SAME 16 digest bytes as a
    4×4 gray raster (palette formats through an identity-gray
    palette), so one oracle recomputes the pixel statistics for all
    eight native decoders. Each builder is written from the format
    spec, independently of its decoder."""
    import struct
    import zlib

    seg: dict[str, bytes] = {}
    # BMP: 8-bit paletted, identity-gray BGRX table, bottom-up (the
    # mean is row-order invariant), stride 4 = no row padding at w=4.
    info = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 16, 0, 0, 256, 0)
    palette = bytes(v for i in range(256) for v in (i, i, i, 0))
    pix_off = 14 + 40 + len(palette)
    seg["bmp"] = (
        b"BM" + struct.pack("<IHHI", pix_off + 16, 0, 0, pix_off) + info + palette
    )
    # TGA: type 3 grayscale, top-down (descriptor bit 5), routed by
    # the mandatory TGA 2.0 footer signature.
    seg["tga_hdr"] = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 3, 0, 0, 0, 0, 0, 4, 4, 8, 0x20
    )
    seg["tga_foot"] = struct.pack("<II", 0, 0) + b"TRUEVISION-XFILE.\x00"
    # TIFF: little-endian, single uncompressed strip right after the
    # IFD (9 entries, tags ascending per spec).
    n_ent = 9
    pix = 8 + 2 + 12 * n_ent + 4
    tiff_tags = (
        (256, 3, 4),      # ImageWidth
        (257, 3, 4),      # ImageLength
        (258, 3, 8),      # BitsPerSample
        (259, 3, 1),      # Compression: none
        (262, 3, 1),      # Photometric: BlackIsZero
        (273, 4, pix),    # StripOffsets
        (277, 3, 1),      # SamplesPerPixel
        (278, 3, 4),      # RowsPerStrip
        (279, 4, 16),     # StripByteCounts
    )

    def tiff_hdr(bo: str, compression: int = 1, count: int = 16) -> bytes:
        # inline tag values are LEFT-justified in the 4-byte slot per
        # spec, so a SHORT packs as 2 value bytes then 2 zero bytes in
        # BOTH byte orders
        parts = []
        for tag, typ, val in tiff_tags:
            if tag == 259:
                val = compression
            elif tag == 279:
                val = count
            head = struct.pack(bo + "HHI", tag, typ, 1)
            if typ == 3:  # SHORT: left-justified in the value slot
                head += struct.pack(bo + "H", val) + b"\x00\x00"
            else:
                head += struct.pack(bo + "I", val)
            parts.append(head)
        mark = b"II\x2a\x00" if bo == "<" else b"MM\x00\x2a"
        return (
            mark + struct.pack(bo + "I", 8)
            + struct.pack(bo + "H", n_ent) + b"".join(parts)
            + struct.pack(bo + "I", 0)
        )

    seg["tiff"] = tiff_hdr("<")
    seg["tiff_be"] = tiff_hdr(">")
    # compressed-path twins, all literal-run constructions that carry
    # the 16 digest bytes verbatim:
    # TGA type 11 (RLE grayscale): one raw packet, control 0x0F = 16
    # literal pixels
    seg["tga_rle_hdr"] = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 11, 0, 0, 0, 0, 0, 4, 4, 8, 0x20
    )
    # BMP RLE8 (bottom-up per spec): per row an absolute-mode escape
    # (00 04 + 4 index bytes, even count = no pad) + EOL, then EOB;
    # biCompression=1, biSizeImage = 4·(2+4+2) + 2 = 34
    info_rle = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 1, 34, 0, 0, 256, 0)
    seg["bmp_rle"] = (
        b"BM" + struct.pack("<IHHI", pix_off + 34, 0, 0, pix_off)
        + info_rle + palette
    )
    seg["bmp_rle_mid"] = b"\x00\x04"      # absolute escape, 4 literals
    seg["bmp_rle_eol"] = b"\x00\x00"      # end of line
    seg["bmp_rle_eob"] = b"\x00\x01"      # end of bitmap
    # TIFF PackBits (32773): control 0x0F = 16 literal bytes
    seg["tiff_pb"] = tiff_hdr("<", compression=32773, count=17)
    # TIFF LZW (5): the clear-code-per-literal trick in TIFF's
    # MSB-first framing (EarlyChange never fires: the table resets at
    # every CLEAR, so the width stays 9) — 38-byte stream, fixed
    # 9-byte bit-shuffle per 4 pixels, b"\x80\x80" EOI tail
    seg["tiff_lzw"] = tiff_hdr("<", compression=5, count=38)
    # QOI: channels=3 header; pixels ship as QOI_OP_RGB literals
    # (interleaved JVM-side), then the 8-byte end marker.
    seg["qoi_hdr"] = b"qoif" + struct.pack(">II", 4, 4) + bytes((3, 0))
    seg["qoi_end"] = b"\x00" * 7 + b"\x01"
    # farbfeld: 16-bit BE RGBA; gray byte v ships as v·257 = (v, v)
    # per channel (so the decoder's high-byte reduction is lossless),
    # alpha fixed opaque.
    seg["ff_hdr"] = b"farbfeld" + struct.pack(">II", 4, 4)
    # PNG: IHDR/IEND constant (CRCs precomputed); IDAT is a STORED-
    # deflate zlib stream — 2-byte header, 5-byte stored-block header
    # (BFINAL=1, LEN=24, NLEN), 4 filter-0 scanlines, then the
    # adler32/crc32 computed JVM-side (linear in the digest bytes /
    # F.crc32). 0x78 0x01 is a valid CMF/FLG pair (30721 % 31 == 0).
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    seg["png_hdr"] = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 31)  # zlib stream: 2 + 5 + 4·(1+4) + 4
    )
    seg["png_zpre"] = b"\x78\x01\x01" + struct.pack("<H", 20) + struct.pack("<H", 0xFFEB)
    seg["png_iend"] = (
        struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )
    # GIF: 256-entry identity-gray global table; the LZW stream is the
    # classic clear-before-every-literal construction (dictionary
    # never grows, width pinned at 9), so the 38-byte data block is a
    # fixed LSB-first bit-shuffle of the 16 pixel bytes + EOI.
    seg["gif_hdr"] = (
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0xF7, 0, 0) + _GIF_GRAY_GCT
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
        + bytes((8, 38))  # LZW min code size, one 38-byte sub-block
    )
    seg["gif_end"] = b"\x01\x01\x00\x3b"  # EOI code bytes, terminator, trailer
    return seg


def _int_byte(expr):
    """Computed integer 0..255 → one binary byte, JVM-side."""
    return F.unhex(F.lpad(F.hex(expr), 2, "0"))


def _gif_cleared_stream_parts(dv_group: list) -> list:
    """One 4-pixel group of the clear-code-per-literal GIF LZW stream
    as 9 JVM-side byte parts: codes (CLEAR, pixel) × 4 at 9 bits
    LSB-first pack into a fixed bit-shuffle of the pixel values (b0
    is always 0; CLEAR = 0x100 contributes the constants 1/4/16/64).
    Pinned against an independent bit packer in
    tests/test_decode_stats_containers.py. Callers append the 2-byte
    EOI tail (b"\\x01\\x01") after the final group."""
    pa, pb, pc, pd = dv_group
    return [
        F.lit(b"\x00"),
        _int_byte(pa.bitwiseAND(F.lit(0x7F)) * 2 + 1),
        _int_byte(F.shiftright(pa, 7)),
        _int_byte(pb.bitwiseAND(F.lit(0x1F)) * 8 + 4),
        _int_byte(F.shiftright(pb, 5)),
        _int_byte(pc.bitwiseAND(F.lit(0x07)) * 32 + 16),
        _int_byte(F.shiftright(pc, 3)),
        _int_byte(pd.bitwiseAND(F.lit(0x01)) * 128 + 64),
        _int_byte(F.shiftright(pd, 1)),
    ]


def _tiff_lzw_cleared_stream_parts(dv_group: list, db_group: list) -> list:
    """TIFF-LZW twin of `_gif_cleared_stream_parts`: same
    clear-code-per-literal construction in TIFF's MSB-FIRST bit
    order (spec §13; GIF packs LSB-first) — codes (CLEAR, pixel) × 4
    at 9 bits pack into 9 bytes whose layout is fixed arithmetic in
    the pixel values (byte 0 is always 0x80 = CLEAR's leading bit;
    byte 7 is always 0x00; byte 8 is the 4th pixel verbatim).
    EarlyChange never fires: the table resets at every CLEAR, so the
    code width is pinned at 9. Pinned against an independent
    MSB-first packer in tests. Callers append the b"\\x80\\x80" EOI
    tail after the final group."""
    pa, pb, pc, pd = dv_group
    return [
        F.lit(b"\x80"),
        _int_byte(F.shiftright(pa, 2)),
        _int_byte(pa.bitwiseAND(F.lit(0x03)) * 64 + 32),
        _int_byte(F.shiftright(pb, 4)),
        _int_byte(pb.bitwiseAND(F.lit(0x0F)) * 16 + 8),
        _int_byte(F.shiftright(pc, 6)),
        _int_byte(pc.bitwiseAND(F.lit(0x3F)) * 4 + 2),
        F.lit(b"\x00"),
        db_group[3],
    ]


# identity-gray 256-entry GIF color table (index i → (i, i, i))
_GIF_GRAY_GCT = bytes(v for i in range(256) for v in (i, i, i))


def _jpeg_dc_segments() -> dict[str, bytes]:
    """Constant byte segments for the DC-only JPEG rotation legs
    (r11): with every AC coefficient zero and Q[0] = 8, one 8×8 block
    decodes to the flat value 128 + DC exactly (the float IDCT error
    on a DC-only block is < 1e-13 of a unit, see jpeg.py), so a
    digest byte b ships as DC = b − 128 and the decoded tile is b.

    The entropy stream is made a FIXED-LENGTH byte-aligned function
    of each digest byte by two choices, both written from T.81
    independently of the decoder:
    - a custom canonical DC Huffman table whose code length for
      magnitude category s is 10 − s (Kraft-valid: lengths 2..10, one
      code each), so category code + value bits is always 10 bits;
      with the single-EOB AC table's code pinned at length 6, every
      block is exactly 16 bits — and since every DC code starts with
      a 0 bit and the low 6 bits are the zero EOB, no entropy byte
      can be 0xFF (no stuffing, fixed 2-byte blocks);
    - DRI = 1 with RST0-7 between MCUs, so every block's DC predictor
      resets and its two bytes depend on ONE digest byte → the whole
      per-byte encoder collapses into the 512-byte table ``mcu``
      (position 2·b, 1-based 2·b+1) that the Spark side indexes with
      substr over a literal.

    ``s0`` is the 2-byte zero-diff unit (category 0 + EOB) used for
    the flat-128 chroma blocks and for the repeated luma blocks of
    the 4:2:0 leg (identical in-MCU blocks ⇒ zero diffs under the
    per-component predictor). Headers cover the four legs: SOF0
    grayscale 32×32, SOF0 YCbCr 4:4:4 interleaved 32×32, SOF0 YCbCr
    4:2:0 64×64, and SOF1 grayscale with a 16-bit (Pq=1) DQT."""
    import struct

    # DC Huffman: categories 0..8 at code lengths 10−s, canonical
    # order HUFFVAL = [8..0]; AC: one EOB code at length 6
    dc_bits = [0] + [1] * 9 + [0] * 6
    dc_vals = bytes([8, 7, 6, 5, 4, 3, 2, 1, 0])
    ac_bits = [0, 0, 0, 0, 0, 1] + [0] * 10
    codes: dict[int, int] = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(dc_bits[length - 1]):
            codes[dc_vals[k]] = code
            k += 1
            code += 1
        code <<= 1
    def dc_unit(v: int) -> bytes:
        s = abs(v).bit_length()
        # T.81 F.1.2.1: s value bits, one's complement for negatives
        dc10 = (
            codes[0]
            if s == 0
            else (codes[s] << s) | (v if v > 0 else v + (1 << s) - 1)
        )
        w = dc10 << 6  # trailing 6 bits: EOB for sequential legs,
        # plain byte-alignment padding for progressive DC scans
        return bytes([w >> 8, w & 0xFF])

    mcu = bytearray()
    mcu_al1 = bytearray()
    for b in range(256):
        mcu += dc_unit(b - 128)
        # successive-approximation first DC scan (Al=1) ships the
        # FLOOR-shifted value (b-128) >> 1 = (b >> 1) - 64; the
        # refinement bit b & 1 restores exactness: 2·⌊x/2⌋+(x&1)=x
        mcu_al1 += dc_unit((b >> 1) - 64)
    assert b"\xff" not in mcu and b"\xff" not in mcu_al1  # no stuffing

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sof(marker: int, h: int, w: int, comps: list) -> bytes:
        return seg(
            marker,
            struct.pack(">BHHB", 8, h, w, len(comps))
            + b"".join(bytes(c) for c in comps),
        )

    def sos(comps: list) -> bytes:
        return seg(
            0xDA,
            bytes([len(comps)])
            + b"".join(bytes(c) for c in comps)
            + bytes([0, 63, 0]),
        )

    def sos_prog(ss: int, se: int, ah: int, al: int, ta: int = 0) -> bytes:
        return seg(0xDA, bytes([1, 1, ta, ss, se, (ah << 4) | al]))

    dqt8 = seg(0xDB, bytes([0x00]) + bytes([8]) * 64)
    dqt16 = seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([8] * 64)))
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(dc_bits) + dc_vals
        + bytes([0x10]) + bytes(ac_bits) + b"\x00",
    )
    # progressive AC table (Th=1): one EOBn symbol 0x40 at length 4 —
    # EOB run of 16 = symbol + 4 zero extra bits = the single byte
    # 0x00 covers the whole 16-block image in one code
    ac_prog_bits = [0, 0, 0, 1] + [0] * 12
    dht_prog = seg(0xC4, bytes([0x11]) + bytes(ac_prog_bits) + b"\x40")
    dri = seg(0xDD, struct.pack(">H", 1))
    dri0 = seg(0xDD, struct.pack(">H", 0))
    soi = b"\xff\xd8"
    gray3 = [(1, 0x11, 0), (2, 0x11, 0), (3, 0x11, 0)]
    return {
        "mcu": bytes(mcu),
        "mcu_al1": bytes(mcu_al1),
        "s0": bytes(mcu[256:258]),  # b=128 ⇒ v=0: the zero-diff unit
        "hdr_gray": soi + dqt8 + sof(0xC0, 32, 32, [(1, 0x11, 0)])
        + dht + dri + sos([(1, 0x00)]),
        "hdr_444": soi + dqt8 + sof(0xC0, 32, 32, gray3)
        + dht + dri + sos([(1, 0), (2, 0), (3, 0)]),
        "hdr_420": soi + dqt8
        + sof(0xC0, 64, 64, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
        + dht + dri + sos([(1, 0), (2, 0), (3, 0)]),
        "hdr_sof1": soi + dqt16 + sof(0xC1, 32, 32, [(1, 0x11, 0)])
        + dht + dri + sos([(1, 0x00)]),
        # progressive legs: header up to the first (DC) SOS; the
        # constant suffix after the DC entropy is DRI=0 + the AC scan
        # (Ss=1..63, Ta=1) whose whole entropy is the 0x00 EOBn byte
        "hdr_prog": soi + dqt8 + sof(0xC2, 32, 32, [(1, 0x11, 0)])
        + dht + dht_prog + dri + sos_prog(0, 0, 0, 0),
        "hdr_prog_sa": soi + dqt8 + sof(0xC2, 32, 32, [(1, 0x11, 0)])
        + dht + dht_prog + dri + sos_prog(0, 0, 0, 1),
        "sa_refine_sos": sos_prog(0, 0, 1, 0),  # DC refinement scan
        "prog_tail": dri0 + sos_prog(1, 63, 0, 0, ta=1) + b"\x00",
    }


def _jpeg_mcu_lookup(jseg: dict, byte_val):
    """One digest byte → its 2-byte DC-only JPEG entropy block,
    JVM-side: a substr index into the 512-byte literal table (1-based
    position 2·b + 1). Substring on BinaryType stays in whole-stage
    codegen like every other part of the payload concat."""
    return F.lit(jseg["mcu"]).substr(byte_val * 2 + 1, F.lit(2))


def _flac_segments() -> dict:
    """Constant byte segments + GF(2)-linear CRC-16 tables for the
    two FLAC rotation legs (r11): a VERBATIM frame and a Rice-coded
    FIXED-order-0 frame, both 16 mono 8-bit samples at 8 kHz carrying
    sample value b−128 per digest byte b. Built from the spec (RFC
    9639), independently of flac.py.

    The frame CRC-16 (poly 0x8005, init 0, no final xor) is LINEAR
    over GF(2) in the message bits: with the variable regions of the
    two legs non-overlapping per digest byte, crc(m) = crc(m₀) ⊕
    ⊕ᵢ Tᵢ[bᵢ], where m₀ is the frame with the variable bits zeroed
    and Tᵢ[b] = crc of the all-zero frame carrying only byte i's
    contribution for digest value b. Each Tᵢ ships as a 512-byte
    literal the Spark side indexes with substr — the same
    construction family as the PNG adler32 linear form.

    Rice leg layout: subframe FIXED order 0 (residual = sample),
    partition order 0, Rice2 param 8 ⇒ every zigzagged residual u =
    2v (v ≥ 0) / −2v−1 (v < 0) < 256 codes as a FIXED 9-bit unit
    (quotient u≫8 = 0 → unary '0', then 8 remainder bits), so the
    residual stream is a fixed MSB-first bit-shuffle of the u values
    starting at bit 19 of the subframe region — `rice_layout` maps
    each output byte to its (code index, code-bit window) fragments
    for the JVM-side assembly."""
    import struct

    from flink_hiveorc_spark.functions.flac import crc8_flac, crc16_flac

    b = bytearray()  # STREAMINFO: all-constant
    b += struct.pack(">HH", 16, 16)  # min/max blocksize
    b += b"\x00" * 6  # frame size hints
    # rate 20 bits | ch-1 3 | bps-1 5 | total 36 = 8 bytes
    packed = (8000 << 44) | (0 << 41) | (7 << 36) | 16
    b += struct.pack(">Q", packed)
    streaminfo = (
        b"fLaC" + struct.pack(">I", (1 << 31) | 34) + bytes(b) + b"\x00" * 16
    )
    # frame header: sync 3FFE, fixed blocking, bs code 6 (+1 byte 15),
    # rate from STREAMINFO, mono, 8-bit, frame number 0
    hdr = bytearray()
    hdr += bytes([0xFF, 0xF8])  # 11111111 111110 0 0
    hdr += bytes([(6 << 4) | 0])  # bs code 6, rate code 0
    hdr += bytes([(0 << 4) | (1 << 1)])  # channels 1, size code 001, res
    hdr += b"\x00"  # UTF-8 frame number 0
    hdr += bytes([15])  # blocksize-1 tail byte
    hdr += bytes([crc8_flac(bytes(hdr))])
    header = bytes(hdr)

    def crc_tables(m0: bytes, positions_or_builder) -> tuple[int, list[bytes]]:
        base = crc16_flac(m0)
        tables = []
        if callable(positions_or_builder):
            for i in range(16):
                tbl = bytearray()
                for v in range(256):
                    tbl += struct.pack(
                        ">H", crc16_flac(positions_or_builder(len(m0), i, v))
                    )
                tables.append(bytes(tbl))
        else:
            for pos in positions_or_builder:
                tbl = bytearray()
                for v in range(256):
                    m = bytearray(len(m0))
                    m[pos] = v ^ 0x80  # sample byte = (b-128) & 0xFF
                    tbl += struct.pack(">H", crc16_flac(bytes(m)))
                tables.append(bytes(tbl))
        return base, tables

    # -- verbatim leg: header + subframe 0x02 + 16 sample bytes
    vb_m0 = header + b"\x02" + b"\x00" * 16
    vb_base, vb_tables = crc_tables(
        vb_m0, [len(header) + 1 + i for i in range(16)]
    )
    # -- rice leg: subframe region = 21 bytes, codes at bits 19 + 9i
    rice_const = bytearray(21)
    rice_const[0] = 0x10  # pad 0, type 001000 (fixed order 0), wasted 0
    rice_const[1] = 0x41  # method 01, partition order 0000, param 01000>>3
    # (param bits 3..4 land in byte 2's top bits — both zero)
    for i in range(16):
        # quotient u>>8 = 0 always (u ≤ 255): unary '1' — a CONSTANT
        # set bit leading each 9-bit code (FLAC unary = q zeros
        # terminated by a one)
        p = 19 + 9 * i
        rice_const[p >> 3] |= 1 << (7 - (p & 7))
    rice_m0 = header + bytes(rice_const)

    def _u(v: int) -> int:
        return 2 * (v - 128) if v >= 128 else 255 - 2 * v

    def rice_component(hdr_len: int, i: int, v: int) -> bytes:
        m = bytearray(len(rice_m0))  # full-length zero message
        u = _u(v)
        start = 8 * len(header) + 19 + 9 * i + 1  # skip the 0 quotient bit
        for j in range(8):  # u's bit 7-j → stream bit start+j
            if (u >> (7 - j)) & 1:
                p = start + j
                m[p >> 3] |= 1 << (7 - (p & 7))
        return bytes(m)

    rice_base, rice_tables = crc_tables(rice_m0, rice_component)
    # byte-assembly windows for the JVM side: for each of the 19
    # variable bytes (indices 2..20 of the subframe region), the list
    # of (code index, u-bit high, u-bit low, shift-into-byte) where
    # the fragment is (u >> low) & ((1 << (high-low+1)) - 1) << shift
    layout: dict[int, list] = {}
    for i in range(16):
        start = 19 + 9 * i + 1  # bit offset of u's MSB in the region
        for j in range(8):
            p = start + j  # region bit of u's bit (7-j)
            bidx = p >> 3
            layout.setdefault(bidx, []).append((i, 7 - j, 7 - (p & 7)))
    rice_layout = []
    for bidx in sorted(layout):
        frags: list = []
        cur = None
        for i, ubit, bbit in layout[bidx]:
            if cur and cur[0] == i and cur[2] - 1 == ubit and cur[4] - 1 == bbit:
                cur[2] = ubit
                cur[4] = bbit
            else:
                if cur:
                    frags.append(tuple(cur))
                cur = [i, ubit, ubit, bbit, bbit]  # [i, hi, lo, bhi, blo]
        if cur:
            frags.append(tuple(cur))
        rice_layout.append((bidx, [(i, hi, lo, blo) for i, hi, lo, bhi, blo in frags]))
    return {
        "streaminfo": streaminfo,
        "header": header,
        "vb_base": vb_base,
        "vb_tables": vb_tables,
        "rice_const": bytes(rice_const),
        "rice_base": rice_base,
        "rice_tables": rice_tables,
        "rice_layout": rice_layout,
    }


@functools.lru_cache(maxsize=1)
def _flac_matrix_segments() -> dict:
    """Per-leg constants for `multimodal_flac_decode_stats` (r11): a
    SYMBOLIC MSB-first bitstream builder — items are ('c', nbits,
    value) constants or ('v', key, nbits) variable fields — compiles
    each leg's subframe region into (constant bytes, fragment layout)
    exactly like `_flac_segments`'s Rice layout, but for arbitrary
    field widths; the frame CRC-16 generalizes to WIRE-BYTE linear
    tables (crc = base ⊕ ⊕ T_pos[wire_byte]) so any leg whose bytes
    are computable columns hashes under the oracle. Legs:
    - vb2: independent-stereo VERBATIM (two subframes);
    - ms: MID/SIDE stereo — mid 8-bit, side 9-bit samples (the
      decorrelation arithmetic under the oracle);
    - f1: FIXED order-1 predictor — Rice2 param 9 makes every
      zigzagged delta a fixed 10-bit unit ('1' quotient + 9 bits);
    - const: CONSTANT subframe (one sample value, 16 frames).
    Built from the spec, independently of flac.py."""
    import struct

    from flink_hiveorc_spark.functions.flac import crc8_flac, crc16_flac

    def streaminfo(nch: int, total: int, bs: int) -> bytes:
        packed = (8000 << 44) | ((nch - 1) << 41) | (7 << 36) | total
        body = (
            struct.pack(">HH", bs, bs)
            + b"\x00" * 6
            + struct.pack(">Q", packed)
            + b"\x00" * 16
        )
        return b"fLaC" + struct.pack(">I", (1 << 31) | 34) + body

    def header(ch_code: int, bs: int) -> bytes:
        hdr = bytearray([0xFF, 0xF8, 0x60, (ch_code << 4) | 2, 0x00, bs - 1])
        hdr += bytes([crc8_flac(bytes(hdr))])
        return bytes(hdr)

    def build(items: list) -> tuple[bytes, list, int]:
        """symbolic bitstream → (const bytes incl. per-byte constant
        bits, [(byteidx, [(key, hi, lo, blo)])], nbytes); zero-pads
        to a byte boundary."""
        nbits = sum(it[1] if it[0] == "c" else it[2] for it in items)
        nbytes = (nbits + 7) // 8
        const = bytearray(nbytes)
        layout: dict[int, list] = {}
        pos = 0
        for it in items:
            if it[0] == "c":
                _, width, value = it
                for j in range(width):
                    if (value >> (width - 1 - j)) & 1:
                        p = pos + j
                        const[p >> 3] |= 1 << (7 - (p & 7))
                pos += width
            else:
                _, key, width = it
                p0 = pos
                # split the field into per-byte fragments
                while pos < p0 + width:
                    bidx = pos >> 3
                    take = min(8 - (pos & 7), p0 + width - pos)
                    hi = width - 1 - (pos - p0)
                    lo = hi - take + 1
                    blo = 8 - (pos & 7) - take
                    layout.setdefault(bidx, []).append((key, hi, lo, blo))
                    pos += take
        return bytes(const), sorted(layout.items()), nbytes

    legs = {}
    specs = {
        "vb2": (2, 8, 8, 1,
                [("c", 8, 0x02)] + [("v", f"x{i}", 8) for i in range(8)]
                + [("c", 8, 0x02)] + [("v", f"x{i}", 8) for i in range(8, 16)]),
        "ms": (2, 8, 8, 10,
               [("c", 8, 0x02)] + [("v", f"mid{i}", 8) for i in range(8)]
               + [("c", 8, 0x02)] + [("v", f"side{i}", 9) for i in range(8)]),
        "f1": (1, 16, 16, 0,
               [("c", 8, 0x12), ("v", "x0", 8),
                ("c", 2, 1), ("c", 4, 0), ("c", 5, 9)]
               + [f for i in range(1, 16)
                  for f in (("c", 1, 1), ("v", f"u{i}", 9))]),
        "const": (1, 16, 16, 0, [("c", 8, 0x00), ("v", "x0", 8)]),
    }
    for name, (nch, total, bs, ch_code, items) in specs.items():
        hdr = header(ch_code, bs)
        const, layout, nbytes = build(items)
        var_bytes = {bidx for bidx, _ in layout}
        m0 = bytearray(hdr + const)
        for bidx in var_bytes:
            m0[len(hdr) + bidx] = 0
        tables = {}
        for bidx in var_bytes:
            tbl = bytearray()
            for v in range(256):
                m = bytearray(len(m0))
                m[len(hdr) + bidx] = v
                tbl += struct.pack(">H", crc16_flac(bytes(m)))
            tables[bidx] = bytes(tbl)
        legs[name] = {
            "prefix": streaminfo(nch, total, bs) + hdr,
            "const": const,
            "layout": layout,
            "nbytes": nbytes,
            "base": crc16_flac(bytes(m0)),
            "tables": tables,
        }
    return legs


def _media_probe_segments() -> dict:
    """Constant byte segments for the media-probe rotation (r11):
    a minimal-but-spec-shaped MP4 (ftyp + moov{mvhd, trak{tkhd,
    mdia{mdhd, hdlr 'vide', minf/stbl/stsd 'avc1'}}}) and a WebM
    (EBML header + Segment{Info{TimestampScale, float Duration},
    Tracks{video V_VP9 with PixelWidth/Height, audio A_OPUS}}).
    Digest bytes splice in verbatim at fixed offsets: MP4 movie
    duration low bytes (d0 d1 at timescale 1000) and the tkhd 16.16
    dimension integer bytes (d2, d3); WebM PixelWidth (d4 d5) and
    PixelHeight (d6 d7). Returns per-container lists of
    (const_chunk, digest_index) pairs plus the tail chunk, built from
    ISO 14496-12 / the Matroska EBML spec independently of
    probe.py."""
    import struct

    def mp4_box(fourcc: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + fourcc + body

    matrix = struct.pack(
        ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
    )
    V = object()  # placeholder marker for one digest byte

    def render(parts: list) -> tuple[list, bytes]:
        """[bytes | (V, digest_idx)] → ([(chunk, idx)...], tail)."""
        chunks = []
        cur = bytearray()
        for p in parts:
            if isinstance(p, tuple):
                chunks.append((bytes(cur), p[1]))
                cur = bytearray()
            else:
                cur += p
        return chunks, bytes(cur)

    mvhd = mp4_box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1000) + b"\x00\x00\xee\xee"  # duration spliced
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + matrix + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = mp4_box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1) + b"\x00" * 4 + struct.pack(">I", 0)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + b"\x00\xee\x00\x00\x00\xee\x00\x00",  # w/h int bytes spliced
    )
    mdhd = mp4_box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = mp4_box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00",
    )
    entry = struct.pack(">I", 16) + b"avc1" + b"\x00" * 6 + struct.pack(">H", 1)
    stsd = mp4_box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    mdia = mp4_box(b"mdia", mdhd + hdlr + mp4_box(b"minf", mp4_box(b"stbl", stsd)))
    moov = mp4_box(b"moov", mvhd + mp4_box(b"trak", tkhd + mdia))
    ftyp = mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    raw = ftyp + moov
    # replace the four 0xEE splice markers (in order) with digest slots
    parts: list = []
    last = 0
    for idx, di in zip(
        (i for i in range(len(raw)) if raw[i] == 0xEE), (0, 1, 2, 3)
    ):
        parts.append(raw[last:idx])
        parts.append((V, di))
        last = idx + 1
    parts.append(raw[last:])
    mp4_chunks, mp4_tail = render(parts)

    def el(eid: bytes, body_len: int) -> bytes:
        assert body_len <= 126
        return eid + bytes([0x80 | body_len])

    def cel(eid: bytes, body: bytes) -> bytes:
        return el(eid, len(body)) + body

    ebml = cel(b"\x1a\x45\xdf\xa3", cel(b"\x42\x82", b"webm"))
    info = cel(
        b"\x15\x49\xa9\x66",
        cel(b"\x2a\xd7\xb1", b"\x0f\x42\x40")  # TimestampScale 1e6
        + cel(b"\x44\x89", struct.pack(">f", 2000.0)),  # 2.0 s
    )
    video = (
        cel(b"\x83", b"\x01") + cel(b"\x86", b"V_VP9")
        # Video{PixelWidth(2 spliced), PixelHeight(2 spliced)}
    )
    video_box = el(b"\xe0", 8)  # B0 82 dd dd BA 82 dd dd
    vtrack_body_len = len(video) + 2 + 8
    atrack = cel(b"\xae", cel(b"\x83", b"\x02") + cel(b"\x86", b"A_OPUS"))
    tracks_body_len = 2 + vtrack_body_len + len(atrack)
    seg_body_len = len(info) + 5 + tracks_body_len
    webm_chunks = [
        (
            ebml + b"\x18\x53\x80\x67" + bytes([0x80 | seg_body_len])
            + info + el(b"\x16\x54\xae\x6b", tracks_body_len)
            + el(b"\xae", vtrack_body_len) + video + video_box
            + b"\xb0\x82",
            4,
        ),
        (b"", 5),
        (b"\xba\x82", 6),
        (b"", 7),
    ]
    webm_tail = atrack

    # --- Ogg Opus leg: BOS page constant; EOS page carries a
    # digest-derived granule position (312 + X ticks ⇒ duration
    # X/48000 after pre-skip), its CRC-32 via wire-byte linear tables
    from flink_hiveorc_spark.functions.probe import ogg_crc

    def ogg_page(htype: int, granule: int, seq: int, body: bytes) -> bytes:
        hdr = (
            b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<II", 0xABCD, seq) + b"\x00" * 4
            + bytes([1, len(body)])
        )
        page = bytearray(hdr + body)
        page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
        return bytes(page)

    opus_head = (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 312)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00"
    )
    page0 = ogg_page(2, 0, 0, opus_head)
    # EOS page template with granule + CRC zeroed (variable regions)
    p1 = bytearray(
        b"OggS" + bytes([0, 4]) + b"\x00" * 8
        + struct.pack("<II", 0xABCD, 1) + b"\x00" * 4
        + bytes([1, 8]) + b"\x00" * 8
    )
    ogg_base = ogg_crc(bytes(p1))
    ogg_tables = {}
    for pos in (6, 7, 8, 9):  # granule low 4 bytes (value < 2^25)
        tbl = bytearray()
        for v in range(256):
            m = bytearray(len(p1))
            m[pos] = v
            tbl += struct.pack(">I", ogg_crc(bytes(m)))
        ogg_tables[pos] = bytes(tbl)

    # --- MP3 leg: ID3v2 whose syncsafe size is digest-derived (the
    # skip arithmetic under the oracle), then three constant CBR
    # frames (MPEG1 Layer III 128 kbps 44.1 kHz → 417 bytes each)
    mp3_frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * 413

    # --- Ogg FLAC leg (r12): FLAC mapping 1.0 BOS packet (0x7F FLAC
    # maj min nheaders + verbatim fLaC + STREAMINFO at 32 kHz); the
    # EOS page template is byte-identical to the Opus leg's, so the
    # same GF(2) CRC tables serve both granule splices
    flac_si = bytearray(34)
    flac_si[10] = (32000 >> 12) & 0xFF
    flac_si[11] = (32000 >> 4) & 0xFF
    flac_si[12] = (32000 & 0xF) << 4
    flac_map = (
        b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0)
        + b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(flac_si)
    )
    flac_page0 = ogg_page(2, 0, 0, flac_map)

    # --- ADTS AAC leg (r12): two 7-byte-header frames at 16 kHz
    # (sampling index 8), 8-byte bodies; byte 6's low 2 bits (the
    # raw-data-block count − 1) are digest-derived, so the per-frame
    # 1024·blocks sample accounting sits under the oracle
    adts_body = b"\xaa" * 8
    flen = 7 + len(adts_body)
    adts_hdr6 = bytes([
        0xFF, 0xF1, (1 << 6) | (8 << 2),
        (1 << 6) | ((flen >> 11) & 3), (flen >> 3) & 0xFF,
        ((flen & 7) << 5) | 0x1F,
    ])

    # --- AVI leg (r12): RIFF('AVI ') → hdrl{avih, strl{strh}} with
    # the canvas dims (avih) and the video stream length (strh, at
    # scale 1 / rate 1000 ⇒ milliseconds) spliced from digest bytes
    avih = bytearray(struct.pack(
        "<14I", 0, 0, 0, 0, 0, 0, 1, 0, 0xEE, 0xEE, 0, 0, 0, 0
    ))
    # the two 0xEE DWORDs render as [EE 00 00 00]; keep only their
    # low byte as the splice marker
    strh = bytearray(b"vids" + b"\x00" * 4 + struct.pack("<I", 0))
    strh += struct.pack("<HH", 0, 0) + struct.pack("<III", 0, 1, 1000)
    strh += struct.pack("<I", 0) + b"\xee\xee\x00\x00"  # dwLength lo/hi
    strh += struct.pack("<III", 0, 0, 0) + b"\x00" * 8

    def riff_list(ltype: bytes, body: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(body)) + ltype + body

    def riff_chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    hdrl = riff_list(
        b"hdrl",
        riff_chunk(b"avih", bytes(avih))
        + riff_list(b"strl", riff_chunk(b"strh", bytes(strh))),
    )
    avi_raw = b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl
    # splice order of appearance: avih width (d2), avih height (d3),
    # strh dwLength lo (d1), hi (d0)
    parts = []
    last = 0
    for idx, di in zip(
        (i for i in range(len(avi_raw)) if avi_raw[i] == 0xEE), (2, 3, 1, 0)
    ):
        parts.append(avi_raw[last:idx])
        parts.append((V, di))
        last = idx + 1
    parts.append(avi_raw[last:])
    avi_chunks_r, avi_tail = render(parts)

    return {
        "mp4": (mp4_chunks, mp4_tail),
        "webm": (webm_chunks, webm_tail),
        "ogg": {
            "page0": page0,
            "p1_pre": bytes(p1[:6]),
            "p1_mid": bytes(p1[10:22]),  # granule high zeros + serial/seq
            "p1_post": bytes(p1[26:]),
            "base": ogg_base,
            "tables": ogg_tables,
        },
        "mp3": {
            "id3_pre": b"ID3" + bytes([4, 0, 0]) + b"\x00" * 3,
            "zeros": b"\x00" * 127,
            "frames": mp3_frame * 3,
        },
        "oggflac_page0": flac_page0,
        "adts": {"hdr6": adts_hdr6, "body": adts_body},
        "avi": (avi_chunks_r, avi_tail),
    }


def _int_be32(expr):
    """Computed integer 0..2^32−1 → four big-endian bytes, JVM-side."""
    return F.unhex(F.lpad(F.hex(expr), 8, "0"))


@memo_constant_column
def _image_payload_chunks():
    """The 18-branch image-container payload over (doc_id, hx) as
    THREE 6-branch partial CASE trees (chunk i covers doc_id%18 in
    [6i, 6i+5], NULL elsewhere; coalesce of the three == the original
    single CASE — doc_id is never NULL, so the m==17 arm equals the
    former otherwise()). Built once per process — ~1.4 s of py4j
    Column construction per build otherwise lands inside every timed
    invocation (see memo_constant_column).

    Why chunks: the single 18-branch tree exceeds what janino can
    compile — and a FAILING whole-stage-codegen compile is not
    cached, so every execution re-paid ~0.6 s re-failing it before
    falling back (measured; the interpreted eval of the same tree is
    ~0.25 s). The call site additionally pins its projection off the
    whole-stage path (see multimodal_image_decode_stats); the chunk
    split keeps each expression-codegen method JIT-sized."""
    hx = F.col("hx")
    seg = _image_container_segments()
    # per-byte views of the digest: binary (db) and integer (dv)
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    digest = F.unhex(hx)
    pgm = F.concat(F.lit(b"P5\n4 4\n255\n"), digest)
    bmp = F.concat(F.lit(seg["bmp"]), digest)
    tga = F.concat(F.lit(seg["tga_hdr"]), digest, F.lit(seg["tga_foot"]))
    tiff = F.concat(F.lit(seg["tiff"]), digest)
    qoi_parts = [F.lit(seg["qoi_hdr"])]
    for i in range(16):
        qoi_parts += [F.lit(b"\xfe"), db[i], db[i], db[i]]
    qoi = F.concat(*qoi_parts, F.lit(seg["qoi_end"]))
    ff_parts = [F.lit(seg["ff_hdr"])]
    for i in range(16):
        ff_parts += [db[i]] * 6 + [F.lit(b"\xff\xff")]
    ff = F.concat(*ff_parts)
    # PNG: raw deflate payload = 4 × (filter 0 + 4 pixel bytes);
    # adler32 with no mod wrap (see docstring), crc32 via the builtin.
    # 20-byte raw stream (4 × [filter, 4 pixels]); weight of the byte
    # at 1-based position p is 21−p, filters contribute 0
    adler_a = sum(dv, F.lit(1))
    weights = [19, 18, 17, 16, 14, 13, 12, 11, 9, 8, 7, 6, 4, 3, 2, 1]
    adler_b = sum((dv[i] * weights[i] for i in range(16)), F.lit(20))
    scanlines = F.concat(
        *(
            part
            for r in range(4)
            for part in (F.lit(b"\x00"), F.unhex(F.substring(hx, 8 * r + 1, 8)))
        )
    )
    idat_body = F.concat(
        F.lit(b"IDAT"),
        F.lit(seg["png_zpre"]),
        scanlines,
        _int_be32(adler_b * 65536 + adler_a),
    )
    png = F.concat(
        F.lit(seg["png_hdr"]), idat_body, _int_be32(F.crc32(idat_body)),
        F.lit(seg["png_iend"]),
    )
    # GIF: codes (CLEAR, pixel) × 16 + EOI at 9 bits, LSB-first — each
    # 4-pixel group packs to 9 bytes whose layout is fixed arithmetic
    # in the pixel values (b0 is always 0; CLEAR contributes the
    # constants 1/4/16/64).
    gif_parts = [F.lit(seg["gif_hdr"])]
    for g in range(4):
        gif_parts += _gif_cleared_stream_parts(dv[4 * g : 4 * g + 4])
    gif = F.concat(*gif_parts, F.lit(seg["gif_end"]))
    # P4: rows are byte-padded, so the 4 pixel bits of row r are the
    # HIGH nibble of digest byte r — the raw bytes ship verbatim
    p4 = F.concat(F.lit(b"P4\n4 4\n"), F.unhex(F.substring(hx, 1, 8)))
    # P2: decimal ASCII tokens (conv() already yields the decimal
    # string; encode() keeps the concat in binary)
    p2_parts = [F.lit(b"P2\n4 4\n255\n")]
    for i in range(16):
        p2_parts += [
            F.encode(F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10), "utf-8"),
            F.lit(b" "),
        ]
    p2 = F.concat(*p2_parts)
    # P1: the same 16 ink bits as P4, as ASCII digits PACKED without
    # any separating whitespace (legal per the PBM spec)
    p1_parts = [F.lit(b"P1\n4 4\n")]
    for r in range(4):
        for c in range(4):
            p1_parts.append(
                F.encode(
                    F.shiftright(dv[r], 7 - c).bitwiseAND(F.lit(1)).cast("string"),
                    "utf-8",
                )
            )
    p1 = F.concat(*p1_parts)
    tiff_be = F.concat(F.lit(seg["tiff_be"]), digest)
    # compressed paths, all literal-run constructions (see
    # _image_container_segments): one raw RLE packet / per-row
    # absolute-mode escapes / one PackBits literal run / the
    # MSB-first LZW clear trick
    tga_rle = F.concat(
        F.lit(seg["tga_rle_hdr"] + b"\x0f"), digest, F.lit(seg["tga_foot"])
    )
    bmp_rle_parts = [F.lit(seg["bmp_rle"])]
    for r in range(4):
        bmp_rle_parts += [
            F.lit(seg["bmp_rle_mid"]),
            F.unhex(F.substring(hx, 8 * r + 1, 8)),
            F.lit(seg["bmp_rle_eol"]),
        ]
    bmp_rle = F.concat(*bmp_rle_parts, F.lit(seg["bmp_rle_eob"]))
    tiff_pb = F.concat(F.lit(seg["tiff_pb"] + b"\x0f"), digest)
    lzw_parts = [F.lit(seg["tiff_lzw"])]
    for g in range(4):
        lzw_parts += _tiff_lzw_cleared_stream_parts(
            dv[4 * g : 4 * g + 4], db[4 * g : 4 * g + 4]
        )
    tiff_lzw = F.concat(*lzw_parts, F.lit(b"\x80\x80"))
    # baseline JPEG: DC-only entropy blocks looked up from the
    # 512-byte literal table (2 bytes per digest byte), RST0-7
    # between MCUs (DRI=1), EOI tail — see _jpeg_dc_segments
    jseg = _jpeg_dc_segments()
    jpg_parts = [F.lit(jseg["hdr_gray"])]
    for i in range(16):
        jpg_parts.append(_jpeg_mcu_lookup(jseg, dv[i]))
        if i < 15:
            jpg_parts.append(F.lit(bytes([0xFF, 0xD0 + (i % 8)])))
    jpg = F.concat(*jpg_parts, F.lit(b"\xff\xd9"))
    # ICO-wrapped PNG: the PNG stream's length is digest-independent,
    # so the ICONDIR + entry (size/offset) is one constant literal
    png_len = (
        len(seg["png_hdr"]) + 4 + len(seg["png_zpre"]) + 20 + 4 + 4
        + len(seg["png_iend"])
    )
    import struct as _struct

    ico_hdr = _struct.pack("<HHH", 0, 1, 1) + _struct.pack(
        "<BBBBHHII", 4, 4, 0, 0, 1, 32, png_len, 22
    )
    ico_png = F.concat(F.lit(ico_hdr), png)
    m = F.col("doc_id") % 18
    branches = [
        pgm, bmp, tga, tiff, qoi, ff,
        png, gif, p4, p2, p1, tiff_be,
        tga_rle, bmp_rle, tiff_pb, tiff_lzw, jpg, ico_png,
    ]
    chunks = []
    for lo in (0, 6, 12):
        c = F.when(m == lo, branches[lo])
        for i in range(lo + 1, lo + 6):
            c = c.when(m == i, branches[i])
        chunks.append(c)
    return tuple(chunks)


@query(
    "multimodal_image_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    s AS (SELECT doc_id, sum(byte) AS sb FROM b GROUP BY doc_id),
    n AS (
      -- bilevel legs: pixels are the HIGH-nibble bits of the first 4
      -- digest bytes, PBM ink convention (1 = black = 0 gray); z
      -- counts the ZERO bits, each rendering as 255
      SELECT doc_id,
             sum(4 - (((byte >> 7) & 1) + ((byte >> 6) & 1)
                    + ((byte >> 5) & 1) + ((byte >> 4) & 1))) AS z
      FROM b WHERE i < 4 GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(CASE WHEN s.doc_id % 18 = 16 THEN 32 ELSE 4 END
                AS BIGINT) AS height,  -- JPEG: 16 flat 8x8 MCUs
           CAST(CASE WHEN s.doc_id % 18 = 16 THEN 32 ELSE 4 END
                AS BIGINT) AS width,
           CAST(CASE s.doc_id % 18
                  WHEN 1 THEN 3   -- BMP: identity palette expands to RGB
                  WHEN 4 THEN 3   -- QOI: channels=3 header
                  WHEN 5 THEN 4   -- farbfeld: always RGBA
                  WHEN 7 THEN 3   -- GIF: palette expands to RGB
                  WHEN 13 THEN 3  -- BMP RLE8: palette expands to RGB
                  ELSE 1          -- gray legs (incl. JPEG 16, ICO-PNG 17)
                END AS BIGINT) AS channels,
           CASE s.doc_id % 18
                WHEN 5 THEN CAST(3 * sb + 16 * 255 AS DOUBLE) / 64  -- +alpha
                WHEN 8 THEN CAST(255 * n.z AS DOUBLE) / 16   -- P4 bilevel
                WHEN 10 THEN CAST(255 * n.z AS DOUBLE) / 16  -- P1 bilevel
                ELSE CAST(sb AS DOUBLE) / 16
           END AS mean_byte
    FROM s JOIN n ON n.doc_id = s.doc_id
    """,
)
def multimodal_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 with REAL decode under the oracle, across the WHOLE native
    image-format matrix (r10 — the video query's dual-container trick
    generalized; r11 adds the baseline-JPEG branch): each document
    ships its 16 md5 digest bytes as a 4×4 gray raster (the JPEG
    branch: as 16 flat 8×8 blocks of a 32×32 raster) in ONE of
    eighteen container branches chosen by doc_id % 18 —
    0 P5 PGM; 1 8-bit paletted BMP (identity-gray palette,
    bottom-up); 2 grayscale TGA 2.0 (footer-routed); 3 uncompressed
    little-endian TIFF; 4 QOI (OP_RGB literals, r=g=b); 5 farbfeld
    (16-bit BE samples as byte·257, opaque alpha); 6 PNG
    (stored-deflate zlib stream with the adler32 computed as a LINEAR
    function of the digest bytes — no mod wrap: A ≤ 4081, weighted
    sum ≤ 40820 < 65521 — and the IDAT CRC via F.crc32); 7 GIF
    (clear-code-per-literal LZW whose 38-byte stream is a fixed
    bit-shuffle of the pixels, identity-gray 256-entry palette);
    8 P4 packed-bilevel PBM (the first 4 digest bytes' HIGH nibbles
    as MSB-first ink bits, row padding in the low nibbles); 9 P2
    ASCII PGM (digest bytes as decimal tokens via conv()); 10 P1
    ASCII PBM with digits PACKED without whitespace (the spec quirk
    path), same bits as branch 8; 11 the SAME TIFF as branch 3 in
    BIG-ENDIAN (MM) byte order; and the COMPRESSED decode paths via
    literal-run constructions that still carry the digest verbatim —
    12 TGA type-11 RLE (one 16-pixel raw packet), 13 BMP RLE8
    (per-row absolute-mode escapes + EOL/EOB), 14 TIFF PackBits (one
    literal run), 15 TIFF LZW (the clear-code trick in MSB-first
    framing with the EarlyChange schedule pinned at width 9,
    `_tiff_lzw_cleared_stream_parts`); and 16 baseline JPEG (r11):
    DC-only 32×32 grayscale SOF0 whose 16 MCUs decode to flat 8×8
    tiles of exactly the digest bytes — DRI=1 resets the predictor so
    each 2-byte entropy block is a per-byte table lookup
    (`_jpeg_dc_segments`), exercising the REAL Huffman + dequant +
    IDCT path end-to-end; and 17 ICO-wrapped PNG (r11): the SAME PNG
    stream inside an ICONDIR whose entry size/offset fields must
    parse exactly for the PNG router to see the blob — the favicon
    container under the oracle. Every payload is JVM-side
    concat/arithmetic — no UDF builds bytes — and all eighteen run
    through the genuine `image_stats` → `decode_image` dispatch. The
    oracle recomputes the statistics once from the hex digest:
    identical gray pixels everywhere, so only channels (palette/RGBA
    expansion), the farbfeld alpha term, the bilevel ink formula, and
    the JPEG 32×32 geometry branch on doc_id % 18 (the JPEG mean is
    the SAME sum/16: 16 flat 64-pixel tiles). A pixel, geometry,
    palette, filter, checksum, bit-order, RLE-framing,
    ASCII-tokenizer, or IDCT divergence in ANY branch flips the hash.
    Exactness: integer pixel sums (≤ 16·255, resp. 3·sum+4080
    ≤ 16320, resp. 255·z ≤ 4080; the JPEG tiles are integer-exact
    after np.rint, float error < 1e-13 of a unit), one final
    power-of-two division in both engines."""
    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    # The 18-branch tree is too large for whole-stage codegen: janino
    # REJECTS the fused stage, and a failing WSCG compile is not
    # cached, so every execution re-paid ~0.6 s re-failing it; even
    # the compiled chunked form ran slower than interpreted eval (the
    # generated methods exceed the JIT's size threshold). The
    # `reflect` no-op tail is the stock CodegenFallback expression:
    # it pins this one projection to the non-WSCG path (expression
    # codegen still applies and caches), measured 1.0 -> 0.5 s for
    # the payload stage, value-identical (concat with X'' is the
    # binary identity; doc_id & 0 == 0 always).
    no_wscg_tail = F.unhex(
        F.substring(
            F.expr("reflect('java.lang.Long', 'toString', doc_id & 0)"), 1, 0
        )
    )
    c0, c1, c2 = _image_payload_chunks()
    payloads = docs.select(
        "doc_id",
        F.concat(F.coalesce(c0, c1, c2), no_wscg_tail).alias("payload"),
    )
    return image_stats(payloads)


@query(
    "multimodal_jpeg_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 6 = 2 THEN 64 ELSE 32 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 6 = 2 THEN 64 ELSE 32 END
                AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 6 IN (1, 2) THEN 3 ELSE 1 END
                AS BIGINT) AS channels,
           CAST(sum(byte) AS DOUBLE) / 16 AS mean_byte
    FROM b GROUP BY doc_id
    """,
)
def multimodal_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native JPEG decoder (jpeg.py, r11) under the external
    oracle across its FEATURE matrix, doc_id % 6 — every leg DC-only
    (flat 8×8 tiles are integer-exact through the float IDCT, so the
    oracle stays pure digest arithmetic) but each exercising a
    different decode path end-to-end:
    0 grayscale SOF0 32×32, one digest byte per MCU, DRI=1 + RST0-7
      (predictor reset, segment realignment, cyclic-index check);
    1 YCbCr 4:4:4 interleaved 32×32 — three per-component DC
      predictors per MCU, chroma blocks the zero-diff unit (flat 128
      ⇒ the BT.601 inverse is exactly identity, R=G=B=Y);
    2 YCbCr 4:2:0 64×64 — 2×2 sampling factors, four luma blocks per
      MCU (first carries the digest byte, the rest zero diffs against
      the in-MCU luma predictor ⇒ a flat 16×16 tile), nearest-
      neighbour chroma upsampling of the flat-128 plane;
    3 grayscale SOF1 (extended sequential) with a 16-bit Pq=1 DQT —
      the alternate frame marker and wide-quant parse paths;
    4 PROGRESSIVE (SOF2) grayscale 32×32: a DC scan (the same 2-byte
      units — their trailing 6 bits become byte-alignment padding
      since progressive DC scans carry no EOB) followed by DRI=0 and
      an AC scan whose ENTIRE entropy is one 0x00 byte (EOBn symbol
      at code length 4 + 4 extra bits = EOB run of exactly 16
      blocks), exercising spectral selection and EOB-run decode;
    5 progressive SUCCESSIVE APPROXIMATION: the DC scan at Al=1
      ships ⌊(b−128)/2⌋ from a second 512-byte table, a DC
      refinement scan (Ah=1) ships bit b&1 as one bit + 7 pad bits
      per restart segment — 2·⌊x/2⌋+(x&1)=x makes the composition
      exact — then the same EOB-run AC scan.
    Payloads are JVM-side concat: headers are literals, each entropy
    block is a 2-byte substr lookup into a 512-byte DC table
    (`_jpeg_dc_segments` — custom Huffman lengths 10−s make every
    block a fixed 16 bits with no 0xFF stuffing possible); the
    refinement bytes are plain byte arithmetic. Means are
    sum(digest)/16 in all six legs (flat tiles of 64/256 px each);
    geometry and channel count branch on the leg. A Huffman,
    predictor, sampling, upsampling, color-matrix, DQT-width,
    EOB-run, or refinement-bit divergence flips the hash. Reference
    has no media surface (SURVEY.md §0); need is BASELINE.json's
    "multimodal columns" north star — JPEG is the #1 image format in
    real corpora, and most large web JPEGs are progressive."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    dv = [
        F.conv(F.substring(F.col("hx"), 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    jseg = _jpeg_dc_segments()
    eoi = F.lit(b"\xff\xd9")

    def entropy(chroma_units: int) -> list:
        parts = []
        for i in range(16):
            parts.append(_jpeg_mcu_lookup(jseg, dv[i]))
            if chroma_units:
                parts.append(F.lit(bytes(jseg["s0"] * chroma_units)))
            if i < 15:
                parts.append(F.lit(bytes([0xFF, 0xD0 + (i % 8)])))
        return parts

    gray_entropy = entropy(0)
    jpg_gray = F.concat(F.lit(jseg["hdr_gray"]), *gray_entropy, eoi)
    # 4:4:4: per MCU one luma block + Cb/Cr zero-diff units
    jpg_444 = F.concat(F.lit(jseg["hdr_444"]), *entropy(2), eoi)
    # 4:2:0: per MCU luma + 3 repeated-luma zero diffs + Cb + Cr
    jpg_420 = F.concat(F.lit(jseg["hdr_420"]), *entropy(5), eoi)
    jpg_sof1 = F.concat(F.lit(jseg["hdr_sof1"]), *gray_entropy, eoi)
    # progressive: DC entropy reuses the same per-byte units (their
    # low 6 bits are segment padding here), the AC scan is constant
    jpg_prog = F.concat(
        F.lit(jseg["hdr_prog"]), *gray_entropy, F.lit(jseg["prog_tail"]), eoi
    )
    # successive approximation: Al=1 DC units, then one refinement
    # byte (b & 1 in the top bit) per restart segment
    sa_parts = [F.lit(jseg["hdr_prog_sa"])]
    for i in range(16):
        sa_parts.append(
            F.lit(jseg["mcu_al1"]).substr(dv[i] * 2 + 1, F.lit(2))
        )
        if i < 15:
            sa_parts.append(F.lit(bytes([0xFF, 0xD0 + (i % 8)])))
    sa_parts.append(F.lit(jseg["sa_refine_sos"]))
    for i in range(16):
        sa_parts.append(_int_byte(dv[i].bitwiseAND(F.lit(1)) * 128))
        if i < 15:
            sa_parts.append(F.lit(bytes([0xFF, 0xD0 + (i % 8)])))
    jpg_sa = F.concat(*sa_parts, F.lit(jseg["prog_tail"]), eoi)
    m = F.col("doc_id") % 6
    payload = (
        F.when(m == 0, jpg_gray)
        .when(m == 1, jpg_444)
        .when(m == 2, jpg_420)
        .when(m == 3, jpg_sof1)
        .when(m == 4, jpg_prog)
        .otherwise(jpg_sa)
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return image_stats(payloads)


def _vp8l_segments() -> dict:
    """Constant byte segments + per-byte lookup tables for the WebP
    VP8L rotation legs (r12): eight feature legs, each a complete
    lossless WebP whose entropy-coded body is a FIXED-LENGTH
    byte-aligned function of the digest bytes, written from the
    public VP8L spec (RFC 9649 §3) independently of webp.py.

    The byte-alignment trick: the "green" code assigns all 256
    literals length 8 (canonical ⇒ code(s) = s), and the red/blue/
    alpha/distance codes are single-symbol (zero-cost), so one pixel
    is exactly one stream byte — the bit-reversal of the literal
    value, since prefix codes are written MSB-first into the
    LSB-first stream (table ``rev``). Headers are padded to a byte
    boundary with semantically-null knobs (extra all-zero slots in
    the code-length table, 3 bits each, and the 8-bit vs 1-bit
    simple-code symbol representation, +7 bits), searched
    automatically. Per leg:
    0 plain literals (green = digest byte, red/blue 0);
    1 SUBTRACT-GREEN transform (inverse makes r = b = g: gray);
    2 PREDICTOR transform, mode-0 tile: digest bytes in the 3×3
      interior, zero residuals on the edges — exercises the black/
      L-edge/T-edge rules and the transform-tile sub-image;
    3 COLOR CACHE (2 bits): each digest byte ships as a 13-bit
      literal + its own 3-bit cache-hit symbol (alphabet 284:
      literals@13, cache@3, Kraft-filling unused length symbols);
    4 COLOR-INDEXING: 16-gray palette (17·i), width_bits=1 pixel
      bundling — packed green = nibble-swapped digest byte;
    5 META-PREFIX (8×2, two groups: left = digest literals, right =
      a zero-cost group) + an LZ77 backref of length 12 through
      SHORT distance code 24 ((4,0) in the neighbor map ⇒ dist 4),
      replicating the 4 digest bytes across the image;
    6 COLOR TRANSFORM with all multipliers 32 ((32·s8(g))>>5 = s8(g)
      exactly): red = g, blue = 2g mod 256 — signed-delta path with
      a digest-arithmetic oracle;
    7 alpha_is_used: green and alpha both carry digest bytes (2-byte
      units), 4-channel output.
    """
    cl_order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
                13, 14, 15)

    class W:
        def __init__(self):
            self.bits: list[int] = []

        def w(self, v, n):
            for k in range(n):
                self.bits.append((v >> k) & 1)

        def code(self, c, n):
            for k in range(n - 1, -1, -1):
                self.bits.append((c >> k) & 1)

        def tobytes(self):
            out = bytearray((len(self.bits) + 7) // 8)
            for i, b in enumerate(self.bits):
                out[i >> 3] |= b << (i & 7)
            return bytes(out)

    def canon(lengths):
        syms = sorted((ln, s) for s, ln in lengths.items())
        out = {}
        codev, prev = 0, syms[0][0]
        for ln, s in syms:
            codev <<= ln - prev
            prev = ln
            out[s] = (codev, ln)
            codev += 1
        return out

    def single(w, sym, wide=False):
        w.w(1, 1)
        w.w(0, 1)
        if sym < 2 and not wide:
            w.w(0, 1)
            w.w(sym, 1)
        else:
            w.w(1, 1)
            w.w(sym, 8)

    def simple2(w, s0, s1):
        w.w(1, 1)
        w.w(1, 1)
        if s0 < 2:
            w.w(0, 1)
            w.w(s0, 1)
        else:
            w.w(1, 1)
            w.w(s0, 8)
        w.w(s1, 8)

    def normal(w, cl_lengths, seq, extra_slots=0, max_sym=None):
        """Code-length-coded definition. seq items are (cl_symbol,
        extra_bits, extra_value) reads in stream order; max_sym is
        the read COUNT for the early-stop counter (None = absent)."""
        cl_codes = canon(cl_lengths)
        w.w(0, 1)
        need = max(max(cl_order.index(s) for s in cl_lengths) + 1, 4)
        need += extra_slots
        assert need <= 19
        w.w(need - 4, 4)
        for i in range(need):
            w.w(cl_lengths.get(cl_order[i], 0), 3)
        if max_sym is None:
            w.w(0, 1)
        else:
            w.w(1, 1)
            nb = 2
            while (1 << nb) <= max_sym - 2:
                nb += 2
            w.w((nb - 2) // 2, 3)
            w.w(max_sym - 2, nb)
        onecl = len(cl_lengths) == 1
        for s, eb, ev in seq:
            if not onecl:
                c, n = cl_codes[s]
                w.code(c, n)
            w.w(ev, eb)

    def green256(w, extra):
        # all 256 literals at length 8: canonical code(s) = s
        normal(w, {8: 1}, [(8, 0, 0)] * 256, extra_slots=extra, max_sym=256)

    def const_subimage(w, a, r, g, b):
        # 1x1 transform tile: five single-symbol codes, 0-bit pixel
        w.w(0, 1)
        single(w, g)
        single(w, r)
        single(w, b)
        single(w, a)
        single(w, 0)

    def hdr(w, width, height, alpha):
        w.w(width - 1, 14)
        w.w(height - 1, 14)
        w.w(alpha, 1)
        w.w(0, 3)

    def trailer(w, wides, alpha_sym=255):
        single(w, 0, wides & 1)  # red
        single(w, 0, wides & 2)  # blue
        if alpha_sym < 2:
            single(w, alpha_sym, wides & 8)
        else:
            single(w, alpha_sym)
        single(w, 0, wides & 4)  # distance

    def leg0(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(0, 3)  # no transforms, no cache, no meta
        green256(w, extra)
        trailer(w, wides)

    def leg1(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(1, 1)
        w.w(2, 2)  # subtract-green
        w.w(0, 3)
        green256(w, extra)
        trailer(w, wides)

    def leg2(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(1, 1)
        w.w(0, 2)  # predictor transform
        w.w(0, 3)  # size_bits = 2 → one 4×4 tile
        const_subimage(w, 255, 0, 0, 0)  # tile green = mode 0
        w.w(0, 3)
        green256(w, extra)
        trailer(w, wides, alpha_sym=0)  # alpha residual is 0

    def leg3(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(0, 1)  # no transforms
        w.w(1, 1)
        w.w(2, 4)  # color cache, 2 bits
        w.w(0, 1)  # no meta
        seq = [(13, 0, 0)] * 256
        seq += [(2, 0, 0), (3, 0, 0), (4, 0, 0), (5, 0, 0)]
        seq += [(18, 7, 9)]  # 20 zeros (11 + 9) for symbols 260..279
        seq += [(3, 0, 0)] * 4  # cache symbols 280..283
        normal(w, {13: 1, 3: 2, 2: 4, 4: 4, 5: 4, 18: 4}, seq,
               extra_slots=extra)
        trailer(w, wides)

    def leg4(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(1, 1)
        w.w(3, 2)  # color-indexing transform
        w.w(15, 8)  # 16 palette entries
        # palette sub-image 16×1: deltas (255,0,0,0) then 15×(0,17,17,17)
        w.w(0, 1)
        simple2(w, 0, 17)  # green
        simple2(w, 0, 17)  # red
        simple2(w, 0, 17)  # blue
        simple2(w, 0, 255)  # alpha
        single(w, 0)  # dist
        w.code(0, 1), w.code(0, 1), w.code(0, 1), w.code(1, 1)
        for _ in range(15):
            w.code(1, 1), w.code(1, 1), w.code(1, 1), w.code(0, 1)
        w.w(0, 3)  # end transforms, no cache, no meta
        green256(w, extra)
        trailer(w, wides)

    def leg5(w, extra, wides):
        hdr(w, 8, 2, 0)
        w.w(0, 2)  # no transforms, no cache
        w.w(1, 1)
        w.w(0, 3)  # meta-prefix bits = 2 → entropy image 2×1
        w.w(0, 1)
        simple2(w, 0, 1)  # entropy greens: group 0 then group 1
        single(w, 0)
        single(w, 0)
        single(w, 255)
        single(w, 0)
        w.code(0, 1)
        w.code(1, 1)
        # group 0 (left half): digest literals
        green256(w, extra)
        single(w, 0, wides & 1)
        single(w, 0, wides & 2)
        single(w, 255)
        single(w, 0, wides & 4)
        # group 1 (right half): green = single length-code symbol 262
        # (262 zeros via two repeat-18s, then one length-1)
        normal(w, {18: 1, 1: 1},
               [(18, 7, 127), (18, 7, 113), (1, 0, 0)], max_sym=3)
        single(w, 0, wides & 8)
        single(w, 0, wides & 16)
        single(w, 255)
        single(w, 8)  # distance prefix code 8 → plane 24 = (4,0) → dist 4

    def leg6(w, extra, wides):
        hdr(w, 4, 4, 0)
        w.w(1, 1)
        w.w(1, 2)  # color transform
        w.w(0, 3)  # size_bits = 2
        # tile: red=red_to_blue=32, green=green_to_blue=32,
        # blue=green_to_red=32
        const_subimage(w, 255, 32, 32, 32)
        w.w(0, 3)
        green256(w, extra)
        trailer(w, wides)

    def legA1(w, extra, wides):
        # animation frame 1: 4x2 subtract-green gray (full canvas)
        hdr(w, 4, 2, 0)
        w.w(1, 1)
        w.w(2, 2)
        w.w(0, 3)
        green256(w, extra)
        trailer(w, wides)

    def legA2(w, extra, wides):
        # animation frame 2: 2x2 subtract-green gray (sub-rect)
        hdr(w, 2, 2, 0)
        w.w(1, 1)
        w.w(2, 2)
        w.w(0, 3)
        green256(w, extra)
        trailer(w, wides)

    def leg7(w, extra, wides):
        hdr(w, 4, 2, 1)
        w.w(0, 3)
        green256(w, extra)
        single(w, 0, wides & 1)  # red
        single(w, 0, wides & 2)  # blue
        green256(w, 0)  # alpha carries digest bytes too
        single(w, 0, wides & 4)  # dist

    def aligned(build) -> bytes:
        for wides in range(32):
            for extra in range(8):
                w = W()
                try:
                    build(w, extra, wides)
                except AssertionError:
                    continue
                if len(w.bits) % 8 == 0:
                    return w.tobytes()
        raise AssertionError("no byte-aligned VP8L header variant")

    def container(hdr_bytes: bytes, unit_len: int, tail: bytes = b"") -> bytes:
        # VP8L is the final chunk, so an odd size carries no pad byte
        # (walkers only pad BETWEEN chunks) — the RIFF size is exact
        chunk = 1 + len(hdr_bytes) + unit_len + len(tail)
        riff = 4 + 8 + chunk
        return (
            b"RIFF" + struct.pack("<I", riff) + b"WEBP"
            + b"VP8L" + struct.pack("<I", chunk) + b"\x2f" + hdr_bytes
        )

    rev = bytes(int(f"{s:08b}"[::-1], 2) for s in range(256))
    # leg 3 per-byte unit: 13-bit literal code 7936+b, then the 3-bit
    # cache-hit code 3+idx for the pixel 0xFF000000 | (b << 8)
    t3 = bytearray()
    for b in range(256):
        w = W()
        w.code(7936 + b, 13)
        px = 0xFF000000 | (b << 8)
        idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 30
        w.code(3 + idx, 3)
        t3 += w.tobytes()
    # leg 4: packed green = nibble swap (first pixel in low bits)
    t4 = bytes(rev[((b >> 4) | ((b & 15) << 4))] for b in range(256))
    tail5 = W()
    tail5.w(3, 2)  # length 12 = prefix code 6 + extra 3
    tail5.w(7, 3)  # plane 24 = prefix code 8 + extra 7
    hdrs = [aligned(f) for f in
            (leg0, leg1, leg2, leg3, leg4, leg5, leg6, leg7)]
    anim_hdrs = [aligned(legA1), aligned(legA2)]
    unit_lens = [16, 16, 16, 16, 8, 4, 16, 16]
    tails = [b""] * 8
    tails[5] = tail5.tobytes()
    return {
        "rev": rev,
        "t3": bytes(t3),
        "t4": t4,
        "full": [
            container(hdrs[i], unit_lens[i], tails[i]) for i in range(8)
        ],
        "tails": tails,
        "anim1_hdr": anim_hdrs[0],
        "anim2_hdr": anim_hdrs[1],
    }


@memo_constant_column
def _webp_payload_expr():
    """The 8-leg VP8L payload over (doc_id, hx) as one CONSTANT
    expression tree, built once per process (~0.9 s of py4j Column
    construction per build — see memo_constant_column)."""
    dv = [
        F.conv(F.substring(F.col("hx"), 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    seg = _vp8l_segments()
    rev = F.lit(seg["rev"])

    def lk(i):
        return rev.substr(dv[i] + 1, F.lit(1))

    legs = []
    # leg 0/1/6: header + all 16 digest bytes bit-reversed
    for leg in (0, 1, 6):
        legs.append((leg, F.concat(F.lit(seg["full"][leg]),
                                   *[lk(i) for i in range(16)])))
    # leg 2: digest at (0,0) and the 3×3 interior, zero on the edges
    z = bytes(1)
    order2 = [lk(0), F.lit(z * 4), lk(1), lk(2), lk(3), F.lit(z),
              lk(4), lk(5), lk(6), F.lit(z), lk(7), lk(8), lk(9)]
    legs.append((2, F.concat(F.lit(seg["full"][2]), *order2)))
    # leg 3: 2-byte literal+cache units for the first 8 digest bytes
    legs.append((3, F.concat(
        F.lit(seg["full"][3]),
        *[F.lit(seg["t3"]).substr(dv[i] * 2 + 1, F.lit(2))
          for i in range(8)],
    )))
    # leg 4: packed palette indices = nibble-swapped digest bytes
    legs.append((4, F.concat(
        F.lit(seg["full"][4]),
        *[F.lit(seg["t4"]).substr(dv[i] + 1, F.lit(1)) for i in range(8)],
    )))
    # leg 5: 4 digest literals + the constant backref tail
    legs.append((5, F.concat(
        F.lit(seg["full"][5]), *[lk(i) for i in range(4)],
        F.lit(seg["tails"][5]),
    )))
    # leg 7: interleaved green/alpha digest bytes (2-byte pixels)
    legs.append((7, F.concat(F.lit(seg["full"][7]),
                             *[lk(i) for i in range(16)])))
    m = F.col("doc_id") % 8
    expr_by_leg = dict(legs)
    payload = expr_by_leg[7]
    for leg in range(6, -1, -1):
        payload = F.when(m == leg, expr_by_leg[leg]).otherwise(payload)
    return payload


@query(
    "multimodal_webp_decode_stats",
    oracle="""
    WITH p AS (
      SELECT doc_id, doc_id % 8 AS m, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id, m, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    )
    SELECT doc_id,
           CAST(CASE WHEN m IN (5, 7) THEN 2 ELSE 4 END AS BIGINT) AS height,
           CAST(CASE WHEN m = 5 THEN 8 ELSE 4 END AS BIGINT) AS width,
           CAST(CASE WHEN m = 7 THEN 4 ELSE 3 END AS BIGINT) AS channels,
           CAST(sum(CASE
             WHEN m = 0 THEN byte
             WHEN m = 1 THEN 3 * byte
             WHEN m = 2 THEN CASE WHEN i = 0 THEN 7 * byte
                                  WHEN i <= 9 THEN byte ELSE 0 END
             WHEN m = 3 THEN CASE WHEN i < 8 THEN 2 * byte ELSE 0 END
             WHEN m = 4 THEN CASE WHEN i < 8
                  THEN 51 * ((byte // 16) + (byte % 16)) ELSE 0 END
             WHEN m = 5 THEN CASE WHEN i < 4 THEN 4 * byte ELSE 0 END
             WHEN m = 6 THEN 2 * byte + (2 * byte) % 256
             ELSE byte END) AS DOUBLE)
           / CASE WHEN m = 7 THEN 32 ELSE 48 END AS mean_byte
    FROM b GROUP BY doc_id, m
    """,
)
def multimodal_webp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native VP8L decoder (webp.py, r12) under the external
    oracle across its feature matrix, doc_id % 8 — see
    _vp8l_segments' docstring for the eight legs (literals,
    subtract-green, predictor, color cache, palette bundling,
    meta-prefix + short-distance LZ77, color transform, alpha).
    Every leg's entropy body is a per-digest-byte substr into a
    literal table, so the payload concat stays JVM-side; the oracle
    is pure digest arithmetic (a Huffman, transform, cache-hash,
    palette-delta, neighbor-map, or signed-multiplier divergence
    flips the hash). Reference has no media surface (SURVEY.md §0);
    need is BASELINE.json's "multimodal columns" north star — WebP
    is the #2 still-image format in scraped web corpora after JPEG,
    and its lossless mode is fully entropy-domain (no DCT), so it
    belongs in the native envelope."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    payloads = docs.select("doc_id", _webp_payload_expr().alias("payload"))
    return image_stats(payloads)


@memo_constant_column
def _audio_payload_expr():
    """The payload-construction tree over (doc_id, hx) as one
    CONSTANT expression, built once per process (~0.5-2 s of py4j
    Column construction per build otherwise lands inside every
    timed invocation — see memo_constant_column)."""
    import struct

    def wav8_hdr(audio_format: int) -> bytes:
        """16-frame mono 8 kHz 8-bit WAV header for the given format
        tag (1 = PCM, 7 = μ-law, 6 = A-law)."""
        return (
            b"RIFF"
            + struct.pack("<I", 52)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", audio_format, 1, 8000, 8000, 1, 8)
            + b"data"
            + struct.pack("<I", 16)
        )

    wav_hdr = wav8_hdr(1)
    # AIFF COMM rate is an 80-bit IEEE extended float: 8000 = 125·2^6,
    # exponent 16383+12, explicit-integer-bit mantissa 125<<57
    f80_8000 = struct.pack(">HQ", 16383 + 12, 125 << 57)
    aiff_hdr = (
        b"FORM"
        + struct.pack(">I", 62)
        + b"AIFF"
        + b"COMM"
        + struct.pack(">I", 18)
        + struct.pack(">hIh", 1, 16, 8)
        + f80_8000
        + b"SSND"
        + struct.pack(">I", 24)
        + struct.pack(">II", 0, 0)
    )
    au_hdr = b".snd" + struct.pack(">5I", 24, 16, 2, 8000, 1)
    mulaw_hdr = wav8_hdr(7)
    alaw_hdr = wav8_hdr(6)
    caf_hdr = (
        b"caff"
        + struct.pack(">HH", 1, 0)
        + b"desc"
        + struct.pack(">q", 32)
        + struct.pack(">d4sIIIII", 8000.0, b"lpcm", 0, 1, 1, 1, 8)
        + b"data"
        + struct.pack(">q", 20)
        + struct.pack(">I", 0)  # edit count
    )
    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    hx = F.col("hx")
    unsigned = F.unhex(hx)
    # digest ⊕ 0x80 per byte: flip the high nibble's top bit via
    # translate on every odd hex position (md5() is lowercase hex)
    signed_parts = []
    for i in range(16):
        signed_parts.append(
            F.translate(
                F.substring(hx, 2 * i + 1, 1),
                "0123456789abcdef",
                "89abcdef01234567",
            )
        )
        signed_parts.append(F.substring(hx, 2 * i + 2, 1))
    signed = F.unhex(F.concat(*signed_parts))
    # FLAC legs (r11): same 16 signed samples through the native FLAC
    # decoder — a VERBATIM frame and a Rice-coded fixed-order-0 frame;
    # the frame CRC-16 ships as a GF(2)-linear form of the digest
    # bytes (16 substr table lookups XORed onto the zero-message CRC)
    fseg = _flac_segments()
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]

    def flac_crc16(base: int, tables: list) -> object:
        crc = F.lit(base).cast("long")
        for i in range(16):
            lut = F.lit(tables[i]).substr(dv[i] * 2 + 1, F.lit(2))
            crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
        return F.unhex(F.lpad(F.hex(crc), 4, "0"))

    flac_vb = F.concat(
        F.lit(fseg["streaminfo"] + fseg["header"] + b"\x02"),
        signed,
        flac_crc16(fseg["vb_base"], fseg["vb_tables"]),
    )
    # zigzagged residual u = 2v (v≥0) / −2v−1 (v<0) for v = b−128
    uz = [
        F.when(dv[i] >= 128, dv[i] * 2 - 256).otherwise(255 - dv[i] * 2)
        for i in range(16)
    ]
    rice_frag_bytes = dict(fseg["rice_layout"])
    rice_parts = [F.lit(fseg["streaminfo"] + fseg["header"])]
    const = fseg["rice_const"]
    run_start = 0
    for bidx in range(21):
        frags = rice_frag_bytes.get(bidx)
        if not frags:
            continue
        if run_start < bidx:  # flush constant bytes as one literal
            rice_parts.append(F.lit(const[run_start:bidx]))
        expr = F.lit(int(const[bidx]))
        for i, hi, lo, blo in frags:
            width = hi - lo + 1
            expr = expr + (
                F.shiftright(uz[i], lo).bitwiseAND(F.lit((1 << width) - 1))
                * (1 << blo)
            )  # disjoint bit windows: addition == OR
        rice_parts.append(_int_byte(expr))
        run_start = bidx + 1
    if run_start < 21:
        rice_parts.append(F.lit(const[run_start:21]))
    flac_rice = F.concat(
        *rice_parts, flac_crc16(fseg["rice_base"], fseg["rice_tables"])
    )
    m = F.col("doc_id") % 8
    payload = (
        F.when(m == 0, F.concat(F.lit(wav_hdr), unsigned))
        .when(m == 1, F.concat(F.lit(aiff_hdr), signed))
        .when(m == 2, F.concat(F.lit(au_hdr), signed))
        .when(m == 3, F.concat(F.lit(caf_hdr), signed))
        .when(m == 4, F.concat(F.lit(mulaw_hdr), unsigned))
        .when(m == 5, F.concat(F.lit(alaw_hdr), unsigned))
        .when(m == 6, flac_vb)
        .otherwise(flac_rice)
    )
    return payload


@query(
    "multimodal_audio_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    g AS (  -- complemented/toggled G.711 code views of the byte
      SELECT doc_id, byte,
             xor(byte, 255) AS u,   -- mu-law complements the code
             xor(byte, 85) AS a     -- A-law toggles alternate bits
      FROM b
    ),
    lin AS (
      SELECT doc_id,
             CASE doc_id % 8
               WHEN 4 THEN  -- ITU G.711 mu-law expansion
                 (CASE WHEN (u & 128) > 0 THEN -1 ELSE 1 END)
                 * ((((u & 15) * 8 + 132) << ((u >> 4) & 7)) - 132)
               WHEN 5 THEN  -- ITU G.711 A-law expansion (sign inverted
                            -- vs mu-law: bit 0x80 set means POSITIVE)
                 (CASE WHEN (a & 128) > 0 THEN 1 ELSE -1 END)
                 * (CASE WHEN ((a >> 4) & 7) = 0
                         THEN (a & 15) * 16 + 8
                         ELSE ((a & 15) * 16 + 264) << (((a >> 4) & 7) - 1)
                    END)
               ELSE byte - 128  -- 8-bit PCM + FLAC legs (6/7)
             END AS x
      FROM g
    )
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(16 AS BIGINT) AS n_frames,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(16 AS DOUBLE) / 8000 AS duration_s,
           sqrt(CAST(sum(x * x) AS DOUBLE) / 16) AS rms
    FROM lin
    GROUP BY doc_id
    """,
)
def multimodal_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of multimodal_image_decode_stats, rotated (r10;
    FLAC legs r11) across the native container AND companding matrix
    via doc_id % 8:
    - 0 — WAV, unsigned 8-bit PCM (raw digest bytes; the featurizer's
      −128 centering applies per spec);
    - 1 — AIFF, big-endian SIGNED 8-bit (the 80-bit-extended-float
      COMM rate parsed natively);
    - 2 — Sun AU, encoding 2 (signed 8-bit);
    - 3 — Apple CAF, big-endian signed 8-bit LPCM;
    - 4 — WAV format 7, G.711 μ-law (digest bytes as companded codes
      through the vectorized ITU expansion table);
    - 5 — WAV format 6, G.711 A-law (inverted sign convention);
    - 6 — FLAC, VERBATIM subframe (the same signed samples through
      the native Rice/LPC decoder's container walk, frame-header
      CRC-8 and frame CRC-16 — the CRC-16 ships as a GF(2)-LINEAR
      form of the digest bytes: 16 table lookups XORed onto the
      zero-message CRC, the adler32 trick's CRC cousin);
    - 7 — FLAC, Rice-coded FIXED-order-0 subframe: with param 8 every
      zigzagged residual is a fixed 9-bit unit ('1' quotient + 8
      remainder bits), so the residual stream is a fixed MSB-first
      bit-shuffle of u = 2v / −2v−1 starting at bit 19 — the Rice
      DECODER (unary + remainder + zigzag) sits under the oracle.
    Legs 1-3 carry digest⊕0x80 — built JVM-side by translating each
    byte's HIGH hex nibble (0-7 ↔ 8-f) before unhex, no UDF — so all
    four PCM chunk walks decode to the identical int8 samples; legs
    4-5 put the G.711 decode TABLES under the oracle, which
    re-derives the piecewise segment/mantissa expansion in SQL bit
    arithmetic. RMS from exact integer sums of squares (≤ 16·128²
    resp. ≤ 16·32256²), /16 power-of-two, IEEE-correctly-rounded
    sqrt in both engines — bit-equal. A sign-convention, endianness,
    header, f80-rate, companding-table, Rice, or CRC divergence in
    any leg flips the hash."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    payloads = docs.select("doc_id", _audio_payload_expr().alias("payload"))
    return audio_stats(payloads)


def _flac_payload_py(legs: dict, doc_id: int, hx: str) -> bytes:
    """Per-row Python twin of the former `_flac_payload_expr` JVM
    tree over `_flac_matrix_segments`'s symbolic layouts — the SAME
    per-byte fragment windows and the SAME GF(2) wire-byte CRC table
    lookups, transcribed field for field (and pinned by the test
    suite's independent `_python_flac_matrix_payloads` twin, which
    decodes every leg exactly through decode_audio's CRC check).

    Why Python (r16): the unrolled four-leg expression tree pushed
    the fused whole-stage past janino's 64 KB method limit ("Code
    grows beyond 64 KB"), silently degrading the ENTIRE encode stage
    to interpreted execution and costing a ~12 s failed compile
    attempt once per process (found by the r16 sweep). The decode
    half was ALWAYS a Python pass (audio featurize), so building the
    payload inside that same pass removes the giant expression, the
    interpreted fallback, AND one full JVM→Python payload round trip
    (the office-family fusion class, see _encoded_stats_df):
    measured 1.84–2.08 s warm → 0.57–0.62 s, rows-identical."""
    dv = bytes.fromhex(hx)
    vals: dict = {}
    for i in range(16):
        vals[f"x{i}"] = dv[i] ^ 0x80
    for i in range(8):
        # mid = floor((L+R)/2) as 8-bit two's complement; side = L−R
        # as 9-bit two's complement (Python >> is arithmetic)
        vals[f"mid{i}"] = ((dv[i] + dv[i + 8] - 256) >> 1) & 0xFF
        vals[f"side{i}"] = (dv[i] - dv[i + 8]) & 0x1FF
    for i in range(1, 16):
        d = dv[i] - dv[i - 1]
        vals[f"u{i}"] = 2 * d if d >= 0 else -2 * d - 1
    leg = legs[("vb2", "ms", "f1", "const")[int(doc_id) % 4]]
    region = bytearray(leg["const"])
    crc = leg["base"]
    for bidx, frags in leg["layout"]:
        b = region[bidx]
        for key, hi, lo, blo in frags:
            width = hi - lo + 1
            b += ((vals[key] >> lo) & ((1 << width) - 1)) << blo
        region[bidx] = b  # disjoint bit windows: addition == OR
        tbl = leg["tables"][bidx]
        crc ^= (tbl[2 * b] << 8) | tbl[2 * b + 1]
    return leg["prefix"] + bytes(region) + struct.pack(">H", crc)


@query(
    "multimodal_flac_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    s AS (
      SELECT doc_id,
             sum((byte - 128) * (byte - 128)) AS sq,
             max(CASE WHEN i = 0 THEN byte END) AS b0
      FROM b GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 8 ELSE 16 END
                AS BIGINT) AS n_frames,
           CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 2 ELSE 1 END
                AS BIGINT) AS n_channels,
           CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 8 ELSE 16 END
                AS DOUBLE) / 8000 AS duration_s,
           CASE WHEN doc_id % 4 = 3 THEN CAST(abs(b0 - 128) AS DOUBLE)
                ELSE sqrt(CAST(sq AS DOUBLE) / 16) END AS rms
    FROM s
    """,
)
def multimodal_flac_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native FLAC decoder's FEATURE matrix under the external
    oracle, doc_id % 4 (companion to the two container legs in
    multimodal_audio_decode_stats — these four exercise the paths a
    single-subframe mono frame cannot):
    0 independent STEREO, two VERBATIM subframes (left = digest bytes
      0-7, right = 8-15, both signed);
    1 MID/SIDE stereo: mid subframe 8-bit, side subframe 9-bit (the
      +1-bit side rule) — the decorrelation reconstruction
      m2 = (mid<<1)|(side&1); L = (m2+side)>>1; R = (m2−side)>>1
      must return exactly the same left/right samples, putting the
      parity arithmetic under the oracle;
    2 FIXED order-1 predictor, Rice2 param 9: every zigzagged DELTA
      u = 2d / −2d−1 ≤ 510 is a fixed 10-bit unit ('1' quotient + 9
      remainder bits), so the prediction s[i] = s[i−1] + residual
      chain reconstructs the digest exactly;
    3 CONSTANT subframe: one sample value repeated 16× (rms = |v|,
      exact: sqrt of a perfect square).
    Payloads are assembled per row from `_flac_matrix_segments`'s
    symbolic bitstream layouts (per-byte fragment windows of the
    computed field values) with the frame CRC-16 as the GF(2)-linear
    wire-byte form — base ⊕ XOR of per-position table lookups indexed
    by the COMPUTED byte — so the decoder's own CRC verification
    gates every construction. A predictor, zigzag, decorrelation-
    parity, bit-packing, or CRC divergence flips the hash. Build and
    decode run as ONE fused Python pass (r16; see _flac_payload_py —
    the former JVM expression tree overflowed janino's 64 KB method
    limit and ran interpreted). All stats from exact integer sums;
    sqrt is IEEE-correctly rounded in both engines."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    legs = _flac_matrix_segments()
    cols = tuple(f.name for f in _AUDIO_STATS_SCHEMA.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, hx in zip(pdf["doc_id"], pdf["hx"]):
                feats = _audio_features(_flac_payload_py(legs, doc_id, hx))
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(feats[k])
            yield pd.DataFrame(out)

    return docs.mapInPandas(run, _AUDIO_STATS_SCHEMA)


@memo_constant_column
def _media_probe_payload_expr():
    """The payload-construction tree over (doc_id, hx) as one
    CONSTANT expression, built once per process (~0.5-2 s of py4j
    Column construction per build otherwise lands inside every
    timed invocation — see memo_constant_column)."""
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(8)]
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(6)
    ]
    seg = _media_probe_segments()

    def assemble(name: str):
        chunks, tail = seg[name]
        parts = []
        for chunk, di in chunks:
            if chunk:
                parts.append(F.lit(chunk))
            parts.append(db[di])
        parts.append(F.lit(tail))
        return F.concat(*parts)

    og = seg["ogg"]

    def ogg_eos_payload(page0: bytes, granule):
        """BOS page + the shared EOS template with a digest-derived
        granule and its GF(2)-table CRC (identical template for the
        Opus and FLAC legs — the CRC correction is layout-linear)."""
        gbytes = [
            _int_byte(F.shiftright(granule, 8 * k).bitwiseAND(F.lit(255)))
            for k in range(4)
        ]
        crc = F.lit(og["base"]).cast("long")
        for k, pos in enumerate((6, 7, 8, 9)):
            lut = F.lit(og["tables"][pos]).substr(
                F.shiftright(granule, 8 * k).bitwiseAND(F.lit(255)) * 4 + 1,
                F.lit(4),
            )
            crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
        crc_le = F.concat(
            *(
                _int_byte(F.shiftright(crc, 8 * k).bitwiseAND(F.lit(255)))
                for k in range(4)
            )
        )
        return F.concat(
            F.lit(page0 + og["p1_pre"]),
            *gbytes,
            F.lit(og["p1_mid"]),
            crc_le,
            F.lit(og["p1_post"]),
        )

    x24 = dv[0] * 65536 + dv[1] * 256 + dv[2]
    ogg_payload = ogg_eos_payload(og["page0"], F.lit(312) + x24)
    oggflac_payload = ogg_eos_payload(seg["oggflac_page0"], x24)
    ad = seg["adts"]
    adts_payload = F.concat(
        F.lit(ad["hdr6"]),
        _int_byte(dv[4].bitwiseAND(F.lit(3)) + 252),
        F.lit(ad["body"] + ad["hdr6"]),
        _int_byte(dv[5].bitwiseAND(F.lit(3)) + 252),
        F.lit(ad["body"]),
    )
    m3 = seg["mp3"]
    pad = dv[3].bitwiseAND(F.lit(0x7F))
    mp3_payload = F.concat(
        F.lit(m3["id3_pre"]),
        _int_byte(pad),
        F.lit(m3["zeros"]).substr(F.lit(1), pad),
        F.lit(m3["frames"]),
    )
    m = F.col("doc_id") % 7
    payload = (
        F.when(m == 0, assemble("mp4"))
        .when(m == 1, assemble("webm"))
        .when(m == 2, ogg_payload)
        .when(m == 3, mp3_payload)
        .when(m == 4, adts_payload)
        .when(m == 5, oggflac_payload)
        .otherwise(assemble("avi"))
    )
    return payload


@query(
    "multimodal_media_probe_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id,
             max(CASE WHEN i = 0 THEN byte END) AS d0,
             max(CASE WHEN i = 1 THEN byte END) AS d1,
             max(CASE WHEN i = 2 THEN byte END) AS d2,
             max(CASE WHEN i = 3 THEN byte END) AS d3,
             max(CASE WHEN i = 4 THEN byte END) AS d4,
             max(CASE WHEN i = 5 THEN byte END) AS d5,
             max(CASE WHEN i = 6 THEN byte END) AS d6,
             max(CASE WHEN i = 7 THEN byte END) AS d7
      FROM (
        SELECT doc_id, i,
               (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
        FROM p, UNNEST(range(0, 8)) AS t(i)
      ) GROUP BY doc_id
    )
    SELECT doc_id,
           CASE doc_id % 7 WHEN 0 THEN 'mp4' WHEN 1 THEN 'webm'
                WHEN 2 THEN 'ogg' WHEN 3 THEN 'mp3' WHEN 4 THEN 'adts'
                WHEN 5 THEN 'ogg' ELSE 'avi' END AS container,
           CASE doc_id % 7 WHEN 0 THEN 'isom' WHEN 1 THEN 'webm'
                WHEN 2 THEN 'opus' WHEN 3 THEN 'mp3' WHEN 4 THEN 'aac'
                WHEN 5 THEN 'flac' ELSE 'avi' END AS brand,
           CASE doc_id % 7
                WHEN 0 THEN CAST(d0 * 256 + d1 AS DOUBLE) / 1000
                WHEN 1 THEN CAST(2.0 AS DOUBLE)
                WHEN 2 THEN
                  CAST(d0 * 65536 + d1 * 256 + d2 AS DOUBLE) / 48000
                WHEN 3 THEN CAST(3456 AS DOUBLE) / 44100
                WHEN 4 THEN
                  CAST(((d4 % 4) + (d5 % 4) + 2) * 1024 AS DOUBLE) / 16000
                WHEN 5 THEN
                  CAST(d0 * 65536 + d1 * 256 + d2 AS DOUBLE) / 32000
                ELSE CAST(d0 * 256 + d1 AS DOUBLE) / 1000 END AS duration_s,
           CAST(CASE doc_id % 7 WHEN 0 THEN d2
                     WHEN 1 THEN d4 * 256 + d5
                     WHEN 6 THEN d2 ELSE 0 END
                AS BIGINT) AS width,
           CAST(CASE doc_id % 7 WHEN 0 THEN d3
                     WHEN 1 THEN d6 * 256 + d7
                     WHEN 6 THEN d3 ELSE 0 END
                AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 7 IN (0, 1, 6) THEN 1 ELSE 0 END
                AS BIGINT) AS n_video,
           CAST(CASE WHEN doc_id % 7 IN (0, 6) THEN 0 ELSE 1 END
                AS BIGINT) AS n_audio,
           CASE doc_id % 7 WHEN 0 THEN 'avc1' WHEN 1 THEN 'A_OPUS,V_VP9'
                WHEN 2 THEN 'opus' WHEN 3 THEN 'mp3' WHEN 4 THEN 'aac'
                WHEN 5 THEN 'flac' ELSE 'rgb' END AS codecs
    FROM b
    """,
)
def multimodal_media_probe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural media probing under the external oracle (r11,
    widened r12), doc_id % 7 across all seven probe.py container
    walks:
    0 MP4 — spec-shaped ftyp isom + full moov tree: mvhd at timescale
      1000 with the movie duration's low bytes = digest bytes 0-1,
      one video trak whose tkhd 16.16 dimensions carry bytes 2/3,
      hdlr 'vide', stsd 'avc1';
    1 WebM — EBML DocType, Segment → Info{TimestampScale 1e6, float
      Duration 2 s} + Tracks{V_VP9 video with PixelWidth/Height =
      digest bytes 4-7, A_OPUS audio};
    2 Ogg Opus — constant CRC-verified BOS page (OpusHead, pre-skip
      312) + an EOS page whose granule position is 312 + X ticks
      (X = bytes 0-2 as a 24-bit integer ⇒ duration X/48000), the
      page CRC-32 shipped as wire-byte GF(2)-linear table lookups
      XORed onto the zero-granule CRC — the probe VERIFIES it;
    3 MP3 — an ID3v2 tag whose SYNCSAFE size is digest byte 3 & 0x7F
      (the skip arithmetic under the oracle: a wrong skip loses frame
      sync and kills the row) followed by three constant CBR frames
      (MPEG1 Layer III, 128 kbps, 44.1 kHz, 417-byte steps ⇒
      duration 3456/44100 from the frame walk);
    4 ADTS AAC [r12] — two 16 kHz frames whose raw-data-block-count
      bits (header byte 6) are digest-derived, so the per-frame
      1024·blocks accounting is oracle-pinned;
    5 Ogg FLAC [r12] — FLAC mapping 1.0 BOS packet (verbatim fLaC +
      STREAMINFO, rate parsed from the 20-bit field) and the SAME
      digest-granule EOS page as the Opus leg (shared CRC tables);
      duration X/32000 with no pre-skip;
    6 AVI [r12] — RIFF hdrl walk shared with the decoder: avih canvas
      dims from digest bytes 2/3, video strh dwLength (ms at
      scale 1/rate 1000) from bytes 0/1.
    All payloads run through the REAL probe.py parsers via the
    `media_probe` featurizer — no frame decoded. A box-size, vint,
    fixed-point, handler-routing, timescale, granule, page-CRC,
    syncsafe, bitrate-table, or frame-step divergence flips the hash.
    Why: routing/budgeting metadata for codec-gated assets
    (H.264/VP9/Opus/MP3 payloads) is a first-class 100 TB pipeline
    need — BASELINE.json "multimodal columns"; the reference has no
    media surface (SURVEY.md §0)."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    payloads = docs.select("doc_id", _media_probe_payload_expr().alias("payload"))
    return media_probe(payloads)


@query(
    "multimodal_pcm_wide_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 4 * j + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 4 * j + 2, 1)) - 1)
           + ((strpos('0123456789abcdef', substr(hx, 4 * j + 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 4 * j + 4, 1)) - 1)) * 256
             AS v
      FROM p, UNNEST(range(0, 8)) AS t(j)
    ),
    w AS (
      SELECT doc_id,
             sum((v - 65536 * (CASE WHEN v >= 32768 THEN 1 ELSE 0 END))
               * (v - 65536 * (CASE WHEN v >= 32768 THEN 1 ELSE 0 END))) AS sx
      FROM s GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    t24 AS (  -- five 3-byte little-endian two's-complement words
      SELECT b0.doc_id,
             b0.byte + 256 * b1.byte + 65536 * b2.byte
           - 16777216 * (CASE WHEN b2.byte >= 128 THEN 1 ELSE 0 END) AS x
      FROM b b0
      JOIN b b1 ON b1.doc_id = b0.doc_id AND b1.i = b0.i + 1
      JOIN b b2 ON b2.doc_id = b0.doc_id AND b2.i = b0.i + 2
      WHERE b0.i % 3 = 0 AND b0.i < 15
    ),
    w24 AS (SELECT doc_id, sum(x * x) AS st FROM t24 GROUP BY doc_id)
    SELECT w.doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(CASE WHEN w.doc_id % 6 = 5 THEN 5 ELSE 8 END
                AS BIGINT) AS n_frames,
           CAST(1 AS BIGINT) AS n_channels,
           CASE WHEN w.doc_id % 6 = 5 THEN CAST(5 AS DOUBLE) / 8000
                ELSE CAST(8 AS DOUBLE) / 8000 END AS duration_s,
           CASE WHEN w.doc_id % 6 = 5 THEN sqrt(CAST(w24.st AS DOUBLE) / 5)
                ELSE sqrt(CAST(w.sx AS DOUBLE) / 8) END AS rms
    FROM w JOIN w24 ON w24.doc_id = w.doc_id
    """,
)
def multimodal_pcm_wide_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-byte PCM sample ASSEMBLY under the external oracle
    (r10): the digest ships as eight little-endian int16 frames
    through five container/endianness paths chosen by doc_id % 6 —
    0 WAV 16-bit LE; 1 AIFF 16-bit BIG-endian (byte pairs swapped
    JVM-side so the decoded samples are identical); 2 AIFC 'sowt'
    (the little-endian-16 AIFC variant Macs actually shipped — raw
    digest); 3 CAF 16-bit little-endian (desc flag bit 1); 4 Sun AU
    encoding 3 (big-endian — swapped pairs) — plus 5: WAV 24-BIT LE
    PCM, five 3-byte frames from digest bytes 0..14, exercising the
    3-byte sign-extension assembly (vals & 0x800000 << 1). One
    oracle: legs 0-4 share the int16 branch; leg 5's 24-bit words
    are recomputed from the byte spine with a positional self-join.
    Exactness: Σx² ≤ 8·32768² resp. 5·(2^23)² — integer-exact,
    single double division + correctly-rounded sqrt in both
    engines. An endianness, byte-pairing, or sign-extension bug in
    any path flips the hash."""
    import struct

    def wav_pcm_hdr(bits: int, n_bytes: int) -> bytes:
        # odd-sized data chunks carry a RIFF pad byte (appended after
        # the payload bytes by the caller) that counts toward the
        # declared RIFF size but NOT the data chunk size — spec-shaped
        # RIFF, not merely walker-tolerated
        return (
            b"RIFF"
            + struct.pack("<I", 36 + n_bytes + (n_bytes & 1))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", 16)
            + struct.pack(
                "<HHIIHH", 1, 1, 8000, 8000 * bits // 8, bits // 8, bits
            )
            + b"data"
            + struct.pack("<I", n_bytes)
        )

    f80_8000 = struct.pack(">HQ", 16383 + 12, 125 << 57)
    aiff16_hdr = (
        b"FORM"
        + struct.pack(">I", 62)
        + b"AIFF"
        + b"COMM"
        + struct.pack(">I", 18)
        + struct.pack(">hIh", 1, 8, 16)
        + f80_8000
        + b"SSND"
        + struct.pack(">I", 24)
        + struct.pack(">II", 0, 0)
    )
    sowt_hdr = (
        b"FORM"
        + struct.pack(">I", 68)
        + b"AIFC"
        + b"COMM"
        # AIFC COMM mandates a compressionName pstring after the
        # 4-byte tag; ship the minimal empty padded one (\x00\x00)
        # so the fixture is strictly spec-shaped, size 24 not 22
        + struct.pack(">I", 24)
        + struct.pack(">hIh", 1, 8, 16)
        + f80_8000
        + b"sowt"
        + b"\x00\x00"
        + b"SSND"
        + struct.pack(">I", 24)
        + struct.pack(">II", 0, 0)
    )
    caf16_hdr = (
        b"caff"
        + struct.pack(">HH", 1, 0)
        + b"desc"
        + struct.pack(">q", 32)
        + struct.pack(">d4sIIIII", 8000.0, b"lpcm", 2, 2, 1, 1, 16)
        + b"data"
        + struct.pack(">q", 20)
        + struct.pack(">I", 0)
    )
    au16_hdr = b".snd" + struct.pack(">5I", 24, 16, 3, 8000, 1)
    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    le16 = F.unhex(hx)
    be_parts = []
    for j in range(8):  # swap each word's bytes for the BE containers
        be_parts += [
            F.substring(hx, 4 * j + 3, 2),
            F.substring(hx, 4 * j + 1, 2),
        ]
    be16 = F.unhex(F.concat(*be_parts))
    le24 = F.unhex(F.substring(hx, 1, 30))  # 15 bytes = 5 × 3-byte frames
    m = F.col("doc_id") % 6
    payload = (
        F.when(m == 0, F.concat(F.lit(wav_pcm_hdr(16, 16)), le16))
        .when(m == 1, F.concat(F.lit(aiff16_hdr), be16))
        .when(m == 2, F.concat(F.lit(sowt_hdr), le16))
        .when(m == 3, F.concat(F.lit(caf16_hdr), le16))
        .when(m == 4, F.concat(F.lit(au16_hdr), be16))
        .otherwise(F.concat(F.lit(wav_pcm_hdr(24, 15)), le24, F.lit(b"\x00")))
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return audio_stats(payloads)


@query(
    "multimodal_adpcm_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 4 * j + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 4 * j + 2, 1)) - 1)
           + ((strpos('0123456789abcdef', substr(hx, 4 * j + 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(hx, 4 * j + 4, 1)) - 1)) * 256
             AS v
      FROM p, UNNEST(range(0, 8)) AS t(j)
    ),
    w AS (
      SELECT doc_id,
             sum((v - 65536 * (CASE WHEN v >= 32768 THEN 1 ELSE 0 END))
               * (v - 65536 * (CASE WHEN v >= 32768 THEN 1 ELSE 0 END))) AS sx
      FROM s GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    bb AS (
      SELECT doc_id, sum((byte - 128) * (byte - 128)) AS sb
      FROM b GROUP BY doc_id
    )
    SELECT w.doc_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(CASE WHEN w.doc_id % 3 = 2 THEN 1024 ELSE 8 END
                AS BIGINT) AS n_frames,
           CAST(1 AS BIGINT) AS n_channels,
           CASE WHEN w.doc_id % 3 = 2 THEN CAST(1024 AS DOUBLE) / 8000
                ELSE CAST(8 AS DOUBLE) / 8000 END AS duration_s,
           CASE WHEN w.doc_id % 3 = 2 THEN 64 * sqrt(CAST(bb.sb AS DOUBLE))
                ELSE sqrt(CAST(w.sx AS DOUBLE) / 8) END AS rms
    FROM w JOIN bb ON bb.doc_id = w.doc_id
    """,
)
def multimodal_adpcm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ADPCM matrix under the external oracle — r9's IMA-WAV leg
    rotated (r10) across ALL THREE native ADPCM decoders via
    doc_id % 3, each exercised LOSSLESSLY so the oracle can recompute
    exact samples:
    - 0 — WAV IMA (0x0011), r9's construction: eight 8-byte blocks at
      wSamplesPerBlock=1; each block HEADER stores one int16 verbatim
      (digest as 8 LE int16s) and the nibble machinery runs on a
      zero-length slice.
    - 1 — WAV Microsoft (0x0002): four 8-byte blocks at
      wSamplesPerBlock=2 — MS block headers carry sample2/sample1
      VERBATIM (emitted in that order), so the same 8 LE int16s ship
      through the whole MS path (coef-table parse, predictor-index
      validation, header state split) with zero nibbles expanded.
      Identical features to leg 0 → same oracle branch.
    - 2 — AIFC 'ima4': sixteen 34-byte packets of all-zero nibbles;
      nibble 0 at step index 0 has diff = 7>>3 = 0, so all 64 samples
      of packet i equal its header predictor (digest byte ⊕ 0x80 as
      the state word's high byte = (byte−128)·256) — the FULL
      vectorized 64-step expansion runs and must be an exact fixpoint.
      1024 frames; rms = 64·√Σ(byte−128)² (the 2^12 scale factors out
      of the sqrt exactly).
    Exactness: integer sums of squares (≤ 8·32768², resp. ≤ 16·128²),
    power-of-two scalings, IEEE-correctly-rounded sqrt in both
    engines. A header-order, sign-extension, step-table, or
    packet-layout divergence in any of the three decoders flips the
    hash."""
    import struct

    ima_fmt = struct.pack("<HHIIHHHH", 0x0011, 1, 8000, 8000, 8, 4, 2, 1)
    ima_hdr = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(ima_fmt) + 8 + 64)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(ima_fmt))
        + ima_fmt
        + b"data"
        + struct.pack("<I", 64)
    )
    # MS ADPCM: one coefficient pair (256, 0); spb=2 means both header
    # samples emit and no nibble decodes (the 1 body byte is padding)
    ms_fmt = (
        struct.pack("<HHIIHH", 0x0002, 1, 8000, 8000, 8, 4)
        + struct.pack("<HHH", 8, 2, 1)  # cbSize, wSamplesPerBlock, wNumCoef
        + struct.pack("<hh", 256, 0)
    )
    ms_hdr = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(ms_fmt) + 8 + 32)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(ms_fmt))
        + ms_fmt
        + b"data"
        + struct.pack("<I", 32)
    )
    f80_8000 = struct.pack(">HQ", 16383 + 12, 125 << 57)
    ima4_hdr = (
        b"FORM"
        + struct.pack(">I", 596)
        + b"AIFC"
        + b"COMM"
        # empty padded compressionName pstring after the tag: AIFC
        # COMM is spec-mandated ≥ 24 bytes, not the bare-tag 22
        + struct.pack(">I", 24)
        + struct.pack(">hIh", 1, 1024, 16)
        + f80_8000
        + b"ima4"
        + b"\x00\x00"
        + b"SSND"
        + struct.pack(">I", 552)
        + struct.pack(">II", 0, 0)
    )
    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    ima_parts = [F.lit(ima_hdr)]
    z6 = b"\x00" * 6  # step index 0, reserved 0, 4 unconsumed nibble bytes
    for j in range(8):
        ima_parts.append(F.unhex(F.substring(hx, 4 * j + 1, 4)))
        ima_parts.append(F.lit(z6))
    ima = F.concat(*ima_parts)
    ms_parts = [F.lit(ms_hdr)]
    for k in range(4):
        # block k: bpred 0, iDelta 64, sample1 = word 2k+1, sample2 =
        # word 2k (the OLDER sample — emits first), 1 pad body byte
        ms_parts += [
            F.lit(b"\x00\x40\x00"),
            F.unhex(F.substring(hx, 8 * k + 5, 4)),
            F.unhex(F.substring(hx, 8 * k + 1, 4)),
            F.lit(b"\x00"),
        ]
    ms = F.concat(*ms_parts)
    ima4_parts = [F.lit(ima4_hdr)]
    for i in range(16):
        # packet i: BE state word (byte⊕0x80)·256 | step index 0, then
        # 32 zero nibble bytes — high hex nibble translated like the
        # audio rotation's signed legs
        ima4_parts += [
            F.unhex(
                F.concat(
                    F.translate(
                        F.substring(hx, 2 * i + 1, 1),
                        "0123456789abcdef",
                        "89abcdef01234567",
                    ),
                    F.substring(hx, 2 * i + 2, 1),
                )
            ),
            F.lit(b"\x00" * 33),
        ]
    ima4 = F.concat(*ima4_parts)
    m = F.col("doc_id") % 3
    payload = F.when(m == 0, ima).when(m == 1, ms).otherwise(ima4)
    payloads = docs.select("doc_id", payload.alias("payload"))
    return audio_stats(payloads)


def _avi_clip_segments(
    compression: bytes = b"I420", bpp: int = 12, frame_size: int = 12
) -> tuple[bytes, bytes]:
    """Constant byte segments of a 2-frame 4×2 25-fps AVI
    (RIFF('AVI ') → hdrl{avih, strl{strh,strf}} → movi with two
    `frame_size`-byte '00db' frames): returns (prefix ending right
    after the FIRST frame chunk header, bare frame chunk header) —
    the caller splices the two frame payloads. Every size is fixed,
    so the container stays JVM-side literals + digest-derived parts.
    `compression` is the strf fourcc (b"\\x00"*4 = BI_RGB);
    frame_size must be even (RIFF pads odd chunks)."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    assert frame_size % 2 == 0
    w, h, n = 4, 2, 2
    avih = struct.pack("<14I", 40000, 0, 0, 0, n, 0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (
        b"vids" + b"\x00" * 4 + struct.pack("<IHHI", 0, 0, 0, 0)
        + struct.pack("<II", 1, 25)  # dwScale, dwRate → 25 fps
        + struct.pack("<IIIiI", 0, n, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, bpp, compression, 0, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    frame_hdr = b"00db" + struct.pack("<I", frame_size)
    movi_len = 4 + 2 * (8 + frame_size)  # 'movi' + two (hdr+frame) pairs
    movi_open = b"LIST" + struct.pack("<I", movi_len) + b"movi"
    riff_body_len = 4 + len(hdrl) + 8 + movi_len  # 'AVI ' + hdrl + movi chunk
    prefix = (
        b"RIFF" + struct.pack("<I", riff_body_len) + b"AVI "
        + hdrl + movi_open + frame_hdr
    )
    return prefix, frame_hdr


@query(
    "multimodal_video_decode_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    ),
    d AS (
      SELECT f1.doc_id, abs(f2.byte - f1.byte) AS step
      FROM b f1 JOIN b f2 ON f2.doc_id = f1.doc_id AND f2.i = f1.i + 8
      WHERE f1.i < 8
    )
    SELECT b.doc_id,
           CAST(2 AS BIGINT) AS n_frames,
           CAST(2 AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS width,
           CAST(25 AS DOUBLE) AS fps,
           CAST(2 AS DOUBLE) / 25 AS duration_s,
           CAST(sum(b.byte) AS DOUBLE) / 16 AS mean_luma,
           (SELECT CAST(sum(step) AS DOUBLE) / 8 FROM d
            WHERE d.doc_id = b.doc_id) AS mean_frame_delta
    FROM b
    GROUP BY b.doc_id
    """,
)
def multimodal_video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video leg of the oracle-checked decode matrix: a 2-frame
    4×2 25-fps clip per document — frame 1 is the first 8 md5
    digest bytes as LUMA, frame 2 the last 8 — through the genuine
    `video_stats` → `decode_video` stream walk, rotated (r10) across
    FOUR container/pixel-format paths by doc_id % 4:
    - 0 — Cmono Y4M (luma-only planes, r7's leg);
    - 1 — I420 AVI (r9's leg: planar 4:2:0 with neutral chroma);
    - 2 — C420jpeg Y4M (the 4:2:0 frame layout with 0x80 chroma
      planes — exercises the chroma-sized frame stride, distinct
      from Cmono);
    - 3 — BI_RGB 24-bit AVI, bottom-up: each luma byte ships as a
      gray BGR triplet, and the decoder's exact-integer BT.601
      reduction (299R+587G+114B+500)//1000 is the IDENTITY on gray —
      so the RGB path and the row-flip land under the same hash.
    All four produce identical luma planes → ONE unchanged oracle.
    Beyond the byte mean the oracle recomputes the TEMPORAL feature,
    mean absolute inter-frame delta, via a positional self-join of
    the byte spine (i ↔ i+8); Σ|Δ| ≤ 8·255 is integer-exact, /8 is a
    power-of-two division — bit-equal. (The bottom-up flip applies
    to BOTH frames, so positional deltas are preserved.)"""
    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    i420_pre, i420_fh = _avi_clip_segments()
    chroma = b"\x80" * 4  # 2×2 U + V planes at 4:2:0 for a 4×2 frame
    luma1 = F.unhex(F.substring(hx, 1, 16))
    luma2 = F.unhex(F.substring(hx, 17, 16))
    y4m = F.concat(
        F.lit(b"YUV4MPEG2 W4 H2 F25:1 Cmono\n"),
        F.lit(b"FRAME\n"), luma1,
        F.lit(b"FRAME\n"), luma2,
    )
    avi = F.concat(
        F.lit(i420_pre), luma1, F.lit(chroma + i420_fh), luma2, F.lit(chroma)
    )
    y4m_420 = F.concat(
        F.lit(b"YUV4MPEG2 W4 H2 F25:1 C420jpeg\n"),
        F.lit(b"FRAME\n"), luma1, F.lit(chroma),
        F.lit(b"FRAME\n"), luma2, F.lit(chroma),
    )
    rgb_pre, rgb_fh = _avi_clip_segments(b"\x00" * 4, 24, 24)
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]

    def rgb_frame(base: int) -> list:
        # bottom-up storage: file row 0 = image row 1; stride 12 = no
        # padding at w=4; gray pixel = the byte three times (BGR)
        return [db[base + i] for i in (4, 5, 6, 7, 0, 1, 2, 3) for _ in range(3)]

    avi_rgb = F.concat(
        F.lit(rgb_pre), *rgb_frame(0), F.lit(rgb_fh), *rgb_frame(8)
    )
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, y4m)
        .when(m == 1, avi)
        .when(m == 2, y4m_420)
        .otherwise(avi_rgb)
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return video_stats(payloads)


@query(
    "multimodal_video_frames_decode",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 16)) AS t(i)
    )
    SELECT doc_id,
           CAST(i // 8 AS BIGINT) AS frame_idx,
           CAST(2 AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS width,
           CAST(1 AS BIGINT) AS channels,
           CAST(sum(byte) AS DOUBLE) / 8 AS mean_byte
    FROM b
    GROUP BY doc_id, i // 8
    """,
)
def multimodal_video_frames_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video→frames→image featurize COMPOSITION under the
    external oracle (r10; the gif-animation query's twin for
    `video_frame_sample`): per document a 2-frame 4×2 clip — even
    doc_ids as Cmono Y4M, odd as I420 AVI — fans out through the
    real `video_frame_sample` (decode_video → per-frame P5 PGM
    re-encode, ORIGINAL frame indices) into `image_stats`, frame
    identity threaded as doc_id·2+frame_idx. The oracle recomputes
    each frame's luma mean from its digest half; a fan-out,
    frame-order, or PGM re-encode bug flips the hash. Two map-only
    mapInPandas stages, zero exchanges. Exact: Σ ≤ 8·255, /8
    power-of-two."""
    # materialize the digest once (see the image rotation's note)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    i420_pre, i420_fh = _avi_clip_segments()
    chroma = b"\x80" * 4
    luma1 = F.unhex(F.substring(hx, 1, 16))
    luma2 = F.unhex(F.substring(hx, 17, 16))
    y4m = F.concat(
        F.lit(b"YUV4MPEG2 W4 H2 F25:1 Cmono\n"),
        F.lit(b"FRAME\n"), luma1,
        F.lit(b"FRAME\n"), luma2,
    )
    avi = F.concat(
        F.lit(i420_pre), luma1, F.lit(chroma + i420_fh), luma2, F.lit(chroma)
    )
    payloads = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, y4m).otherwise(avi).alias("payload"),
    )
    frames = video_frame_sample(payloads)
    packed = frames.select(
        (F.col("doc_id") * 2 + F.col("frame_idx")).alias("doc_id"), "payload"
    )
    stats = image_stats(packed)
    return stats.select(
        F.expr("doc_id DIV 2").alias("doc_id"),
        (F.col("doc_id") % 2).alias("frame_idx"),
        "height",
        "width",
        "channels",
        "mean_byte",
    )


@query(
    "multimodal_gif_animation_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 12)) AS t(i)
    ),
    f AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS frame_idx, sum(byte) AS sb
      FROM b WHERE i < 8 GROUP BY doc_id
      UNION ALL
      -- frame 2 composite: the 2x2 sub-rect at (2,0) overwrites bytes
      -- 2,3 (row 0) and 6,7 (row 1) with bytes 8..11; the rest of the
      -- canvas still shows frame 1
      SELECT doc_id, CAST(1 AS BIGINT) AS frame_idx,
             sum(CASE WHEN i IN (0, 1, 4, 5, 8, 9, 10, 11) THEN byte
                      ELSE 0 END) AS sb
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, frame_idx,
           CAST(2 AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS channels,
           CAST(sb AS DOUBLE) / 8 AS mean_byte
    FROM f
    """,
)
def multimodal_gif_animation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Animated-GIF COMPOSITING under the external oracle (r10): per
    document a 2-frame GIF89a on a 4×2 logical screen — frame 1 a
    full-rect of digest bytes 0..7, frame 2 a 2×2 SUB-RECT at (2,0)
    of bytes 8..11, each behind its own GCE (delays 4 and 6 cs,
    disposal 0) — built entirely JVM-side with the same
    clear-code-per-literal LZW construction as the image rotation.
    The pipeline is the real video-corpus composition: the payload
    fans out through `gif_frame_sample` (decode_gif_frames — GCE
    parse, sub-rect placement on the persisting canvas, PPM
    re-encode) into `image_stats`, frame identity threaded through a
    packed doc_id·2+frame_idx key. The oracle recomputes both
    composited frames' means from the digest: frame 2's canvas is
    frame 1 with positions 2,3,6,7 overwritten — a placement,
    disposal, or compositing bug (e.g. clearing the canvas between
    frames, off-by-one rect) flips the hash. Exact: integer sums ≤
    8·255, one /8 in both engines. Scale: two map-only mapInPandas
    stages, zero exchanges."""
    import struct

    # materialize the digest ONCE as a column: the construction trees
    # below reference hx hundreds of times, and a non-cheap alias with
    # multiple references survives CollapseProject, so md5 runs once
    # per row instead of once per subexpression (measured ~1.4x on the
    # 12-branch image query)
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(12)
    ]

    def gce(delay_cs: int) -> bytes:
        return b"\x21\xf9\x04" + bytes((0, delay_cs, 0, 0)) + b"\x00"

    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 2, 0xF7, 0, 0) + _GIF_GRAY_GCT
    img1 = (
        gce(4)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 2, 0)
        + bytes((8, 20))  # min code size; 8 pixels → 20-byte sub-block
    )
    img2 = (
        gce(6)
        + b"\x2c" + struct.pack("<HHHHB", 2, 0, 2, 2, 0)
        + bytes((8, 11))  # 4 pixels → 11-byte sub-block
    )
    eoi_end = F.lit(b"\x01\x01\x00")  # EOI bytes + sub-block terminator
    parts = [F.lit(hdr + img1)]
    parts += _gif_cleared_stream_parts(dv[0:4])
    parts += _gif_cleared_stream_parts(dv[4:8])
    parts += [eoi_end, F.lit(img2)]
    parts += _gif_cleared_stream_parts(dv[8:12])
    parts += [eoi_end, F.lit(b"\x3b")]
    payloads = docs.select("doc_id", F.concat(*parts).alias("payload"))
    frames = gif_frame_sample(payloads)
    packed = frames.select(
        (F.col("doc_id") * 2 + F.col("frame_idx")).alias("doc_id"), "payload"
    )
    stats = image_stats(packed)
    return stats.select(
        F.expr("doc_id DIV 2").alias("doc_id"),
        (F.col("doc_id") % 2).alias("frame_idx"),
        "height",
        "width",
        "channels",
        "mean_byte",
    )


@query(
    "multimodal_apng_animation_stats",
    oracle="""
    WITH p AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, i,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1) AS byte
      FROM p, UNNEST(range(0, 12)) AS t(i)
    ),
    f AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS frame_idx, sum(byte) AS sb
      FROM b WHERE i < 8 GROUP BY doc_id
      UNION ALL
      SELECT doc_id, CAST(1 AS BIGINT) AS frame_idx,
             sum(CASE WHEN i IN (0, 1, 4, 5, 8, 9, 10, 11) THEN byte
                      ELSE 0 END) AS sb
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, frame_idx,
           CAST(2 AS BIGINT) AS height,
           CAST(4 AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS channels,
           CAST(sb AS DOUBLE) / 8 AS mean_byte
    FROM f
    """,
)
def multimodal_apng_animation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APNG COMPOSITING under the external oracle (r11) — the PNG
    twin of multimodal_gif_animation_stats, SAME oracle, same
    expected canvases: per document a 2-frame APNG on a 4×2 gray
    canvas — frame 1 the full rect of digest bytes 0..7 carried by
    the IDAT (its fcTL precedes it), frame 2 a 2×2 SUB-RECT at (2,0)
    of bytes 8..11 in an fdAT (blend SOURCE, dispose NONE). Both
    frame streams are the stored-deflate construction from the image
    rotation's PNG leg with their adler32 as mod-free linear forms
    (frame 1: A ≤ 2041, B ≤ 10210; frame 2: A ≤ 1021, B ≤ 3066 —
    both < 65521), chunk CRCs via F.crc32, acTL/fcTL constants with
    Python-computed CRCs; sequence numbers 0,1,2 across
    fcTL/fcTL/fdAT. The payload fans out through `gif_frame_sample`
    (which routes PNG magic to decode_apng_frames: mini-PNG
    synthesis per region, canvas compositing) into `image_stats`. A
    sequence, region-placement, blend, dispose, CRC, or adler
    divergence flips the hash. Exact: integer sums ≤ 8·255, one /8
    in both engines. Scale: two map-only mapInPandas stages, zero
    exchanges."""
    import struct
    import zlib

    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("hx")
        )
    )
    hx = F.col("hx")
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(12)
    ]
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(12)]

    def cchunk(t: bytes, b: bytes) -> bytes:
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    hdr = (
        _PNG_MAGIC
        + cchunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0))
        + cchunk(b"acTL", struct.pack(">II", 2, 0))
        + cchunk(
            b"fcTL",
            struct.pack(">IIIIIHHBB", 0, 4, 2, 0, 0, 1, 10, 0, 0),
        )
    )
    fctl1 = cchunk(
        b"fcTL", struct.pack(">IIIIIHHBB", 1, 2, 2, 2, 0, 1, 10, 0, 0)
    )
    iend = cchunk(b"IEND", b"")
    # frame 1: stored-deflate of 2 scanlines (filter0 + 4 bytes each)
    zpre10 = b"\x78\x01\x01\x0a\x00\xf5\xff"
    scan0 = F.concat(
        F.lit(b"\x00"), F.unhex(F.substring(hx, 1, 8)),
        F.lit(b"\x00"), F.unhex(F.substring(hx, 9, 8)),
    )
    a0 = sum((dv[i] for i in range(8)), F.lit(1))
    b0 = sum(
        (dv[i] * w for i, w in zip(range(8), (9, 8, 7, 6, 4, 3, 2, 1))),
        F.lit(10),
    )
    idat_body = F.concat(
        F.lit(b"IDAT" + zpre10), scan0, _int_be32(b0 * 65536 + a0)
    )
    idat = F.concat(
        F.lit(struct.pack(">I", 4 + len(zpre10) + 10 + 4 - 4)),  # data len
        idat_body,
        _int_be32(F.crc32(idat_body)),
    )
    # frame 2: fdAT (seq 2) with a 2x2 stored-deflate region
    zpre6 = b"\x78\x01\x01\x06\x00\xf9\xff"
    scan1 = F.concat(
        F.lit(b"\x00"), db[8], db[9], F.lit(b"\x00"), db[10], db[11]
    )
    a1 = sum((dv[i] for i in range(8, 12)), F.lit(1))
    b1 = sum(
        (dv[i] * w for i, w in zip(range(8, 12), (5, 4, 2, 1))), F.lit(6)
    )
    fdat_body = F.concat(
        F.lit(b"fdAT" + struct.pack(">I", 2) + zpre6),
        scan1,
        _int_be32(b1 * 65536 + a1),
    )
    fdat = F.concat(
        F.lit(struct.pack(">I", 4 + len(zpre6) + 6 + 4)),
        fdat_body,
        _int_be32(F.crc32(fdat_body)),
    )
    payload = F.concat(F.lit(hdr), idat, F.lit(fctl1), fdat, F.lit(iend))
    payloads = docs.select("doc_id", payload.alias("payload"))
    frames = gif_frame_sample(payloads)
    packed = frames.select(
        (F.col("doc_id") * 2 + F.col("frame_idx")).alias("doc_id"), "payload"
    )
    stats = image_stats(packed)
    return stats.select(
        F.expr("doc_id DIV 2").alias("doc_id"),
        (F.col("doc_id") % 2).alias("frame_idx"),
        "height",
        "width",
        "channels",
        "mean_byte",
    )


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("z_len", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-language z-score of document length.

    Moments come from EXACT integer sums (Python ints, no fp
    accumulation order) and the final arithmetic is the same IEEE
    double expression tree the oracle SQL spells out — pandas
    .mean()/.std() would drift in the last bit vs DuckDB's Welford
    accumulator (observed 4e-16), which the exact-compare gate
    rejects. Arrow hands the whole group as one pandas frame."""
    x = pdf["n_chars"]
    n = len(x)
    if n < 2:
        # stddev_samp of one row is NULL in SQL; a naive n-1 division
        # here would raise ZeroDivisionError and kill the task. Emit
        # real NULLs (nullable Float64 -> Arrow null) to match.
        z = pd.array([pd.NA] * n, dtype="Float64")
        return pd.DataFrame({"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": z})
    s1 = int(x.sum())
    s2 = int((x * x).sum())
    mu = s1 / n
    var = (s2 - (s1 * s1) / n) / (n - 1)
    if var <= 0:
        # Zero variance: SQL yields NULL (x/0); mirror it rather than
        # emitting +-inf.
        z = pd.array([pd.NA] * n, dtype="Float64")
        return pd.DataFrame({"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": z})
    sd = var**0.5
    xf = x.astype("float64")
    return pd.DataFrame(
        {"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": (xf - mu) / sd}
    )


@query(
    "udf_grouped_zscore",
    oracle="""
    WITH m AS (
      SELECT lang, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY lang) AS s1,
             sum(n_chars * n_chars) OVER (PARTITION BY lang) AS s2,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           doc_id,
           (CAST(n_chars AS DOUBLE) - s1 / n)
             / sqrt((s2 - (s1 * s1) / n) / (n - 1)) AS z_len
    FROM m
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 UDAF/grouped-map shape: applyInPandas over groupBy — the
    sanctioned custom-aggregation escape hatch (Arrow batches, whole
    group per call). Oracle-checked against window-function SQL.

    100 TB caveat: each GROUP materializes in one worker's memory —
    fine for bounded groups (languages, dates), wrong for unbounded
    keys; that case belongs to built-in window/agg functions.
    """
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return d.groupBy("lang").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("chunk_len", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)

_CHUNK = 256  # bytes per frame/chunk


def _frame_manifest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One→many frame sampling over binary payloads: split each blob
    into fixed 256-byte chunks and emit one manifest row per chunk —
    the batch shape of video frame-extraction / audio windowing
    (N input blobs → sum(ceil(len/256)) output rows, streamed per
    Arrow batch). The per-chunk digest is md5 over the UPPERCASE HEX
    of the chunk: content-equivalent to hashing the bytes, and
    expressible in the oracle engine (DuckDB has no BLOB md5)."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "frame_idx", "byte_offset", "chunk_len", "chunk_md5")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            # ceil(len/CHUNK) chunks; an empty payload yields zero
            # rows (mirrors the oracle's range(0, ceil(0)) = empty).
            for i in range(-(-len(payload) // _CHUNK)):
                chunk = payload[i * _CHUNK : (i + 1) * _CHUNK]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["byte_offset"].append(i * _CHUNK)
                out["chunk_len"].append(len(chunk))
                out["chunk_md5"].append(hashlib.md5(chunk.hex().upper().encode()).hexdigest())
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_manifest",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT doc_id,
           i AS frame_idx,
           i * {_CHUNK} AS byte_offset,
           least({_CHUNK}, n - i * {_CHUNK}) AS chunk_len,
           md5(substr(hx, i * {_CHUNK} * 2 + 1, {_CHUNK} * 2)) AS chunk_md5
    FROM p, UNNEST(range(0, CAST(ceil(n / {_CHUNK}.0) AS BIGINT))) AS t(i)
    """,
)
def multimodal_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: frame/chunk manifest — the one→many mapInPandas shape of
    video frame sampling or audio windowing, with deterministic chunk
    digests so the WHOLE fan-out (row multiplication, offsets,
    lengths, per-chunk content identity) is oracle-verified. Swap the
    chunker for a real frame extractor on a cluster with codecs; the
    Spark-side plumbing (binary column in, per-chunk rows out,
    Arrow-batched) is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return parallelize_small_scan(mm.select("doc_id", "payload")).mapInPandas(
        _frame_manifest, _MANIFEST_SCHEMA
    )


def _normalize_series(texts: pd.Series) -> pd.Series:
    """Vectorized text normalization: lower → strip non-alphanumerics
    → collapse whitespace → trim. Pure pandas string kernels over
    Arrow batches — the Series→Series fast path (no per-row Python
    function calls; ~10-100× over a row UDF)."""
    return (
        texts.str.lower()
        .str.replace(r"[^a-z0-9 ]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )


@query(
    "udf_pandas_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                      '\\s+', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
)
def udf_pandas_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar pandas UDF (Series→Series): the third Arrow shape
    next to mapInPandas (multimodal_binary_features) and
    applyInPandas (udf_grouped_zscore). Normalization is the
    canonical pre-dedup step; the oracle runs the equivalent regex
    chain in SQL, verifying the vectorized kernel byte-for-byte."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def norm(texts: pd.Series) -> pd.Series:
        return _normalize_series(texts)

    d = load_table(spark, sf_dir, "documents")
    # Two-step select: the UDF runs once; the length derives from its
    # output column instead of a second UDF evaluation.
    return d.select("doc_id", norm("text").alias("norm_text")).select(
        "doc_id", "norm_text", F.length("norm_text").alias("n_chars_norm")
    )


@query(
    "udf_grouped_agg_gini",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           any_value(n) AS n_events,
           CAST(sum((2 * i - n - 1) * cents) AS DOUBLE)
             / (any_value(n) * sum(cents)) AS gini
    FROM r
    GROUP BY event_type
    """,
)
def udf_grouped_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 GROUPED_AGG pandas UDF — the fourth Arrow shape (true
    UDAF: Series→scalar inside .agg()), completing the surface next
    to scalar (udf_pandas_normalize_text), grouped-map
    (udf_grouped_zscore), and map-iter (multimodal_binary_features).

    The aggregate is the Gini concentration coefficient of event
    value per type (sorted-rank formula G = Σ(2i−n−1)x_(i) /
    (n·Σx)) — computed over CENTS as int64 inside the kernel, so the
    only float op is one final division of two exact < 2^53 integers:
    engine-identical, no tolerance needed. Ties contribute
    index-permutation-invariant sums (equal x across an index block
    factor out), so the sort inside the kernel is deterministic-
    enough by construction.

    Scale caveat (documented, inherent to GROUPED_AGG): the whole
    group materializes in one kernel invocation — no partial
    aggregation. Right for bounded group counts/sizes (5 types here);
    for unbounded groups use the built-in-expression formulation the
    oracle itself demonstrates (window rank + integer sums), which
    does stream. Both shapes shown on purpose: the UDF is the
    escape hatch, the oracle is the scale path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gini(v: pd.Series) -> float:
        cents = np.floor(v.to_numpy(dtype="float64") * 100.0 + 0.5).astype("int64")
        cents.sort()
        n = len(cents)
        total = int(cents.sum())
        if n == 0 or total == 0:
            return None
        num = int(((2 * np.arange(1, n + 1) - n - 1) * cents).sum())
        return float(num) / float(n * total)

    ev = load_table(spark, sf_dir, "events")
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT) — the
    # count runs as its own plain aggregate and joins back on the
    # group key, the same split-agg shape as agg_approx_count_distinct.
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    ginis = ev.groupBy("event_type").agg(gini("value").alias("gini"))
    return counts.join(ginis, "event_type").select("event_type", "n_events", "gini")
