"""Legacy / texture raster decoders — pure stdlib + numpy.

Six formats that still appear in scraped corpora (old web archives,
game assets, mobile-era content) and need no entropy codec:

- PCX (ZSoft PC Paintbrush): per-byte RLE (0xC0 run flag), 1-bit
  bilevel, 4-bit EGA-palette, 8-bit VGA-palette (0x0C trailer), and
  24-bit as three 8-bit planes per scanline;
- Sun Raster (``0x59A66A95``): standard + RT_BYTE_ENCODED RLE
  (0x80 flag), optional RGB colormap, 16-bit row padding, BGR(A) vs
  RT_FORMAT_RGB ordering, 1-bit ink rows;
- SGI image (``0x01DA``): verbatim and RLE storage (offset/length
  tables, 0x80-flagged counts), 1-4 channels, bottom-up rows, 2-byte
  bpc mapped to its high byte;
- XBM (X BitMap): the C-source text format — #define width/height +
  a brace-list of byte literals, LSB-first bits, PBM ink convention
  (set bit = 0 gray);
- WBMP (WAP): type-0 monochrome, uintvar dimensions, MSB-first bits;
- DDS (DirectDraw Surface): uncompressed RGB(A) via the pixel-format
  bit masks, and BLOCK-COMPRESSED DXT1/DXT5 — S3TC is fixed-point
  palette interpolation per 4x4 block (RGB565 endpoints + 2-bit
  indices; DXT5 adds the 3-bit-index alpha ramp), not entropy
  coding, so it sits squarely in the native envelope. DXT2-4 and
  DX10-header variants are honestly gated.

Interpolation conventions (documented because S3TC leaves rounding
to implementations): 2/3-point color blends use floor division
((2a+b)//3, (a+b)//2) and the DXT5 alpha ramp uses the canonical
((7-i)*a0 + i*a1)//7 / ((5-i)*a0 + i*a1)//5 integer forms. The
external oracle leg (multimodal_raster_decode_stats) only exercises
exact-endpoint texels, so no oracle row depends on a rounding
choice.

Error contract matches decode_image: ValueError = malformed payload
of a recognized format; NotImplementedError = a format feature
outside the native envelope.
"""

from __future__ import annotations

import re
import struct

import numpy as np


# ------------------------------------------------------------------ PCX


def decode_pcx(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    if len(data) < 128:
        raise ValueError("truncated PCX header")
    if data[0] != 0x0A:
        raise ValueError("bad PCX manufacturer byte")
    version, encoding, bpp = data[1], data[2], data[3]
    if version not in (0, 2, 3, 4, 5):
        raise ValueError(f"unknown PCX version {version}")
    if encoding not in (0, 1):
        raise ValueError(f"unknown PCX encoding {encoding}")
    xmin, ymin, xmax, ymax = struct.unpack_from("<4H", data, 4)
    if xmax < xmin or ymax < ymin:
        raise ValueError("PCX window is inverted")
    w, h = xmax - xmin + 1, ymax - ymin + 1
    planes = data[65]
    (bpl,) = struct.unpack_from("<H", data, 66)
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"PCX {w}x{h} exceeds {max_pixels} pixels")
    if (bpp, planes) not in ((1, 1), (4, 1), (8, 1), (8, 3)):
        raise NotImplementedError(
            f"PCX {bpp}-bit {planes}-plane layout unsupported "
            "(1/4/8-bit single-plane and 24-bit 3-plane covered)"
        )
    if bpl * 8 < w * bpp:
        raise ValueError("PCX bytes-per-line smaller than the row")
    need = h * planes * bpl
    body_end = len(data)
    palette256 = None
    if bpp == 8 and planes == 1:
        if len(data) >= 128 + 769 and data[-769] == 0x0C:
            pal = np.frombuffer(data[-768:], dtype=np.uint8).reshape(256, 3)
            palette256 = pal
            body_end = len(data) - 769
        else:
            raise ValueError("8-bit PCX lacks the 0x0C VGA palette trailer")
    # RLE decode (continuous; runs may not cross rows per spec, but
    # tolerant continuous decode accepts both writer styles)
    if encoding == 1:
        out = bytearray()
        pos = 128
        while len(out) < need:
            if pos >= body_end:
                raise ValueError("PCX RLE stream ended early")
            b = data[pos]
            pos += 1
            if b >= 0xC0:
                if pos >= body_end:
                    raise ValueError("PCX RLE run missing its value byte")
                out += bytes([data[pos]]) * (b & 0x3F)
                pos += 1
            else:
                out.append(b)
        raw = bytes(out[:need])
    else:
        raw = data[128 : 128 + need]
        if len(raw) < need:
            raise ValueError("uncompressed PCX body ended early")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, planes, bpl)
    if bpp == 8 and planes == 3:
        rgb = rows[:, :, :w].transpose(0, 2, 1)
        return np.ascontiguousarray(rgb)
    if bpp == 8:
        idx = rows[:, 0, :w]
        return np.ascontiguousarray(palette256[idx])
    if bpp == 4:
        # packed big-nibble-first; EGA palette from the header
        by = rows[:, 0, : (w + 1) // 2]
        inter = np.empty((h, 2 * by.shape[1]), dtype=np.uint8)
        inter[:, 0::2] = by >> 4
        inter[:, 1::2] = by & 0x0F
        idx = inter[:, :w]
        pal16 = np.frombuffer(data[16:64], dtype=np.uint8).reshape(16, 3)
        return np.ascontiguousarray(pal16[idx])
    # 1-bit: PCX monochrome convention 1 = white
    bits = np.unpackbits(rows[:, 0, :], axis=1)[:, :w]
    return (bits * np.uint8(255)).reshape(h, w, 1)


# ------------------------------------------------------------ Sun Raster

_SUN_MAGIC = 0x59A66A95


def decode_sun_raster(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    if len(data) < 32:
        raise ValueError("truncated Sun raster header")
    magic, w, h, depth, length, rtype, maptype, maplen = struct.unpack_from(
        ">8I", data, 0
    )
    if magic != _SUN_MAGIC:
        raise ValueError("bad Sun raster magic")
    if w == 0 or h == 0:
        raise ValueError("Sun raster with a zero dimension")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"Sun raster {w}x{h} exceeds {max_pixels} pixels")
    if rtype not in (0, 1, 2, 3):
        raise NotImplementedError(f"Sun raster type {rtype} unsupported")
    if depth not in (1, 8, 24, 32):
        raise NotImplementedError(f"Sun raster depth {depth} unsupported")
    pos = 32
    cmap = None
    if maptype == 1:
        if maplen % 3 or pos + maplen > len(data):
            raise ValueError("bad Sun raster colormap")
        n = maplen // 3
        flat = np.frombuffer(data[pos : pos + maplen], dtype=np.uint8)
        cmap = np.stack([flat[:n], flat[n : 2 * n], flat[2 * n :]], axis=1)
        pos += maplen
    elif maptype == 2:
        pos += maplen  # raw map: skip, per convention
    elif maptype != 0:
        raise NotImplementedError(f"Sun raster maptype {maptype} unsupported")
    stride = ((w * depth + 15) // 16) * 2  # rows pad to 16 bits
    need = stride * h
    if rtype == 2:
        out = bytearray()
        while len(out) < need:
            if pos >= len(data):
                raise ValueError("Sun raster RLE ended early")
            b = data[pos]
            pos += 1
            if b == 0x80:
                if pos >= len(data):
                    raise ValueError("Sun raster RLE flag at EOF")
                cnt = data[pos]
                pos += 1
                if cnt == 0:
                    out.append(0x80)
                else:
                    if pos >= len(data):
                        raise ValueError("Sun raster RLE run missing value")
                    out += bytes([data[pos]]) * (cnt + 1)
                    pos += 1
            else:
                out.append(b)
        raw = bytes(out[:need])
    else:
        raw = data[pos : pos + need]
        if len(raw) < need:
            raise ValueError("Sun raster body ended early")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        # Sun bilevel: 1 = black ink
        return ((1 - bits) * np.uint8(255)).reshape(h, w, 1)
    if depth == 8:
        idx = rows[:, :w]
        if cmap is not None:
            if int(idx.max(initial=0)) >= len(cmap):
                raise ValueError("Sun raster colormap index out of range")
            return np.ascontiguousarray(cmap[idx])
        return np.ascontiguousarray(idx.reshape(h, w, 1))
    nch = depth // 8
    px = rows[:, : w * nch].reshape(h, w, nch)
    if depth == 24:
        order = [0, 1, 2] if rtype == 3 else [2, 1, 0]  # RGB vs BGR
        return np.ascontiguousarray(px[:, :, order])
    # 32-bit: pad byte FIRST (xBGR / xRGB)
    order = [1, 2, 3] if rtype == 3 else [3, 2, 1]
    return np.ascontiguousarray(px[:, :, order])


# ------------------------------------------------------------------ SGI


def decode_sgi(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    if len(data) < 512:
        raise ValueError("truncated SGI header")
    magic, storage, bpc = struct.unpack_from(">HBB", data, 0)
    if magic != 474:
        raise ValueError("bad SGI magic")
    if storage not in (0, 1):
        raise ValueError(f"unknown SGI storage {storage}")
    if bpc not in (1, 2):
        raise ValueError(f"bad SGI bytes-per-channel {bpc}")
    dim, w, h, z = struct.unpack_from(">4H", data, 4)
    if dim not in (1, 2, 3):
        raise ValueError(f"bad SGI dimension {dim}")
    if dim < 3:
        z = 1
    if dim < 2:
        h = 1
    if w == 0 or h == 0 or not 1 <= z <= 4:
        raise ValueError("bad SGI geometry")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"SGI {w}x{h} exceeds {max_pixels} pixels")
    out = np.empty((z, h, w), dtype=np.uint8)

    def scan(row_bytes: bytes) -> np.ndarray:
        vals = np.frombuffer(row_bytes, dtype=">u2" if bpc == 2 else np.uint8)
        return (vals >> 8).astype(np.uint8) if bpc == 2 else vals

    if storage == 0:  # verbatim, rows bottom-up per channel
        rowlen = w * bpc
        need = rowlen * h * z
        body = data[512 : 512 + need]
        if len(body) < need:
            raise ValueError("SGI verbatim body ended early")
        for c in range(z):
            for y in range(h):
                off = (c * h + y) * rowlen
                out[c, h - 1 - y] = scan(body[off : off + rowlen])
        return np.ascontiguousarray(out.transpose(1, 2, 0))
    ntab = h * z
    tabs_end = 512 + 8 * ntab
    if len(data) < tabs_end:
        raise ValueError("truncated SGI RLE offset tables")
    starts = struct.unpack_from(f">{ntab}I", data, 512)
    lengths = struct.unpack_from(f">{ntab}I", data, 512 + 4 * ntab)
    for c in range(z):
        for y in range(h):
            t = c * h + y
            s, ln = starts[t], lengths[t]
            if s + ln > len(data):
                raise ValueError("SGI RLE row overflows the file")
            row = data[s : s + ln]
            vals = scan(row) if bpc == 2 else np.frombuffer(row, np.uint8)
            dec = np.empty(w, dtype=np.uint8)
            x = 0
            i = 0
            while True:
                if i >= len(vals):
                    raise ValueError("SGI RLE row missing terminator")
                pixel = int(vals[i])
                i += 1
                count = pixel & 0x7F
                if count == 0:
                    break
                if x + count > w:
                    raise ValueError("SGI RLE run overflows the row")
                if pixel & 0x80:  # copy
                    if i + count > len(vals):
                        raise ValueError("SGI RLE copy ended early")
                    dec[x : x + count] = vals[i : i + count]
                    i += count
                else:  # repeat
                    if i >= len(vals):
                        raise ValueError("SGI RLE repeat missing value")
                    dec[x : x + count] = vals[i]
                    i += 1
                x += count
            if x != w:
                raise ValueError("SGI RLE row decoded to the wrong width")
            out[c, h - 1 - y] = dec
    return np.ascontiguousarray(out.transpose(1, 2, 0))


# ------------------------------------------------------------------ XBM

_XBM_DEFINE = re.compile(
    rb"#define\s+\w*?_?(width|height)\s+(\d+)", re.IGNORECASE
)
_XBM_BYTE = re.compile(rb"0[xX][0-9a-fA-F]{1,2}|\b\d{1,3}\b")


def decode_xbm(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    dims = {}
    for m in _XBM_DEFINE.finditer(data):
        dims[m.group(1).lower().decode("ascii")] = int(m.group(2))
    if "width" not in dims or "height" not in dims:
        raise ValueError("XBM lacks width/height #defines")
    w, h = dims["width"], dims["height"]
    if w == 0 or h == 0:
        raise ValueError("XBM with a zero dimension")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"XBM {w}x{h} exceeds {max_pixels} pixels")
    brace = data.find(b"{")
    if brace < 0 or b"}" not in data[brace:]:
        raise ValueError("XBM lacks a bits brace list")
    body = data[brace : data.index(b"}", brace)]
    vals = [int(m.group(0), 0) for m in _XBM_BYTE.finditer(body)]
    bpr = (w + 7) // 8
    if len(vals) < bpr * h:
        raise ValueError(
            f"XBM bits list has {len(vals)} bytes, needs {bpr * h}"
        )
    if any(v > 255 for v in vals):
        raise ValueError("XBM byte literal out of range")
    rows = np.array(vals[: bpr * h], dtype=np.uint8).reshape(h, bpr)
    bits = np.unpackbits(rows, axis=1, bitorder="little")[:, :w]
    # X11 convention: set bit = foreground = ink (0 gray), like PBM
    return ((1 - bits) * np.uint8(255)).reshape(h, w, 1)


# ----------------------------------------------------------------- WBMP


def _uintvar(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for _ in range(5):
        if pos >= len(data):
            raise ValueError("truncated WBMP uintvar")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise ValueError("WBMP uintvar longer than 5 bytes")


def decode_wbmp(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    ty, pos = _uintvar(data, 0)
    if ty != 0:
        raise NotImplementedError(f"WBMP type {ty} unsupported (type 0 only)")
    if pos >= len(data):
        raise ValueError("truncated WBMP fix-header")
    if data[pos] != 0:
        raise ValueError("WBMP fix-header with extension bits")
    pos += 1
    w, pos = _uintvar(data, pos)
    h, pos = _uintvar(data, pos)
    if w == 0 or h == 0:
        raise ValueError("WBMP with a zero dimension")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"WBMP {w}x{h} exceeds {max_pixels} pixels")
    bpr = (w + 7) // 8
    need = bpr * h
    body = data[pos : pos + need]
    if len(body) < need:
        raise ValueError("WBMP body ended early")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, bpr)
    bits = np.unpackbits(rows, axis=1)[:, :w]  # MSB-first
    # WBMP: 1 = white
    return (bits * np.uint8(255)).reshape(h, w, 1)


# ------------------------------------------------------------------ DDS


def _expand565(c: np.ndarray) -> np.ndarray:
    """uint16 RGB565 → (n, 3) uint8 with bit replication."""
    r = ((c >> 11) & 0x1F).astype(np.uint16)
    g = ((c >> 5) & 0x3F).astype(np.uint16)
    b = (c & 0x1F).astype(np.uint16)
    return np.stack(
        [(r << 3) | (r >> 2), (g << 2) | (g >> 4), (b << 3) | (b >> 2)],
        axis=-1,
    ).astype(np.uint8)


def _dxt_color_block(block: bytes, dxt1: bool):
    """8-byte color block → (16, 4) RGBA rows in raster order."""
    c0, c1 = struct.unpack_from("<HH", block, 0)
    (idx,) = struct.unpack_from("<I", block, 4)
    e = _expand565(np.array([c0, c1], dtype=np.uint16)).astype(np.int32)
    pal = np.zeros((4, 4), dtype=np.int32)
    pal[0, :3], pal[1, :3] = e[0], e[1]
    pal[:, 3] = 255
    if not dxt1 or c0 > c1:
        pal[2, :3] = (2 * e[0] + e[1]) // 3
        pal[3, :3] = (e[0] + 2 * e[1]) // 3
    else:
        pal[2, :3] = (e[0] + e[1]) // 2
        pal[3] = 0  # 1-bit-alpha transparent black
    sel = (idx >> (2 * np.arange(16))) & 3
    return pal[sel].astype(np.uint8)


def _dxt5_alpha_block(block: bytes) -> np.ndarray:
    a0, a1 = block[0], block[1]
    bits = int.from_bytes(block[2:8], "little")
    ramp = np.zeros(8, dtype=np.int32)
    ramp[0], ramp[1] = a0, a1
    if a0 > a1:
        for i in range(1, 7):
            ramp[1 + i] = ((7 - i) * a0 + i * a1) // 7
    else:
        for i in range(1, 5):
            ramp[1 + i] = ((5 - i) * a0 + i * a1) // 5
        ramp[6], ramp[7] = 0, 255
    sel = (bits >> (3 * np.arange(16))) & 7
    return ramp[sel].astype(np.uint8)


def decode_dds(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    if len(data) < 128 or data[:4] != b"DDS ":
        raise ValueError("bad DDS magic")
    (hsize,) = struct.unpack_from("<I", data, 4)
    if hsize != 124:
        raise ValueError(f"bad DDS header size {hsize}")
    h, w = struct.unpack_from("<II", data, 12)
    if w == 0 or h == 0:
        raise ValueError("DDS with a zero dimension")
    if max_pixels is not None and w * h > max_pixels:
        raise ValueError(f"DDS {w}x{h} exceeds {max_pixels} pixels")
    pf_flags, fourcc = struct.unpack_from("<I4s", data, 80)
    if pf_flags & 0x4:  # DDPF_FOURCC
        if fourcc == b"DX10":
            raise NotImplementedError("DDS DX10 extended header unsupported")
        if fourcc not in (b"DXT1", b"DXT5"):
            raise NotImplementedError(
                f"DDS fourCC {fourcc!r} unsupported (DXT1/DXT5 covered)"
            )
        dxt1 = fourcc == b"DXT1"
        bw, bh = (w + 3) // 4, (h + 3) // 4
        bsize = 8 if dxt1 else 16
        need = bw * bh * bsize
        body = data[128 : 128 + need]
        if len(body) < need:
            raise ValueError("DDS block data ended early")
        out = np.zeros((bh * 4, bw * 4, 4), dtype=np.uint8)
        for by in range(bh):
            for bx in range(bw):
                blk = body[(by * bw + bx) * bsize :][:bsize]
                if dxt1:
                    texels = _dxt_color_block(blk, True)
                else:
                    texels = _dxt_color_block(blk[8:], False)
                    texels[:, 3] = _dxt5_alpha_block(blk[:8])
                out[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] = texels.reshape(
                    4, 4, 4
                )
        out = out[:h, :w]
        return np.ascontiguousarray(out if not dxt1 else out[:, :, :3])
    if pf_flags & 0x40:  # DDPF_RGB with masks
        (bitcount,) = struct.unpack_from("<I", data, 88)
        masks = struct.unpack_from("<4I", data, 92)
        if bitcount not in (16, 24, 32):
            raise NotImplementedError(
                f"DDS uncompressed {bitcount}-bit unsupported"
            )
        nb = bitcount // 8
        need = w * h * nb
        body = data[128 : 128 + need]
        if len(body) < need:
            raise ValueError("DDS pixel data ended early")
        flat = np.frombuffer(body, dtype=np.uint8).reshape(-1, nb)
        vals = np.zeros(len(flat), dtype=np.uint32)
        for i in range(nb):
            vals |= flat[:, i].astype(np.uint32) << (8 * i)
        has_alpha = bool(pf_flags & 0x1) and masks[3] != 0
        chans = []
        for mask in masks[: 4 if has_alpha else 3]:
            if mask == 0:
                raise ValueError("DDS zero channel mask")
            shift = (mask & -mask).bit_length() - 1
            width_bits = int(mask >> shift).bit_length()
            c = (vals & mask) >> shift
            # replicate to 8 bits
            if width_bits < 8:
                c = (c << (8 - width_bits)) | (c >> (2 * width_bits - 8))
            chans.append(c.astype(np.uint8))
        return np.ascontiguousarray(
            np.stack(chans, axis=-1).reshape(h, w, len(chans))
        )
    raise NotImplementedError("DDS pixel format without FOURCC or RGB flags")
