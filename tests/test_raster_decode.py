"""Legacy/texture raster decoders (functions/rasters.py): independent
builders per format (spec-grounded, written against the published
layouts, not the decoder) with expected pixel arrays computed by the
test's own logic."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image
from flink_hiveorc_spark.functions.rasters import (
    decode_dds,
    decode_pcx,
    decode_sgi,
    decode_sun_raster,
    decode_wbmp,
    decode_xbm,
)

# ------------------------------------------------------------------ PCX


def _pcx_rle(row: bytes) -> bytes:
    """Spec RLE: runs of up to 63; any byte >= 0xC0 must ship in run
    form even for a single occurrence."""
    out = bytearray()
    i = 0
    while i < len(row):
        v = row[i]
        n = 1
        while i + n < len(row) and row[i + n] == v and n < 63:
            n += 1
        if n > 1 or v >= 0xC0:
            out += bytes([0xC0 | n, v])
        else:
            out.append(v)
        i += n
    return bytes(out)


def _pcx(w, h, rows_by_plane, bpp, planes, palette256=None, pal16=None,
         encoding=1):
    bpl = len(rows_by_plane[0][0])
    hdr = bytearray(128)
    hdr[0], hdr[1], hdr[2], hdr[3] = 0x0A, 5, encoding, bpp
    struct.pack_into("<4H", hdr, 4, 0, 0, w - 1, h - 1)
    if pal16 is not None:
        hdr[16:64] = pal16.tobytes()
    hdr[65] = planes
    struct.pack_into("<H", hdr, 66, bpl)
    body = bytearray()
    for y in range(h):
        for p in range(planes):
            row = rows_by_plane[p][y]
            body += _pcx_rle(row) if encoding else row
    out = bytes(hdr) + bytes(body)
    if palette256 is not None:
        out += b"\x0c" + palette256.tobytes()
    return out


def test_pcx_8bit_palette_rle():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    payload = _pcx(7, 5, [[idx[y].tobytes() + b"\x00" for y in range(5)]],
                   8, 1, palette256=pal)
    np.testing.assert_array_equal(decode_pcx(payload), pal[idx])
    np.testing.assert_array_equal(decode_image(payload), pal[idx])


def test_pcx_24bit_planes_and_uncompressed():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    planes = [
        [img[y, :, c].tobytes() for y in range(4)] for c in range(3)
    ]
    for enc in (1, 0):
        payload = _pcx(6, 4, planes, 8, 3, encoding=enc)
        np.testing.assert_array_equal(decode_pcx(payload), img)


def test_pcx_1bit_and_4bit():
    bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1]], dtype=np.uint8)
    packed = np.packbits(bits, axis=1)
    payload = _pcx(10, 1, [[packed[0].tobytes()]], 1, 1)
    out = decode_pcx(payload)
    np.testing.assert_array_equal(out[:, :, 0], bits * 255)
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    pal16 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    rows = []
    for y in range(3):
        nibs = idx[y]
        row = bytearray((5 + 1) // 2)
        for x, v in enumerate(nibs):
            row[x // 2] |= v << (4 if x % 2 == 0 else 0)
        rows.append(bytes(row))
    payload = _pcx(5, 3, [rows], 4, 1, pal16=pal16)
    np.testing.assert_array_equal(decode_pcx(payload), pal16[idx])


# ------------------------------------------------------------ Sun Raster


def _sun_rle(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        v = raw[i]
        n = 1
        while i + n < len(raw) and raw[i + n] == v and n < 256:
            n += 1
        if n > 1:
            out += bytes([0x80, n - 1, v])
        elif v == 0x80:
            out += bytes([0x80, 0x00])
        else:
            out.append(v)
        i += n
    return bytes(out)


def _sun(w, h, depth, body, rtype=1, cmap=None):
    maptype = 1 if cmap is not None else 0
    maplen = cmap.size if cmap is not None else 0
    hdr = struct.pack(
        ">8I", 0x59A66A95, w, h, depth, len(body), rtype, maptype, maplen
    )
    cm = b""
    if cmap is not None:
        cm = (
            cmap[:, 0].tobytes() + cmap[:, 1].tobytes() + cmap[:, 2].tobytes()
        )
    return hdr + cm + body


def test_sun_8bit_colormap_and_rle():
    rng = np.random.default_rng(4)
    idx = rng.integers(0, 200, (4, 5), dtype=np.uint8)
    cmap = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    stride = ((5 * 8 + 15) // 16) * 2
    raw = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - 5) for y in range(4)
    )
    np.testing.assert_array_equal(
        decode_sun_raster(_sun(5, 4, 8, raw, 1, cmap)), cmap[idx]
    )
    np.testing.assert_array_equal(
        decode_sun_raster(_sun(5, 4, 8, _sun_rle(raw), 2, cmap)), cmap[idx]
    )
    # gray without colormap
    out = decode_sun_raster(_sun(5, 4, 8, raw, 1))
    np.testing.assert_array_equal(out[:, :, 0], idx)


def test_sun_24_32bit_orders_and_1bit():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    stride = ((3 * 24 + 15) // 16) * 2
    bgr = b"".join(
        img[y, :, ::-1].tobytes() + b"\x00" * (stride - 9) for y in range(2)
    )
    np.testing.assert_array_equal(decode_sun_raster(_sun(3, 2, 24, bgr, 1)), img)
    rgb = b"".join(
        img[y].tobytes() + b"\x00" * (stride - 9) for y in range(2)
    )
    np.testing.assert_array_equal(decode_sun_raster(_sun(3, 2, 24, rgb, 3)), img)
    # 32-bit: pad byte first, xBGR for type 1
    xbgr = b"".join(
        b"".join(b"\x00" + img[y, x, ::-1].tobytes() for x in range(3))
        for y in range(2)
    )
    np.testing.assert_array_equal(
        decode_sun_raster(_sun(3, 2, 32, xbgr, 1)), img
    )
    bits = np.array([[1, 0, 1, 0, 0, 1, 1, 1, 0, 1]], dtype=np.uint8)
    raw = np.packbits(bits, axis=1).tobytes()  # 2 bytes = 16-bit pad ok
    out = decode_sun_raster(_sun(10, 1, 1, raw, 1))
    np.testing.assert_array_equal(out[0, :, 0], (1 - bits[0]) * 255)


# ------------------------------------------------------------------ SGI


def _sgi_rle_row(vals: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(vals):
        v = vals[i]
        n = 1
        while i + n < len(vals) and vals[i + n] == v and n < 127:
            n += 1
        if n > 2:
            out += bytes([n, v])
            i += n
        else:
            j = i
            lit = bytearray()
            while j < len(vals) and len(lit) < 127:
                if (
                    j + 2 < len(vals)
                    and vals[j] == vals[j + 1] == vals[j + 2]
                ):
                    break
                lit.append(vals[j])
                j += 1
            out += bytes([0x80 | len(lit)]) + bytes(lit)
            i = j
    out.append(0)
    return bytes(out)


def _sgi(img: np.ndarray, rle: bool) -> bytes:
    h, w, z = img.shape
    hdr = bytearray(512)
    struct.pack_into(">HBB", hdr, 0, 474, 1 if rle else 0, 1)
    struct.pack_into(">4H", hdr, 4, 3, w, h, z)
    if not rle:
        body = b"".join(
            img[h - 1 - y, :, c].tobytes()
            for c in range(z)
            for y in range(h)
        )
        return bytes(hdr) + body
    rows = [
        _sgi_rle_row(img[h - 1 - y, :, c].tobytes())
        for c in range(z)
        for y in range(h)
    ]
    pos = 512 + 8 * len(rows)
    starts, lens = [], []
    for r in rows:
        starts.append(pos)
        lens.append(len(r))
        pos += len(r)
    return (
        bytes(hdr)
        + struct.pack(f">{len(rows)}I", *starts)
        + struct.pack(f">{len(rows)}I", *lens)
        + b"".join(rows)
    )


@pytest.mark.parametrize("z", [1, 3, 4])
@pytest.mark.parametrize("rle", [False, True])
def test_sgi_channels_and_storage(z, rle):
    rng = np.random.default_rng(10 + z)
    img = rng.integers(0, 256, (6, 9, z), dtype=np.uint8)
    np.testing.assert_array_equal(decode_sgi(_sgi(img, rle)), img)
    np.testing.assert_array_equal(decode_image(_sgi(img, rle)), img)


def test_sgi_bpc2_maps_high_byte():
    rng = np.random.default_rng(14)
    img16 = rng.integers(0, 65536, (3, 4, 1), dtype=np.uint16)
    hdr = bytearray(512)
    struct.pack_into(">HBB", hdr, 0, 474, 0, 2)
    struct.pack_into(">4H", hdr, 4, 3, 4, 3, 1)
    body = b"".join(
        img16[3 - 1 - y, :, 0].astype(">u2").tobytes() for y in range(3)
    )
    out = decode_sgi(bytes(hdr) + body)
    np.testing.assert_array_equal(out[:, :, 0], (img16[:, :, 0] >> 8))


# ------------------------------------------------------------- XBM/WBMP


def test_xbm_text_formats():
    bits = np.array(
        [[1, 0, 1, 1, 0, 0, 0, 1, 1, 0], [0, 1, 0, 0, 1, 1, 1, 0, 0, 1]],
        dtype=np.uint8,
    )
    rows = np.packbits(bits, axis=1, bitorder="little")
    hexes = ", ".join(
        f"0x{b:02x}" for row in rows for b in row
    )
    src = (
        "/* a comment */\n#define thing_width 10\n"
        f"#define thing_height 2\nstatic unsigned char thing_bits[] = {{\n"
        f"  {hexes}}};\n"
    ).encode()
    out = decode_xbm(src)
    np.testing.assert_array_equal(out[:, :, 0], (1 - bits) * 255)
    np.testing.assert_array_equal(decode_image(src), out)
    # decimal literals parse too
    dec = ", ".join(str(b) for row in rows for b in row)
    src2 = (
        f"#define i_width 10\n#define i_height 2\nchar i_bits[]={{{dec}}};"
    ).encode()
    np.testing.assert_array_equal(decode_xbm(src2), out)


def test_wbmp_including_multibyte_dims():
    rng = np.random.default_rng(20)
    bits = rng.integers(0, 2, (3, 10), dtype=np.uint8)
    body = np.packbits(bits, axis=1).tobytes()
    payload = b"\x00\x00" + bytes([10, 3]) + body
    out = decode_wbmp(payload)
    np.testing.assert_array_equal(out[:, :, 0], bits * 255)
    # width 200 needs a 2-byte uintvar
    bits2 = rng.integers(0, 2, (2, 200), dtype=np.uint8)
    body2 = np.packbits(bits2, axis=1).tobytes()
    payload2 = b"\x00\x00" + bytes([0x81, 0x48, 2]) + body2
    out2 = decode_wbmp(payload2)
    assert out2.shape == (2, 200, 1)
    np.testing.assert_array_equal(out2[:, :, 0], bits2 * 255)
    # router plausibility: decode_image dispatches a valid WBMP
    np.testing.assert_array_equal(decode_image(payload), out)


# ------------------------------------------------------------------ DDS


def _e565(c):
    r, g, b = (c >> 11) & 31, (c >> 5) & 63, c & 31
    return np.array(
        [(r << 3) | (r >> 2), (g << 2) | (g >> 4), (b << 3) | (b >> 2)],
        dtype=np.int32,
    )


def _dds_header(w, h, fourcc=None, bitcount=32,
                masks=(0xFF, 0xFF00, 0xFF0000, 0xFF000000)):
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<II", hdr, 12, h, w)
    struct.pack_into("<I", hdr, 76, 32)  # pixel format size
    if fourcc:
        struct.pack_into("<I", hdr, 80, 0x4)
        hdr[84:88] = fourcc
    else:
        struct.pack_into("<I", hdr, 80, 0x41 if masks[3] else 0x40)
        struct.pack_into("<I", hdr, 88, bitcount)
        struct.pack_into("<4I", hdr, 92, *masks)
    return bytes(hdr)


def test_dds_dxt1_four_color_and_three_color_modes():
    # c0 > c1: 4-color palette
    c0, c1 = 0xF800, 0x001F  # red, blue
    idx = 0b11100100_11100100_11100100_11100100  # 0,1,2,3 per row
    blk = struct.pack("<HHI", c0, c1, idx)
    out = decode_dds(_dds_header(4, 4, b"DXT1") + blk)
    e0, e1 = _e565(c0), _e565(c1)
    exp = np.stack([e0, e1, (2 * e0 + e1) // 3, (e0 + 2 * e1) // 3])
    for x in range(4):
        np.testing.assert_array_equal(out[0, x], exp[x].astype(np.uint8))
    # c0 <= c1: 3-color + transparent black at index 3
    blk = struct.pack("<HHI", c1, c0, idx)
    out = decode_dds(_dds_header(4, 4, b"DXT1") + blk)
    np.testing.assert_array_equal(out[0, 2], ((e1 + e0) // 2).astype(np.uint8))
    np.testing.assert_array_equal(out[0, 3], [0, 0, 0])


def test_dds_dxt5_alpha_ramp_and_multiblock():
    a0, a1 = 200, 40  # a0 > a1: 8-entry ramp
    sel = sum(((i * 3) % 8) << (3 * i) for i in range(16))
    ablk = bytes([a0, a1]) + sel.to_bytes(6, "little")
    cblk = struct.pack("<HHI", 0xFFFF, 0x0000, 0)
    out = decode_dds(_dds_header(8, 4, b"DXT5") + (ablk + cblk) * 2)
    assert out.shape == (4, 8, 4)
    ramp = [a0, a1] + [((7 - i) * a0 + i * a1) // 7 for i in range(1, 7)]
    for i in range(4):
        assert out[0, i, 3] == ramp[(i * 3) % 8]
    # a0 <= a1: 6-entry ramp + 0/255 extremes
    ablk2 = bytes([40, 200]) + sel.to_bytes(6, "little")
    out2 = decode_dds(_dds_header(4, 4, b"DXT5") + ablk2 + cblk)
    ramp2 = [40, 200] + [((5 - i) * 40 + i * 200) // 5 for i in range(1, 5)]
    ramp2 += [0, 255]
    assert out2[0, 2, 3] == ramp2[6] and out2[1, 0, 3] == ramp2[(4 * 3) % 8]


def test_dds_uncompressed_masks():
    rng = np.random.default_rng(30)
    img = rng.integers(0, 256, (3, 5, 4), dtype=np.uint8)
    # ABGR8888 layout: R lowest byte
    body = bytearray()
    for y in range(3):
        for x in range(5):
            r, g, b, a = (int(v) for v in img[y, x])
            body += struct.pack("<I", r | (g << 8) | (b << 16) | (a << 24))
    out = decode_dds(_dds_header(5, 3) + bytes(body))
    np.testing.assert_array_equal(out, img)
    # RGB565 16-bit
    img3 = img[:, :, :3]
    body = bytearray()
    for y in range(3):
        for x in range(5):
            r, g, b = (int(v) for v in img3[y, x])
            body += struct.pack(
                "<H", ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
            )
    out = decode_dds(
        _dds_header(5, 3, bitcount=16, masks=(0xF800, 0x07E0, 0x1F, 0))
        + bytes(body)
    )
    exp = np.zeros_like(img3)
    for y in range(3):
        for x in range(5):
            r, g, b = (int(v) for v in img3[y, x])
            c = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
            exp[y, x] = _e565(c)
    np.testing.assert_array_equal(out, exp)


def test_dds_non_multiple_of_four_crops():
    blk = struct.pack("<HHI", 0xF800, 0x001F, 0)
    out = decode_dds(_dds_header(3, 2, b"DXT1") + blk)
    assert out.shape == (2, 3, 3)


# -------------------------------------------------------- error contract


def test_error_contract_and_gates():
    with pytest.raises(ValueError, match="magic"):
        decode_sun_raster(b"\x59\xa6\x6a\x96" + b"\x00" * 60)
    with pytest.raises(ValueError, match="RLE stream ended|palette trailer"):
        decode_pcx(
            _pcx(4, 4, [[b"\xaa\xaa\xaa\xaa"] * 4], 8, 1,
                 palette256=np.zeros((256, 3), np.uint8))[:135]
        )
    with pytest.raises(NotImplementedError, match="DX10"):
        decode_dds(_dds_header(4, 4, b"DX10") + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="fourCC"):
        decode_dds(_dds_header(4, 4, b"DXT3") + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="WBMP type"):
        decode_wbmp(b"\x01\x00\x04\x04" + b"\x00" * 4)
    with pytest.raises(ValueError, match="width/height"):
        decode_xbm(b"#define only_width 4\nchar b[]={0x00};")
    with pytest.raises(
        ValueError, match="wrong width|overflows|terminator|missing|early"
    ):
        rng = np.random.default_rng(40)
        img = rng.integers(0, 256, (4, 4, 1), dtype=np.uint8)
        payload = bytearray(_sgi(img, True))
        # the last byte is the final row's 0 terminator: turn it into
        # a dangling repeat count with no value byte
        payload[-1] = 0x05
        decode_sgi(bytes(payload))


def test_fuzz_byte_flips_keep_error_contract():
    rng = np.random.default_rng(41)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    cmap = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    stride = ((6 * 8 + 15) // 16) * 2
    raw = b"".join(idx[y].tobytes() + b"\x00" * (stride - 6) for y in range(6))
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    corpus = [
        (decode_pcx, _pcx(6, 6, [[idx[y].tobytes() for y in range(6)]],
                          8, 1, palette256=pal)),
        (decode_sun_raster, _sun(6, 6, 8, _sun_rle(raw), 2, cmap)),
        (decode_sgi, _sgi(img, True)),
        (decode_dds, _dds_header(8, 8, b"DXT5")
         + bytes(rng.integers(0, 256, 64, dtype=np.uint8))),
        (decode_wbmp, b"\x00\x00\x08\x08"
         + bytes(rng.integers(0, 256, 8, dtype=np.uint8))),
    ]
    for decode, payload in corpus:
        for _ in range(150):
            bad = bytearray(payload)
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
            try:
                decode(bytes(bad))
            except (ValueError, NotImplementedError):
                pass  # classified
