"""Native baseline-TIFF decode (functions/multimodal.py::_decode_tiff).

The serializer here builds IFDs byte-by-byte from the TIFF 6.0 spec
(entry layout, inline-vs-offset values, strip tables, both byte
orders) and the PackBits encoder implements the compression side of
the RLE — both independent of the decoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image

from test_image_decode import _no_pil, _rng


def _packbits_encode(row: bytes) -> bytes:
    """Spec-side PackBits: greedy runs — repeats of >=2 become repeat
    packets, everything else literal packets of <=128."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (
            i < len(row)
            and i - lit < 128
            and not (i + 1 < len(row) and row[i + 1] == row[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


class _MSBBitWriter:
    """MSB-first bit packer (TIFF §13 byte order — GIF's mirror)."""

    def __init__(self):
        self.buf = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self.buf = (self.buf << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.out.append((self.buf >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append((self.buf << (8 - self.nbits)) & 0xFF)
            self.buf = self.nbits = 0
        return bytes(self.out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor: clear=256/end=257, MSB-first, and
    the EarlyChange width schedule — the encoder grows when its next
    free code reaches 2^width (one code earlier than GIF's 2^width+1;
    the decoder, one entry behind, fires at table size 2^width−1 —
    the 511/1023/2047 slots the PDF LZWDecode spec names)."""
    bw = _MSBBitWriter()
    width = 9
    d = {bytes([i]): i for i in range(256)}
    next_code = 258
    bw.write(256, width)  # clear
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in d:
            seq = cand
            continue
        bw.write(d[seq], width)
        if next_code < 4094:
            d[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:  # EarlyChange
                width += 1
        seq = bytes([byte])
    if seq:
        bw.write(d[seq], width)
    bw.write(257, width)  # EOI
    return bw.flush()


def _tiff_bytes(
    arr: np.ndarray,
    bo: str = "<",
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
    predictor: int = 1,
    rows_per_strip: int = None,
    photometric: int = None,
    palette: np.ndarray = None,
    bilevel: bool = False,
    fill_order: int = 1,
    colormap_8bit: bool = False,
    palette_bilevel: np.ndarray = None,
    strip_pad: int = 0,
) -> bytes:
    """TIFF from an HxWxC uint8 array (or HxW indices with `palette`,
    or HxW 0/1 with `bilevel`). Header + strips + IFD at the end."""
    if palette_bilevel is not None:
        bilevel = True
        palette = palette_bilevel
    if palette is not None or bilevel:
        h, w = arr.shape
        spp, depth = 1, (1 if bilevel else 8)
    else:
        h, w, spp = arr.shape
        depth = 8
    rps = rows_per_strip or h
    stored = arr
    if predictor == 2:
        # horizontal differencing, per channel per row, scalar loop
        # (the decoder undoes it with a vectorized cumsum)
        flat = arr.reshape(h, -1).astype(int)
        diff = flat.copy()
        for x in range(spp, flat.shape[1]):
            diff[:, x] = (flat[:, x] - flat[:, x - spp]) % 256
        stored = diff.astype(np.uint8).reshape(arr.shape)
    if bilevel:
        order = "little" if fill_order == 2 else "big"
        rows = [np.packbits(stored[y], bitorder=order).tobytes() for y in range(h)]
    else:
        rows = [stored[y].tobytes() for y in range(h)]
    strips = []
    for y0 in range(0, h, rps):
        strip = b"".join(rows[y0 : y0 + rps])
        if packbits:
            strip = _packbits_encode(strip)
        elif lzw:
            strip = _tiff_lzw_encode(strip)
        elif deflate:
            import zlib

            strip = zlib.compress(strip)
        # strip_pad mimics word-aligning writers whose StripByteCounts
        # include trailing padding bytes (legal for compression=1: the
        # reader must trim each strip to its row share)
        strips.append(strip + b"\xab" * strip_pad)
    # layout: 8-byte header, strip data, [colormap], IFD
    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    cmap_off = pos
    cmap_words = []
    if palette is not None:
        # ColorMap: 3*2^depth SHORTs, R plane then G then B; spec says
        # value<<8, colormap_8bit mimics the raw-8-bit writer bug
        shift = 0 if colormap_8bit else 8
        nslots = 1 << depth
        for ch in range(3):
            plane = np.zeros(nslots, dtype=np.uint16)
            plane[: len(palette)] = palette[:, ch].astype(np.uint16) << shift
            cmap_words.extend(int(v) for v in plane)
        pos += 2 * len(cmap_words)
    ifd_off = pos

    entries = []  # (tag, type, count, packed-value-or-offset bytes)

    def entry(tag, typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ]
        payload = struct.pack(bo + fmt * len(vals), *vals)
        if len(payload) <= 4:
            payload = payload + b"\x00" * (4 - len(payload))
            entries.append(struct.pack(bo + "HHI", tag, typ, len(vals)) + payload)
        else:
            entries.append(None)  # patched below with an offset
            deferred.append((len(entries) - 1, tag, typ, vals, payload))

    deferred = []
    phot = photometric
    if phot is None:
        phot = 3 if palette is not None else (1 if spp == 1 else 2)
    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [depth] * spp)
    entry(259, 3, [32773 if packbits else (5 if lzw else (8 if deflate else 1))])
    entry(262, 3, [phot])
    entry(273, 4, strip_offs)
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, [len(s) for s in strips])
    if predictor != 1:
        entry(317, 3, [predictor])
    if fill_order != 1:
        entry(266, 3, [fill_order])
    if spp == 4:
        entry(338, 3, [2])  # ExtraSamples: unassociated alpha
    if palette is not None:
        entries.append(
            struct.pack(bo + "HHI", 320, 3, len(cmap_words))
            + struct.pack(bo + "I", cmap_off)
        )
    # resolve deferred (multi-value) entries after the IFD
    tail_off = ifd_off + 2 + 12 * len(entries) + 4
    tail = bytearray()
    for slot, tag, typ, vals, payload in deferred:
        entries[slot] = struct.pack(bo + "HHI", tag, typ, len(vals)) + struct.pack(
            bo + "I", tail_off + len(tail)
        )
        tail += payload
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    for s in strips:
        out += s
    if cmap_words:
        out += struct.pack(bo + "H" * len(cmap_words), *cmap_words)
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += tail
    return bytes(out)


def test_tiff_rgb_both_endians():
    arr = _rng(500).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(arr, "<")), arr)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(arr, ">")), arr)


def test_tiff_gray_and_rgba():
    g = _rng(501).integers(0, 256, size=(4, 9, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(g)), g)
    ga = _rng(502).integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(ga)), ga)


def test_tiff_multi_strip():
    arr = _rng(503).integers(0, 256, size=(11, 4, 3), dtype=np.uint8)
    got = decode_image(_tiff_bytes(arr, rows_per_strip=3))  # 4 strips, last short
    np.testing.assert_array_equal(got, arr)


def test_tiff_packbits_roundtrip():
    # long runs + noise: exercises repeat packets, literal packets,
    # and the 128-length packet cap
    arr = np.zeros((8, 70, 1), dtype=np.uint8)
    arr[2:5, 10:40] = 200
    arr[6] = _rng(504).integers(0, 256, size=(70, 1), dtype=np.uint8)
    got = decode_image(_tiff_bytes(arr, packbits=True, rows_per_strip=2))
    np.testing.assert_array_equal(got, arr)


def test_tiff_white_is_zero_inverts():
    g = _rng(505).integers(0, 256, size=(3, 5, 1), dtype=np.uint8)
    got = decode_image(_tiff_bytes(g, photometric=0))
    np.testing.assert_array_equal(got, 255 - g)


def test_tiff_palette():
    pal = np.array(
        [(9 * i % 256, (5 * i + 1) % 256, (11 * i + 7) % 256) for i in range(40)],
        dtype=np.uint8,
    )
    idx = _rng(506).integers(0, 40, size=(7, 6), dtype=np.uint8)
    got = decode_image(_tiff_bytes(idx, palette=pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_tiff_bilevel_scan():
    """1-bit fax-style scan: MSB-first packed rows, byte-aligned; both
    photometric polarities."""
    bits = _rng(507).integers(0, 2, size=(5, 19), dtype=np.uint8)
    got = decode_image(_tiff_bytes(bits, bilevel=True, photometric=1))
    np.testing.assert_array_equal(got, (bits * 255)[:, :, None])
    got0 = decode_image(_tiff_bytes(bits, bilevel=True, photometric=0))
    np.testing.assert_array_equal(got0, (255 - bits * 255)[:, :, None])


def test_tiff_lzw_roundtrip_with_width_growth():
    """40x40 RGB noise = 4800 mostly-incompressible bytes: the LZW
    dictionary crosses the 511 and 1023 EarlyChange boundaries, so an
    encoder/decoder width-schedule mismatch cannot survive this."""
    arr = _rng(508).integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(arr, lzw=True)), arr)
    # multi-strip: each strip is an independent LZW stream
    got = decode_image(_tiff_bytes(arr, lzw=True, rows_per_strip=7, bo=">"))
    np.testing.assert_array_equal(got, arr)


def test_tiff_lzw_with_horizontal_predictor():
    """Predictor 2 (the standard LZW companion): serializer differences
    per channel scalar-wise, decoder undoes with a vectorized cumsum."""
    base = np.add.outer(np.arange(9), 3 * np.arange(11)) % 256
    arr = np.stack([base, (base * 2) % 256, (base + 7) % 256], axis=2).astype(np.uint8)
    got = decode_image(_tiff_bytes(arr, lzw=True, predictor=2))
    np.testing.assert_array_equal(got, arr)
    gray = _rng(512).integers(0, 256, size=(5, 30, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_image(_tiff_bytes(gray, lzw=True, predictor=2)), gray
    )


def test_tiff_deflate_roundtrip():
    """Adobe Deflate (compression 8): per-strip zlib streams, with and
    without the predictor."""
    arr = _rng(514).integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_tiff_bytes(arr, deflate=True)), arr)
    got = decode_image(_tiff_bytes(arr, deflate=True, predictor=2, rows_per_strip=5))
    np.testing.assert_array_equal(got, arr)


def test_tiff_jpeg_compression_needs_codec():
    if not _no_pil():
        pytest.skip("PIL present on this host; gate untestable")
    arr = _rng(513).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(_tiff_bytes(arr))
    ifd_off = struct.unpack_from("<I", data, 4)[0]
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", data, off)[0]
        if tag == 259:
            struct.pack_into("<H", data, off + 8, 7)  # new-style JPEG
    with pytest.raises(NotImplementedError):
        decode_image(bytes(data))


def _patch_tag(data: bytes, tag: int, new_tag: int = None, new_value: int = None) -> bytes:
    """Rewrite an IFD entry's tag id and/or inline value (LE only)."""
    out = bytearray(data)
    ifd_off = struct.unpack_from("<I", out, 4)[0]
    (n,) = struct.unpack_from("<H", out, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack_from("<H", out, off)[0] == tag:
            if new_tag is not None:
                struct.pack_into("<H", out, off, new_tag)
            if new_value is not None:
                typ = struct.unpack_from("<H", out, off + 2)[0]
                struct.pack_into("<H" if typ == 3 else "<I", out, off + 8, new_value)
    return bytes(out)


def test_tiff_unsupported_features_classified_not_misdecoded():
    """CMYK/YCbCr photometrics, planar configuration, and sub-byte
    tiled layouts are valid TIFF features this decoder doesn't own —
    they must raise NotImplementedError (quarantine class
    'unsupported'), never decode raw samples as RGB (silently wrong).
    Tiled 8-bit layouts decode natively since r9, so a tile-tagged
    file MISSING TileWidth/Length is now the malformed class."""
    arr = _rng(520).integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    ok = _tiff_bytes(arr)
    for phot in (5, 6, 8):  # CMYK, YCbCr, CIELab
        with pytest.raises(NotImplementedError):
            decode_image(_patch_tag(ok, 262, new_value=phot))
    # strip tags renamed to tile tags WITHOUT TileWidth/Length: a
    # tiled file with no tile geometry is structurally damaged
    tiled = _patch_tag(_patch_tag(ok, 273, new_tag=324), 279, new_tag=325)
    with pytest.raises(ValueError, match="TileWidth"):
        decode_image(tiled)
    # 1-bit tiled stays codec-contract territory
    bits = _rng(522).integers(0, 2, size=(4, 8), dtype=np.uint8)
    bil = _tiff_bytes(bits, bilevel=True)
    bil_tiled = _patch_tag(_patch_tag(bil, 273, new_tag=324), 279, new_tag=325)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_image(bil_tiled)
    # planar configuration 2: ExtraSamples tag rewritten to tag 284=2
    planar = _patch_tag(ok, 338, new_tag=284, new_value=2)
    with pytest.raises(NotImplementedError):
        decode_image(planar)


def test_tiff_bilevel_palette_uses_colormap():
    """A 1-bit paletted TIFF maps bits through the 2-entry ColorMap —
    previously the bilevel branch returned 0/255 gray and silently
    ignored the palette."""
    bits = _rng(521).integers(0, 2, size=(3, 10), dtype=np.uint8)
    pal = np.array([(200, 10, 30), (5, 120, 250)], dtype=np.uint8)
    data = _tiff_bytes(bits, bilevel=True, palette_bilevel=pal)
    np.testing.assert_array_equal(decode_image(data), pal[bits])


def test_tiff_fill_order_lsb():
    """FillOrder=2 packs row bits low-order-first; bits must not come
    out mirrored."""
    bits = _rng(522).integers(0, 2, size=(4, 11), dtype=np.uint8)
    data = _tiff_bytes(bits, bilevel=True, photometric=1, fill_order=2)
    np.testing.assert_array_equal(decode_image(data), (bits * 255)[:, :, None])


def test_tiff_8bit_valued_colormap_compensated():
    """Some writers store ColorMap values in 0..255 instead of
    value<<8 (known bug libtiff/PIL compensate for); max<=255 means
    use as-is, not >>8 into near-black."""
    pal = np.array([(10 + i, 20 + i, 30 + i) for i in range(16)], dtype=np.uint8)
    idx = _rng(523).integers(0, 16, size=(5, 5), dtype=np.uint8)
    data = _tiff_bytes(idx, palette=pal, colormap_8bit=True)
    np.testing.assert_array_equal(decode_image(data), pal[idx])


def test_tiff_malformed_rejected():
    arr = _rng(509).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    ok = _tiff_bytes(arr)
    with pytest.raises(ValueError):  # strip data cut off
        decode_image(ok[:20])
    data = bytearray(ok)
    struct.pack_into("<I", data, 4, len(ok) + 100)  # IFD offset past EOF
    with pytest.raises(ValueError):
        decode_image(bytes(data))


def test_tiff_bomb_dimensions_rejected():
    arr = _rng(510).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(_tiff_bytes(arr))
    ifd_off = struct.unpack_from("<I", data, 4)[0]
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack_from("<H", data, off)[0]
        if tag in (256, 257):
            struct.pack_into("<I", data, off + 8, 60000)
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_image(bytes(data))


def test_tiff_property_random():
    rng = _rng(511)
    for trial in range(12):
        h = int(rng.integers(1, 10))
        w = int(rng.integers(1, 10))
        c = int(rng.integers(1, 4))
        c = {1: 1, 2: 3, 3: 4}[c]
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        bo = "<" if trial % 2 else ">"
        pb = trial % 3 == 0
        rps = int(rng.integers(1, h + 1))
        got = decode_image(_tiff_bytes(arr, bo=bo, packbits=pb, rows_per_strip=rps))
        np.testing.assert_array_equal(got, arr, err_msg=f"trial {trial}")


def test_tiff_padded_uncompressed_strips_trimmed():
    """Word-aligning writers pad compression=1 strips and report the
    padded length in StripByteCounts; each strip must be trimmed to
    its row share or every later strip shifts and the raster decodes
    silently wrong (ADVICE r7 #1 — reproduced before the fix: 0xAB
    junk bytes appeared mid-raster with no error)."""
    arr = _rng(512).integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    for pad in (1, 2, 7):
        got = decode_image(_tiff_bytes(arr, rows_per_strip=2, strip_pad=pad))
        np.testing.assert_array_equal(got, arr, err_msg=f"pad={pad}")


def test_tiff_short_uncompressed_strip_rejected():
    """A compression=1 strip SHORTER than its row share is malformed
    (truncated data), not silently zero-filled — classified ValueError
    like the compressed branches."""
    arr = _rng(513).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = _tiff_bytes(arr)  # single strip, inline StripByteCounts
    short = _patch_tag(data, 279, new_value=4 * 4 * 3 - 5)
    with pytest.raises(ValueError, match="TIFF"):
        decode_image(short)


# --------------------------------------------------- tiled layout (r9)


def _tiff_tiled_bytes(
    arr: np.ndarray,
    tile_w: int,
    tile_h: int,
    bo: str = "<",
    lzw: bool = False,
    packbits: bool = False,
    deflate: bool = False,
    predictor: int = 1,
    palette: np.ndarray = None,
) -> bytes:
    """Tiled TIFF per spec §15, written independently of the decoder:
    the raster as a grid of FULL-SIZE tiles (edge tiles zero-padded),
    each tile compressed on its own with the predictor applied within
    the tile (it resets at every tile's left edge), tags
    TileWidth/TileLength/TileOffsets/TileByteCounts instead of the
    strip tags."""
    if palette is not None:
        h, w = arr.shape
        spp = 1
    else:
        h, w, spp = arr.shape
    across, down = -(-w // tile_w), -(-h // tile_h)
    px = arr.reshape(h, w, spp)
    tiles = []
    for ty in range(down):
        for tx in range(across):
            tile = np.zeros((tile_h, tile_w, spp), dtype=np.uint8)
            sub = px[ty * tile_h : (ty + 1) * tile_h, tx * tile_w : (tx + 1) * tile_w]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            if predictor == 2:
                flat = tile.reshape(tile_h, -1).astype(int)
                diff = flat.copy()
                for x in range(spp, flat.shape[1]):
                    diff[:, x] = (flat[:, x] - flat[:, x - spp]) % 256
                tile = diff.astype(np.uint8).reshape(tile.shape)
            seg = tile.tobytes()
            if packbits:
                seg = _packbits_encode(seg)
            elif lzw:
                seg = _tiff_lzw_encode(seg)
            elif deflate:
                import zlib

                seg = zlib.compress(seg)
            tiles.append(seg)
    pos = 8
    tile_offs = []
    for s in tiles:
        tile_offs.append(pos)
        pos += len(s)
    cmap_words = []
    cmap_off = pos
    if palette is not None:
        for ch in range(3):
            plane = np.zeros(256, dtype=np.uint16)
            plane[: len(palette)] = palette[:, ch].astype(np.uint16) << 8
            cmap_words.extend(int(v) for v in plane)
        pos += 2 * len(cmap_words)
    ifd_off = pos

    entries = []
    deferred = []

    def entry(tag, typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        payload = struct.pack(bo + fmt * len(vals), *vals)
        if len(payload) <= 4:
            payload = payload + b"\x00" * (4 - len(payload))
            entries.append(struct.pack(bo + "HHI", tag, typ, len(vals)) + payload)
        else:
            entries.append(None)
            deferred.append((len(entries) - 1, tag, typ, vals, payload))

    phot = 3 if palette is not None else (1 if spp == 1 else 2)
    comp = 32773 if packbits else (5 if lzw else (8 if deflate else 1))
    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [comp])
    entry(262, 3, [phot])
    entry(277, 3, [spp])
    if predictor != 1:
        entry(317, 3, [predictor])
    if spp == 4:
        entry(338, 3, [2])
    if palette is not None:
        entry(320, 3, cmap_words) if len(cmap_words) * 2 <= 4 else entries.append(
            struct.pack(bo + "HHII", 320, 3, len(cmap_words), cmap_off)
        )
    entry(322, 3, [tile_w])
    entry(323, 3, [tile_h])
    entry(324, 4, tile_offs)
    entry(325, 4, [len(s) for s in tiles])
    # resolve deferred (value blocks after the IFD)
    tail_off = ifd_off + 2 + 12 * len(entries) + 4
    tail = b""
    for slot, tag, typ, vals, payload in deferred:
        entries[slot] = struct.pack(bo + "HHII", tag, typ, len(vals), tail_off + len(tail))
        tail += payload
    out = bytearray()
    out += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, ifd_off)
    for s in tiles:
        out += s
    for v in cmap_words:
        out += struct.pack(bo + "H", v)
    out += struct.pack(bo + "H", len(entries))
    for e in entries:
        out += e
    out += struct.pack(bo + "I", 0)
    out += tail
    return bytes(out)


def test_tiff_tiled_rgb_edge_padding():
    """20x35 RGB with 16x16 tiles: a 3x2 grid whose right/bottom
    tiles carry padding the decoder must trim."""
    arr = _rng(85).integers(0, 256, size=(20, 35, 3), dtype=np.uint8)
    got = decode_image(_tiff_tiled_bytes(arr, 16, 16))
    np.testing.assert_array_equal(got, arr)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_tiff_tiled_lzw_predictor_resets_per_tile(bo):
    """The key tiled-predictor semantic: horizontal differencing
    resets at every tile's left edge — a decoder running one cumsum
    across the assembled raster would corrupt every tile after the
    first column of tiles."""
    arr = _rng(86).integers(0, 256, size=(18, 40, 3), dtype=np.uint8)
    got = decode_image(
        _tiff_tiled_bytes(arr, 16, 16, bo=bo, lzw=True, predictor=2)
    )
    np.testing.assert_array_equal(got, arr)


def test_tiff_tiled_gray_packbits_and_rgba_deflate():
    g = _rng(87).integers(0, 256, size=(17, 33, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_image(_tiff_tiled_bytes(g, 16, 16, packbits=True)), g
    )
    rgba = _rng(88).integers(0, 256, size=(16, 20, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_image(_tiff_tiled_bytes(rgba, 16, 16, deflate=True)), rgba
    )


def test_tiff_tiled_palette():
    pal = _rng(89).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(90).integers(0, 16, size=(19, 21), dtype=np.uint8)
    got = decode_image(_tiff_tiled_bytes(idx, 16, 16, palette=pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_tiff_tiled_malformed_and_unsupported():
    arr = _rng(91).integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    ok = _tiff_tiled_bytes(arr, 16, 16)
    # wrong tile-table length for the grid
    bad = bytearray(_tiff_tiled_bytes(arr, 8, 8))  # 2x2 grid, 4 tiles
    # patch TileWidth to 16 so the grid claims 1x1 but 4 offsets exist
    i = bad.find(struct.pack("<HHI", 322, 3, 1))
    struct.pack_into("<H", bad, i + 8, 16)
    i = bad.find(struct.pack("<HHI", 323, 3, 1))
    struct.pack_into("<H", bad, i + 8, 16)
    with pytest.raises(ValueError, match="grid"):
        decode_image(bytes(bad))
    # truncated tile data
    with pytest.raises(ValueError):
        decode_image(ok[:40])
    # sanity: the untouched payload still decodes
    np.testing.assert_array_equal(decode_image(ok), arr)
