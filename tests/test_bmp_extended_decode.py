"""Extended BMP decode (functions/multimodal.py::_decode_bmp):
paletted 1/4/8-bit, RLE8/RLE4, 16-bit 555/565, and BI_BITFIELDS
with alpha — everything in the classic BMP family is fixed-layout or
run-length (no entropy coding), so it decodes natively. Serializers
here are written from the Microsoft BMP/DIB documentation
independently of the decoder: BITMAPFILEHEADER + BITMAPINFOHEADER
(/V4), BGRX color tables, 4-byte row strides, MSB-first sub-byte
packing, hi-nibble-first RLE4, and the RLE escape codes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image

from test_image_decode import _rng


def _bmp_container(
    w: int,
    h_signed: int,
    bpp: int,
    compression: int,
    data: bytes,
    masks_blob: bytes = b"",
    pal_blob: bytes = b"",
    clr_used: int = 0,
    hdr_size: int = 40,
) -> bytes:
    """Assemble the BMP: file header, info header (zero-padded to
    hdr_size for V4/V5), optional BITFIELDS mask block (hdr 40),
    color table, pixel data."""
    info = struct.pack(
        "<IiiHHIIiiII",
        hdr_size, w, h_signed, 1, bpp, compression,
        len(data), 2835, 2835, clr_used, 0,
    )
    info += masks_blob if hdr_size > 40 else b""
    info = info.ljust(hdr_size, b"\x00")
    after_info = (masks_blob if hdr_size == 40 else b"") + pal_blob
    pix_off = 14 + len(info) + len(after_info)
    file_hdr = b"BM" + struct.pack(
        "<IHHI", pix_off + len(data), 0, 0, pix_off
    )
    return file_hdr + info + after_info + data


def _pal_blob(palette: np.ndarray) -> bytes:
    """RGB palette (n, 3) → the BGRX quad table BMP stores."""
    quads = np.zeros((len(palette), 4), dtype=np.uint8)
    quads[:, 0] = palette[:, 2]
    quads[:, 1] = palette[:, 1]
    quads[:, 2] = palette[:, 0]
    return quads.tobytes()


def _pack_indices(idx_rows: np.ndarray, bpp: int) -> bytes:
    """Bottom-up row storage, MSB-first sub-byte packing, 4-byte
    stride."""
    h, w = idx_rows.shape
    stride = ((w * bpp + 31) // 32) * 4
    out = bytearray()
    for row in idx_rows[::-1]:  # bottom-up
        if bpp == 8:
            raw = bytes(row)
        elif bpp == 4:
            padded = np.concatenate([row, np.zeros(len(row) % 2, dtype=row.dtype)])
            raw = bytes((padded[0::2] << 4) | padded[1::2])
        else:
            raw = np.packbits(row.astype(bool)).tobytes()
        out += raw.ljust(stride, b"\x00")
    return bytes(out)


def _paletted_bmp(idx: np.ndarray, palette: np.ndarray, bpp: int,
                  clr_used: int = 0) -> bytes:
    return _bmp_container(
        idx.shape[1], idx.shape[0], bpp, 0,
        _pack_indices(idx, bpp), pal_blob=_pal_blob(palette),
        clr_used=clr_used,
    )


@pytest.mark.parametrize("bpp,ncolors,w", [(8, 256, 13), (4, 16, 11), (1, 2, 19)])
def test_bmp_paletted_roundtrip(bpp, ncolors, w):
    """Odd widths exercise sub-byte packing + the 4-byte stride."""
    rng = _rng(970 + bpp)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(7, w), dtype=np.uint8)
    got = decode_image(_paletted_bmp(idx, pal, bpp))
    np.testing.assert_array_equal(got, pal[idx])


def test_bmp_paletted_clr_used_subset():
    """biClrUsed shrinks the stored table; an index beyond it is
    malformed, not garbage colors."""
    rng = _rng(974)
    pal = rng.integers(0, 256, size=(10, 3), dtype=np.uint8)
    idx = rng.integers(0, 10, size=(5, 6), dtype=np.uint8)
    got = decode_image(_paletted_bmp(idx, pal, 8, clr_used=10))
    np.testing.assert_array_equal(got, pal[idx])
    bad_idx = idx.copy()
    bad_idx[2, 2] = 11
    with pytest.raises(ValueError, match="palette index"):
        decode_image(_paletted_bmp(bad_idx, pal, 8, clr_used=10))


def _rle8_encode(idx: np.ndarray) -> bytes:
    """Every pixel as encoded runs (valid per spec; count 1..255),
    EOL per row, EOF at the end — bottom-up row order."""
    out = bytearray()
    for row in idx[::-1]:
        x = 0
        while x < len(row):
            run = 1
            while x + run < len(row) and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


def test_bmp_rle8_roundtrip():
    rng = _rng(975)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    # runs exist: low-cardinality indices
    idx = rng.integers(0, 5, size=(9, 14), dtype=np.uint8)
    payload = _bmp_container(
        14, 9, 8, 1, _rle8_encode(idx), pal_blob=_pal_blob(pal)
    )
    np.testing.assert_array_equal(decode_image(payload), pal[idx])


def test_bmp_rle4_runs_absolute_delta_and_default_fill():
    """A hand-built RLE4 stream: an alternating-nibble run, an
    absolute block (hi-first nibbles, padded to an even byte count),
    a delta skip whose skipped span must read as palette index 0, a
    short line completed by EOL, and EOF before the last row —
    remaining pixels default to 0."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [255, 0, 255]], dtype=np.uint8
    )
    w, h = 8, 3
    stream = bytes(
        [
            4, 0x55,          # y0: x0..3 = 5 5 5 5
            0, 2, 2, 1,       # delta: x+=2, y+=1 → (6, 1); skipped → 0
            2, 0x12,          # y1: x6..7 = 1 2
            0, 0,             # EOL → y2, x0
            0, 4, 0x12, 0x34, # absolute: 4 nibbles 1,2,3,4 (even bytes)
            0, 1,             # EOF — rest of y2 stays 0
        ]
    )
    expect_bu = np.zeros((h, w), dtype=np.uint8)  # bottom-up rows
    expect_bu[0, :4] = 5
    expect_bu[1, 6] = 1
    expect_bu[1, 7] = 2
    expect_bu[2, :4] = [1, 2, 3, 4]
    payload = _bmp_container(
        w, h, 4, 2, stream, pal_blob=_pal_blob(pal), clr_used=len(pal)
    )
    np.testing.assert_array_equal(decode_image(payload), pal[expect_bu[::-1]])


def test_bmp_rle_malformed():
    pal = np.zeros((256, 3), dtype=np.uint8)
    blob = _pal_blob(pal)
    # run crossing the row boundary
    with pytest.raises(ValueError, match="row"):
        decode_image(_bmp_container(4, 2, 8, 1, bytes([6, 7, 0, 1]), pal_blob=blob))
    # truncated absolute block
    with pytest.raises(ValueError, match="absolute"):
        decode_image(_bmp_container(8, 2, 8, 1, bytes([0, 4, 1, 2]), pal_blob=blob))
    # no EOF escape
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_image(_bmp_container(4, 2, 8, 1, bytes([2, 3, 0, 0]), pal_blob=blob))
    # top-down RLE is invalid per spec
    with pytest.raises(ValueError, match="top-down"):
        decode_image(_bmp_container(4, -2, 8, 1, bytes([2, 3, 0, 1]), pal_blob=blob))
    # delta escaping the bitmap
    with pytest.raises(ValueError, match="delta"):
        decode_image(
            _bmp_container(4, 2, 8, 1, bytes([0, 2, 200, 200]), pal_blob=blob)
        )


def _scale(v: np.ndarray, width: int) -> np.ndarray:
    m = (1 << width) - 1
    return ((v.astype(np.uint32) * 255 + m // 2) // m).astype(np.uint8)


def test_bmp_16bit_555_implicit():
    """compression=0 at 16 bpp means 555 per the spec — no mask block
    present."""
    rng = _rng(976)
    r5 = rng.integers(0, 32, size=(5, 7), dtype=np.uint16)
    g5 = rng.integers(0, 32, size=(5, 7), dtype=np.uint16)
    b5 = rng.integers(0, 32, size=(5, 7), dtype=np.uint16)
    vals = (r5 << 10) | (g5 << 5) | b5
    data = bytearray()
    stride = (7 * 2 + 3) & ~3
    for row in vals[::-1]:
        data += row.astype("<u2").tobytes().ljust(stride, b"\x00")
    got = decode_image(_bmp_container(7, 5, 16, 0, bytes(data)))
    np.testing.assert_array_equal(
        got, np.stack([_scale(r5, 5), _scale(g5, 5), _scale(b5, 5)], axis=-1)
    )


def test_bmp_16bit_565_bitfields():
    rng = _rng(977)
    r5 = rng.integers(0, 32, size=(4, 6), dtype=np.uint16)
    g6 = rng.integers(0, 64, size=(4, 6), dtype=np.uint16)
    b5 = rng.integers(0, 32, size=(4, 6), dtype=np.uint16)
    vals = (r5 << 11) | (g6 << 5) | b5
    stride = (6 * 2 + 3) & ~3
    data = bytearray()
    for row in vals[::-1]:
        data += row.astype("<u2").tobytes().ljust(stride, b"\x00")
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    got = decode_image(
        _bmp_container(6, 4, 16, 3, bytes(data), masks_blob=masks)
    )
    np.testing.assert_array_equal(
        got, np.stack([_scale(r5, 5), _scale(g6, 6), _scale(b5, 5)], axis=-1)
    )


def test_bmp_32bit_bitfields_alpha_v4_header():
    """V4 header (108 bytes) carries the masks in-header including
    alpha → RGBA output; alpha mask 0 under a 40-byte header with a
    3-mask block → RGB."""
    rng = _rng(978)
    px = rng.integers(0, 256, size=(3, 5, 4), dtype=np.uint8)  # RGBA
    vals = (
        px[:, :, 0].astype(np.uint32) << 16  # R mask 0x00FF0000
        | px[:, :, 1].astype(np.uint32) << 8
        | px[:, :, 2].astype(np.uint32)
        | px[:, :, 3].astype(np.uint32) << 24
    )
    data = bytearray()
    for row in vals[::-1]:
        data += row.astype("<u4").tobytes()
    masks = struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    got = decode_image(
        _bmp_container(5, 3, 32, 3, bytes(data), masks_blob=masks, hdr_size=108)
    )
    assert got.shape == (3, 5, 4)
    np.testing.assert_array_equal(got, px)
    # same pixels, hdr 40 + RGB masks only → alpha dropped
    got3 = decode_image(
        _bmp_container(5, 3, 32, 3, bytes(data), masks_blob=masks[:12])
    )
    np.testing.assert_array_equal(got3, px[:, :, :3])


def test_bmp_unsupported_and_malformed_headers():
    with pytest.raises(NotImplementedError, match="OS/2"):
        decode_image(
            b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 4, 4, 1, 24) + b"\x00" * 40
        )
    with pytest.raises(NotImplementedError, match="bpp"):
        decode_image(_bmp_container(4, 4, 2, 0, b"\x00" * 16))
    with pytest.raises(ValueError, match="non-contiguous"):
        masks = struct.pack("<III", 0b101000, 0b010, 0b1)
        decode_image(
            _bmp_container(2, 2, 16, 3, b"\x00" * 16, masks_blob=masks)
        )
    with pytest.raises(ValueError, match="dimensions"):
        decode_image(_bmp_container(0, 2, 24, 0, b""))
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_image(_bmp_container(50000, 50000, 24, 0, b""))
    with pytest.raises(NotImplementedError, match="biCompression"):
        decode_image(_bmp_container(2, 2, 24, 4, b"\x00" * 16))  # BI_JPEG
    with pytest.raises(ValueError, match="color table"):
        pal = np.zeros((4, 3), dtype=np.uint8)
        payload = _paletted_bmp(
            np.zeros((2, 2), dtype=np.uint8), pal, 8, clr_used=256
        )
        decode_image(payload)


def test_bmp_paletted_through_image_stats(spark):
    """The Spark featurizer path sees the widened format."""
    from pyspark.sql import functions as F  # noqa: F401

    from flink_hiveorc_spark.functions.multimodal import image_stats

    rng = _rng(979)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(6, 9), dtype=np.uint8)
    df = spark.createDataFrame(
        [(50, bytearray(_paletted_bmp(idx, pal, 4)))],
        "doc_id long, payload binary",
    )
    [r] = image_stats(df).collect()
    expect = pal[idx]
    assert (r["height"], r["width"], r["channels"]) == (6, 9, 3)
    assert r["mean_byte"] == int(expect.sum(dtype="int64")) / expect.size
