"""ICO/CUR decoding: independent fixture builders (ICONDIR + doubled-
height DIB + packed AND mask, or embedded PNG) must decode through
the real decode_image dispatch to the exact expected RGBA pixels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image

from test_png_g711_decode import ALL_FILTERS, _png_from_array


def _and_mask(bits: np.ndarray) -> bytes:
    """h×w 0/1 array → bottom-up, 32-bit-padded 1-bpp mask rows."""
    h, w = bits.shape
    stride = (w + 31) // 32 * 4
    out = bytearray()
    for row in bits[::-1]:
        packed = np.packbits(row.astype(np.uint8))
        out += packed.tobytes() + b"\x00" * (stride - len(packed))
    return bytes(out)


def _dib_entry(w, h, bpp, xor_rows: bytes, mask_bits, palette=b""):
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0, 0, 0, 0,
        len(palette) // 4, 0,
    )
    return hdr + palette + xor_rows + _and_mask(mask_bits)


def _ico(entries, kind=1):
    """entries: list of (w, h, bpp, blob)."""
    out = struct.pack("<HHH", 0, kind, len(entries))
    off = 6 + 16 * len(entries)
    dirs = b""
    blobs = b""
    for w, h, bpp, blob in entries:
        dirs += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp, len(blob), off
        )
        blobs += blob
        off += len(blob)
    return out + dirs + blobs


def test_ico_8bit_paletted_with_mask():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, size=(6, 5), dtype=np.uint8)
    pal = bytes(v for i in range(4) for v in (i * 10, i * 20, i * 30, 0))
    stride = (5 + 3) & ~3
    xor = b"".join(
        bytes(row) + b"\x00" * (stride - 5) for row in idx[::-1]
    )
    mask = np.zeros((6, 5), dtype=np.uint8)
    mask[0, 0] = 1  # top-left transparent
    blob = _dib_entry(5, 6, 8, xor, mask, pal)
    arr = decode_image(_ico([(5, 6, 8, blob)]))
    assert arr.shape == (6, 5, 4)
    # palette is BGRX: index i -> (B,G,R) = (10i, 20i, 30i) -> RGB reversed
    assert (arr[:, :, 0] == idx * 30).all()
    assert (arr[:, :, 1] == idx * 20).all()
    assert (arr[:, :, 2] == idx * 10).all()
    assert arr[0, 0, 3] == 0 and (arr[1:, :, 3] == 255).all()
    assert (arr[0, 1:, 3] == 255).all()


def test_ico_32bit_real_alpha_and_legacy_fallback():
    rng = np.random.default_rng(2)
    bgra = rng.integers(1, 255, size=(4, 4, 4), dtype=np.uint8)
    xor = bgra[::-1].tobytes()
    mask = np.zeros((4, 4), dtype=np.uint8)
    arr = decode_image(_ico([(4, 4, 32, _dib_entry(4, 4, 32, xor, mask))]))
    np.testing.assert_array_equal(arr[:, :, 0], bgra[:, :, 2])
    np.testing.assert_array_equal(arr[:, :, 3], bgra[:, :, 3])
    # all-zero alpha plane -> AND mask supplies transparency
    legacy = bgra.copy()
    legacy[:, :, 3] = 0
    mask2 = np.zeros((4, 4), dtype=np.uint8)
    mask2[2, 3] = 1
    arr = decode_image(
        _ico([(4, 4, 32, _dib_entry(4, 4, 32, legacy[::-1].tobytes(), mask2))])
    )
    assert arr[2, 3, 3] == 0 and arr[0, 0, 3] == 255


def test_ico_24bit_and_entry_selection():
    rng = np.random.default_rng(3)
    big = rng.integers(0, 255, size=(8, 8, 3), dtype=np.uint8)
    stride = (8 * 3 + 3) & ~3
    xor = b"".join(
        row.tobytes() + b"\x00" * (stride - 24) for row in big[::-1]
    )
    mask = np.zeros((8, 8), dtype=np.uint8)
    big_blob = _dib_entry(8, 8, 24, xor, mask)
    small = np.zeros((2, 2, 4), dtype=np.uint8)
    small_blob = _dib_entry(2, 2, 32, small.tobytes(), np.zeros((2, 2), np.uint8))
    arr = decode_image(_ico([(2, 2, 32, small_blob), (8, 8, 24, big_blob)]))
    assert arr.shape == (8, 8, 4)  # largest area wins
    np.testing.assert_array_equal(arr[:, :, 0], big[:, :, 2])  # BGR->RGB
    assert (arr[:, :, 3] == 255).all()


def test_ico_embedded_png():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    png = bytes(_png_from_array(img, ALL_FILTERS))
    arr = decode_image(_ico([(4, 4, 32, png)]))
    np.testing.assert_array_equal(arr[:, :, :3], img)


def test_ico_error_contract():
    with pytest.raises(ValueError, match="zero images"):
        decode_image(struct.pack("<HHH", 0, 1, 0))
    with pytest.raises(ValueError, match="truncated ICO directory"):
        decode_image(struct.pack("<HHH", 0, 1, 2) + b"\x00" * 16)
    ent = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, 999, 22)
    with pytest.raises(ValueError, match="overflows"):
        decode_image(struct.pack("<HHH", 0, 1, 1) + ent + b"\x00" * 8)
    # odd DIB height (no room for the mask half)
    blob = struct.pack("<IiiHHIIiiII", 40, 2, 3, 1, 32, 0, 0, 0, 0, 0, 0)
    blob += b"\x00" * 64
    with pytest.raises(ValueError, match="positive double"):
        decode_image(_ico([(2, 1, 32, blob)]))
    # compressed DIB inside ICO
    blob = struct.pack("<IiiHHIIiiII", 40, 2, 4, 1, 8, 1, 0, 0, 0, 0, 0)
    blob += b"\x00" * 64
    with pytest.raises(NotImplementedError, match="compression"):
        decode_image(_ico([(2, 2, 8, blob)]))


def test_ico_fuzz_byte_flips():
    rng = np.random.default_rng(5)
    bgra = rng.integers(0, 255, size=(4, 4, 4), dtype=np.uint8)
    good = _ico([(4, 4, 32, _dib_entry(4, 4, 32, bgra.tobytes(),
                                       np.zeros((4, 4), np.uint8)))])
    for _ in range(150):
        bad = bytearray(good)
        i = int(rng.integers(0, len(bad)))
        bad[i] ^= int(rng.integers(1, 256))
        try:
            decode_image(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def _no_pil():
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


@pytest.mark.skipif(_no_pil(), reason="PIL not installed (armed leg)")
def test_pil_equivalence_ico_32bit():
    import io

    from PIL import Image

    rng = np.random.default_rng(11)
    bgra = rng.integers(1, 255, size=(8, 8, 4), dtype=np.uint8)
    payload = _ico(
        [(8, 8, 32, _dib_entry(8, 8, 32, bgra[::-1].tobytes(),
                               np.zeros((8, 8), np.uint8)))]
    )
    ours = decode_image(payload)
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("RGBA"))
    np.testing.assert_array_equal(ours, theirs)


def test_cur_magic_vs_footerless_tga_disambiguation():
    """A footer-less truecolor TGA header IS the CUR magic
    (00 00 02 00) — it must keep its historical PIL-gated routing
    (NotImplementedError without PIL), while a shape-valid CUR
    decodes through the icon path. Caught by the r11 parallel suite:
    a naive magic check hijacked every footer-less TGA."""
    # minimal footer-less truecolor TGA: 2x2 24-bit
    tga = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 24, 0)
    tga += b"\x01\x02\x03" * 4
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            decode_image(tga)
    # the same magic with a VALID ICONDIR decodes as a cursor
    bgra = np.full((2, 2, 4), 9, dtype=np.uint8)
    cur = _ico(
        [(2, 2, 32, _dib_entry(2, 2, 32, bgra.tobytes(),
                               np.zeros((2, 2), np.uint8)))],
        kind=2,
    )
    arr = decode_image(cur)
    assert arr.shape == (2, 2, 4) and (arr[:, :, :3] == 9).all()
