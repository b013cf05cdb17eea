"""Native-vs-PIL decode equivalence — ARMED contract tests (r7
verdict #4).

The container has no PIL, so the PIL leg of every assertion
auto-skips today; the moment the environment grows a codec these
tests certify that the C-speed dispatch path
(functions/multimodal.py::_pil_decode) and PIL's own pixel
conventions agree with the native decoders on the existing
round-trip corpora — certified, not trusted.

Structure that keeps the module honest WITHOUT PIL: every case
asserts native decode == the ground-truth pixel array built by the
INDEPENDENT test serializers (so the corpus itself and the native
expectations run green in this container), and the PIL assertions
reuse the same ground truth — they are exercised logic, not dead
code waiting on an import.

PIL leg normalization: every PIL read goes through
``Image.convert('RGBA')`` — exact for 8-bit inputs (L replicates,
P/transparency looks up the palette and key) — and the native
array is projected to RGBA the same way. Formats where PIL's 8-bit
conversion is lossy or convention-divergent (16-bit PNG clips via
mode 'I', sub-byte gray expansion varies by version) stay
native-only with the divergence documented inline.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image

from test_gif_decode import _PAL8, _gif_bytes
from test_image_decode import _bmp_bytes, _no_pil, _pgm_bytes, _ppm_bytes, _rng
from test_png_g711_decode import (
    ALL_FILTERS,
    _pack_row,
    _png_adam7_from_array,
    _png_bytes,
    _png_from_array,
)
from test_tiff_decode import _tiff_bytes

HAS_PIL = not _no_pil()


def _to_rgba(native: np.ndarray) -> np.ndarray:
    """Project a native HxWxC decode (C ∈ 1..4) to RGBA with PIL's
    convert() conventions: gray replicates, missing alpha is 255."""
    c = native.shape[2]
    if c == 1:
        rgb, a = np.repeat(native, 3, axis=2), None
    elif c == 2:
        rgb, a = np.repeat(native[:, :, :1], 3, axis=2), native[:, :, 1]
    elif c == 3:
        rgb, a = native, None
    else:
        rgb, a = native[:, :, :3], native[:, :, 3]
    if a is None:
        a = np.full(native.shape[:2], 255, dtype=np.uint8)
    return np.dstack([rgb, a])


def _check(payload: bytes, expect_native: np.ndarray, pil_leg: bool = True):
    """The shared contract: native == ground truth ALWAYS; with PIL
    present additionally (a) PIL's own RGBA read == the same ground
    truth and (b) the repo's _pil_decode dispatch == its RGB part."""
    got = decode_image(payload)
    np.testing.assert_array_equal(got, expect_native)
    if not (HAS_PIL and pil_leg):
        return
    from PIL import Image

    from flink_hiveorc_spark.functions.multimodal import _pil_decode

    expect_rgba = _to_rgba(expect_native)
    pil_rgba = np.asarray(Image.open(io.BytesIO(payload)).convert("RGBA"))
    np.testing.assert_array_equal(pil_rgba, expect_rgba)
    # convert('RGB') drops alpha without compositing, like [:, :, :3]
    np.testing.assert_array_equal(_pil_decode(payload), expect_rgba[:, :, :3])


def test_pil_arming_status():
    """Visible record of which leg ran: passes either way, but the
    assertion message in -v output shows whether PIL was exercised."""
    assert HAS_PIL in (True, False)


# ---------------------------------------------------------------- PNG


def test_equiv_png_rgb_all_filters():
    arr = _rng(900).integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    _check(_png_from_array(arr, ALL_FILTERS), arr)


def test_equiv_png_rgba():
    arr = _rng(901).integers(0, 256, size=(6, 9, 4), dtype=np.uint8)
    _check(_png_from_array(arr, [4, 3, 2]), arr)


def test_equiv_png_gray_and_gray_alpha():
    g = _rng(902).integers(0, 256, size=(5, 5, 1), dtype=np.uint8)
    _check(_png_from_array(g, [3, 1]), g)
    ga = _rng(903).integers(0, 256, size=(4, 8, 2), dtype=np.uint8)
    _check(_png_from_array(ga, [2, 4]), ga)


def test_equiv_png_adam7():
    arr = _rng(904).integers(0, 256, size=(10, 9, 3), dtype=np.uint8)
    _check(_png_adam7_from_array(arr, ALL_FILTERS), arr)


def test_equiv_png_palette_with_trns():
    pal = [(10 * i % 256, (7 * i + 3) % 256, (13 * i + 1) % 256) for i in range(16)]
    trns = [255, 0, 128, 7]
    idx = _rng(905).integers(0, 16, size=(6, 11), dtype=np.uint8)
    png = _png_bytes(
        [idx[y].tobytes() for y in range(6)], 11, 6, 8, 3, ALL_FILTERS, pal, trns
    )
    pal_arr = np.array(pal, dtype=np.uint8)
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:4] = trns
    _check(png, np.dstack([pal_arr[idx], alpha[idx][:, :, None]]))


def test_equiv_png_gray_trns_key():
    import struct

    vals = np.array([[10, 20, 10], [30, 10, 40]], dtype=np.uint8)
    png = _png_bytes(
        [vals[y].tobytes() for y in range(2)], 3, 2, 8, 0, [0, 1],
        trns=struct.pack(">H", 10),
    )
    expect = np.dstack([vals, np.where(vals == 10, 0, 255).astype(np.uint8)])
    _check(png, expect)


def test_equiv_png_rgb_trns_key():
    import struct

    arr = _rng(906).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    key = tuple(int(v) for v in arr[2, 3])
    png = _png_bytes(
        [arr[y].tobytes() for y in range(5)], 7, 5, 8, 2, ALL_FILTERS,
        trns=struct.pack(">3H", *key),
    )
    match = (arr == np.array(key, dtype=np.uint8)).all(axis=2)
    expect = np.dstack([arr, np.where(match, 0, 255).astype(np.uint8)])
    _check(png, expect)


def test_equiv_png_16bit_native_only():
    """PIL opens 16-bit gray PNG as mode 'I' and convert() CLIPS
    values >255 instead of scaling, so a PIL comparison would pin a
    PIL quirk, not a decode truth. Native high-byte reduction stays
    pinned here; pil_leg off by design."""
    arr16 = _rng(907).integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    rows = [arr16[y].astype(">u2").tobytes() for y in range(6)]
    _check(
        _png_bytes(rows, 5, 6, 16, 2, ALL_FILTERS),
        (arr16 >> 8).astype(np.uint8),
        pil_leg=False,
    )


def test_equiv_png_subbyte_gray_native_only():
    """Sub-byte gray expansion conventions vary across PIL versions
    (scaled vs raw indices for depth 2/4); native 0..255 scaling is
    already pinned by the decode suite — keep it native-only."""
    for depth in (1, 2, 4):
        maxval = (1 << depth) - 1
        vals = _rng(908 + depth).integers(
            0, maxval + 1, size=(3, 11), dtype=np.uint8
        )
        png = _png_bytes(
            [_pack_row(vals[y], depth) for y in range(3)], 11, 3, depth, 0, [0, 2]
        )
        expect = (vals * (255 // maxval)).astype(np.uint8)[:, :, None]
        _check(png, expect, pil_leg=False)


# ---------------------------------------------------------------- GIF


def test_equiv_gif_basic():
    idx = _rng(910).integers(0, 8, size=(7, 9), dtype=np.uint8)
    _check(_gif_bytes(idx, _PAL8), np.array(_PAL8, dtype=np.uint8)[idx])


def test_equiv_gif_interlaced():
    idx = _rng(911).integers(0, 8, size=(13, 5), dtype=np.uint8)
    _check(
        _gif_bytes(idx, _PAL8, interlace=True),
        np.array(_PAL8, dtype=np.uint8)[idx],
    )


def test_equiv_gif_transparency():
    idx = _rng(912).integers(0, 8, size=(6, 6), dtype=np.uint8)
    pal = np.array(_PAL8, dtype=np.uint8)
    alpha = np.where(idx == 3, 0, 255).astype(np.uint8)
    _check(
        _gif_bytes(idx, _PAL8, transparent=3),
        np.dstack([pal[idx], alpha]),
    )


def test_equiv_gif_animated_first_frame():
    idx = _rng(913).integers(0, 8, size=(5, 8), dtype=np.uint8)
    _check(
        _gif_bytes(idx, _PAL8, extra_frame=True),
        np.array(_PAL8, dtype=np.uint8)[idx],
    )


# --------------------------------------------------------------- TIFF


def test_equiv_tiff_rgb_both_endians():
    arr = _rng(920).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    _check(_tiff_bytes(arr, "<"), arr)
    _check(_tiff_bytes(arr, ">"), arr)


def test_equiv_tiff_gray_rgba_multistrip():
    g = _rng(921).integers(0, 256, size=(7, 4, 1), dtype=np.uint8)
    _check(_tiff_bytes(g, rows_per_strip=3), g)
    rgba = _rng(922).integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    _check(_tiff_bytes(rgba), rgba)


def test_equiv_tiff_compressions():
    arr = _rng(923).integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    _check(_tiff_bytes(arr, packbits=True, rows_per_strip=4), arr)
    _check(_tiff_bytes(arr, lzw=True, predictor=2), arr)
    _check(_tiff_bytes(arr, deflate=True, rows_per_strip=2), arr)


def test_equiv_tiff_palette():
    pal = np.array(
        [(i * 16 % 256, (255 - i * 8) % 256, i * 3) for i in range(40)],
        dtype=np.uint8,
    )
    idx = _rng(924).integers(0, 40, size=(6, 8), dtype=np.uint8)
    _check(_tiff_bytes(idx, palette=pal), pal[idx])


def test_equiv_tiff_white_is_zero():
    g = _rng(925).integers(0, 256, size=(5, 5, 1), dtype=np.uint8)
    _check(_tiff_bytes(g, photometric=0), 255 - g)


def test_equiv_tiff_bilevel():
    bits = _rng(926).integers(0, 2, size=(6, 10), dtype=np.uint8)
    _check(_tiff_bytes(bits, bilevel=True), (bits * 255)[:, :, None])


# ----------------------------------------------------------- BMP/PNM


def test_equiv_bmp_24bit_both_orientations():
    """32-bit BMP stays native-only elsewhere: PIL historically reads
    BI_RGB 32bpp as RGBX (alpha ignored), a PIL quirk we refuse to
    codify — 24-bit is the equivalence surface."""
    arr = _rng(930).integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    _check(_bmp_bytes(arr), arr)
    _check(_bmp_bytes(arr, top_down=True), arr)


def test_equiv_pnm():
    rgb = _rng(931).integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    _check(_ppm_bytes(rgb), rgb)
    g = _rng(932).integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    _check(_pgm_bytes(g), g)


# ------------------------------------------------- BMP widened (r9)


def test_equiv_bmp_paletted():
    """Paletted BMPs are squarely in PIL's surface — armed leg on."""
    from test_bmp_extended_decode import _paletted_bmp

    rng = _rng(933)
    for bpp, ncolors in ((8, 256), (4, 16), (1, 2)):
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, size=(6, 11), dtype=np.uint8)
        _check(_paletted_bmp(idx, pal, bpp), pal[idx])


def test_equiv_bmp_rle8():
    from test_bmp_extended_decode import (
        _bmp_container,
        _pal_blob,
        _rle8_encode,
    )

    rng = _rng(934)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, size=(7, 10), dtype=np.uint8)
    payload = _bmp_container(10, 7, 8, 1, _rle8_encode(idx), pal_blob=_pal_blob(pal))
    _check(payload, pal[idx])


def test_equiv_bmp_16bit_native_only():
    """16-bit 555/565 stays native-only: PIL's raw BGR;15/16 decoder
    expands sub-8-bit channels by BIT REPLICATION ((v<<3)|(v>>2) =
    floor), while this module scales by exact integer ROUNDING
    ((v·255 + m//2)//m) — they differ by 1 for some codes (e.g.
    5-bit 30 → 246 vs 247). We refuse to codify the floor variant;
    the native ground truth is the rounding one."""
    from test_bmp_extended_decode import _bmp_container, _scale

    rng = _rng(935)
    r5 = rng.integers(0, 32, size=(4, 5), dtype=np.uint16)
    g5 = rng.integers(0, 32, size=(4, 5), dtype=np.uint16)
    b5 = rng.integers(0, 32, size=(4, 5), dtype=np.uint16)
    vals = (r5 << 10) | (g5 << 5) | b5
    stride = (5 * 2 + 3) & ~3
    data = b"".join(
        row.astype("<u2").tobytes().ljust(stride, b"\x00") for row in vals[::-1]
    )
    _check(
        _bmp_container(5, 4, 16, 0, data),
        np.stack([_scale(r5, 5), _scale(g5, 5), _scale(b5, 5)], axis=-1),
        pil_leg=False,
    )


# ------------------------------------------------------ TGA (late r8)


def test_equiv_tga_truecolor_and_gray():
    """PIL reads footer-signed TGA 2.0; RLE and both row orders are
    part of its surface, so the new native TGA path joins the armed
    contract."""
    from test_qoi_tga_pnm_decode import _tga_bytes

    rgb = _rng(940).integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    _check(_tga_bytes(rgb), rgb)
    _check(_tga_bytes(rgb, top_down=False), rgb)
    _check(_tga_bytes(rgb, rle=True), rgb)
    g = _rng(941).integers(0, 256, size=(5, 5, 1), dtype=np.uint8)
    _check(_tga_bytes(g), g)


def test_equiv_tga_rgba():
    from test_qoi_tga_pnm_decode import _tga_bytes

    rgba = _rng(942).integers(0, 256, size=(4, 7, 4), dtype=np.uint8)
    _check(_tga_bytes(rgba), rgba)
    _check(_tga_bytes(rgba, rle=True, top_down=False), rgba)


# --------------------------------------------- tiled TIFF (r9)


def test_equiv_tiff_tiled():
    """PIL/libtiff read tiled TIFFs; both codecs and the per-tile
    predictor reset join the armed contract."""
    from test_tiff_decode import _tiff_tiled_bytes

    arr = _rng(944).integers(0, 256, size=(20, 35, 3), dtype=np.uint8)
    _check(_tiff_tiled_bytes(arr, 16, 16), arr)
    _check(_tiff_tiled_bytes(arr, 16, 16, lzw=True, predictor=2), arr)
    g = _rng(946).integers(0, 256, size=(17, 18, 1), dtype=np.uint8)
    _check(_tiff_tiled_bytes(g, 16, 16, packbits=True), g)


# ------------------------------------------- GIF animation (r9)


def test_equiv_gif_animation_full_opaque_frames():
    """Armed leg for the animation compositor on its portable subset
    (full-screen opaque frames — no disposal/transparency ambiguity
    between renderers): every PIL seek(k).convert('RGBA') must equal
    the composited canvas."""
    import numpy as np

    from flink_hiveorc_spark.functions.multimodal import decode_gif_frames
    from test_gif_decode import _PAL8, _gif_anim_bytes

    rng = _rng(945)
    idxs = [rng.integers(0, 8, size=(5, 7), dtype=np.uint8) for _ in range(3)]
    payload = _gif_anim_bytes(
        (7, 5), [{"idx": i, "delay": 4} for i in idxs], _PAL8
    )
    frames, delays = decode_gif_frames(payload)
    pal = np.asarray(_PAL8, dtype=np.uint8)
    for k in range(3):
        np.testing.assert_array_equal(frames[k, :, :, :3], pal[idxs[k]])
        assert (frames[k, :, :, 3] == 255).all()
    assert delays == [4, 4, 4]
    if not HAS_PIL:
        return
    from PIL import Image

    im = Image.open(io.BytesIO(payload))
    assert getattr(im, "n_frames", 1) == 3
    for k in range(3):
        im.seek(k)
        np.testing.assert_array_equal(
            np.asarray(im.convert("RGBA")), frames[k]
        )


# ---------------------------------------------------------------- WebP


def test_equiv_webp_lossless_rgb():
    from test_webp_decode import encode_vp8l

    rng = np.random.default_rng(700)
    img = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    _check(encode_vp8l(img, transforms=[("subtract_green",)]), img)


def test_equiv_webp_lossless_rgba():
    from test_webp_decode import encode_vp8l

    rng = np.random.default_rng(701)
    img = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    _check(encode_vp8l(img, alpha=True), img)


def test_equiv_webp_lossless_predictor_palette():
    from test_webp_decode import encode_vp8l

    rng = np.random.default_rng(702)
    img = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    grid = [[11, 12], [13, 7]]
    _check(encode_vp8l(img, transforms=[("predictor", 2, grid)]), img)


# ------------------------------------------------------- legacy rasters


def test_equiv_pcx_8bit():
    from test_raster_decode import _pcx

    rng = np.random.default_rng(710)
    idx = rng.integers(0, 256, (6, 8), dtype=np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    payload = _pcx(8, 6, [[idx[y].tobytes() for y in range(6)]], 8, 1,
                   palette256=pal)
    _check(payload, pal[idx])


def test_equiv_sgi_rgb_both_storages():
    from test_raster_decode import _sgi

    rng = np.random.default_rng(711)
    img = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    for rle in (False, True):
        _check(_sgi(img, rle), img)


def test_equiv_sun_raster_native_only():
    # PIL's SUN plugin mishandles some colormap layouts; keep the
    # native leg authoritative and skip the PIL comparison
    from test_raster_decode import _sun

    rng = np.random.default_rng(712)
    idx = rng.integers(0, 200, (4, 6), dtype=np.uint8)
    cmap = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    stride = ((6 * 8 + 15) // 16) * 2
    raw = b"".join(
        idx[y].tobytes() + b"\x00" * (stride - 6) for y in range(4)
    )
    _check(_sun(6, 4, 8, raw, 1, cmap), cmap[idx], pil_leg=False)


def test_equiv_xbm():
    rng = np.random.default_rng(713)
    bits = rng.integers(0, 2, (4, 10), dtype=np.uint8)
    rows = np.packbits(bits, axis=1, bitorder="little")
    hexes = ", ".join(f"0x{b:02x}" for row in rows for b in row)
    src = (
        "#define e_width 10\n#define e_height 4\n"
        f"static unsigned char e_bits[] = {{{hexes}}};\n"
    ).encode()
    _check(src, ((1 - bits) * np.uint8(255)).reshape(4, 10, 1))
