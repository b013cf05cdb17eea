"""QOI / TGA / complete-netpbm native decode: round-trips against
serializers written independently from the decoder (QOI encoder
straight from the qoiformat.org 1.0 spec, TGA from the Truevision 2.0
spec, netpbm ASCII/bilevel from the netpbm man pages), plus the
quarantine error contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image


def _rng(seed: int):
    return np.random.default_rng(seed)


# ------------------------------------------------------------- QOI


def _qoi_bytes(img: np.ndarray, channels: int | None = None) -> bytes:
    """Spec-1.0 QOI encoder, written independently of the decoder:
    greedy RUN > INDEX > DIFF > LUMA > literal op selection."""
    h, w, c = img.shape
    if channels is None:
        channels = c
    px = img if c == 4 else np.concatenate(
        [img, np.full((h, w, 1), 255, np.uint8)], axis=2
    )
    px = px.reshape(-1, 4)
    out = bytearray(b"qoif" + struct.pack(">II", w, h) + bytes([channels, 0]))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for p in map(tuple, px.tolist()):
        if p == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        r, g, b, a = p
        hidx = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[hidx] == p:
            out.append(hidx)
        else:
            index[hidx] = p
            pr, pg, pb, pa = prev
            dr, dg, db = (r - pr) & 0xFF, (g - pg) & 0xFF, (b - pb) & 0xFF
            dr = dr - 256 if dr > 127 else dr
            dg = dg - 256 if dg > 127 else dg
            db = db - 256 if db > 127 else db
            if a == pa and -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                a == pa
                and -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            elif a == pa:
                out += bytes([0xFE, r, g, b])
            else:
                out += bytes([0xFF, r, g, b, a])
        prev = p
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"
    return bytes(out)


def test_qoi_rgb_random_roundtrip():
    img = _rng(50).integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    got = decode_image(_qoi_bytes(img))
    np.testing.assert_array_equal(got, img)


def test_qoi_rgba_roundtrip():
    img = _rng(51).integers(0, 256, size=(7, 11, 4), dtype=np.uint8)
    got = decode_image(_qoi_bytes(img))
    np.testing.assert_array_equal(got, img)


def test_qoi_run_and_index_heavy():
    """Flat regions (RUN ops incl. the 62-px cap) and a repeating
    2-color pattern (INDEX ops) — the op mix a screenshotty image
    actually produces."""
    img = np.zeros((4, 100, 3), dtype=np.uint8)
    img[0] = [10, 20, 30]
    img[1, ::2] = [10, 20, 30]
    img[1, 1::2] = [200, 100, 50]
    img[2] = [10, 20, 30]
    img[3, :50] = [255, 255, 255]
    got = decode_image(_qoi_bytes(img))
    np.testing.assert_array_equal(got, img)


def test_qoi_diff_and_luma_gradients():
    """Smooth gradients exercise DIFF (±2) and LUMA (±32/±8) ops."""
    base = np.arange(64, dtype=np.int32)
    img = np.stack(
        [
            (base * 1 + 10) % 256,
            (base * 2 + 20) % 256,
            (base * 3 + 30) % 256,
        ],
        axis=1,
    ).astype(np.uint8).reshape(8, 8, 3)
    got = decode_image(_qoi_bytes(img))
    np.testing.assert_array_equal(got, img)


def test_qoi_truncated_stream_is_malformed():
    img = _rng(52).integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    payload = _qoi_bytes(img)
    with pytest.raises(ValueError):
        decode_image(payload[: len(payload) // 2])


def test_qoi_bad_end_marker_is_malformed():
    img = _rng(53).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = bytearray(_qoi_bytes(img))
    payload[-1] = 0x02
    with pytest.raises(ValueError):
        decode_image(bytes(payload))


def test_qoi_bomb_dimensions_rejected():
    hdr = b"qoif" + struct.pack(">II", 1 << 20, 1 << 20) + bytes([3, 0])
    with pytest.raises(ValueError):
        decode_image(hdr + b"\x00" * 32)


# ------------------------------------------------------------- TGA

_TGA_FOOTER_BLOCK = b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"


def _tga_bytes(
    img: np.ndarray,
    rle: bool = False,
    top_down: bool = True,
    cmap: np.ndarray | None = None,
    id_field: bytes = b"",
    right_to_left: bool = False,
) -> bytes:
    """TGA 2.0 from an HxWxC array (C=1 gray, 3 RGB, 4 RGBA) or, with
    `cmap`, an HxW index array + Nx3/Nx4 RGB(A) palette. Pixels are
    stored BGR(A); bottom-up files reverse row order on disk."""
    h, w = img.shape[:2]
    if cmap is not None:
        img_type, depth = 1, 8
        pix = img.reshape(h, w, 1)
        cmap_entry = cmap.shape[1] * 8
        pal = cmap[:, ::-1] if cmap.shape[1] == 3 else cmap[:, [2, 1, 0, 3]]
        cmap_spec = struct.pack("<HHB", 0, len(cmap), cmap_entry)
        cmap_body = pal.astype(np.uint8).tobytes()
        cmap_type = 1
    else:
        c = img.shape[2]
        img_type = 3 if c == 1 else 2
        depth = c * 8
        pix = img if c == 1 else (
            img[:, :, [2, 1, 0]] if c == 3 else img[:, :, [2, 1, 0, 3]]
        )
        cmap_spec = struct.pack("<HHB", 0, 0, 0)
        cmap_body = b""
        cmap_type = 0
    if rle:
        img_type |= 8
    desc = (0x20 if top_down else 0) | (0x10 if right_to_left else 0)
    hdr = (
        bytes([len(id_field), cmap_type, img_type])
        + cmap_spec
        + struct.pack("<HHHHB", 0, 0, w, h, depth)
        + bytes([desc])
    )
    rows = pix if top_down else pix[::-1]
    if right_to_left:  # descriptor bit 4: pixels stored right-to-left
        rows = rows[:, ::-1]
    flat = rows.astype(np.uint8).reshape(-1, pix.shape[2])
    if rle:
        body = bytearray()
        i = 0
        px_list = [bytes(p) for p in flat]
        while i < len(px_list):
            # run length of identical pixels
            j = i + 1
            while j < len(px_list) and px_list[j] == px_list[i] and j - i < 128:
                j += 1
            if j - i >= 2:
                body.append(0x80 | (j - i - 1))
                body += px_list[i]
                i = j
            else:
                k = i + 1
                while (
                    k < len(px_list)
                    and k - i < 128
                    and (k + 1 >= len(px_list) or px_list[k + 1] != px_list[k])
                ):
                    k += 1
                body.append(k - i - 1)
                body += b"".join(px_list[i:k])
                i = k
        body = bytes(body)
    else:
        body = flat.tobytes()
    return hdr + id_field + cmap_body + body + _TGA_FOOTER_BLOCK


def test_tga_rgb_topdown_roundtrip():
    img = _rng(60).integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    got = decode_image(_tga_bytes(img))
    np.testing.assert_array_equal(got, img)


def test_tga_rgba_bottomup_roundtrip():
    img = _rng(61).integers(0, 256, size=(5, 8, 4), dtype=np.uint8)
    got = decode_image(_tga_bytes(img, top_down=False))
    np.testing.assert_array_equal(got, img)


def test_tga_gray_roundtrip():
    img = _rng(62).integers(0, 256, size=(6, 6, 1), dtype=np.uint8)
    got = decode_image(_tga_bytes(img))
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("top_down", [True, False])
@pytest.mark.parametrize("rle", [False, True])
def test_tga_right_to_left_roundtrip(top_down, rle):
    """Descriptor bit 4 (ADVICE r8): right-to-left pixel order must
    un-mirror on decode — previously the bit was silently ignored and
    every row came back reversed. Crossed with both row orders and
    RLE (packets are laid down in the mirrored on-disk order)."""
    img = _rng(63).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = decode_image(
        _tga_bytes(img, rle=rle, top_down=top_down, right_to_left=True)
    )
    np.testing.assert_array_equal(got, img)


def test_tga_rle_roundtrip_with_runs_and_literals():
    img = _rng(63).integers(0, 4, size=(12, 17, 3), dtype=np.uint8) * 60
    got = decode_image(_tga_bytes(img, rle=True))
    np.testing.assert_array_equal(got, img)


def test_tga_rle_bottomup_with_id_field():
    img = _rng(64).integers(0, 3, size=(4, 50, 4), dtype=np.uint8) * 100
    got = decode_image(
        _tga_bytes(img, rle=True, top_down=False, id_field=b"written by tests")
    )
    np.testing.assert_array_equal(got, img)


def test_tga_colormapped_roundtrip():
    pal = _rng(65).integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = _rng(66).integers(0, 16, size=(7, 9), dtype=np.uint8)
    got = decode_image(_tga_bytes(idx, cmap=pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_tga_colormapped_rgba_palette():
    pal = _rng(67).integers(0, 256, size=(8, 4), dtype=np.uint8)
    idx = _rng(68).integers(0, 8, size=(5, 5), dtype=np.uint8)
    got = decode_image(_tga_bytes(idx, cmap=pal))
    np.testing.assert_array_equal(got, pal[idx])


def test_tga_without_footer_stays_pil_gated():
    """A signature-less TGA is indistinguishable from noise in a
    magic-dispatch architecture — it must fall through to the PIL
    gate (NotImplementedError here), never mis-decode."""
    img = _rng(69).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = _tga_bytes(img)[: -len(_TGA_FOOTER_BLOCK)]
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; fallthrough routes to PIL")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        decode_image(payload)


def test_tga_truncated_pixels_is_malformed():
    img = _rng(70).integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    payload = _tga_bytes(img)
    cut = payload[:30] + _TGA_FOOTER_BLOCK
    with pytest.raises(ValueError):
        decode_image(cut)


def test_tga_rle_crossing_image_boundary_is_malformed():
    hdr = (
        bytes([0, 0, 10])
        + struct.pack("<HHB", 0, 0, 0)
        + struct.pack("<HHHHB", 0, 0, 2, 2, 24)
        + bytes([0x20])
    )
    # 128-pixel run into a 4-pixel image
    body = bytes([0x80 | 127]) + b"\x01\x02\x03"
    with pytest.raises(ValueError):
        decode_image(hdr + body + _TGA_FOOTER_BLOCK)


def test_tga_cmap_index_out_of_range_is_malformed():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((2, 2), 9, dtype=np.uint8)  # palette has 4 entries
    with pytest.raises(ValueError):
        decode_image(_tga_bytes(idx, cmap=pal))


def test_tga_16bit_not_implemented():
    hdr = (
        bytes([0, 0, 2])
        + struct.pack("<HHB", 0, 0, 0)
        + struct.pack("<HHHHB", 0, 0, 2, 2, 16)
        + bytes([0x20])
    )
    with pytest.raises(NotImplementedError):
        decode_image(hdr + b"\x00" * 8 + _TGA_FOOTER_BLOCK)


# ----------------------------------------------------------- netpbm


def test_p4_packed_bilevel_roundtrip():
    bits = _rng(80).integers(0, 2, size=(5, 11), dtype=np.uint8)
    packed = np.packbits(bits, axis=1)
    payload = b"P4\n11 5\n" + packed.tobytes()
    got = decode_image(payload)
    np.testing.assert_array_equal(got[:, :, 0], (1 - bits) * 255)


def test_p1_ascii_bilevel_both_spacings():
    bits = np.array([[0, 1, 1, 0], [1, 0, 0, 1]], dtype=np.uint8)
    spaced = b"P1\n4 2\n0 1 1 0\n1 0 0 1\n"
    packed = b"P1\n4 2\n0110\n1001\n"
    for payload in (spaced, packed):
        got = decode_image(payload)
        np.testing.assert_array_equal(got[:, :, 0], (1 - bits) * 255)


def test_p2_ascii_gray_roundtrip():
    img = _rng(81).integers(0, 256, size=(3, 4), dtype=np.uint8)
    body = "\n".join(" ".join(str(v) for v in row) for row in img)
    payload = f"P2\n# comment\n4 3\n255\n{body}\n".encode()
    got = decode_image(payload)
    np.testing.assert_array_equal(got[:, :, 0], img)


def test_p3_ascii_rgb_roundtrip():
    img = _rng(82).integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    body = " ".join(str(v) for v in img.ravel())
    payload = f"P3\n3 2 255\n{body}\n".encode()
    got = decode_image(payload)
    np.testing.assert_array_equal(got, img)


def test_ascii_sample_above_maxval_is_malformed():
    with pytest.raises(ValueError):
        decode_image(b"P2\n2 1\n100\n50 200\n")


def test_p1_garbage_token_is_malformed():
    with pytest.raises(ValueError):
        decode_image(b"P1\n2 1\n0 7\n")


def test_p4_truncated_is_malformed():
    with pytest.raises(ValueError):
        decode_image(b"P4\n16 4\n\xff")


# ------------------------------------------------- feature integration


def test_image_features_flow_for_new_formats():
    from flink_hiveorc_spark.functions.multimodal import _image_features

    img = np.full((4, 4, 3), 100, dtype=np.uint8)
    for payload in (_qoi_bytes(img), _tga_bytes(img)):
        f = _image_features(payload)
        assert (f["height"], f["width"], f["channels"]) == (4, 4, 3)
        assert f["mean_byte"] == 100.0
    f = _image_features(b"P1\n2 2\n01\n10\n")
    assert (f["height"], f["width"], f["channels"]) == (2, 2, 1)
    assert f["mean_byte"] == 127.5
