"""APNG decoding: an independent builder (acTL/fcTL/fdAT chunks with
their own CRCs over independently deflated frame regions) must
composite through decode_apng_frames to hand-computed canvases —
including region offsets, all three dispose ops, both blend ops, the
IDAT-frame and hidden-default-image layouts, and the sequence-number
contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import (
    decode_apng_frames,
    gif_frame_sample,
)


def _chunk(t: bytes, b: bytes) -> bytes:
    return (
        struct.pack(">I", len(b)) + t + b
        + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
    )


def _zraw(arr: np.ndarray) -> bytes:
    """RGBA rows → filtered + deflated stream (filter 0 per row)."""
    h = arr.shape[0]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return zlib.compress(raw)


def _fctl(seq, w, h, x, y, dnum=1, dden=10, dispose=0, blend=0):
    return _chunk(
        b"fcTL",
        struct.pack(">IIIIIHHBB", seq, w, h, x, y, dnum, dden, dispose, blend),
    )


def _apng(W, H, frames, idat_first=True, n_override=None, extra_seq_shift=0):
    """frames: list of (arr RGBA, x, y, dispose, blend)."""
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 6, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", n_override or len(frames), 0))
    seq = 0
    for i, (arr, x, y, dispose, blend) in enumerate(frames):
        h, w = arr.shape[:2]
        out += _fctl(seq + extra_seq_shift, w, h, x, y,
                     dispose=dispose, blend=blend)
        seq += 1
        if i == 0 and idat_first:
            out += _chunk(b"IDAT", _zraw(arr))
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + _zraw(arr))
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _rgba(rng, h, w, opaque=True):
    a = rng.integers(0, 255, size=(h, w, 4), dtype=np.uint8)
    if opaque:
        a[:, :, 3] = 255
    return a


def test_apng_regions_and_dispose_ops():
    rng = np.random.default_rng(1)
    f0 = _rgba(rng, 4, 6)
    f1 = _rgba(rng, 2, 2)
    f2 = _rgba(rng, 1, 3)
    payload = _apng(6, 4, [
        (f0, 0, 0, 0, 0),          # full canvas
        (f1, 2, 1, 2, 0),          # region overwrite, dispose PREVIOUS
        (f2, 3, 3, 1, 0),          # dispose BACKGROUND
    ])
    frames, delays = decode_apng_frames(payload)
    assert frames.shape == (3, 4, 6, 4)
    np.testing.assert_array_equal(frames[0], f0)
    exp1 = f0.copy()
    exp1[1:3, 2:4] = f1
    np.testing.assert_array_equal(frames[1], exp1)
    exp2 = f0.copy()  # dispose 2 restored f0's region
    exp2[3:4, 3:6] = f2
    np.testing.assert_array_equal(frames[2], exp2)
    assert delays == [100.0, 100.0, 100.0]


def test_apng_blend_over_and_transparent_source():
    rng = np.random.default_rng(2)
    base = _rgba(rng, 3, 3)
    overlay = _rgba(rng, 3, 3)
    overlay[:, :, 3] = 0  # fully transparent source
    overlay[1, 1, 3] = 255  # except one opaque pixel
    payload = _apng(3, 3, [
        (base, 0, 0, 0, 0),
        (overlay, 0, 0, 0, 1),  # blend OVER
    ])
    frames, _ = decode_apng_frames(payload)
    exp = base.copy()
    exp[1, 1] = overlay[1, 1]
    np.testing.assert_array_equal(frames[1], exp)


def test_apng_hidden_default_image():
    """IDAT before any fcTL is NOT part of the animation."""
    rng = np.random.default_rng(3)
    hidden = _rgba(rng, 2, 2)
    shown = _rgba(rng, 2, 2)
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", 1, 0))
    out += _chunk(b"IDAT", _zraw(hidden))
    out += _fctl(0, 2, 2, 0, 0)
    out += _chunk(b"fdAT", struct.pack(">I", 1) + _zraw(shown))
    out += _chunk(b"IEND", b"")
    frames, _ = decode_apng_frames(bytes(out))
    assert frames.shape == (1, 2, 2, 4)
    np.testing.assert_array_equal(frames[0], shown)


def test_apng_error_contract():
    rng = np.random.default_rng(4)
    f = _rgba(rng, 2, 2)
    # still PNG (no acTL) -> NotImplementedError routing class
    still = bytearray(b"\x89PNG\r\n\x1a\n")
    still += _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    still += _chunk(b"IDAT", _zraw(f)) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="no acTL"):
        decode_apng_frames(bytes(still))
    with pytest.raises(ValueError, match="sequence numbers"):
        decode_apng_frames(_apng(2, 2, [(f, 0, 0, 0, 0)], extra_seq_shift=1))
    with pytest.raises(ValueError, match="declares"):
        decode_apng_frames(_apng(2, 2, [(f, 0, 0, 0, 0)], n_override=3))
    with pytest.raises(ValueError, match="outside the canvas"):
        decode_apng_frames(
            _apng(2, 2, [(f, 0, 0, 0, 0), (_rgba(rng, 2, 2), 1, 1, 0, 0)])
        )
    with pytest.raises(ValueError, match="full canvas"):
        decode_apng_frames(_apng(4, 4, [(f, 1, 1, 0, 0)]))
    bad = bytearray(_apng(2, 2, [(f, 0, 0, 0, 0)]))
    bad[-5] ^= 0x01  # IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_apng_frames(bytes(bad))


def test_apng_fuzz_byte_flips():
    rng = np.random.default_rng(5)
    good = _apng(3, 3, [
        (_rgba(rng, 3, 3), 0, 0, 0, 0),
        (_rgba(rng, 2, 2), 1, 1, 2, 1),
    ])
    for _ in range(150):
        bad = bytearray(good)
        i = int(rng.integers(0, len(bad)))
        bad[i] ^= int(rng.integers(1, 256))
        try:
            decode_apng_frames(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def test_frame_sampler_routes_apng(spark):
    """gif_frame_sample fans APNG frames exactly like GIF ones."""
    rng = np.random.default_rng(6)
    f0 = _rgba(rng, 2, 3)
    f1 = _rgba(rng, 2, 3)
    payload = _apng(3, 2, [(f0, 0, 0, 0, 0), (f1, 0, 0, 0, 0)])
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"notanimage"))],
        "doc_id long, payload binary",
    )
    rows = gif_frame_sample(df, quarantine=True).collect()
    good = [r for r in rows if r["error"] is None]
    assert sorted(r["frame_idx"] for r in good) == [0, 1]
    for r in good:
        exp = f0 if r["frame_idx"] == 0 else f1
        assert bytes(r["payload"]) == b"P6\n3 2\n255\n" + exp[:, :, :3].tobytes()
    bad = [r for r in rows if r["error"] is not None]
    assert len(bad) == 1 and bad[0]["error"].startswith("unsupported:")


def _no_pil():
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


@pytest.mark.skipif(_no_pil(), reason="PIL not installed (armed leg)")
def test_pil_equivalence_apng():
    import io

    from PIL import Image, ImageSequence

    rng = np.random.default_rng(7)
    f0 = _rgba(rng, 4, 4)
    f1 = _rgba(rng, 2, 2)
    payload = _apng(4, 4, [(f0, 0, 0, 0, 0), (f1, 1, 1, 0, 0)])
    ours, _ = decode_apng_frames(payload)
    im = Image.open(io.BytesIO(payload))
    theirs = [
        np.asarray(fr.convert("RGBA")) for fr in ImageSequence.Iterator(im)
    ]
    assert len(theirs) == len(ours)
    for a, b in zip(ours, theirs):
        np.testing.assert_array_equal(a, b)


def test_apng_invalid_ihdr_methods_rejected():
    # r12: the frame re-synthesis passes the parent IHDR's compression/
    # filter methods through, so invalid declared methods are rejected
    # instead of being silently decoded as 0/0.
    rng = np.random.default_rng(40)
    good = _apng(2, 2, [(_rgba(rng, 2, 2), 0, 0, 0, 0)])
    ihdr_off = 8 + 8  # magic + length/type of IHDR
    for byte_idx, field in ((10, "compression"), (11, "filter")):
        bad = bytearray(good)
        bad[ihdr_off + byte_idx] = 7  # invalid method
        # fix the IHDR CRC so the chunk walk reaches the decode
        body = bytes(bad[ihdr_off : ihdr_off + 13])
        crc = zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
        bad[ihdr_off + 13 : ihdr_off + 17] = struct.pack(">I", crc)
        with pytest.raises(ValueError):
            decode_apng_frames(bytes(bad))
