"""farbfeld / Apple CAF native decode: round-trips against serializers
written independently from the decoder (farbfeld from the suckless
spec, CAF from the Apple Core Audio Format 1.0 chunk layout), plus
the quarantine error contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_audio, decode_image


def _rng(seed: int):
    return np.random.default_rng(seed)


# -------------------------------------------------------- farbfeld


def _farbfeld_bytes(img16: np.ndarray) -> bytes:
    """farbfeld from an HxWx4 uint16 array (16 bits per channel)."""
    h, w, c = img16.shape
    assert c == 4
    return (
        b"farbfeld"
        + struct.pack(">II", w, h)
        + img16.astype(">u2").tobytes()
    )


def test_farbfeld_roundtrip_high_byte():
    img16 = _rng(90).integers(0, 65536, size=(5, 7, 4), dtype=np.uint16)
    got = decode_image(_farbfeld_bytes(img16))
    np.testing.assert_array_equal(got, (img16 >> 8).astype(np.uint8))


def test_farbfeld_truncated_is_malformed():
    img16 = _rng(91).integers(0, 65536, size=(4, 4, 4), dtype=np.uint16)
    payload = _farbfeld_bytes(img16)
    with pytest.raises(ValueError):
        decode_image(payload[: len(payload) - 10])


def test_farbfeld_bomb_dimensions_rejected():
    hdr = b"farbfeld" + struct.pack(">II", 1 << 20, 1 << 20)
    with pytest.raises(ValueError):
        decode_image(hdr + b"\x00" * 64)


# ------------------------------------------------------------- CAF


def _caf_bytes(
    samples: np.ndarray,
    rate: float,
    fmt: bytes = b"lpcm",
    float_fmt: bool = False,
    little_endian: bool = False,
    unsized_data: bool = False,
    extra_chunk: bool = False,
) -> bytes:
    """CAF from an (n_frames, n_channels) array already in its wire
    byte order."""
    n, ch = samples.shape
    bits = samples.dtype.itemsize * 8
    flags = (1 if float_fmt else 0) | (2 if little_endian else 0)
    desc = struct.pack(
        ">d4sIIIII", rate, fmt, flags, ch * bits // 8, 1, ch, bits
    )
    out = b"caff" + struct.pack(">HH", 1, 0)
    out += b"desc" + struct.pack(">q", len(desc)) + desc
    if extra_chunk:
        body = b"free bytes!"
        out += b"free" + struct.pack(">q", len(body)) + body
    data = struct.pack(">I", 0) + samples.tobytes()
    out += b"data" + struct.pack(">q", -1 if unsized_data else len(data)) + data
    return out


def test_caf_int16_bigendian_roundtrip():
    s = _rng(92).integers(-32768, 32768, size=(200, 2)).astype(">i2")
    got, rate = decode_audio(_caf_bytes(s, 44100.0, extra_chunk=True))
    assert rate == 44100
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_caf_int16_littleendian_flag():
    s = _rng(93).integers(-32768, 32768, size=(100, 1)).astype("<i2")
    got, _ = decode_audio(_caf_bytes(s, 8000.0, little_endian=True))
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_caf_int8_signed():
    s = _rng(94).integers(-128, 128, size=(64, 1)).astype("i1")
    got, _ = decode_audio(_caf_bytes(s, 8000.0))
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, s)


def test_caf_int24_both_endians():
    vals = np.array([[8388607], [-8388608], [-1], [42]], dtype=np.int32)
    for le in (False, True):
        packed = np.zeros((4, 3), dtype=np.uint8)
        for i, v in enumerate(vals.ravel()):
            u = int(v) & 0xFFFFFF
            if le:
                packed[i] = [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF]
            else:
                packed[i] = [(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF]
        desc = struct.pack(">d4sIIIII", 48000.0, b"lpcm", 2 if le else 0, 3, 1, 1, 24)
        data = struct.pack(">I", 0) + packed.tobytes()
        payload = (
            b"caff" + struct.pack(">HH", 1, 0)
            + b"desc" + struct.pack(">q", len(desc)) + desc
            + b"data" + struct.pack(">q", len(data)) + data
        )
        got, rate = decode_audio(payload)
        assert rate == 48000
        np.testing.assert_array_equal(got, vals)


def test_caf_float32_and_unsized_data():
    s = _rng(95).normal(size=(50, 2)).astype(">f4")
    got, _ = decode_audio(_caf_bytes(s, 96000.0, float_fmt=True, unsized_data=True))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, s.astype(np.float32))


def test_caf_float64_roundtrip():
    s = _rng(96).normal(size=(25, 1)).astype(">f8")
    got, _ = decode_audio(_caf_bytes(s, 48000.0, float_fmt=True))
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, s.astype(np.float64))


def test_caf_compressed_format_not_implemented():
    s = np.zeros((10, 1), dtype=">i2")
    with pytest.raises(NotImplementedError):
        decode_audio(_caf_bytes(s, 44100.0, fmt=b"aac "))


def test_caf_missing_desc_is_malformed():
    payload = bytearray(_caf_bytes(np.zeros((4, 1), dtype=">i2"), 8000.0))
    idx = payload.find(b"desc")
    payload[idx : idx + 4] = b"junk"
    with pytest.raises(ValueError):
        decode_audio(bytes(payload))


def test_caf_partial_frame_is_malformed():
    s = np.zeros((10, 2), dtype=">i2")
    payload = _caf_bytes(s, 8000.0)
    # shrink the data chunk by one byte (and its declared size)
    idx = payload.find(b"data")
    size = struct.unpack_from(">q", payload, idx + 4)[0]
    patched = (
        payload[: idx + 4]
        + struct.pack(">q", size - 1)
        + payload[idx + 12 : idx + 12 + size - 1]
    )
    with pytest.raises(ValueError):
        decode_audio(patched)


def test_caf_inf_rate_is_malformed():
    s = np.zeros((4, 1), dtype=">i2")
    payload = bytearray(_caf_bytes(s, 8000.0))
    idx = payload.find(b"desc") + 12
    struct.pack_into(">d", payload, idx, float("inf"))
    with pytest.raises(ValueError):
        decode_audio(bytes(payload))


def test_caf_declared_size_past_eof_is_malformed():
    s = np.zeros((4, 1), dtype=">i2")
    payload = _caf_bytes(s, 8000.0)
    idx = payload.find(b"data")
    patched = bytearray(payload)
    struct.pack_into(">q", patched, idx + 4, 10_000)
    with pytest.raises(ValueError):
        decode_audio(bytes(patched))


# ------------------------------------------------- feature integration


def test_features_flow_for_farbfeld_and_caf():
    from flink_hiveorc_spark.functions.multimodal import (
        _audio_features,
        _image_features,
    )

    img16 = np.full((3, 3, 4), 0x6400, dtype=np.uint16)  # high byte 100
    f = _image_features(_farbfeld_bytes(img16))
    assert (f["height"], f["width"], f["channels"]) == (3, 3, 4)
    assert f["mean_byte"] == 100.0  # every channel's high byte is 0x64

    s = np.array([[3], [-4]], dtype=">i2")
    f = _audio_features(_caf_bytes(s, 8000.0))
    assert f["sample_rate"] == 8000
    assert f["n_frames"] == 2
    import math

    assert f["rms"] == math.sqrt((9 + 16) / 2)
