"""AIFF / AIFF-C / AU native decode: round-trips against serializers
written independently from the decoder (straight from the EA IFF 85 /
AIFF-1.3 and Sun .snd specs), plus the quarantine error contract on
malformed and unsupported payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_audio


def _rng(seed: int):
    return np.random.default_rng(seed)


def _f80_bytes(value: float) -> bytes:
    """80-bit IEEE extended float, written independently: normalize
    the integer-valued rate to m·2^e with the explicit integer bit set
    (bit 63 of the mantissa)."""
    assert value > 0
    m = int(value)
    assert float(m) == value, "test rates are integers"
    e = 16383 + 63
    while m < 1 << 63:
        m <<= 1
        e -= 1
    while m >= 1 << 64:
        m >>= 1
        e += 1
    return struct.pack(">HQ", e, m)


def _aiff_bytes(
    samples: np.ndarray,
    rate: int,
    comp: bytes | None = None,
    bits: int | None = None,
    ssnd_offset: int = 0,
    extra_chunk: bool = False,
    declared_frames: int | None = None,
) -> bytes:
    """AIFF (comp=None) or AIFF-C container from an
    (n_frames, n_channels) array already in its wire encoding."""
    n, ch = samples.shape
    if bits is None:
        bits = samples.dtype.itemsize * 8
    data = samples.tobytes()
    comm = struct.pack(
        ">hIh", ch, declared_frames if declared_frames is not None else n, bits
    ) + _f80_bytes(float(rate))
    form_type = b"AIFF"
    if comp is not None:
        form_type = b"AIFC"
        comm += comp + b"\x00\x00"  # empty pstring name, even-padded
    chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
    if extra_chunk:
        note = b"odd"  # 3 bytes: exercises even-offset chunk padding
        chunks += b"ANNO" + struct.pack(">I", len(note)) + note + b"\x00"
    ssnd = struct.pack(">II", ssnd_offset, 0) + b"\x00" * ssnd_offset + data
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(chunks) & 1:
        chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks


def _au_bytes(
    samples: np.ndarray,
    rate: int,
    encoding: int,
    offset: int = 24,
    size: int | None = None,
) -> bytes:
    n, ch = samples.shape
    data = samples.tobytes()
    hdr = struct.pack(
        ">4s5I",
        b".snd",
        offset,
        len(data) if size is None else size,
        encoding,
        rate,
        ch,
    )
    return hdr + b"\x00" * (offset - 24) + data


# ---------------------------------------------------------------- AIFF


def test_aiff16_stereo_roundtrip_with_odd_chunk():
    s = _rng(30).integers(-32768, 32768, size=(300, 2)).astype(">i2")
    got, rate = decode_audio(_aiff_bytes(s, 44100, extra_chunk=True))
    assert rate == 44100
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_aiff8_signed_mono():
    """AIFF 8-bit is SIGNED (unlike WAV's unsigned uint8)."""
    s = _rng(31).integers(-128, 128, size=(64, 1)).astype("i1")
    got, rate = decode_audio(_aiff_bytes(s, 8000))
    assert rate == 8000 and got.dtype == np.int8
    np.testing.assert_array_equal(got, s)


def test_aiff24_bigendian_sign_extension():
    """Hand-built mono 24-bit AIFF (the _aiff_bytes helper infers the
    channel count from the array shape, which 3-byte packing breaks —
    so this one assembles the container directly)."""
    vals = np.array([[8388607], [-8388608], [-1], [1], [0]], dtype=np.int32)
    packed = np.zeros((5, 3), dtype=np.uint8)
    for i, v in enumerate(vals.ravel()):
        u = int(v) & 0xFFFFFF
        packed[i] = [(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF]
    comm = struct.pack(">hIh", 1, 5, 24) + _f80_bytes(48000.0)
    ssnd = struct.pack(">II", 0, 0) + packed.tobytes()
    chunks = (
        b"COMM" + struct.pack(">I", len(comm)) + comm
        + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    )
    if len(chunks) & 1:
        chunks += b"\x00"
    payload = b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks
    got, rate = decode_audio(payload)
    assert rate == 48000
    np.testing.assert_array_equal(got, vals)


def test_aifc_sowt_little_endian():
    s = _rng(32).integers(-32768, 32768, size=(100, 2)).astype("<i2")
    got, rate = decode_audio(_aiff_bytes(s, 22050, comp=b"sowt"))
    assert rate == 22050
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_aifc_twos_is_bigendian_none():
    s = _rng(33).integers(-32768, 32768, size=(80, 1)).astype(">i2")
    got, _ = decode_audio(_aiff_bytes(s, 8000, comp=b"twos"))
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_aifc_fl32_roundtrip():
    s = _rng(34).normal(size=(120, 2)).astype(">f4")
    got, rate = decode_audio(_aiff_bytes(s, 96000, comp=b"fl32", bits=32))
    assert rate == 96000 and got.dtype == np.float32
    np.testing.assert_array_equal(got, s.astype(np.float32))


def test_aifc_fl64_roundtrip():
    s = _rng(35).normal(size=(60, 1)).astype(">f8")
    got, _ = decode_audio(_aiff_bytes(s, 48000, comp=b"fl64", bits=64))
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, s.astype(np.float64))


def test_aifc_ulaw_matches_wav_g711():
    """The same μ-law byte codes through AIFC and through WAV format 7
    must expand to identical int16 linear samples."""
    from tests.test_image_decode import _wav_bytes

    codes = np.arange(256, dtype=np.uint8).reshape(-1, 1)
    via_aifc, _ = decode_audio(_aiff_bytes(codes, 8000, comp=b"ulaw", bits=16))
    via_wav, _ = decode_audio(_wav_bytes(codes, 8000, fmt_tag=7))
    np.testing.assert_array_equal(via_aifc, via_wav)


def test_aifc_alaw_matches_wav_g711():
    from tests.test_image_decode import _wav_bytes

    codes = np.arange(256, dtype=np.uint8).reshape(-1, 1)
    via_aifc, _ = decode_audio(_aiff_bytes(codes, 8000, comp=b"alaw", bits=16))
    via_wav, _ = decode_audio(_wav_bytes(codes, 8000, fmt_tag=6))
    np.testing.assert_array_equal(via_aifc, via_wav)


def test_aiff_ssnd_offset_skipped():
    s = _rng(36).integers(-32768, 32768, size=(50, 1)).astype(">i2")
    got, _ = decode_audio(_aiff_bytes(s, 8000, ssnd_offset=16))
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_aiff_short_ssnd_is_malformed():
    s = _rng(37).integers(-32768, 32768, size=(50, 1)).astype(">i2")
    payload = _aiff_bytes(s, 8000, declared_frames=60)  # data for 50
    with pytest.raises(ValueError):
        decode_audio(payload)


def test_aifc_compressed_variant_not_implemented():
    """MACE is genuinely entropy-coded → codec-gated. (ima4 used to be
    the example here until r9 made it a REAL native decode — a PCM
    body under comp='ima4' is now malformed, covered in
    test_adpcm_decode.py.)"""
    s = np.zeros((10, 1), dtype=">i2")
    with pytest.raises(NotImplementedError):
        decode_audio(_aiff_bytes(s, 8000, comp=b"MAC3"))


def test_aiff_missing_comm_is_malformed():
    payload = bytearray(_aiff_bytes(np.zeros((4, 1), dtype=">i2"), 8000))
    idx = payload.find(b"COMM")
    payload[idx : idx + 4] = b"JUNK"
    with pytest.raises(ValueError):
        decode_audio(bytes(payload))


def test_aiff_zero_channels_is_malformed():
    s = np.zeros((4, 1), dtype=">i2")
    payload = bytearray(_aiff_bytes(s, 8000))
    idx = payload.find(b"COMM") + 8
    struct.pack_into(">h", payload, idx, 0)  # channels = 0
    with pytest.raises(ValueError):
        decode_audio(bytes(payload))


def test_aiff_huge_rate_exponent_is_malformed():
    s = np.zeros((4, 1), dtype=">i2")
    payload = bytearray(_aiff_bytes(s, 8000))
    idx = payload.find(b"COMM") + 8 + 8  # rate field
    struct.pack_into(">H", payload, idx, 0x7FFE)  # enormous exponent
    with pytest.raises(ValueError):
        decode_audio(bytes(payload))


# ------------------------------------------------------------------ AU


def test_au_int16_roundtrip():
    s = _rng(40).integers(-32768, 32768, size=(200, 2)).astype(">i2")
    got, rate = decode_audio(_au_bytes(s, 16000, encoding=3))
    assert rate == 16000
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_au_int8_signed():
    s = _rng(41).integers(-128, 128, size=(64, 1)).astype("i1")
    got, _ = decode_audio(_au_bytes(s, 8000, encoding=2))
    assert got.dtype == np.int8
    np.testing.assert_array_equal(got, s)


def test_au_int24_sign_extension():
    vals = np.array([[8388607], [-8388608], [-1], [42]], dtype=np.int32)
    packed = np.zeros((4, 3), dtype=np.uint8)
    for i, v in enumerate(vals.ravel()):
        u = int(v) & 0xFFFFFF
        packed[i] = [(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF]
    hdr = struct.pack(">4s5I", b".snd", 24, 12, 4, 48000, 1)
    got, rate = decode_audio(hdr + packed.tobytes())
    assert rate == 48000
    np.testing.assert_array_equal(got, vals)


def test_au_int32_and_floats():
    s32 = _rng(42).integers(-(2**31), 2**31, size=(30, 1)).astype(">i4")
    got, _ = decode_audio(_au_bytes(s32, 8000, encoding=5))
    np.testing.assert_array_equal(got, s32.astype(np.int32))

    f32 = _rng(43).normal(size=(30, 2)).astype(">f4")
    got, _ = decode_audio(_au_bytes(f32, 8000, encoding=6))
    np.testing.assert_array_equal(got, f32.astype(np.float32))

    f64 = _rng(44).normal(size=(15, 1)).astype(">f8")
    got, _ = decode_audio(_au_bytes(f64, 8000, encoding=7))
    np.testing.assert_array_equal(got, f64.astype(np.float64))


def test_au_ulaw_alaw_match_wav_g711():
    from tests.test_image_decode import _wav_bytes

    codes = np.arange(256, dtype=np.uint8).reshape(-1, 1)
    via_au_u, _ = decode_audio(_au_bytes(codes, 8000, encoding=1))
    via_wav_u, _ = decode_audio(_wav_bytes(codes, 8000, fmt_tag=7))
    np.testing.assert_array_equal(via_au_u, via_wav_u)
    via_au_a, _ = decode_audio(_au_bytes(codes, 8000, encoding=27))
    via_wav_a, _ = decode_audio(_wav_bytes(codes, 8000, fmt_tag=6))
    np.testing.assert_array_equal(via_au_a, via_wav_a)


def test_au_unknown_size_reads_to_eof():
    s = _rng(45).integers(-32768, 32768, size=(40, 1)).astype(">i2")
    got, _ = decode_audio(_au_bytes(s, 8000, encoding=3, size=0xFFFFFFFF))
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_au_nonstandard_offset_skipped():
    s = _rng(46).integers(-32768, 32768, size=(40, 1)).astype(">i2")
    got, _ = decode_audio(_au_bytes(s, 8000, encoding=3, offset=32))
    np.testing.assert_array_equal(got, s.astype(np.int16))


def test_au_compressed_encoding_not_implemented():
    s = np.zeros((10, 1), dtype=">i2")
    with pytest.raises(NotImplementedError):
        decode_audio(_au_bytes(s, 8000, encoding=23))  # G.721 ADPCM


def test_au_declared_size_past_eof_is_malformed():
    s = np.zeros((10, 1), dtype=">i2")
    with pytest.raises(ValueError):
        decode_audio(_au_bytes(s, 8000, encoding=3, size=999))


def test_au_partial_frame_is_malformed():
    s = np.zeros((10, 2), dtype=">i2")
    payload = _au_bytes(s, 8000, encoding=3)[:-1]  # cut one byte
    payload = payload[:8] + struct.pack(">I", 39) + payload[12:]
    with pytest.raises(ValueError):
        decode_audio(payload)


def test_au_truncated_header_is_malformed():
    with pytest.raises(ValueError):
        decode_audio(b".snd\x00\x00\x00\x18")


# -------------------------------------------------- feature integration


def test_audio_features_flow_for_aiff_and_au():
    """The featurizer path (duration, rms) must accept the new
    containers unchanged — same contract as WAV."""
    from flink_hiveorc_spark.functions.multimodal import _audio_features

    s = np.array([[3], [-4]], dtype=">i2")
    for payload in (
        _aiff_bytes(s, 8000),
        _au_bytes(s, 8000, encoding=3),
    ):
        f = _audio_features(payload)
        assert f["sample_rate"] == 8000
        assert f["n_frames"] == 2
        import math

        assert f["rms"] == math.sqrt((9 + 16) / 2)
