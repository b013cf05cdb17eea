"""Real image decode (functions/multimodal.py): the pure-numpy
PPM/PGM/BMP decoders must reproduce independently serialized pixel
arrays bit-for-bit, compressed formats must fail loudly without a
codec, and the distributed decode→featurize path (image_stats,
mapInPandas) must agree with local numpy over a mixed-format corpus.

The serializers here are written from the format specs independently
of the decoder (netpbm header grammar; BITMAPINFOHEADER layout with
4-byte row padding and bottom-up row order) so a shared
misunderstanding can't cancel out.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_image, image_stats


def _rng(seed):
    return np.random.default_rng(seed)


def _ppm_bytes(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w, c = arr.shape
    assert c == 3
    head = b"P6\n"
    if comment:
        head += b"# synthetic test image\n"
    head += f"{w} {h}\n255\n".encode()
    return head + arr.tobytes()


def _pgm_bytes(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    assert c == 1
    return f"P5\n{w} {h}\n255\n".encode() + arr.tobytes()


def _bmp_bytes(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Uncompressed BMP: 24-bit for 3-channel input, 32-bit for
    4-channel; RGB(A) input stored as BGR(A) rows padded to 4 bytes,
    bottom-up unless top_down."""
    h, w, c = arr.shape
    nch = c
    bgr = arr[:, :, [2, 1, 0]] if c == 3 else arr[:, :, [2, 1, 0, 3]]
    rows = bgr if top_down else bgr[::-1]
    stride = (w * nch + 3) & ~3
    body = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * nch) for r in range(h)
    )
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        nch * 8,
        0,  # BI_RGB
        len(body),
        2835,
        2835,
        0,
        0,
    )
    return header + info + body


def test_ppm_roundtrip_with_header_comment():
    arr = _rng(1).integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_ppm_bytes(arr, comment=True)), arr)


def test_pgm_roundtrip_single_channel():
    arr = _rng(2).integers(0, 256, size=(5, 9, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_pgm_bytes(arr)), arr)


def test_bmp24_bottom_up_with_row_padding():
    # width 3 -> 9-byte rows pad to 12: exercises the stride math
    arr = _rng(3).integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_bmp_bytes(arr)), arr)


def test_bmp32_top_down():
    arr = _rng(4).integers(0, 256, size=(6, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_bmp_bytes(arr, top_down=True)), arr)


def _no_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


def test_compressed_without_codec_raises_not_implemented():
    # baseline JPEG decodes natively since r11, so the codec-gated
    # example is WebP (VP8 entropy coding genuinely needs a codec);
    # a JPEG with only garbage after the APP0 header is now correctly
    # classified malformed by the native parser, not codec-gated
    webp_magic = b"RIFF" + b"\x28\x00\x00\x00" + b"WEBPVP8 " + b"\x00" * 32
    if not _no_pil():
        pytest.skip("PIL present on this host; gate untestable")
    with pytest.raises(NotImplementedError):
        decode_image(webp_magic)
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_image(b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 32)


def test_rle_bmp_with_wrong_bpp_and_jpeg_dib_rejected():
    """RLE8 decodes natively since r9 — but only at bpp 8: a 24-bit
    header claiming RLE8 is malformed (ValueError), and a
    JPEG-embedded DIB (BI_JPEG=4) still needs a codec
    (NotImplementedError). Full RLE coverage lives in
    test_bmp_extended_decode.py."""
    arr = _rng(5).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(_bmp_bytes(arr))
    struct.pack_into("<I", data, 30, 1)  # compression = BI_RLE8, bpp 24
    with pytest.raises(ValueError):
        decode_image(bytes(data))
    data = bytearray(_bmp_bytes(arr))
    struct.pack_into("<I", data, 30, 4)  # BI_JPEG
    with pytest.raises(NotImplementedError):
        decode_image(bytes(data))


def _wav_bytes(
    samples: np.ndarray, rate: int, extra_chunk: bool = False, fmt_tag: int = 1
) -> bytes:
    """WAV from an (n_frames, n_channels) sample array; written from
    the RIFF spec independently of the decoder (fmt layout, even-byte
    chunk padding, optional LIST chunk before data). fmt_tag 1 = PCM,
    3 = IEEE float, 6/7 = G.711 A-law/μ-law byte codes."""
    n, ch = samples.shape
    bits = samples.dtype.itemsize * 8
    data = samples.astype(samples.dtype.newbyteorder("<")).tobytes()
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        info = b"INFOodd"  # 7 bytes: exercises even-offset padding
        chunks += b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav16_stereo_roundtrip_with_odd_chunk():
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    samples = _rng(20).integers(-32768, 32768, size=(500, 2)).astype("<i2")
    got, rate = decode_audio(_wav_bytes(samples, 16000, extra_chunk=True))
    assert rate == 16000
    np.testing.assert_array_equal(got, samples)


def test_wav8_mono_unsigned():
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    samples = _rng(21).integers(0, 256, size=(64, 1)).astype(np.uint8)
    got, rate = decode_audio(_wav_bytes(samples, 8000))
    assert rate == 8000 and got.dtype == np.uint8
    np.testing.assert_array_equal(got, samples)


def test_wav32_fullscale_rms_exact_no_overflow():
    """Full-scale 32-bit PCM: each sample squares to ~2^62, so a naive
    int64 accumulator wraps negative after TWO samples (observed:
    complex RMS). The hi/lo-split exact sum must return the true
    value."""
    from flink_hiveorc_spark.functions.multimodal import (
        _sum_of_squares_exact,
        decode_audio,
    )

    samples = np.array(
        [[2**31 - 1], [-(2**31)], [2**31 - 1], [-(2**31)], [123456789]],
        dtype="<i4",
    )
    got, rate = decode_audio(_wav_bytes(samples, 48000))
    np.testing.assert_array_equal(got, samples)
    expect = sum(int(v) ** 2 for v in samples.ravel())
    assert expect > 2**63  # the naive accumulator provably wraps here
    assert _sum_of_squares_exact(got) == expect


def test_wav_zero_channels_rejected_as_malformed():
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    samples = _rng(23).integers(-100, 100, size=(8, 1)).astype("<i2")
    data = bytearray(_wav_bytes(samples, 8000))
    struct.pack_into("<H", data, 22, 0)  # n_channels = 0
    with pytest.raises(ValueError):
        decode_audio(bytes(data))
    data = bytearray(_wav_bytes(samples, 8000))
    struct.pack_into("<I", data, 24, 0)  # sample_rate = 0
    with pytest.raises(ValueError):
        decode_audio(bytes(data))


def test_malformed_supported_formats_raise_value_error():
    """The decode error contract: NotImplementedError = unsupported
    FORMAT; ValueError = malformed payload of a supported format — so
    a DLQ-style caller can catch the pair and never sees a raw
    struct.error / ZeroDivisionError from header math."""
    # truncated PPM body (header promises more pixels than exist)
    with pytest.raises(ValueError):
        decode_image(b"P6\n10 10\n255\n" + b"\x00" * 10)
    # BMP magic with garbage header
    with pytest.raises(ValueError):
        decode_image(b"BM" + b"\x01" * 20)


def test_unsupported_wav_and_mp3_rejected():
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    samples = _rng(22).integers(-100, 100, size=(8, 1)).astype("<i2")
    data = bytearray(_wav_bytes(samples, 8000))
    struct.pack_into("<H", data, 20, 0x55)  # format 0x55 = MPEG layer 3
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(data))
    data = bytearray(_wav_bytes(samples, 8000))
    # format 2 (MS ADPCM) decodes natively since r9 — but only at 4
    # bits; a 16-bit "ADPCM" header is still codec-contract territory
    struct.pack_into("<H", data, 20, 2)
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(data))
    data = bytearray(_wav_bytes(samples, 8000))
    struct.pack_into("<H", data, 20, 3)  # float16 isn't a WAV thing
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(data))
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00" + b"\x00" * 64)  # MP3 frame sync


def test_wav_extensible_format():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real format hides in the
    SubFormat GUID's first two bytes — how multichannel/high-bit WAVs
    actually ship. 6-channel 24-bit PCM and stereo float32."""
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    def _extensible(samples, rate, sub_fmt, bits):
        n, ch = samples.shape
        data = samples.tobytes() if bits != 24 else b"".join(
            int(v).to_bytes(3, "little", signed=True) for v in samples.ravel()
        )
        guid = struct.pack("<H", sub_fmt) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack(
            "<HHIIHHHHI",
            0xFFFE, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits,
            22, bits, (1 << ch) - 1,
        ) + guid
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    pcm24 = _rng(25).integers(-(2**23), 2**23, size=(50, 6)).astype(np.int32)
    got, rate = decode_audio(_extensible(pcm24, 48000, 1, 24))
    assert rate == 48000 and got.shape == (50, 6)
    np.testing.assert_array_equal(got, pcm24)
    f32 = _rng(26).normal(size=(40, 2)).astype("<f4")
    got, _ = decode_audio(_extensible(f32, 44100, 3, 32))
    np.testing.assert_array_equal(got, f32)
    # truncated extension: malformed, not struct.error
    bad = bytearray(_extensible(pcm24, 48000, 1, 24))
    struct.pack_into("<I", bad, 16, 18)  # fmt size lies: too short for GUID
    with pytest.raises(ValueError):
        decode_audio(bytes(bad))


def test_audio_stats_distributed_matches_numpy(spark):
    from flink_hiveorc_spark.functions.multimodal import audio_stats

    clips = {
        200: (_rng(30).integers(-32768, 32768, size=(800, 1)).astype("<i2"), 16000),
        201: (_rng(31).integers(-32768, 32768, size=(441, 2)).astype("<i2"), 44100),
        202: (_rng(32).integers(0, 256, size=(123, 1)).astype(np.uint8), 8000),
    }
    df = spark.createDataFrame(
        [(k, bytearray(_wav_bytes(s, r))) for k, (s, r) in clips.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in audio_stats(df).collect()}
    assert set(got) == set(clips)
    for doc_id, (s, rate) in clips.items():
        r = got[doc_id]
        n, ch = s.shape
        assert (r["sample_rate"], r["n_frames"], r["n_channels"]) == (rate, n, ch)
        assert r["duration_s"] == n / rate
        # 8-bit PCM centers on its 0x80 zero level before squaring
        lin = s.astype("int64") - 128 if s.dtype == np.uint8 else s.astype("int64")
        sq = int((lin**2).sum())
        assert r["rms"] == math.sqrt(sq / (n * ch))


def test_wav8_silence_rms_is_zero():
    """8-bit PCM digital silence is all-0x80 (unsigned zero level);
    the RMS feature must report 0, not 128 — otherwise the loudness
    feature is incomparable with the same waveform at 16-bit."""
    from flink_hiveorc_spark.functions.multimodal import _audio_features

    silence = np.full((64, 1), 0x80, dtype=np.uint8)
    assert _audio_features(_wav_bytes(silence, 8000))["rms"] == 0.0


def test_wav_truncated_chunks_are_malformed():
    """A fmt chunk shorter than 16 bytes must raise ValueError (not
    struct.error, which quarantine mode can't catch), and a data
    chunk whose declared size overruns the payload must raise instead
    of silently decoding a shorter clip."""
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    short_fmt = (
        b"RIFF" + struct.pack("<I", 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError):
        decode_audio(short_fmt)
    samples = _rng(24).integers(-100, 100, size=(8, 1)).astype("<i2")
    data = bytearray(_wav_bytes(samples, 8000))
    # data chunk declares 16 more bytes than the payload carries
    struct.pack_into("<I", data, len(data) - len(samples.tobytes()) - 4, 32)
    with pytest.raises(ValueError):
        decode_audio(bytes(data))


def test_image_stats_distributed_matches_numpy(spark):
    """Mixed-format corpus through the Spark mapInPandas path: shapes
    and exact mean bytes equal local numpy on the same arrays."""
    arrays = {
        100: _rng(10).integers(0, 256, size=(16, 11, 3), dtype=np.uint8),
        101: _rng(11).integers(0, 256, size=(3, 30, 1), dtype=np.uint8),
        102: _rng(12).integers(0, 256, size=(7, 5, 3), dtype=np.uint8),
        103: _rng(13).integers(0, 256, size=(2, 2, 4), dtype=np.uint8),
    }
    payloads = {
        100: _ppm_bytes(arrays[100], comment=True),
        101: _pgm_bytes(arrays[101]),
        102: _bmp_bytes(arrays[102]),
        103: _bmp_bytes(arrays[103], top_down=True),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in image_stats(df).collect()}
    assert set(got) == set(arrays)
    for doc_id, arr in arrays.items():
        r = got[doc_id]
        assert (r["height"], r["width"], r["channels"]) == arr.shape
        assert r["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size
