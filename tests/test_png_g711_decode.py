"""Native PNG and G.711/float WAV decode (functions/multimodal.py).

The PNG serializer here is written from the PNG spec independently of
the decoder: scalar per-byte filter math (the decoder unfilters with
vectorized prefix sums / per-pixel loops), explicit MSB-first bit
packing for sub-byte depths, chunk CRCs via zlib.crc32 over
type+body. The G.711 reference decoders are scalar transliterations
of the CCITT/Sun reference C (ulaw2linear / alaw2linear) — a
different formulation from the decoder's vectorized bit-field table —
so a shared misunderstanding can't cancel out.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import decode_audio, decode_image

from test_image_decode import _no_pil, _rng, _wav_bytes

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: list, prev: list, bpp: int) -> bytes:
    """Apply PNG filter `ftype` to one scanline, scalar per-byte per
    spec §9 (recon → filtered)."""
    out = bytearray()
    for x, v in enumerate(row):
        a = row[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((v - pred) % 256)
    return bytes(out)


def _pack_row(samples, depth: int) -> bytes:
    """MSB-first bit packing of sub-byte samples into scanline bytes."""
    bits = []
    for s in samples:
        for k in range(depth - 1, -1, -1):
            bits.append((int(s) >> k) & 1)
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - i) for i, b in enumerate(bits[j : j + 8]))
        for j in range(0, len(bits), 8)
    )


def _filter_image(scanlines: list, filters: list, bpp: int) -> bytearray:
    """Filtered stream of one (sub-)image: per-row filter byte + the
    filtered bytes; the previous-row context starts at zeros (each
    Adam7 pass is its own image per spec §8.2)."""
    raw = bytearray()
    prev = [0] * len(scanlines[0])
    for y, row in enumerate(scanlines):
        f = filters[y % len(filters)]
        raw.append(f)
        raw += _filter_row(f, list(row), prev, bpp)
        prev = list(row)
    return raw


def _png_bytes(
    scanlines: list,
    w: int,
    h: int,
    depth: int,
    color: int,
    filters: list,
    palette=None,
    trns=None,
    interlace: int = 0,
) -> bytes:
    """Full PNG byte stream: signature, IHDR, optional PLTE/tRNS, the
    IDAT zlib stream split across TWO chunks (exercises multi-IDAT
    concatenation), IEND. `scanlines` may be one row list
    (progressive) or a list of per-pass row lists (Adam7)."""
    bpp = max(1, depth * _CHANNELS[color] // 8)
    passes = scanlines if isinstance(scanlines[0], list) else [scanlines]
    raw = bytearray()
    for p in passes:
        raw += _filter_image(p, filters, bpp)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if palette is not None:
        out += _png_chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(trns))
    comp = zlib.compress(bytes(raw))
    mid = len(comp) // 2
    out += _png_chunk(b"IDAT", comp[:mid]) + _png_chunk(b"IDAT", comp[mid:])
    return out + _png_chunk(b"IEND", b"")


def _png_from_array(arr: np.ndarray, filters: list) -> bytes:
    """8-bit PNG of an HxWxC array (C ∈ {1,2,3,4} → color type)."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    return _png_bytes([arr[y].tobytes() for y in range(h)], w, h, 8, color, filters)


_ADAM7_GEOM = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_adam7_from_array(arr: np.ndarray, filters: list) -> bytes:
    """Adam7-interlaced 8-bit PNG: the seven passes extracted by the
    spec's stride geometry, each serialized as its own sub-image
    (empty passes omitted entirely)."""
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    passes = []
    for x0, y0, dx, dy in _ADAM7_GEOM:
        sub = arr[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            passes.append([sub[y].tobytes() for y in range(sub.shape[0])])
    return _png_bytes(passes, w, h, 8, color, filters, interlace=1)


ALL_FILTERS = [0, 1, 2, 3, 4]


def test_png_rgb_all_five_filters_roundtrip():
    arr = _rng(40).integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    got = decode_image(_png_from_array(arr, ALL_FILTERS))
    np.testing.assert_array_equal(got, arr)


def test_png_rgba_paeth_only():
    arr = _rng(41).integers(0, 256, size=(6, 9, 4), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_png_from_array(arr, [4])), arr)


def test_png_gray_and_gray_alpha():
    g = _rng(42).integers(0, 256, size=(5, 5, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_png_from_array(g, [3, 1])), g)
    ga = _rng(43).integers(0, 256, size=(4, 8, 2), dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(_png_from_array(ga, [2, 4])), ga)


def test_png_palette8_with_trns_alpha():
    pal = [(10 * i % 256, (7 * i + 3) % 256, (13 * i + 1) % 256) for i in range(16)]
    trns = [255, 0, 128, 7]  # first 4 entries get explicit alpha
    idx = _rng(44).integers(0, 16, size=(6, 11), dtype=np.uint8)
    png = _png_bytes(
        [idx[y].tobytes() for y in range(6)], 11, 6, 8, 3, ALL_FILTERS, pal, trns
    )
    got = decode_image(png)
    pal_arr = np.array(pal, dtype=np.uint8)
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:4] = trns
    expect = np.dstack([pal_arr[idx], alpha[idx][:, :, None]])
    np.testing.assert_array_equal(got, expect)


def test_png_palette4_packed_indices():
    pal = [(i * 16, 255 - i * 16, i * 5) for i in range(13)]
    idx = _rng(45).integers(0, 13, size=(7, 5), dtype=np.uint8)  # odd width: pad bits
    png = _png_bytes(
        [_pack_row(idx[y], 4) for y in range(7)], 5, 7, 4, 3, [0, 1, 2], pal
    )
    np.testing.assert_array_equal(
        decode_image(png), np.array(pal, dtype=np.uint8)[idx]
    )


@pytest.mark.parametrize("depth", [1, 2])
def test_png_subbyte_gray_scales_to_full_range(depth):
    maxval = (1 << depth) - 1
    vals = _rng(46 + depth).integers(0, maxval + 1, size=(3, 11), dtype=np.uint8)
    png = _png_bytes(
        [_pack_row(vals[y], depth) for y in range(3)], 11, 3, depth, 0, [0, 2]
    )
    expect = (vals * (255 // maxval)).astype(np.uint8)[:, :, None]
    np.testing.assert_array_equal(decode_image(png), expect)


def test_png_crc_corruption_is_malformed():
    arr = _rng(48).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    data = bytearray(_png_from_array(arr, [0]))
    data[-5] ^= 0xFF  # flip a bit inside IEND's CRC... IEND body empty; flip IDAT
    data[40] ^= 0x01  # and one inside a chunk body
    with pytest.raises(ValueError):
        decode_image(bytes(data))


def test_png_truncated_stream_is_malformed():
    arr = _rng(49).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    h, w, _ = arr.shape
    # lie about the height: IHDR promises 5 rows, stream carries 4
    rows = [arr[y].tobytes() for y in range(h)]
    png = _png_bytes(rows, w, 5, 8, 2, [0])
    with pytest.raises(ValueError):
        decode_image(png)


def test_png_adam7_interlaced_roundtrip():
    """Adam7: a 13x11 RGB image (every pass non-empty, ragged edge
    sizes) with all five filters cycling inside each pass."""
    arr = _rng(50).integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    got = decode_image(_png_adam7_from_array(arr, ALL_FILTERS))
    np.testing.assert_array_equal(got, arr)


def test_png_adam7_tiny_images_skip_empty_passes():
    """w or h < 8 leaves some Adam7 passes with zero pixels — the spec
    says those contribute NO scanlines. 1x1 is the extreme: only pass
    1 exists."""
    for shape in [(1, 1, 1), (2, 3, 4), (5, 2, 3), (3, 9, 2)]:
        arr = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_image(_png_adam7_from_array(arr, [0, 1, 2, 3, 4]))
        np.testing.assert_array_equal(got, arr, err_msg=f"shape {shape}")


def test_png_16bit_reduces_to_high_byte():
    """16-bit samples (big-endian) decode to their high byte — the
    standard 16→8 reduction; filter math runs on the 2-byte lanes
    (bpp=2·channels), which the Paeth rows exercise."""
    arr16 = _rng(52).integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    rows = [arr16[y].astype(">u2").tobytes() for y in range(6)]
    got = decode_image(_png_bytes(rows, 5, 6, 16, 2, ALL_FILTERS))
    np.testing.assert_array_equal(got, (arr16 >> 8).astype(np.uint8))
    # gray+alpha 16-bit, Adam7
    ga16 = _rng(53).integers(0, 65536, size=(9, 4, 2), dtype=np.uint16)
    passes = []
    for x0, y0, dx, dy in _ADAM7_GEOM:
        sub = ga16[y0::dy, x0::dx]
        if sub.shape[0] and sub.shape[1]:
            passes.append([sub[y].astype(">u2").tobytes() for y in range(sub.shape[0])])
    got = decode_image(_png_bytes(passes, 4, 9, 16, 4, [4, 3], interlace=1))
    np.testing.assert_array_equal(got, (ga16 >> 8).astype(np.uint8))


def test_png_property_random_images_random_filters():
    """Hypothesis-style sweep without the library overhead: 20 random
    (shape, channels, per-row filter) draws must all round-trip."""
    rng = _rng(51)
    for trial in range(20):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        c = int(rng.integers(1, 5))
        arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        filters = [int(f) for f in rng.integers(0, 5, size=h)]
        enc = _png_adam7_from_array if trial % 2 else _png_from_array
        got = decode_image(enc(arr, filters))
        np.testing.assert_array_equal(got, arr, err_msg=f"trial {trial}")


# --- G.711 -----------------------------------------------------------------


def _ulaw2lin_ref(byte: int) -> int:
    """Scalar transliteration of the Sun/CCITT reference ulaw2linear."""
    u = ~byte & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw2lin_ref(byte: int) -> int:
    """Scalar transliteration of the Sun/CCITT reference alaw2linear."""
    a = byte ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_g711_tables_match_reference_all_256_codes():
    from flink_hiveorc_spark.functions.multimodal import _g711_table

    ulaw, alaw = _g711_table(7), _g711_table(6)
    for b in range(256):
        assert ulaw[b] == _ulaw2lin_ref(b), f"ulaw code {b:#04x}"
        assert alaw[b] == _alaw2lin_ref(b), f"alaw code {b:#04x}"
    # spec-pinned landmarks: silence codes and full-scale magnitudes
    assert ulaw[0xFF] == 0 and alaw[0xD5] == 8
    assert ulaw[0x80] == 32124 and alaw[0xAA] == 32256
    assert int(np.abs(ulaw).max()) == 32124
    assert int(np.abs(alaw).max()) == 32256


@pytest.mark.parametrize("fmt_tag", [6, 7])
def test_g711_wav_roundtrip(fmt_tag):
    from flink_hiveorc_spark.functions.multimodal import _g711_table

    codes = _rng(60 + fmt_tag).integers(0, 256, size=(300, 2)).astype(np.uint8)
    got, rate = decode_audio(_wav_bytes(codes, 8000, fmt_tag=fmt_tag))
    assert rate == 8000 and got.dtype == np.int16
    np.testing.assert_array_equal(got, _g711_table(fmt_tag)[codes])


def test_pcm24_wav_sign_extension():
    """24-bit PCM: 3-byte little-endian frames serialized by hand
    (independently of the decoder's assembly), full-scale negative and
    positive values included."""
    vals = np.array(
        [[-(2**23)], [2**23 - 1], [-1], [0], [1], [-123456], [654321]],
        dtype=np.int32,
    )
    body = b"".join(
        int(v).to_bytes(3, "little", signed=True) for v in vals.ravel()
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    got, rate = decode_audio(payload)
    assert rate == 48000
    np.testing.assert_array_equal(got, vals)


def test_png_decompression_bomb_capped():
    """IDAT inflating past the IHDR-promised size must fail the length
    check without materializing the full bomb (decompressobj cap)."""
    bomb = zlib.compress(b"\x00" * 10_000_000)  # ~10 KB compressed
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image(png)


def test_png_bomb_ihdr_dimensions_rejected_before_allocation():
    """IHDR dimensions are attacker-controlled: a tiny payload
    claiming a gigapixel raster must raise the quarantine-catchable
    ValueError BEFORE allocating the output array or inflating
    (MAX_IMAGE_PIXELS guard), and sub-cap dimensions whose pixel
    stream could not possibly fit the IDAT bytes (DEFLATE max ratio
    1032:1) must be rejected before inflating too."""
    tiny_idat = _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
    giga = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 50_000, 50_000, 8, 6, 0, 0, 0))
        + tiny_idat
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_image(giga)
    # 4000x4000 RGB = 48 MB pixel stream, under the pixel cap, but a
    # ~80-byte IDAT cannot encode it at any DEFLATE ratio
    implausible = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4000, 4000, 8, 2, 0, 0, 0))
        + tiny_idat
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="cannot encode"):
        decode_image(implausible)


def test_float_wav_roundtrip_exact():
    f32 = _rng(70).normal(size=(200, 1)).astype("<f4")
    got, rate = decode_audio(_wav_bytes(f32, 44100, fmt_tag=3))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, f32)
    f64 = _rng(71).normal(size=(64, 2)).astype("<f8")
    got64, _ = decode_audio(_wav_bytes(f64, 48000, fmt_tag=3))
    assert got64.dtype == np.float64
    np.testing.assert_array_equal(got64, f64)


def test_audio_stats_float_and_g711_clips(spark):
    """Distributed featurize over the NEW formats: float WAV RMS
    (float64 accumulation, checked against math.fsum within 1e-9
    relative) and μ-law RMS (int16 after expansion → exact path)."""
    import math

    from flink_hiveorc_spark.functions.multimodal import _g711_table, audio_stats

    f32 = _rng(80).normal(scale=0.3, size=(500, 2)).astype("<f4")
    codes = _rng(81).integers(0, 256, size=(400, 1)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (300, bytearray(_wav_bytes(f32, 16000, fmt_tag=3))),
            (301, bytearray(_wav_bytes(codes, 8000, fmt_tag=7))),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in audio_stats(df).collect()}
    r = got[300]
    assert (r["n_frames"], r["n_channels"], r["sample_rate"]) == (500, 2, 16000)
    expect_sq = math.fsum(float(v) ** 2 for v in f32.astype("float64").ravel())
    assert r["rms"] == pytest.approx(math.sqrt(expect_sq / 1000), rel=1e-9)
    r = got[301]
    lin = _g711_table(7)[codes]
    sq = sum(int(v) ** 2 for v in lin.ravel())
    assert r["rms"] == math.sqrt(sq / 400)


def test_image_stats_quarantine_routes_failures_not_kills_task(spark):
    """100 TB posture: quarantine=True turns decode failures into
    error rows (NULL features, classified error string) while good
    blobs in the SAME Arrow batch still featurize; default mode still
    raises (fail-fast contract unchanged)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from flink_hiveorc_spark.functions.multimodal import image_stats

    good = _rng(91).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    rows = [
        (500, bytearray(_png_from_array(good, [1, 4]))),
        (501, bytearray(b"P6\n9 9\n255\n" + b"\x00" * 5)),  # truncated: malformed
        # arithmetic-coded JPEG: outside the native envelope
        (502, bytearray(b"\xff\xd8\xff\xc9" + b"\x00" * 16)),  # needs codec
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary").repartition(1)
    got = {r["doc_id"]: r for r in image_stats(df, quarantine=True).collect()}
    assert got[500]["error"] is None and got[500]["height"] == 4
    assert got[501]["height"] is None and got[501]["error"].startswith("malformed:")
    if _no_pil():
        assert got[502]["error"].startswith("unsupported:")
    with pytest.raises((PythonException, Py4JJavaError)):
        image_stats(df).collect()  # default stays fail-fast


def test_audio_stats_quarantine(spark):
    from flink_hiveorc_spark.functions.multimodal import audio_stats

    ok = _rng(92).integers(-1000, 1000, size=(32, 1)).astype("<i2")
    bad = bytearray(_wav_bytes(ok, 8000))
    struct.pack_into("<H", bad, 22, 0)  # channels=0: malformed
    df = spark.createDataFrame(
        [
            (600, bytearray(_wav_bytes(ok, 8000))),
            (601, bad),
            (602, bytearray(b"\xff\xfb\x90\x00" + b"\x00" * 32)),  # MP3: unsupported
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in audio_stats(df, quarantine=True).collect()}
    assert got[600]["error"] is None and got[600]["n_frames"] == 32
    assert got[601]["error"].startswith("malformed:")
    assert got[602]["error"].startswith("unsupported:")
    assert got[601]["rms"] is None and got[602]["n_frames"] is None


def test_image_stats_includes_png(spark):
    """PNG joins the mixed-format distributed corpus: exact shape and
    mean through the mapInPandas path."""
    from flink_hiveorc_spark.functions.multimodal import image_stats

    arr = _rng(90).integers(0, 256, size=(14, 6, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [(400, bytearray(_png_from_array(arr, ALL_FILTERS)))],
        "doc_id long, payload binary",
    )
    [r] = image_stats(df).collect()
    assert (r["height"], r["width"], r["channels"]) == (14, 6, 4)
    assert r["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size


def test_png_gray_trns_key_becomes_alpha():
    """Type-0 tRNS (ADVICE r7 #2): pixels whose raw gray sample equals
    the 2-byte key decode transparent — output gains an alpha channel
    (gray+alpha shape), previously the chunk was silently ignored."""
    vals = np.array([[10, 20, 10], [30, 10, 40]], dtype=np.uint8)
    png = _png_bytes(
        [vals[y].tobytes() for y in range(2)], 3, 2, 8, 0, [0, 1],
        trns=struct.pack(">H", 10),
    )
    got = decode_image(png)
    assert got.shape == (2, 3, 2)
    np.testing.assert_array_equal(got[:, :, 0], vals)
    np.testing.assert_array_equal(
        got[:, :, 1], np.where(vals == 10, 0, 255).astype(np.uint8)
    )


def test_png_rgb_trns_key_becomes_alpha():
    """Type-2 tRNS: only pixels matching ALL THREE 16-bit key fields
    go transparent; everything else keeps alpha 255."""
    arr = _rng(54).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    key = tuple(int(v) for v in arr[2, 3])
    arr[4, 1] = key  # a second pixel matching the key
    png = _png_bytes(
        [arr[y].tobytes() for y in range(5)], 7, 5, 8, 2, ALL_FILTERS,
        trns=struct.pack(">3H", *key),
    )
    got = decode_image(png)
    assert got.shape == (5, 7, 4)
    np.testing.assert_array_equal(got[:, :, :3], arr)
    match = (arr == np.array(key, dtype=np.uint8)).all(axis=2)
    np.testing.assert_array_equal(
        got[:, :, 3], np.where(match, 0, 255).astype(np.uint8)
    )


def test_png_subbyte_gray_trns_compared_pre_scaling():
    """The tRNS key lives in the RAW depth-bit sample space; matching
    must happen before the 0..255 scaling (key 3 at depth 2 means raw
    3, i.e. scaled 255 — not scaled 3)."""
    vals = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    png = _png_bytes(
        [_pack_row(vals[y], 2) for y in range(2)], 4, 2, 2, 0, [0],
        trns=struct.pack(">H", 3),
    )
    got = decode_image(png)
    np.testing.assert_array_equal(got[:, :, 0], (vals * 85).astype(np.uint8))
    np.testing.assert_array_equal(
        got[:, :, 1], np.where(vals == 3, 0, 255).astype(np.uint8)
    )


def test_png_16bit_trns_matches_full_samples():
    """At depth 16 the tRNS key compares against the FULL 16-bit raw
    samples (spec 11.3.2; libpng/PIL agree) even though the OUTPUT
    reduces to the high byte — a pixel sharing only the key's high
    byte (0x12FF vs key 0x1234) must stay opaque (ADVICE r8: the
    high-byte match falsely blanked it)."""
    arr16 = np.array([[0x1234, 0x12FF, 0x3456, 0x1234]], dtype=np.uint16)
    png = _png_bytes(
        [arr16[0].astype(">u2").tobytes()], 4, 1, 16, 0, [0],
        trns=struct.pack(">H", 0x1234),
    )
    got = decode_image(png)
    np.testing.assert_array_equal(got[:, :, 0], (arr16 >> 8).astype(np.uint8))
    np.testing.assert_array_equal(
        got[:, :, 1], np.array([[0, 255, 255, 0]], dtype=np.uint8)
    )


def test_png_16bit_rgb_trns_matches_full_samples():
    """Type-2 at depth 16: all three 16-bit fields must match exactly;
    a pixel agreeing with the key in every HIGH byte but one LOW byte
    stays opaque."""
    key = (0x1234, 0x5678, 0x9ABC)
    arr16 = np.array(
        [
            [key, (0x1235, 0x5678, 0x9ABC), (0x1234, 0x56FF, 0x9ABC)],
            [(0x1111, 0x2222, 0x3333), key, (0x12FF, 0x78FF, 0xBCFF)],
        ],
        dtype=np.uint16,
    )
    png = _png_bytes(
        [arr16[y].astype(">u2").tobytes() for y in range(2)], 3, 2, 16, 2, [0, 1],
        trns=struct.pack(">3H", *key),
    )
    got = decode_image(png)
    assert got.shape == (2, 3, 4)
    np.testing.assert_array_equal(got[:, :, :3], (arr16 >> 8).astype(np.uint8))
    np.testing.assert_array_equal(
        got[:, :, 3], np.array([[0, 255, 255], [255, 0, 255]], dtype=np.uint8)
    )


def test_png_bad_trns_length_rejected():
    """A tRNS body whose length doesn't fit the color type is
    malformed → ValueError, not a misdecode."""
    arr = _rng(55).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    png = _png_bytes(
        [arr[y].tobytes() for y in range(2)], 2, 2, 8, 2, [0],
        trns=b"\x00\x01\x02",
    )
    with pytest.raises(ValueError, match="tRNS"):
        decode_image(png)


def test_wav_trailing_partial_frame_rejected():
    """ADVICE r7 #3: a data chunk that isn't a whole number of frames
    was silently floored (wrong n_frames/duration); now classified
    malformed like the truncated-chunk case above it."""
    from flink_hiveorc_spark.functions.multimodal import decode_audio

    samples = _rng(56).integers(-32768, 32768, size=(100, 2)).astype("<i2")
    good = _wav_bytes(samples, 8000)
    # chop one byte off the data payload and shrink both size fields
    bad = bytearray(good[:-1])
    struct.pack_into("<I", bad, 4, len(bad) - 8)  # RIFF size
    data_off = bytes(bad).rindex(b"data")
    struct.pack_into("<I", bad, data_off + 4, len(samples.tobytes()) - 1)
    with pytest.raises(ValueError, match="frame"):
        decode_audio(bytes(bad))
    # sanity: the untouched twin still decodes
    got, rate = decode_audio(good)
    np.testing.assert_array_equal(got, samples)


def test_png_out_of_range_trns_key_matches_nothing():
    """Spec says tRNS key bits above the depth are zero; a malformed
    key outside the sample range must match NOTHING (libpng/PIL
    behavior) — masking it down would invent false transparency."""
    vals = np.array([[0x45, 0x46], [0x47, 0x45]], dtype=np.uint8)
    png = _png_bytes(
        [vals[y].tobytes() for y in range(2)], 2, 2, 8, 0, [0],
        trns=struct.pack(">H", 0x0145),  # low byte collides with 0x45
    )
    got = decode_image(png)
    np.testing.assert_array_equal(got[:, :, 0], vals)
    np.testing.assert_array_equal(
        got[:, :, 1], np.full((2, 2), 255, dtype=np.uint8)
    )
