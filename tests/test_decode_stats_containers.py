"""The r10 decode-stats oracle rotations: every container branch of
`multimodal_{image,audio,video,adpcm,pcm_wide,gif_animation}_*`
ships the same digest-derived samples/pixels, so one oracle per
query value-checks many native decoders.

Pins, independent of the Spark expression code:
- a pure-Python twin of each image container construction decodes
  (via the REAL decode_image dispatch) to exactly the expected
  pixels — including the BMP bottom-up flip, the farbfeld 16-bit
  reduction, the palette expansions, and the PBM ink convention;
- the GIF stream's fixed 9-byte-per-4-pixels bit-shuffle equals an
  independently written LSB-first bit packer (the arithmetic the
  Spark side computes JVM-side);
- the PNG adler32 linear-weight formula equals zlib.adler32 (the
  no-mod-wrap claim);
- each registered query at sf0.001 equals a local recomputation
  row-for-row, with every doc_id % k branch asserted exercised.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

import flink_hiveorc_spark.functions.multimodal as mm


def _digest(text: str) -> bytes:
    return hashlib.md5(text.encode()).digest()


def _bit_pack_lsb(codes, width: int) -> bytes:
    """Independent LSB-first bit packer (GIF appendix F)."""
    buf = nbits = 0
    out = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _python_payloads(dg: bytes) -> dict[str, bytes]:
    """Pure-Python twin of the Spark-side concat construction."""
    seg = mm._image_container_segments()
    out = {
        "pgm": b"P5\n4 4\n255\n" + dg,
        "bmp": seg["bmp"] + dg,
        "tga": seg["tga_hdr"] + dg + seg["tga_foot"],
        "tiff": seg["tiff"] + dg,
        "qoi": seg["qoi_hdr"]
        + b"".join(b"\xfe" + bytes([v, v, v]) for v in dg)
        + seg["qoi_end"],
        "ff": seg["ff_hdr"] + b"".join(bytes([v]) * 6 + b"\xff\xff" for v in dg),
    }
    raw = b"".join(b"\x00" + dg[4 * r : 4 * r + 4] for r in range(4))
    idat = b"IDAT" + seg["png_zpre"] + raw + struct.pack(">I", zlib.adler32(raw))
    out["png"] = (
        seg["png_hdr"] + idat + struct.pack(">I", zlib.crc32(idat)) + seg["png_iend"]
    )
    codes = []
    for v in dg:
        codes += [256, v]
    codes.append(257)
    stream = _bit_pack_lsb(codes, 9)
    assert len(stream) == 38
    out["gif"] = seg["gif_hdr"] + stream + b"\x00\x3b"
    out["p4"] = b"P4\n4 4\n" + dg[:4]
    out["p2"] = b"P2\n4 4\n255\n" + b"".join(b"%d " % v for v in dg)
    bits = [(dg[r] >> (7 - c)) & 1 for r in range(4) for c in range(4)]
    out["p1"] = b"P1\n4 4\n" + b"".join(b"%d" % v for v in bits)
    out["tiff_be"] = seg["tiff_be"] + dg
    out["tga_rle"] = seg["tga_rle_hdr"] + b"\x0f" + dg + seg["tga_foot"]
    out["bmp_rle"] = (
        seg["bmp_rle"]
        + b"".join(
            seg["bmp_rle_mid"] + dg[4 * r : 4 * r + 4] + seg["bmp_rle_eol"]
            for r in range(4)
        )
        + seg["bmp_rle_eob"]
    )
    out["tiff_pb"] = seg["tiff_pb"] + b"\x0f" + dg
    out["tiff_lzw"] = seg["tiff_lzw"] + _bit_pack_msb(codes, 9)
    out["ico_png"] = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, len(out["png"]), 22)
        + out["png"]
    )
    return out


def _bit_pack_msb(codes, width: int) -> bytes:
    """Independent MSB-first bit packer (TIFF spec §13 order)."""
    buf = nbits = 0
    out = bytearray()
    for c in codes:
        buf = (buf << width) | c
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


_EXPECT_CHANNELS = {
    "pgm": 1, "bmp": 3, "tga": 1, "tiff": 1,
    "qoi": 3, "ff": 4, "png": 1, "gif": 3,
    "p4": 1, "p2": 1, "p1": 1, "tiff_be": 1,
    "tga_rle": 1, "bmp_rle": 3, "tiff_pb": 1, "tiff_lzw": 1,
    "ico_png": 1,
}


def _bilevel_pixels(dg: bytes) -> "np.ndarray":
    bits = np.array(
        [(dg[r] >> (7 - c)) & 1 for r in range(4) for c in range(4)],
        dtype=np.uint8,
    ).reshape(4, 4)
    return (1 - bits) * 255  # PBM ink convention: 1 = black


@pytest.mark.parametrize("text", ["hello world", "", "αβγ δε", "x" * 500])
def test_container_matrix_decodes_to_identical_pixels(text):
    dg = _digest(text)
    gray = np.frombuffer(dg, dtype=np.uint8).reshape(4, 4)
    for fmt, payload in _python_payloads(dg).items():
        arr = mm.decode_image(payload)
        ch = _EXPECT_CHANNELS[fmt]
        assert arr.shape == (4, 4, ch), fmt
        if fmt in ("p4", "p1"):
            rows = _bilevel_pixels(dg)
        elif fmt in ("bmp", "bmp_rle"):
            rows = gray[::-1]  # BMP is bottom-up
        else:
            rows = gray
        if ch == 1:
            np.testing.assert_array_equal(arr[:, :, 0], rows, err_msg=fmt)
        else:
            for c in range(3):
                np.testing.assert_array_equal(arr[:, :, c], rows, err_msg=fmt)
            if ch == 4:
                assert (arr[:, :, 3] == 255).all(), fmt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gif_bit_shuffle_formulas_match_independent_packer(seed):
    """The 9-byte group arithmetic the Spark expressions compute must
    equal the independent bit packer for arbitrary pixel bytes."""
    rng = np.random.default_rng(seed)
    px = [int(v) for v in rng.integers(0, 256, size=16)]
    codes = []
    for v in px:
        codes += [256, v]
    codes.append(257)
    ref = _bit_pack_lsb(codes, 9)
    got = bytearray()
    for g in range(4):
        pa, pb, pc, pd = px[4 * g : 4 * g + 4]
        got += bytes(
            [
                0,
                (pa & 0x7F) * 2 + 1,
                pa >> 7,
                (pb & 0x1F) * 8 + 4,
                pb >> 5,
                (pc & 0x07) * 32 + 16,
                pc >> 3,
                (pd & 0x01) * 128 + 64,
                pd >> 1,
            ]
        )
    got += b"\x01\x01"  # EOI bytes
    assert bytes(got) == ref


@pytest.mark.parametrize("seed", [6, 7, 8])
def test_tiff_lzw_bit_shuffle_formulas_match_independent_packer(seed):
    """The MSB-first 9-byte group arithmetic the Spark expressions
    compute for the TIFF-LZW leg must equal the independent packer."""
    rng = np.random.default_rng(seed)
    px = [int(v) for v in rng.integers(0, 256, size=16)]
    codes = []
    for v in px:
        codes += [256, v]
    codes.append(257)
    ref = _bit_pack_msb(codes, 9)
    got = bytearray()
    for g in range(4):
        pa, pb, pc, pd = px[4 * g : 4 * g + 4]
        got += bytes(
            [
                0x80,
                pa >> 2,
                (pa & 0x03) * 64 + 32,
                pb >> 4,
                (pb & 0x0F) * 16 + 8,
                pc >> 6,
                (pc & 0x3F) * 4 + 2,
                0x00,
                pd,
            ]
        )
    got += b"\x80\x80"  # EOI bytes (+ zero padding)
    assert bytes(got) == ref


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_png_adler_linear_weights_match_zlib(seed):
    """A = 1 + Σd, B = 20 + Σ(21−pos)·d with NO mod (A ≤ 4081,
    B ≤ 40820 < 65521) — must equal zlib.adler32 over the filtered
    scanline stream."""
    rng = np.random.default_rng(seed)
    dg = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    raw = b"".join(b"\x00" + dg[4 * r : 4 * r + 4] for r in range(4))
    weights = [19, 18, 17, 16, 14, 13, 12, 11, 9, 8, 7, 6, 4, 3, 2, 1]
    a = 1 + sum(dg)
    b = 20 + sum(w * v for w, v in zip(weights, dg))
    assert a <= 4081 and b <= 40820
    assert (b << 16) | a == zlib.adler32(raw)


def test_image_decode_stats_query_all_branches(spark, sf_dir):
    """The registered query at sf0.001 equals a local recomputation
    from the parquet text column, and every doc_id % 18 branch
    (16 = the r11 DC-only baseline-JPEG leg, 17 = ICO-wrapped PNG)
    is actually exercised."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {r["doc_id"]: r for r in QUERIES["multimodal_image_decode_stats"](spark, sf_dir).collect()}
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 18
        seen.add(m)
        dg = _digest(text)
        sb = sum(dg)
        r = rows[doc_id]
        exp_dim = 32 if m == 16 else 4
        assert (r["height"], r["width"]) == (exp_dim, exp_dim)
        exp_ch = {1: 3, 4: 3, 7: 3, 5: 4, 13: 3}.get(m, 1)
        assert r["channels"] == exp_ch, (doc_id, m)
        if m == 5:
            exp_mean = (3 * sb + 16 * 255) / 64
        elif m in (8, 10):
            z = sum(4 - bin(v >> 4).count("1") for v in dg[:4])
            exp_mean = 255 * z / 16
        else:
            exp_mean = sb / 16
        assert r["mean_byte"] == exp_mean, (doc_id, m)
    assert seen == set(range(18))


def _g711_expand(b: int, law: str) -> int:
    """Scalar ITU G.711 expansion, re-typed from the spec (independent
    of the module's vectorized tables)."""
    if law == "mu":
        u = b ^ 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
        return -mag if u & 0x80 else mag
    a = b ^ 0x55
    seg = (a >> 4) & 7
    t = (a & 0x0F) << 4
    mag = t + 8 if seg == 0 else (t + 0x108) << (seg - 1)
    return mag if a & 0x80 else -mag


def test_audio_decode_stats_query_all_branches(spark, sf_dir):
    """The 8-way audio rotation (WAV unsigned / AIFF / AU / CAF
    signed / WAV mu-law / WAV A-law / FLAC verbatim / FLAC Rice) at
    sf0.001: the PCM and FLAC branches decode to samples digest−128,
    the G.711 branches to the ITU expansion of the digest codes; all
    eight doc_id % 8 branches are exercised."""
    import math

    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_audio_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 8
        seen.add(m)
        dg = _digest(text)
        if m == 4:
            lin = [_g711_expand(v, "mu") for v in dg]
        elif m == 5:
            lin = [_g711_expand(v, "a") for v in dg]
        else:
            lin = [v - 128 for v in dg]
        sq = sum(x * x for x in lin)
        r = rows[doc_id]
        assert (r["sample_rate"], r["n_frames"], r["n_channels"]) == (8000, 16, 1)
        assert r["duration_s"] == 16 / 8000
        assert r["rms"] == math.sqrt(sq / 16), (doc_id, m)
    assert seen == set(range(8))


def test_gif_animation_stats_query(spark, sf_dir):
    """multimodal_gif_animation_stats at sf0.001: two rows per doc;
    frame 0 means digest bytes 0..7, frame 1 the composited canvas
    (sub-rect at (2,0) overwrites positions 2,3,6,7 with bytes
    8..11)."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    rows = QUERIES["multimodal_gif_animation_stats"](spark, sf_dir).collect()
    assert len(rows) == 2 * len(docs)
    for r in rows:
        dg = _digest(docs[r["doc_id"]])
        assert (r["height"], r["width"], r["channels"]) == (2, 4, 3)
        if r["frame_idx"] == 0:
            exp = sum(dg[:8]) / 8
        else:
            exp = (dg[0] + dg[1] + dg[4] + dg[5] + sum(dg[8:12])) / 8
        assert r["mean_byte"] == exp, (r["doc_id"], r["frame_idx"])


def test_adpcm_decode_stats_query_all_branches(spark, sf_dir):
    """The r10 3-way ADPCM rotation: IMA-WAV and MS-WAV legs carry the
    digest as 8 LE int16s losslessly in block headers; the AIFC ima4
    leg decodes 16 all-zero-nibble packets to 64 copies of
    (byte−128)·256 each — a fixpoint of the full vectorized
    expansion."""
    import math

    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_adpcm_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 3
        seen.add(m)
        dg = _digest(text)
        r = rows[doc_id]
        assert (r["sample_rate"], r["n_channels"]) == (8000, 1)
        if m == 2:
            sb = sum((v - 128) * (v - 128) for v in dg)
            assert r["n_frames"] == 1024
            assert r["duration_s"] == 1024 / 8000
            assert r["rms"] == 64 * math.sqrt(sb), (doc_id, m)
        else:
            words = [
                int.from_bytes(dg[2 * j : 2 * j + 2], "little", signed=True)
                for j in range(8)
            ]
            sx = sum(v * v for v in words)
            assert r["n_frames"] == 8
            assert r["duration_s"] == 8 / 8000
            assert r["rms"] == math.sqrt(sx / 8), (doc_id, m)
    assert seen == set(range(3))


def test_video_decode_stats_query_all_branches(spark, sf_dir):
    """The r10 4-way video rotation (Cmono Y4M / I420 AVI / C420jpeg
    Y4M / BI_RGB-24 bottom-up AVI): identical luma planes, so every
    branch must report the same digest-derived stats."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_video_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        seen.add(doc_id % 4)
        dg = _digest(text)
        r = rows[doc_id]
        assert (r["n_frames"], r["height"], r["width"]) == (2, 2, 4)
        assert (r["fps"], r["duration_s"]) == (25.0, 2 / 25)
        assert r["mean_luma"] == sum(dg) / 16
        assert r["mean_frame_delta"] == sum(
            abs(dg[i + 8] - dg[i]) for i in range(8)
        ) / 8, (doc_id, doc_id % 4)
    assert seen == set(range(4))


def test_pcm_wide_decode_stats_query_all_branches(spark, sf_dir):
    """The r10 wide-PCM rotation: five 16-bit container/endianness
    paths must decode the digest to the same LE int16 words; the
    24-bit leg to five sign-extended 3-byte words."""
    import math

    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_pcm_wide_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 6
        seen.add(m)
        dg = _digest(text)
        r = rows[doc_id]
        assert (r["sample_rate"], r["n_channels"]) == (8000, 1)
        if m == 5:
            vals = [
                int.from_bytes(dg[3 * k : 3 * k + 3], "little", signed=True)
                for k in range(5)
            ]
            assert r["n_frames"] == 5 and r["duration_s"] == 5 / 8000
            assert r["rms"] == math.sqrt(sum(v * v for v in vals) / 5), (doc_id, m)
        else:
            vals = [
                int.from_bytes(dg[2 * j : 2 * j + 2], "little", signed=True)
                for j in range(8)
            ]
            assert r["n_frames"] == 8 and r["duration_s"] == 8 / 8000
            assert r["rms"] == math.sqrt(sum(v * v for v in vals) / 8), (doc_id, m)
    assert seen == set(range(6))


def test_video_frames_decode_query(spark, sf_dir):
    """multimodal_video_frames_decode at sf0.001: two PGM-re-encoded
    frames per doc through the real video_frame_sample → image_stats
    composition, frame means equal the digest halves; both the Y4M
    and AVI source branches are exercised."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    rows = QUERIES["multimodal_video_frames_decode"](spark, sf_dir).collect()
    assert len(rows) == 2 * len(docs)
    seen = set()
    for r in rows:
        seen.add(r["doc_id"] % 2)
        dg = _digest(docs[r["doc_id"]])
        assert (r["height"], r["width"], r["channels"]) == (2, 4, 1)
        f = r["frame_idx"]
        assert r["mean_byte"] == sum(dg[8 * f : 8 * f + 8]) / 8, (r["doc_id"], f)
    assert seen == {0, 1}


# ---------------------------------------------------------------- JPEG (r11)


def _bit_pack_msb_stream(units) -> bytes:
    """Independent MSB-first packer over (value, nbits) units."""
    buf = nbits = 0
    out = bytearray()
    for v, n in units:
        buf = (buf << n) | v
        nbits += n
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)
    assert nbits == 0  # the construction is byte-aligned by design
    return bytes(out)


def _canonical_codes(bits, vals):
    """T.81 Annex C canonical assignment, written independently of
    multimodal._jpeg_dc_segments."""
    codes = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def test_jpeg_dc_table_matches_independent_encoder():
    """The 512-byte DC-only MCU table equals an independently packed
    [DC Huffman code][value bits][EOB] stream for all 256 byte
    values, and contains no 0xFF (the no-stuffing claim)."""
    seg = mm._jpeg_dc_segments()
    dc = _canonical_codes([0] + [1] * 9 + [0] * 6, [8, 7, 6, 5, 4, 3, 2, 1, 0])
    ac = _canonical_codes([0, 0, 0, 0, 0, 1] + [0] * 10, [0x00])
    eob = ac[0x00]
    tbl = seg["mcu"]
    assert len(tbl) == 512 and b"\xff" not in tbl
    for b in range(256):
        v = b - 128
        s = abs(v).bit_length()
        units = [dc[s]]  # (code, length)
        if s:
            valbits = v if v > 0 else v + (1 << s) - 1
            units.append((valbits, s))
        units.append(eob)
        ref = _bit_pack_msb_stream([(c, n) for c, n in units])
        assert tbl[2 * b : 2 * b + 2] == ref, b
    # the zero-diff chroma/repeat unit is the b=128 entry
    assert seg["s0"] == tbl[256:258]


def _python_jpeg_payloads(dg: bytes) -> dict[str, bytes]:
    """Pure-Python twin of the Spark-side JPEG concat construction."""
    seg = mm._jpeg_dc_segments()
    tbl, s0 = seg["mcu"], seg["s0"]
    rst = [bytes([0xFF, 0xD0 + (i % 8)]) for i in range(8)]

    def entropy(chroma_units: int) -> bytes:
        out = bytearray()
        for i in range(16):
            out += tbl[2 * dg[i] : 2 * dg[i] + 2]
            out += s0 * chroma_units
            if i < 15:
                out += rst[i % 8]
        return bytes(out)

    eoi = b"\xff\xd9"
    sa1 = bytearray()
    sa2 = bytearray()
    for i in range(16):
        sa1 += seg["mcu_al1"][2 * dg[i] : 2 * dg[i] + 2]
        sa2 += bytes([(dg[i] & 1) << 7])
        if i < 15:
            sa1 += rst[i % 8]
            sa2 += rst[i % 8]
    return {
        "gray": seg["hdr_gray"] + entropy(0) + eoi,
        "444": seg["hdr_444"] + entropy(2) + eoi,
        "420": seg["hdr_420"] + entropy(5) + eoi,
        "sof1": seg["hdr_sof1"] + entropy(0) + eoi,
        "prog": seg["hdr_prog"] + entropy(0) + seg["prog_tail"] + eoi,
        "sa": seg["hdr_prog_sa"] + bytes(sa1) + seg["sa_refine_sos"]
        + bytes(sa2) + seg["prog_tail"] + eoi,
    }


@pytest.mark.parametrize("text", ["hello world", "", "αβγ δε", "x" * 500])
def test_jpeg_rotation_payloads_decode_exact(text):
    """All four DC-only legs decode (through the REAL decode_image →
    decode_jpeg dispatch) to exactly the expected flat tiles: the
    digest bytes as 8×8 (gray/4:4:4) or 16×16 (4:2:0) blocks, RGB
    legs with R=G=B=Y (flat-128 chroma is an exact BT.601 identity)."""
    dg = _digest(text)
    grid = np.frombuffer(dg, dtype=np.uint8).reshape(4, 4)
    exp8 = np.repeat(np.repeat(grid, 8, 0), 8, 1)
    exp16 = np.repeat(np.repeat(grid, 16, 0), 16, 1)
    pl = _python_jpeg_payloads(dg)
    for fmt, exp, ch in (
        ("gray", exp8, 1),
        ("444", exp8, 3),
        ("420", exp16, 3),
        ("sof1", exp8, 1),
        ("prog", exp8, 1),
        ("sa", exp8, 1),
    ):
        arr = mm.decode_image(pl[fmt])
        assert arr.shape == exp.shape + (ch,), fmt
        for c in range(ch):
            np.testing.assert_array_equal(arr[:, :, c], exp, err_msg=fmt)


def test_jpeg_decode_stats_query_all_branches(spark, sf_dir):
    """multimodal_jpeg_decode_stats at sf0.001 equals a local
    recomputation, with every doc_id % 6 feature leg exercised
    (4 = progressive, 5 = progressive successive approximation)."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_jpeg_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 6
        seen.add(m)
        r = rows[doc_id]
        exp_dim = 64 if m == 2 else 32
        exp_ch = 3 if m in (1, 2) else 1
        assert (r["height"], r["width"], r["channels"]) == (
            exp_dim,
            exp_dim,
            exp_ch,
        ), (doc_id, m)
        assert r["mean_byte"] == sum(_digest(text)) / 16, (doc_id, m)
    assert seen == {0, 1, 2, 3, 4, 5}


# ---------------------------------------------------------------- FLAC (r11)


def _python_flac_payloads(dg: bytes) -> dict[str, bytes]:
    """Pure-Python twin of the Spark-side FLAC leg constructions,
    including the GF(2)-linear CRC-16 assembly the Spark expressions
    compute via table lookups + XOR."""
    seg = mm._flac_segments()

    def crc(base, tables):
        c = base
        for i, b in enumerate(dg):
            c ^= struct.unpack(">H", tables[i][2 * b : 2 * b + 2])[0]
        return struct.pack(">H", c)

    vb = (
        seg["streaminfo"] + seg["header"] + b"\x02"
        + bytes(b ^ 0x80 for b in dg)
        + crc(seg["vb_base"], seg["vb_tables"])
    )
    region = bytearray(seg["rice_const"])
    us = [2 * (b - 128) if b >= 128 else 255 - 2 * b for b in dg]
    for bidx, frags in seg["rice_layout"]:
        val = 0
        for i, hi, lo, blo in frags:
            width = hi - lo + 1
            val |= ((us[i] >> lo) & ((1 << width) - 1)) << blo
        region[bidx] |= val
    rice = (
        seg["streaminfo"] + seg["header"] + bytes(region)
        + crc(seg["rice_base"], seg["rice_tables"])
    )
    return {"flac_vb": vb, "flac_rice": rice}


@pytest.mark.parametrize("text", ["hello world", "", "αβγ δε", "x" * 500])
def test_flac_rotation_payload_twins_decode_exact(text):
    """Both FLAC legs decode (through the REAL decode_audio → FLAC
    dispatch, which VERIFIES the CRC-8/CRC-16 — so the linear-table
    construction is pinned by the decoder itself) to exactly the
    signed digest samples."""
    dg = _digest(text)
    exp = np.array([b - 128 for b in dg], dtype=np.int64)
    for name, payload in _python_flac_payloads(dg).items():
        samples, rate = mm.decode_audio(payload)
        assert rate == 8000 and samples.shape == (16, 1), name
        np.testing.assert_array_equal(samples[:, 0], exp, err_msg=name)


def test_flac_rice_stream_matches_independent_bit_packer():
    """The rice_layout byte-fragment windows must equal an
    independently packed MSB-first stream of '1'+u[8] units at bit
    offset 19 over the constant subframe head."""
    rng = np.random.default_rng(12)
    dg = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    seg = mm._flac_segments()
    us = [2 * (b - 128) if b >= 128 else 255 - 2 * b for b in dg]
    # independent: pack header bits then the 9-bit units
    bits = []
    for v, n in ((0x10, 8), (0x41 >> 0, 8), (0, 3)):
        bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]
    # the first 19 bits are subframe hdr (8) + method/po/param (11);
    # the two constant bytes encode 16 of them, plus 3 zero bits
    bits = bits[:19]
    for u in us:
        bits.append(1)  # quotient 0 → unary '1'
        bits += [(u >> (7 - i)) & 1 for i in range(8)]
    bits += [0] * (168 - len(bits))
    ref = bytearray(21)
    for p, bit in enumerate(bits):
        if bit:
            ref[p >> 3] |= 1 << (7 - (p & 7))
    region = bytearray(seg["rice_const"])
    for bidx, frags in seg["rice_layout"]:
        val = 0
        for i, hi, lo, blo in frags:
            width = hi - lo + 1
            val |= ((us[i] >> lo) & ((1 << width) - 1)) << blo
        region[bidx] |= val
    assert bytes(region) == bytes(ref)


def _python_flac_matrix_payloads(dg: bytes) -> dict[str, bytes]:
    """Pure-Python twin of the _flac_matrix_segments leg assembly."""
    legs = mm._flac_matrix_segments()
    vals = {}
    for i in range(16):
        vals[f"x{i}"] = dg[i] ^ 0x80
    for i in range(8):
        L, R = dg[i] - 128, dg[i + 8] - 128
        vals[f"mid{i}"] = ((L + R) >> 1) & 0xFF
        vals[f"side{i}"] = (L - R) & 0x1FF
    for i in range(1, 16):
        d = dg[i] - dg[i - 1]
        vals[f"u{i}"] = 2 * d if d >= 0 else -2 * d - 1
    out = {}
    for name, leg in legs.items():
        region = bytearray(leg["const"])
        for bidx, frags in leg["layout"]:
            acc = 0
            for key, hi, lo, blo in frags:
                width = hi - lo + 1
                acc |= ((vals[key] >> lo) & ((1 << width) - 1)) << blo
            region[bidx] |= acc
        crc = leg["base"]
        for bidx, _ in leg["layout"]:
            wb = region[bidx]
            crc ^= struct.unpack(">H", leg["tables"][bidx][2 * wb : 2 * wb + 2])[0]
        out[name] = leg["prefix"] + bytes(region) + struct.pack(">H", crc)
    return out


@pytest.mark.parametrize("text", ["hello world", "", "αβγ δε", "x" * 500])
def test_flac_matrix_payload_twins_decode_exact(text):
    """All four matrix legs decode (through decode_audio, which
    verifies the CRCs) to the exact digest samples: stereo verbatim
    and mid/side reconstruct L=bytes 0-7 / R=8-15; fixed-order-1
    reconstructs the mono sequence from deltas; constant repeats
    sample 0."""
    dg = _digest(text)
    sv = np.array([b - 128 for b in dg], dtype=np.int64)
    pl = _python_flac_matrix_payloads(dg)
    for name in ("vb2", "ms"):
        s, r = mm.decode_audio(pl[name])
        assert r == 8000 and s.shape == (8, 2), name
        np.testing.assert_array_equal(s[:, 0], sv[:8], err_msg=name)
        np.testing.assert_array_equal(s[:, 1], sv[8:], err_msg=name)
    s, _ = mm.decode_audio(pl["f1"])
    assert s.shape == (16, 1)
    np.testing.assert_array_equal(s[:, 0], sv)
    s, _ = mm.decode_audio(pl["const"])
    assert s.shape == (16, 1) and (s[:, 0] == sv[0]).all()


def test_flac_matrix_query_all_branches(spark, sf_dir):
    """multimodal_flac_decode_stats at sf0.001 equals a local
    recomputation, with every doc_id % 4 leg exercised."""
    import math

    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_flac_decode_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 4
        seen.add(m)
        dg = _digest(text)
        r = rows[doc_id]
        nf = 8 if m in (0, 1) else 16
        nch = 2 if m in (0, 1) else 1
        assert (r["sample_rate"], r["n_frames"], r["n_channels"]) == (
            8000, nf, nch,
        ), (doc_id, m)
        assert r["duration_s"] == nf / 8000
        if m == 3:
            exp = float(abs(dg[0] - 128))
        else:
            exp = math.sqrt(sum((b - 128) ** 2 for b in dg) / 16)
        assert r["rms"] == exp, (doc_id, m)
    assert seen == {0, 1, 2, 3}


def test_apng_animation_stats_query(spark, sf_dir):
    """multimodal_apng_animation_stats at sf0.001: the APNG twin of
    the GIF compositor query — identical expected canvases (frame 0
    digest bytes 0..7; frame 1 the sub-rect composite), through the
    real fcTL/fdAT parse + mini-PNG synthesis + canvas compositing."""
    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
    rows = QUERIES["multimodal_apng_animation_stats"](spark, sf_dir).collect()
    assert len(rows) == 2 * len(docs)
    for r in rows:
        dg = _digest(docs[r["doc_id"]])
        assert (r["height"], r["width"], r["channels"]) == (2, 4, 3)
        if r["frame_idx"] == 0:
            exp = sum(dg[:8]) / 8
        else:
            exp = (dg[0] + dg[1] + dg[4] + dg[5] + sum(dg[8:12])) / 8
        assert r["mean_byte"] == exp, (r["doc_id"], r["frame_idx"])
