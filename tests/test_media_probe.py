"""Structural media probing (probe.py): independent MP4/ISO-BMFF and
Matroska/WebM fixture builders (written from the specs, not from the
parser) must probe to exactly the declared metadata — including
64-bit box sizes, version-1 full boxes, multi-track layouts,
unknown-size EBML segments, and 8-byte float durations — and
structural damage must classify per the decode error contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import media_probe
from flink_hiveorc_spark.functions.probe import probe_media


def _box(fourcc, body, large=False):
    if large:
        return (
            struct.pack(">I", 1) + fourcc + struct.pack(">Q", len(body) + 16)
            + body
        )
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _mvhd(dur, scale=1000, v1=False):
    if v1:
        body = b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
        body += struct.pack(">I", scale) + struct.pack(">Q", dur)
    else:
        body = b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        body += struct.pack(">I", scale) + struct.pack(">I", dur)
    body += struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
    body += b"\x00" * 10 + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2)
    return _box(b"mvhd", body)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _trak(handler, w=0, h=0, codec=b"avc1", tkhd_v1=False):
    if tkhd_v1:
        tk = b"\x01\x00\x00\x07" + struct.pack(">QQ", 0, 0)
        tk += struct.pack(">I", 1) + b"\x00" * 4 + struct.pack(">Q", 0)
    else:
        tk = b"\x00\x00\x00\x07" + struct.pack(">II", 0, 0)
        tk += struct.pack(">I", 1) + b"\x00" * 4 + struct.pack(">I", 0)
    tk += b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
    tk += struct.pack(">II", w << 16, h << 16)
    mdhd = _box(
        b"mdhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 1000, 0)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 12 + b"\x00",
    )
    entry = struct.pack(">I", 16) + codec + b"\x00" * 6 + struct.pack(">H", 1)
    stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
    minf = _box(b"minf", _box(b"stbl", stsd))
    return _box(b"trak", _box(b"tkhd", tk) + _box(b"mdia", mdhd + hdlr + minf))


def _mp4(traks, dur=4660, scale=1000, v1=False, brand=b"isom", large_moov=False):
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    moov = _box(b"moov", _mvhd(dur, scale, v1) + b"".join(traks),
                large=large_moov)
    return ftyp + moov


def _el(eid, body):
    if len(body) <= 126:
        return eid + bytes([0x80 | len(body)]) + body
    return eid + bytes([0x40 | (len(body) >> 8), len(body) & 0xFF]) + body


def _mkv(w, h, dur_ticks=2000.0, f64=False, tscale=1_000_000,
         unknown_size_segment=False):
    ebml = _el(b"\x1a\x45\xdf\xa3", _el(b"\x42\x82", b"matroska"))
    dur = struct.pack(">d" if f64 else ">f", dur_ticks)
    info = _el(
        b"\x15\x49\xa9\x66",
        _el(b"\x2a\xd7\xb1", tscale.to_bytes(4, "big")) + _el(b"\x44\x89", dur),
    )
    vtrack = _el(
        b"\xae",
        _el(b"\x83", b"\x01") + _el(b"\x86", b"V_AV1")
        + _el(b"\xe0", _el(b"\xb0", struct.pack(">H", w))
              + _el(b"\xba", struct.pack(">H", h))),
    )
    atrack = _el(b"\xae", _el(b"\x83", b"\x02") + _el(b"\x86", b"A_VORBIS"))
    body = info + _el(b"\x16\x54\xae\x6b", vtrack + atrack)
    if unknown_size_segment:
        return ebml + b"\x18\x53\x80\x67" + b"\xff" + body
    return ebml + _el(b"\x18\x53\x80\x67", body)


def test_mp4_basic_and_v1_and_large():
    r = probe_media(_mp4([_trak(b"vide", 320, 240)]))
    assert r == {
        "container": "mp4", "brand": "isom", "duration_s": 4.66,
        "width": 320, "height": 240, "n_video": 1, "n_audio": 0,
        "codecs": "avc1",
    }
    # version-1 boxes and a 64-bit moov size
    r = probe_media(
        _mp4([_trak(b"vide", 1920, 1080, tkhd_v1=True)],
             dur=90000, scale=600, v1=True, large_moov=True)
    )
    assert r["duration_s"] == 150.0 and (r["width"], r["height"]) == (1920, 1080)


def test_mp4_multitrack_codecs_and_dims():
    traks = [
        _trak(b"vide", 640, 480, codec=b"hvc1"),
        _trak(b"vide", 1280, 720, codec=b"av01"),
        _trak(b"soun", codec=b"mp4a"),
    ]
    r = probe_media(_mp4(traks))
    assert r["n_video"] == 2 and r["n_audio"] == 1
    assert (r["width"], r["height"]) == (1280, 720)  # max over video traks
    assert r["codecs"] == "av01,hvc1,mp4a"


def test_matroska_variants():
    r = probe_media(_mkv(3840, 2160))
    assert r == {
        "container": "matroska", "brand": "matroska", "duration_s": 2.0,
        "width": 3840, "height": 2160, "n_video": 1, "n_audio": 1,
        "codecs": "A_VORBIS,V_AV1",
    }
    # 8-byte float duration, custom timescale, unknown-size segment
    r = probe_media(
        _mkv(100, 50, dur_ticks=1500.0, f64=True, tscale=2_000_000,
             unknown_size_segment=True)
    )
    assert r["duration_s"] == 3.0
    assert (r["width"], r["height"]) == (100, 50)


def test_error_contract():
    # AVI routes to the structural probe since r12: a bare RIFF shell
    # with no header list is malformed, not unrecognized
    with pytest.raises(ValueError, match="no hdrl"):
        probe_media(b"RIFF\x00\x00\x00\x00AVI LIST")
    with pytest.raises(NotImplementedError, match="unrecognized media"):
        probe_media(b"FORM\x00\x00\x00\x00AIFF")
    good = _mp4([_trak(b"vide", 8, 8)])
    with pytest.raises(ValueError, match="overflows|truncated"):
        probe_media(good[:-10])
    bad = bytearray(good)
    bad[0:4] = struct.pack(">I", 10 ** 6)  # ftyp size overflow
    with pytest.raises(ValueError, match="overflows"):
        probe_media(bytes(bad))
    # no moov
    with pytest.raises(ValueError, match="no moov"):
        probe_media(_box(b"ftyp", b"isom" + b"\x00" * 8))
    # zero timescale
    with pytest.raises(ValueError, match="timescale is zero"):
        probe_media(_mp4([_trak(b"vide", 8, 8)], scale=0))
    m = bytearray(_mkv(8, 8))
    m[-1] ^= 0xFF  # corrupt the tail element size region
    try:
        probe_media(bytes(m))
    except (ValueError, NotImplementedError):
        pass


def test_fuzz_byte_flips_keep_error_contract():
    rng = np.random.default_rng(4)
    for payload in (_mp4([_trak(b"vide", 16, 16)]), _mkv(16, 16)):
        for _ in range(120):
            bad = bytearray(payload)
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
            try:
                probe_media(bytes(bad))
            except (ValueError, NotImplementedError):
                pass  # classified — never a raw struct/index error


def test_media_probe_dataframe_and_quarantine(spark):
    rows = [
        (1, _mp4([_trak(b"vide", 12, 34)])),
        (2, _mkv(56, 78)),
        (3, b"\x00garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in media_probe(df, quarantine=True).collect()}
    assert out[1]["container"] == "mp4" and out[1]["width"] == 12
    assert out[2]["container"] == "matroska" and out[2]["height"] == 78
    assert out[3]["container"] is None
    assert out[3]["error"].startswith("unsupported:")


def _ogg_page(htype, granule, serial, seq, packets):
    from flink_hiveorc_spark.functions.probe import ogg_crc

    lacing = b""
    body = b""
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing += b"\xff"
            n -= 255
        lacing += bytes([n])
        body += p
    hdr = b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
    hdr += struct.pack("<II", serial, seq) + b"\x00" * 4
    hdr += bytes([len(lacing)]) + lacing
    page = bytearray(hdr + body)
    page[22:26] = struct.pack("<I", ogg_crc(bytes(page)))
    return bytes(page)


def _opus_head(preskip=312):
    return (
        b"OpusHead" + bytes([1, 1]) + struct.pack("<H", preskip)
        + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00"
    )


def test_ogg_opus_and_vorbis():
    p = _ogg_page(2, 0, 9, 0, [_opus_head()]) + _ogg_page(
        4, 312 + 96000, 9, 1, [b"\x00" * 8]
    )
    r = probe_media(p)
    assert r == {
        "container": "ogg", "brand": "opus", "duration_s": 2.0,
        "width": 0, "height": 0, "n_video": 0, "n_audio": 1,
        "codecs": "opus",
    }
    vid = (
        b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
        + struct.pack("<I", 44100) + struct.pack("<iii", 0, 128000, 0)
        + bytes([0xB8, 1])
    )
    p = _ogg_page(2, 0, 7, 0, [vid]) + _ogg_page(4, 44100 * 3, 7, 1, [b"x"])
    r = probe_media(p)
    assert r["codecs"] == "vorbis" and r["duration_s"] == 3.0
    # CRC damage must be caught
    bad = bytearray(p)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC|truncated|lacing"):
        probe_media(bytes(bad))


def _mp3_bytes(pad, n_frames=3, id3v1=False):
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes(
        [(pad >> 21) & 0x7F, (pad >> 14) & 0x7F, (pad >> 7) & 0x7F, pad & 0x7F]
    ) + b"\x00" * pad
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * 413
    out = id3 + frame * n_frames
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return out


def test_mp3_frame_walk():
    for pad in (0, 17, 1000):
        r = probe_media(_mp3_bytes(pad))
        assert r["container"] == "mp3"
        assert r["duration_s"] == pytest.approx(3 * 1152 / 44100), pad
    r = probe_media(_mp3_bytes(5, n_frames=7, id3v1=True))
    assert r["duration_s"] == pytest.approx(7 * 1152 / 44100)
    # MPEG2 layer III: half the samples per frame (index 9 = 80 kbps)
    f2 = bytes([0xFF, 0xF3, 0x90, 0x00])
    f2 += b"\x00" * (72 * 80000 // 22050 - 4)
    r = probe_media(f2 * 2)
    assert r["duration_s"] == pytest.approx(2 * 576 / 22050)
    with pytest.raises(ValueError, match="bitrate index 15"):
        probe_media(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 40)
    with pytest.raises(NotImplementedError, match="free-format"):
        probe_media(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 40)
    with pytest.raises(ValueError, match="lost MP3 frame sync"):
        probe_media(_mp3_bytes(0) + b"\x00\x11garbagegarbagegarbage")


def test_ogg_mp3_fuzz_byte_flips():
    rng = np.random.default_rng(9)
    ogg = _ogg_page(2, 0, 3, 0, [_opus_head()]) + _ogg_page(
        4, 312 + 480, 3, 1, [b"\x01" * 4]
    )
    for payload in (ogg, _mp3_bytes(9)):
        for _ in range(120):
            bad = bytearray(payload)
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
            try:
                probe_media(bytes(bad))
            except (ValueError, NotImplementedError):
                pass


def test_media_probe_query_all_branches(spark, sf_dir):
    """multimodal_media_probe_stats at sf0.001 equals a local
    recomputation; all seven doc_id % 7 container legs exercised."""
    import hashlib

    import pyarrow.parquet as pq

    from flink_hiveorc_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs = tbl.to_pydict()
    rows = {
        r["doc_id"]: r
        for r in QUERIES["multimodal_media_probe_stats"](spark, sf_dir).collect()
    }
    assert len(rows) == len(docs["doc_id"])
    seen = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        m = doc_id % 7
        seen.add(m)
        dg = hashlib.md5(text.encode()).digest()
        r = rows[doc_id]
        if m == 0:
            assert (r["container"], r["brand"], r["codecs"]) == (
                "mp4", "isom", "avc1",
            )
            assert r["duration_s"] == (dg[0] * 256 + dg[1]) / 1000
            assert (r["width"], r["height"]) == (dg[2], dg[3])
            assert (r["n_video"], r["n_audio"]) == (1, 0)
        elif m == 1:
            assert (r["container"], r["codecs"]) == ("webm", "A_OPUS,V_VP9")
            assert r["duration_s"] == 2.0
            assert r["width"] == dg[4] * 256 + dg[5]
            assert r["height"] == dg[6] * 256 + dg[7]
            assert (r["n_video"], r["n_audio"]) == (1, 1)
        elif m == 2:
            assert (r["container"], r["brand"]) == ("ogg", "opus")
            X = dg[0] * 65536 + dg[1] * 256 + dg[2]
            assert r["duration_s"] == X / 48000
            assert (r["n_video"], r["n_audio"]) == (0, 1)
        elif m == 3:
            assert (r["container"], r["codecs"]) == ("mp3", "mp3")
            assert r["duration_s"] == 3456 / 44100
            assert (r["n_video"], r["n_audio"]) == (0, 1)
        elif m == 4:
            assert (r["container"], r["brand"]) == ("adts", "aac")
            want = ((dg[4] % 4) + (dg[5] % 4) + 2) * 1024 / 16000
            assert r["duration_s"] == pytest.approx(want)
            assert (r["n_video"], r["n_audio"]) == (0, 1)
        elif m == 5:
            assert (r["container"], r["brand"]) == ("ogg", "flac")
            X = dg[0] * 65536 + dg[1] * 256 + dg[2]
            assert r["duration_s"] == X / 32000
            assert (r["n_video"], r["n_audio"]) == (0, 1)
        else:
            assert (r["container"], r["codecs"]) == ("avi", "rgb")
            assert r["duration_s"] == (dg[0] * 256 + dg[1]) / 1000
            assert (r["width"], r["height"]) == (dg[2], dg[3])
            assert (r["n_video"], r["n_audio"]) == (1, 0)
    assert seen == {0, 1, 2, 3, 4, 5, 6}


def test_mp3_mixed_rate_duration_per_frame():
    # r12: duration accumulates per-frame samples/rate, so a version-
    # switching VBR stream (MPEG1@44100 then MPEG2@22050) gets the exact
    # sum rather than a first-frame-rate division.
    f1 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * (144 * 128000 // 44100 - 4)
    f2 = bytes([0xFF, 0xF3, 0x90, 0x00]) + b"\xbb" * (72 * 80000 // 22050 - 4)
    r = probe_media(f1 + f2)
    assert r["duration_s"] == pytest.approx(1152 / 44100 + 576 / 22050)


# ------------------------------------------------------- r12 new branches


def _flac_mapping_packet(rate=32000):
    # Ogg FLAC mapping 1.0 BOS packet: 0x7F FLAC maj min nheaders +
    # verbatim fLaC + STREAMINFO(34) with the rate at bit offset 80
    si = bytearray(34)
    si[10] = (rate >> 12) & 0xFF
    si[11] = (rate >> 4) & 0xFF
    si[12] = (rate & 0xF) << 4
    return (
        b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0)
        + b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    )


def test_ogg_flac_mapping():
    p = _ogg_page(2, 0, 11, 0, [_flac_mapping_packet(32000)])
    p += _ogg_page(4, 32000 * 5, 11, 1, [b"\xffdata"])
    r = probe_media(p)
    assert r["codecs"] == "flac" and r["brand"] == "flac"
    assert r["duration_s"] == 5.0
    # structural damage stays classified
    with pytest.raises(ValueError, match="fLaC signature"):
        probe_media(_ogg_page(2, 0, 11, 0,
                              [_flac_mapping_packet()[:9] + b"XXXX" * 12]))


def _adts_frame(sr_idx=8, n_blocks=1, body_len=20, no_crc=True):
    flen = 7 + body_len
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF0 | (1 if no_crc else 0)
    b[2] = (1 << 6) | (sr_idx << 2)
    b[3] = (1 << 6) | ((flen >> 11) & 3)
    b[4] = (flen >> 3) & 0xFF
    b[5] = ((flen & 7) << 5) | 0x1F
    b[6] = 0xFC | (n_blocks - 1)
    return bytes(b) + b"\xaa" * body_len


def test_adts_aac_frame_walk():
    # sr_idx 8 = 16000 Hz; 3 frames of 1 block each
    r = probe_media(_adts_frame() * 3)
    assert r["container"] == "adts" and r["codecs"] == "aac"
    assert r["duration_s"] == pytest.approx(3 * 1024 / 16000)
    # multi-block frame and mixed rates accumulate per frame
    r = probe_media(_adts_frame(sr_idx=8, n_blocks=2) + _adts_frame(sr_idx=4))
    assert r["duration_s"] == pytest.approx(2 * 1024 / 16000 + 1024 / 44100)
    # ID3v1 tail tolerated
    r = probe_media(_adts_frame() + b"TAG" + b"\x00" * 125)
    assert r["duration_s"] == pytest.approx(1024 / 16000)
    with pytest.raises(ValueError, match="reserved ADTS sampling"):
        probe_media(_adts_frame(sr_idx=14))
    with pytest.raises(ValueError, match="overflows"):
        probe_media(_adts_frame()[:-4])
    # MP3 sync (nonzero layer bits) must NOT route to ADTS
    mp3 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * (144 * 128000 // 44100 - 4)
    assert probe_media(mp3)["container"] == "mp3"


def test_avi_probe_shares_riff_walker():
    from test_avi_decode import _BI_RGB, _avi_bytes, _rgb_frame

    rng = np.random.default_rng(77)
    frames = [
        _rgb_frame(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8), 24, False)
        for _ in range(3)
    ]
    payload = _avi_bytes(frames, 4, 4, 24, _BI_RGB)
    r = probe_media(payload)
    assert r["container"] == "avi" and r["n_video"] == 1
    assert r["width"] == 4 and r["height"] == 4
    assert r["duration_s"] > 0
    with pytest.raises(ValueError, match="truncated RIFF"):
        probe_media(payload[: len(payload) // 2])


def test_svg_probe_dimensions_and_errors():
    from flink_hiveorc_spark.functions.probe import probe_media

    got = probe_media(
        b'<?xml version="1.0"?>\n<svg xmlns="http://www.w3.org/2000/svg"'
        b' version="1.1" width="120px" height="80"><rect/></svg>'
    )
    assert got["container"] == "svg" and got["brand"] == "1.1"
    assert (got["width"], got["height"]) == (120, 80)
    assert got["n_video"] == 0 and got["duration_s"] is None
    # viewBox fallback, comma-separated, fractional
    g2 = probe_media(b'<svg viewBox="0,0,300.5 200"/>')
    assert (g2["width"], g2["height"]) == (300, 200)
    # percentage width has no absolute meaning; viewBox fills in
    g3 = probe_media(b'<svg width="100%" viewBox="0 0 64 32"/>')
    assert (g3["width"], g3["height"]) == (64, 32)
    import pytest

    with pytest.raises(ValueError, match="malformed SVG"):
        probe_media(b'<?xml version="1.0"?><svg broken')
    with pytest.raises(ValueError, match="not <svg>"):
        probe_media(b'<?xml version="1.0"?><x><svg/></x>')
    # an XML doc with no <svg> anywhere stays unsupported, not svg
    with pytest.raises(NotImplementedError, match="unrecognized"):
        probe_media(b'<?xml version="1.0"?><html><body/></html>')
