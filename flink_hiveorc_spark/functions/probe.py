"""Structural media probing — container metadata WITHOUT decoding.

A 100 TB video corpus needs routing decisions (keep/drop, which GPU
decode pool, dedup key, budget estimates) long before any frame is
decoded: duration, dimensions, codec, and track layout live in the
container STRUCTURE, which is pure length-prefixed parsing — no
entropy coding, no codec library. This module probes the two
container families whose PAYLOAD codecs are outside the native decode
envelope (H.264/H.265/VP9/AV1/AAC/Opus), so the pipeline can still
see and reason about those assets:

- ISO BMFF (MP4/MOV/M4A — ISO/IEC 14496-12): box walk with 32/64-bit
  sizes, ftyp brand, mvhd movie duration/timescale, per-trak tkhd
  16.16 dimensions, mdia/hdlr handler classification (vide/soun),
  stbl/stsd sample-entry fourccs;
- Matroska/WebM (EBML): vint ID/size parsing, EBML DocType, Segment →
  Info (TimestampScale + float Duration) and Tracks → TrackEntry
  (TrackType, CodecID, Video PixelWidth/PixelHeight), unknown-size
  segment handling.

Error contract matches the decoders: ValueError for structural damage
(truncated/overflowing boxes, bad vints, missing mandatory boxes),
NotImplementedError for unrecognized containers. `media_probe` is the
distributed mapInPandas featurizer twin of image/audio/video_stats
with the same quarantine channel; `multimodal_media_probe_stats` puts
both parsers under the external oracle with digest-derived durations
and dimensions.
"""

from __future__ import annotations

import struct

__all__ = ["probe_media"]

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_end) at one nesting level."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to end of file
        if size < body - pos or pos + size > end:
            raise ValueError(f"MP4 box {fourcc!r} overflows its container")
        yield fourcc, body, pos + size
        pos += size


def _mp4_fullbox(data: bytes, pos: int, end: int) -> tuple[int, int]:
    if pos + 4 > end:
        raise ValueError("truncated MP4 full box")
    return data[pos], pos + 4


def _probe_mp4(data: bytes) -> dict:
    brand = None
    duration_s = None
    width = height = 0
    n_video = n_audio = 0
    codecs: list[str] = []

    def walk_trak(body: bytes, pos: int, end: int) -> None:
        nonlocal width, height, n_video, n_audio
        handler = None
        tk_w = tk_h = 0
        stsd_formats: list[str] = []
        for fc, b, e in _mp4_boxes(body, pos, end):
            if fc == b"tkhd":
                ver, p = _mp4_fullbox(body, b, e)
                skip = (8 * 3 + 4 * 2) if ver == 1 else (4 * 5)
                p += skip + 8 + 2 + 2 + 2 + 2 + 36
                if p + 8 > e:
                    raise ValueError("truncated tkhd box")
                tk_w = struct.unpack_from(">I", body, p)[0] >> 16
                tk_h = struct.unpack_from(">I", body, p + 4)[0] >> 16
            elif fc == b"mdia":
                for fc2, b2, e2 in _mp4_boxes(body, b, e):
                    if fc2 == b"hdlr":
                        _, p2 = _mp4_fullbox(body, b2, e2)
                        if p2 + 8 > e2:
                            raise ValueError("truncated hdlr box")
                        handler = body[p2 + 4 : p2 + 8]
                    elif fc2 == b"minf":
                        for fc3, b3, e3 in _mp4_boxes(body, b2, e2):
                            if fc3 != b"stbl":
                                continue
                            for fc4, b4, e4 in _mp4_boxes(body, b3, e3):
                                if fc4 != b"stsd":
                                    continue
                                _, p4 = _mp4_fullbox(body, b4, e4)
                                if p4 + 4 > e4:
                                    raise ValueError("truncated stsd box")
                                n = struct.unpack_from(">I", body, p4)[0]
                                q = p4 + 4
                                for _ in range(n):
                                    if q + 8 > e4:
                                        raise ValueError(
                                            "truncated stsd sample entry"
                                        )
                                    esz = struct.unpack_from(">I", body, q)[0]
                                    if esz < 8 or q + esz > e4:
                                        raise ValueError(
                                            "stsd entry overflows stsd"
                                        )
                                    stsd_formats.append(
                                        body[q + 4 : q + 8]
                                        .decode("latin1")
                                        .strip()
                                    )
                                    q += esz
        if handler == b"vide":
            n_video += 1
            width = max(width, tk_w)
            height = max(height, tk_h)
        elif handler == b"soun":
            n_audio += 1
        codecs.extend(stsd_formats)

    saw_moov = False
    for fc, b, e in _mp4_boxes(data, 0, len(data)):
        if fc == b"ftyp":
            if e - b < 4:
                raise ValueError("truncated ftyp box")
            brand = data[b : b + 4].decode("latin1").strip()
        elif fc == b"moov":
            saw_moov = True
            for fc2, b2, e2 in _mp4_boxes(data, b, e):
                if fc2 == b"mvhd":
                    ver, p = _mp4_fullbox(data, b2, e2)
                    if ver == 1:
                        if p + 28 > e2:
                            raise ValueError("truncated mvhd box")
                        scale = struct.unpack_from(">I", data, p + 16)[0]
                        dur = struct.unpack_from(">Q", data, p + 20)[0]
                    else:
                        if p + 16 > e2:
                            raise ValueError("truncated mvhd box")
                        scale = struct.unpack_from(">I", data, p + 8)[0]
                        dur = struct.unpack_from(">I", data, p + 12)[0]
                    if scale == 0:
                        raise ValueError("mvhd timescale is zero")
                    duration_s = dur / scale
                elif fc2 == b"trak":
                    walk_trak(data, b2, e2)
    if not saw_moov:
        raise ValueError("MP4 has no moov box")
    if duration_s is None:
        raise ValueError("MP4 moov has no mvhd box")
    return {
        "container": "mp4",
        "brand": brand,
        "duration_s": duration_s,
        "width": width,
        "height": height,
        "n_video": n_video,
        "n_audio": n_audio,
        "codecs": ",".join(sorted(codecs)),
    }


def _ebml_vint(data: bytes, pos: int, end: int, keep_marker: bool):
    """EBML variable-length integer at pos → (value, new_pos)."""
    if pos >= end:
        raise ValueError("truncated EBML vint")
    first = data[pos]
    if first == 0:
        raise ValueError("invalid EBML vint leading byte 0")
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > end:
        raise ValueError("truncated EBML vint body")
    v = first if keep_marker else (first & (mask - 1))
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length, length


def _ebml_elements(data: bytes, pos: int, end: int):
    while pos < end:
        eid, pos, _ = _ebml_vint(data, pos, end, keep_marker=True)
        size, pos, slen = _ebml_vint(data, pos, end, keep_marker=False)
        if size == (1 << (7 * slen)) - 1:  # unknown size: to end
            size = end - pos
        if pos + size > end:
            raise ValueError(f"EBML element {eid:#x} overflows its parent")
        yield eid, pos, pos + size
        pos += size


def _ebml_uint(data: bytes, b: int, e: int) -> int:
    if e - b > 8:
        raise ValueError("oversized EBML uint")
    v = 0
    for i in range(b, e):
        v = (v << 8) | data[i]
    return v


def _probe_matroska(data: bytes) -> dict:
    doctype = None
    tscale = 1_000_000
    duration_ticks = None
    width = height = 0
    n_video = n_audio = 0
    codecs: list[str] = []
    for eid, b, e in _ebml_elements(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header
            for eid2, b2, e2 in _ebml_elements(data, b, e):
                if eid2 == 0x4282:  # DocType
                    doctype = data[b2:e2].decode("latin1")
        elif eid == 0x18538067:  # Segment
            for eid2, b2, e2 in _ebml_elements(data, b, e):
                if eid2 == 0x1549A966:  # Info
                    for eid3, b3, e3 in _ebml_elements(data, b2, e2):
                        if eid3 == 0x2AD7B1:
                            tscale = _ebml_uint(data, b3, e3)
                        elif eid3 == 0x4489:  # Duration (float)
                            n = e3 - b3
                            if n == 4:
                                duration_ticks = struct.unpack_from(
                                    ">f", data, b3
                                )[0]
                            elif n == 8:
                                duration_ticks = struct.unpack_from(
                                    ">d", data, b3
                                )[0]
                            else:
                                raise ValueError(
                                    f"Matroska Duration of {n} bytes"
                                )
                elif eid2 == 0x1654AE6B:  # Tracks
                    for eid3, b3, e3 in _ebml_elements(data, b2, e2):
                        if eid3 != 0xAE:  # TrackEntry
                            continue
                        ttype = 0
                        for eid4, b4, e4 in _ebml_elements(data, b3, e3):
                            if eid4 == 0x83:
                                ttype = _ebml_uint(data, b4, e4)
                            elif eid4 == 0x86:
                                codecs.append(
                                    data[b4:e4].decode("latin1")
                                )
                            elif eid4 == 0xE0:  # Video
                                for eid5, b5, e5 in _ebml_elements(
                                    data, b4, e4
                                ):
                                    if eid5 == 0xB0:
                                        width = max(
                                            width, _ebml_uint(data, b5, e5)
                                        )
                                    elif eid5 == 0xBA:
                                        height = max(
                                            height, _ebml_uint(data, b5, e5)
                                        )
                        if ttype == 1:
                            n_video += 1
                        elif ttype == 2:
                            n_audio += 1
    if doctype is None:
        raise ValueError("Matroska stream has no EBML DocType")
    if tscale == 0:
        raise ValueError("Matroska TimestampScale is zero")
    duration_s = (
        duration_ticks * tscale / 1e9 if duration_ticks is not None else 0.0
    )
    return {
        "container": doctype,
        "brand": doctype,
        "duration_s": duration_s,
        "width": width,
        "height": height,
        "n_video": n_video,
        "n_audio": n_audio,
        "codecs": ",".join(sorted(codecs)),
    }


def probe_media(payload: bytes) -> dict:
    """Structural container probe → {container, brand, duration_s,
    width, height, n_video, n_audio, codecs}. Routes ISO BMFF (ftyp),
    Matroska/WebM (EBML magic), Ogg (OggS capture pattern — Opus,
    Vorbis, and FLAC mapping headers), AVI (RIFF walk shared with the
    decoder), ADTS AAC (layer-00 sync, checked before MP3 whose
    layer bits are never 00), and MP3 (ID3v2 prefix or raw frame
    sync). See module docstring for field sources and the error
    contract."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return _probe_mp4(payload)
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return _probe_matroska(payload)
    if payload[:4] == b"OggS":
        return _probe_ogg(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return _probe_avi(payload)
    if (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xF6) == 0xF0
    ):
        # 0xFFF sync with layer bits 00: ADTS AAC (an MP3 frame sync
        # always carries nonzero layer bits)
        return _probe_adts(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return _probe_mp3(payload)
    head = payload[:256].lstrip(b"\xef\xbb\xbf \t\r\n")
    if head.startswith(b"<svg") or (
        head.startswith(b"<?xml") and b"<svg" in payload[:2048]
    ):
        return _probe_svg(payload)
    raise NotImplementedError(
        "unrecognized media container (structural probing covers ISO BMFF, "
        "Matroska/WebM, Ogg Opus/Vorbis/FLAC, AVI, ADTS AAC, and MP3 "
        "frame streams)"
    )


def _svg_len(value: str | None) -> int | None:
    """Leading number of an SVG length ('120', '120px', '12.5em');
    percentages are viewport-relative and carry no absolute pixel
    meaning → None."""
    if not value or value.strip().endswith("%"):
        return None
    import re as _re

    m = _re.match(r"\s*([0-9]+(?:\.[0-9]+)?)", value)
    return int(float(m.group(1))) if m else None


def _probe_svg(data: bytes) -> dict:
    """SVG structural probe: dimensions from width/height attributes
    with a viewBox fallback (the common crawl-asset shapes). SVG is
    vector TEXT — there is nothing to decode without a renderer, so
    like the codec containers it probes structurally and routes.
    stdlib ElementTree; parse failures are malformed (ValueError);
    external entities are refused by the stdlib parser."""
    from xml.etree import ElementTree

    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed SVG XML: {e}") from e
    if root.tag.rsplit("}", 1)[-1] != "svg":
        raise ValueError("XML root element is not <svg>")
    w = _svg_len(root.get("width"))
    h = _svg_len(root.get("height"))
    if (w is None or h is None) and root.get("viewBox"):
        vb = root.get("viewBox").replace(",", " ").split()
        if len(vb) == 4:
            try:
                w = w if w is not None else int(float(vb[2]))
                h = h if h is not None else int(float(vb[3]))
            except ValueError as e:
                raise ValueError(f"malformed SVG viewBox: {e}") from e
    return {
        "container": "svg",
        "brand": root.get("version") or "",
        "duration_s": None,
        "width": w,
        "height": h,
        "n_video": 0,
        "n_audio": 0,
        "codecs": [],
    }


def riff_chunks(data: bytes, pos: int, end: int):
    """Iterate RIFF chunks as (fourcc, body_start, body_size); LISTs
    yield their list-type as fourcc with the body EXCLUDING it, so
    callers can recurse. Sizes are validated against the buffer — a
    declared size past EOF is malformed, not silently short. Shared
    by the AVI decoder (multimodal._decode_avi) and the AVI probe."""
    import struct as _s

    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        size = _s.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated RIFF chunk {fourcc.decode('latin1')!r}"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)  # chunks pad to even offsets


def _probe_avi(data: bytes) -> dict:
    """AVI structural probe: RIFF('AVI ') → LIST hdrl → avih (canvas
    dims, total frames, frame interval) + per-stream LIST strl/strh
    (type, handler fourcc, scale/rate/length). Duration prefers the
    first video stream's dwLength·dwScale/dwRate, falling back to
    avih dwTotalFrames·dwMicroSecPerFrame. Codec string joins each
    stream's handler fourcc (or 'rgb' for unset video handlers —
    BI_RGB DIB streams commonly leave it zero)."""
    import struct as _s

    width = height = 0
    n_video = n_audio = 0
    codecs: list[str] = []
    duration = None
    avih_duration = None
    saw_hdrl = False
    for fourcc, body, size in riff_chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[body : body + 4] != b"hdrl":
            continue
        saw_hdrl = True
        for f2, b2, s2 in riff_chunks(data, body + 4, body + size):
            if f2 == b"avih" and s2 >= 40:
                (usec_pf,) = _s.unpack_from("<I", data, b2)
                (total_frames,) = _s.unpack_from("<I", data, b2 + 16)
                width, height = _s.unpack_from("<II", data, b2 + 32)
                if usec_pf and total_frames:
                    avih_duration = total_frames * usec_pf / 1e6
            elif f2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                for f3, b3, s3 in riff_chunks(data, b2 + 4, b2 + s2):
                    if f3 != b"strh" or s3 < 36:
                        continue
                    ftype = data[b3 : b3 + 4]
                    handler = data[b3 + 4 : b3 + 8]
                    scale, rate = _s.unpack_from("<II", data, b3 + 20)
                    (length,) = _s.unpack_from("<I", data, b3 + 32)
                    name = handler.strip(b"\x00 ").decode(
                        "latin1"
                    ).lower()
                    if ftype == b"vids":
                        n_video += 1
                        codecs.append(name or "rgb")
                        if (
                            duration is None
                            and scale and rate and length
                        ):
                            duration = length * scale / rate
                    elif ftype == b"auds":
                        n_audio += 1
                        codecs.append(name or "pcm")
    if not saw_hdrl:
        raise ValueError("AVI has no hdrl header list")
    if n_video + n_audio == 0:
        raise ValueError("AVI declares no streams")
    if duration is None:
        duration = avih_duration
    if duration is None:
        raise ValueError("AVI has no usable duration source")
    return {
        "container": "avi",
        "brand": "avi",
        "duration_s": duration,
        "width": int(width),
        "height": int(height),
        "n_video": n_video,
        "n_audio": n_audio,
        "codecs": ",".join(codecs),
    }


_ADTS_RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350]


def _probe_adts(data: bytes, pos: int = 0) -> dict:
    """ADTS AAC frame walk (ISO 14496-3 §1.A.2): 0xFFF sync with
    layer bits 00, 7/9-byte headers (protection_absent toggles the
    CRC), 13-bit frame length, 1024 samples per raw data block,
    per-frame rate accumulation (mixed-rate streams sum exactly, as
    in the MP3 walk). ID3v1 tails tolerated."""
    duration = 0.0
    n_frames = 0
    while pos < len(data):
        if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
            break  # ID3v1 tail
        if pos + 7 > len(data):
            raise ValueError("truncated ADTS frame header")
        b = data[pos : pos + 7]
        if b[0] != 0xFF or (b[1] & 0xF6) != 0xF0:
            raise ValueError(f"lost ADTS frame sync at offset {pos}")
        sr_idx = (b[2] >> 2) & 0x0F
        if sr_idx >= len(_ADTS_RATES):
            raise ValueError(f"reserved ADTS sampling index {sr_idx}")
        frame_len = ((b[3] & 0x03) << 11) | (b[4] << 3) | (b[5] >> 5)
        min_len = 7 if (b[1] & 0x01) else 9  # CRC adds 2 bytes
        if frame_len < min_len:
            raise ValueError(f"ADTS frame length {frame_len} too short")
        if pos + frame_len > len(data):
            raise ValueError("ADTS frame overflows the file")
        n_blocks = (b[6] & 0x03) + 1
        duration += n_blocks * 1024 / _ADTS_RATES[sr_idx]
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("ADTS stream has no audio frames")
    return {
        "container": "adts",
        "brand": "aac",
        "duration_s": duration,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 1,
        "codecs": "aac",
    }


# ------------------------------------------------------------------- Ogg

_OGG_CRC_TBL = []


def _ogg_crc_table():
    if not _OGG_CRC_TBL:
        for b in range(256):
            r = b << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                    else (r << 1) & 0xFFFFFFFF
            _OGG_CRC_TBL.append(r)
    return _OGG_CRC_TBL


def ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, unreflected, no
    final xor (RFC 3533 §6)."""
    tbl = _ogg_crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tbl[((r >> 24) & 0xFF) ^ b]
    return r


def _probe_ogg(data: bytes) -> dict:
    """Ogg page walk (RFC 3533): CRC-verified pages; codec and
    parameters from the BOS packet (OpusHead / Vorbis identification),
    duration from the last page's granule position (Opus: 48 kHz
    ticks minus pre-skip; Vorbis/FLAC: sample ticks at the declared
    rate)."""
    import struct as _s

    pos = 0
    codec = None
    rate = preskip = 0
    last_granule = 0
    n_pages = 0
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg page capture pattern at {pos}")
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg stream structure version")
        granule = _s.unpack_from("<q", data, pos + 6)[0]
        crc_stored = _s.unpack_from("<I", data, pos + 22)[0]
        nsegs = data[pos + 26]
        lacing = data[pos + 27 : pos + 27 + nsegs]
        if len(lacing) != nsegs:
            raise ValueError("truncated Ogg lacing table")
        body_len = sum(lacing)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page body")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00" * 4
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("Ogg page CRC mismatch")
        body = data[pos + 27 + nsegs : page_end]
        if data[pos + 5] & 0x02:  # BOS: identification packet
            if body[:8] == b"OpusHead":
                codec = "opus"
                if len(body) < 12:
                    raise ValueError("truncated OpusHead")
                preskip = _s.unpack_from("<H", body, 10)[0]
                rate = 48000  # Opus granules are always 48 kHz ticks
            elif body[:7] == b"\x01vorbis":
                codec = "vorbis"
                if len(body) < 16:
                    raise ValueError("truncated Vorbis identification")
                rate = _s.unpack_from("<I", body, 12)[0]
                if rate == 0:
                    raise ValueError("Vorbis sample rate is zero")
            elif body[:5] == b"\x7fFLAC":
                # Ogg FLAC mapping 1.0: 0x7F 'FLAC' maj min nheaders
                # then a verbatim fLaC signature + STREAMINFO block;
                # granules are sample ticks at the STREAMINFO rate
                codec = "flac"
                if len(body) < 9 + 4 + 4 + 34:
                    raise ValueError("truncated Ogg FLAC mapping packet")
                if body[9:13] != b"fLaC":
                    raise ValueError("Ogg FLAC mapping lacks fLaC signature")
                if body[13] & 0x7F != 0:
                    raise ValueError(
                        "first Ogg FLAC metadata block is not STREAMINFO"
                    )
                si = body[17:51]
                rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
                if rate == 0:
                    raise ValueError("FLAC sample rate is zero")
            else:
                raise NotImplementedError(
                    "unrecognized Ogg codec (OpusHead, Vorbis, and FLAC "
                    "mapping identification headers are structurally probed)"
                )
        if granule >= 0:
            last_granule = granule
        n_pages += 1
        pos = page_end
    if codec is None:
        raise ValueError("Ogg stream has no BOS identification packet")
    ticks = max(0, last_granule - preskip)
    return {
        "container": "ogg",
        "brand": codec,
        "duration_s": ticks / rate,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 1,
        "codecs": codec,
    }


# ------------------------------------------------------------------- MP3

_MP3_BITRATES = {
    # (version_group, layer): kbps by index 1..14 (0 = free, 15 = bad)
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000],
              0: [11025, 12000, 8000]}


def _probe_mp3(data: bytes) -> dict:
    """MP3 frame-header walk: ID3v2 skip (syncsafe size + footer
    flag), per-frame bitrate/samplerate table decode, frame-size
    stepping, sample accumulation for exact duration, ID3v1 'TAG'
    tail tolerated. Structural only — no MDCT, no Huffman."""
    import struct as _s

    pos = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        flags = data[5]
        size = 0
        for b in data[6:10]:
            if b & 0x80:
                raise ValueError("ID3v2 syncsafe size byte with high bit set")
            size = (size << 7) | b
        pos = 10 + size + (10 if flags & 0x10 else 0)
        if pos > len(data):
            raise ValueError("ID3v2 tag overflows the file")
    duration = 0.0
    n_frames = 0
    while pos < len(data):
        if data[pos : pos + 3] == b"TAG" and len(data) - pos == 128:
            break  # ID3v1 tail
        if pos + 4 > len(data):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at offset {pos}")
        ver_bits = (b1 >> 3) & 3
        if ver_bits == 1:
            raise ValueError("reserved MPEG version bits")
        layer_bits = (b1 >> 1) & 3
        if layer_bits == 0:
            raise ValueError("reserved MPEG layer bits")
        layer = 4 - layer_bits  # 1/2/3
        vgroup = 1 if ver_bits == 3 else 2
        br_idx = b2 >> 4
        if br_idx == 15:
            raise ValueError("invalid MP3 bitrate index 15")
        if br_idx == 0:
            raise NotImplementedError(
                "free-format MP3 bitrate (frame size discovery) unsupported"
            )
        sr_idx = (b2 >> 2) & 3
        if sr_idx == 3:
            raise ValueError("reserved MP3 sample rate index")
        frate = _MP3_RATES[ver_bits][sr_idx]
        kbps = _MP3_BITRATES[(vgroup, layer)][br_idx - 1]
        padding = (b2 >> 1) & 1
        if layer == 1:
            fsize = (12 * kbps * 1000 // frate + padding) * 4
            fsamples = 384
        else:
            per = 144 if (layer == 2 or vgroup == 1) else 72
            fsize = per * kbps * 1000 // frate + padding
            fsamples = 1152 if (layer == 2 or vgroup == 1) else 576
        if fsize < 4 or pos + fsize > len(data):
            raise ValueError("MP3 frame overflows the file")
        # Per-frame accumulation: a version-switching VBR stream changes
        # sample rate mid-stream, so dividing a global sample sum by the
        # first frame's rate would skew the duration.
        duration += fsamples / frate
        n_frames += 1
        pos += fsize
    if n_frames == 0:
        raise ValueError("MP3 stream has no audio frames")
    return {
        "container": "mp3",
        "brand": "mp3",
        "duration_s": duration,
        "width": 0,
        "height": 0,
        "n_video": 0,
        "n_audio": 1,
        "codecs": "mp3",
    }
