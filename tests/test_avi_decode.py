"""Native uncompressed-AVI video decode
(functions/multimodal.py::_decode_avi via decode_video). The
serializer here writes the RIFF/AVI layout independently from the
decoder, straight from the Microsoft AVI RIFF form description:
RIFF('AVI ') → LIST hdrl (avih + LIST strl{strh,strf}) → LIST movi
with '00db' frame chunks (optionally grouped under LIST 'rec ' and
interleaved with '01wb' audio chunks), chunks padded to even
offsets. Covers BI_RGB 24/32 bpp in both row orders, the planar
4:2:0 fourccs I420/IYUV/YV12, fps from strh dwRate/dwScale, and the
malformed/unsupported contract (truncation sweep, codec fourccs,
bomb dims)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import (
    _video_features,
    decode_video,
    video_stats,
)

from test_image_decode import _rng


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _vids_strl(
    w: int,
    h: int,
    bpp: int,
    compression: bytes,
    scale: int,
    rate: int,
    n_frames: int,
    top_down: bool,
) -> bytes:
    """LIST strl for the video stream: AVIStreamHeader (56 bytes) +
    BITMAPINFOHEADER (40 bytes). biCompression is 0 for BI_RGB or the
    planar fourcc; negative biHeight means top-down rows (DIB rule)."""
    strh = (
        b"vids"
        + b"DIB "  # fccHandler, informational
        + struct.pack("<I", 0)  # dwFlags
        + struct.pack("<HH", 0, 0)  # wPriority, wLanguage
        + struct.pack("<I", 0)  # dwInitialFrames
        + struct.pack("<II", scale, rate)  # dwScale, dwRate @ offset 20
        + struct.pack("<III", 0, n_frames, 0)  # start, length, bufsize
        + struct.pack("<iI", 0, 0)  # dwQuality, dwSampleSize
        + struct.pack("<4H", 0, 0, w, h)  # rcFrame
    )
    assert len(strh) == 56
    comp = (
        struct.pack("<I", 0) if compression == b"\x00\x00\x00\x00" else compression
    )
    strf = struct.pack(
        "<Iii HH", 40, w, -h if top_down else h, 1, bpp
    ) + comp + struct.pack("<IiiII", 0, 0, 0, 0, 0)
    assert len(strf) == 40
    return _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))


def _auds_strl(sample_rate: int = 8000) -> bytes:
    """A minimal audio stream (stream 1): 'auds' header + PCMWAVEFORMAT."""
    strh = (
        b"auds"
        + b"\x00" * 4
        + struct.pack("<I", 0)
        + struct.pack("<HH", 0, 0)
        + struct.pack("<I", 0)
        + struct.pack("<II", 1, sample_rate)
        + struct.pack("<III", 0, 0, 0)
        + struct.pack("<iI", 0, 2)
        + struct.pack("<4H", 0, 0, 0, 0)
    )
    strf = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))


def _rgb_frame(frame_rgb: np.ndarray, bpp: int, top_down: bool) -> bytes:
    """One BI_RGB frame: BGR(A) byte order, rows padded to 4-byte
    stride, bottom-up unless top_down."""
    h, w, _ = frame_rgb.shape
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = frame_rgb[:, :, ::-1]  # RGB → BGR
    if nch == 4:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        rows = np.concatenate([rows, alpha], axis=2)
    if not top_down:
        rows = rows[::-1]
    out = bytearray()
    pad = b"\x00" * (stride - w * nch)
    for y in range(h):
        out += rows[y].tobytes() + pad
    return bytes(out)


def _yuv420_frame(luma: np.ndarray, chroma_fill: int = 128) -> bytes:
    h, w = luma.shape
    chroma = ((w + 1) // 2) * ((h + 1) // 2)
    return luma.tobytes() + bytes([chroma_fill]) * (2 * chroma)


def _avi_bytes(
    frames: list[bytes],
    w: int,
    h: int,
    bpp: int,
    compression: bytes,
    *,
    fps=(30, 1),
    top_down: bool = False,
    rec_groups: bool = False,
    audio_chunks: bool = False,
    junk: bool = True,
) -> bytes:
    """Assemble the RIFF('AVI ') container from pre-built frame
    payloads. fps=(rate, scale) lands in strh; rec_groups wraps each
    frame in a LIST 'rec '; audio_chunks interleaves '01wb' chunks
    the video decoder must skip."""
    rate, scale = fps
    streams = 2 if audio_chunks else 1
    usec = int(1_000_000 * scale / rate) if rate else 0
    avih = struct.pack(
        "<14I", usec, 0, 0, 0, len(frames), 0, streams, 0, w, h, 0, 0, 0, 0
    )
    hdrl_body = _chunk(b"avih", avih) + _vids_strl(
        w, h, bpp, compression, scale, rate, len(frames), top_down
    )
    if audio_chunks:
        hdrl_body += _auds_strl()
    movi_body = b""
    for data in frames:
        entry = _chunk(b"00db", data)
        if audio_chunks:
            entry += _chunk(b"01wb", b"\x01\x02\x03\x04")
        if rec_groups:
            entry = _list(b"rec ", entry)
        movi_body += entry
    body = _list(b"hdrl", hdrl_body)
    if junk:
        body += _chunk(b"JUNK", b"\x00" * 12)
    body += _list(b"movi", movi_body)
    riff_body = b"AVI " + body
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


_BI_RGB = b"\x00\x00\x00\x00"


def _expected_luma(rgb: np.ndarray) -> np.ndarray:
    r = rgb.astype(np.int64)
    return ((299 * r[..., 0] + 587 * r[..., 1] + 114 * r[..., 2] + 500) // 1000).astype(
        np.uint8
    )


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("top_down", [False, True])
def test_avi_rgb_roundtrip(bpp, top_down):
    """BI_RGB at both depths and both row orders; odd width exercises
    the 4-byte row stride padding."""
    rgb = _rng(700 + bpp).integers(0, 256, size=(3, 4, 5, 3), dtype=np.uint8)
    frames = [_rgb_frame(f, bpp, top_down) for f in rgb]
    payload = _avi_bytes(frames, 5, 4, bpp, _BI_RGB, top_down=top_down)
    got, fps, cspace = decode_video(payload)
    assert fps == 30.0 and cspace == f"rgb{bpp}"
    np.testing.assert_array_equal(got, _expected_luma(rgb))


@pytest.mark.parametrize("fourcc", [b"I420", b"IYUV", b"YV12"])
def test_avi_planar_roundtrip(fourcc):
    """Planar 4:2:0: the luma plane returns exactly; odd dims exercise
    the ceil-division chroma size (frame chunks go odd → pad byte)."""
    lumas = _rng(710).integers(0, 256, size=(4, 3, 5), dtype=np.uint8)
    frames = [_yuv420_frame(f) for f in lumas]
    payload = _avi_bytes(frames, 5, 3, 12, fourcc, fps=(25, 1))
    got, fps, cspace = decode_video(payload)
    assert fps == 25.0 and cspace == fourcc.decode().lower()
    np.testing.assert_array_equal(got, lumas)


def test_avi_rec_groups_and_audio_interleave():
    """'rec ' grouped frames descend; interleaved '01wb' audio chunks
    and JUNK are skipped; fractional fps comes from dwRate/dwScale."""
    rgb = _rng(711).integers(0, 256, size=(5, 2, 2, 3), dtype=np.uint8)
    frames = [_rgb_frame(f, 24, False) for f in rgb]
    payload = _avi_bytes(
        frames, 2, 2, 24, _BI_RGB, fps=(30000, 1001),
        rec_groups=True, audio_chunks=True,
    )
    got, fps, _ = decode_video(payload)
    assert fps == 30000 / 1001
    np.testing.assert_array_equal(got, _expected_luma(rgb))


def test_avi_unsupported_and_malformed():
    rgb = _rng(712).integers(0, 256, size=(2, 3, 3, 3), dtype=np.uint8)
    ok = _avi_bytes([_rgb_frame(f, 24, False) for f in rgb], 3, 3, 24, _BI_RGB)
    # codec fourccs genuinely need a codec
    with pytest.raises(NotImplementedError, match="codec"):
        decode_video(
            _avi_bytes([b"\x00" * 10], 3, 3, 24, b"MJPG")
        )
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_video(_avi_bytes([b"\x00" * 18], 3, 3, 16, _BI_RGB))
    # structural failures are ValueError
    with pytest.raises(ValueError, match="strh"):
        no_strl = b"AVI " + _list(b"hdrl", _chunk(b"avih", b"\x00" * 56)) + _list(
            b"movi", b""
        )
        decode_video(b"RIFF" + struct.pack("<I", len(no_strl)) + no_strl)
    with pytest.raises(ValueError, match="movi"):
        hdr_only = b"AVI " + _list(
            b"hdrl",
            _chunk(b"avih", b"\x00" * 56)
            + _vids_strl(3, 3, 24, _BI_RGB, 1, 30, 1, False),
        )
        decode_video(b"RIFF" + struct.pack("<I", len(hdr_only)) + hdr_only)
    with pytest.raises(ValueError, match="frame rate"):
        decode_video(
            _avi_bytes([_rgb_frame(rgb[0], 24, False)], 3, 3, 24, _BI_RGB, fps=(0, 1))
        )
    with pytest.raises(ValueError, match="no video frames"):
        decode_video(_avi_bytes([], 3, 3, 24, _BI_RGB))
    with pytest.raises(ValueError, match="dimensions"):
        decode_video(_avi_bytes([b""], 0, 3, 24, _BI_RGB))
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_video(_avi_bytes([b""], 50000, 50000, 24, _BI_RGB))
    # a frame chunk smaller than one frame is truncated, not short
    short = _avi_bytes([_rgb_frame(rgb[0], 24, False)[:-4]], 3, 3, 24, _BI_RGB)
    with pytest.raises(ValueError, match="truncated AVI frame"):
        decode_video(short)
    # sanity: the valid payload still decodes after all that
    got, _, _ = decode_video(ok)
    assert got.shape == (2, 3, 3)


def test_avi_truncation_sweep():
    """Every prefix truncation ≥12 bytes must raise a clean contract
    error (ValueError for structural damage); shorter prefixes miss
    the AVI magic and fall through to the codec NotImplementedError."""
    rgb = _rng(713).integers(0, 256, size=(3, 4, 4, 3), dtype=np.uint8)
    payload = _avi_bytes(
        [_rgb_frame(f, 24, False) for f in rgb], 4, 4, 24, _BI_RGB,
        rec_groups=True, audio_chunks=True,
    )
    for cut in range(len(payload)):
        try:
            decode_video(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        pytest.fail(f"truncation at {cut} decoded a damaged AVI")


def test_avi_video_features_exact():
    """The featurizer path: exact integer luma sums and frame deltas
    over an AVI payload, same contract as Y4M."""
    lumas = np.zeros((3, 4, 4), dtype=np.uint8)
    lumas[1] = 10
    lumas[2] = 250
    payload = _avi_bytes(
        [_yuv420_frame(f) for f in lumas], 4, 4, 12, b"I420", fps=(25, 1)
    )
    f = _video_features(payload)
    assert (f["n_frames"], f["height"], f["width"]) == (3, 4, 4)
    assert f["duration_s"] == 3 / 25
    assert f["mean_luma"] == (0 + 10 + 250) / 3
    assert f["mean_frame_delta"] == (10 + 240) / 2


def test_avi_video_stats_distributed_with_quarantine(spark):
    """AVI joins the Spark featurizer surface: good AVI featurized,
    codec-fourcc AVI quarantined as unsupported, truncated AVI as
    malformed — one Arrow batch, Y4M clip alongside."""
    from test_y4m_decode import _y4m_bytes

    rgb = _rng(714).integers(0, 256, size=(4, 6, 6, 3), dtype=np.uint8)
    good = _avi_bytes([_rgb_frame(f, 32, True) for f in rgb], 6, 6, 32, _BI_RGB)
    lumas = _rng(715).integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (810, bytearray(good)),
            (811, bytearray(_avi_bytes([b"\x00" * 8], 4, 4, 24, b"XVID"))),
            (812, bytearray(good[:-9])),
            (813, bytearray(_y4m_bytes(lumas))),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in video_stats(df, quarantine=True).collect()}
    r = got[810]
    assert r["error"] is None and r["n_frames"] == 4
    expect = _video_features(good)
    assert r["mean_luma"] == expect["mean_luma"]
    assert r["mean_frame_delta"] == expect["mean_frame_delta"]
    assert got[811]["error"].startswith("unsupported:")
    assert got[812]["error"].startswith("malformed:")
    assert got[813]["error"] is None and got[813]["n_frames"] == 2
