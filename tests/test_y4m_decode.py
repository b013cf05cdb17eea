"""Native Y4M video decode (functions/multimodal.py::decode_video) and
the video_stats featurizer — the third modality through the shared
quarantine wrapper. The serializer here writes the YUV4MPEG2 layout
from the format description independently of the decoder (ASCII
stream/frame headers, planar frame sizes per chroma mode)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import (
    _video_features,
    decode_video,
    video_stats,
)

from test_image_decode import _rng


def _y4m_bytes(
    lumas: np.ndarray,
    fps=(30, 1),
    cspace: str = "420jpeg",
    frame_param: bool = False,
    chroma_fill: int = 128,
) -> bytes:
    """Y4M stream: one luma plane per frame from `lumas` (n, h, w),
    chroma planes filled with a constant at the subsampled size."""
    n, h, w = lumas.shape
    if cspace.startswith("420"):
        chroma = 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif cspace == "422":
        chroma = 2 * ((w + 1) // 2) * h
    elif cspace == "444":
        chroma = 2 * w * h
    elif cspace == "444alpha":
        chroma = 3 * w * h  # U, V, and alpha planes after luma
    elif cspace == "mono":
        chroma = 0
    else:
        raise AssertionError(cspace)
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{cspace}\n".encode()
    )
    for i in range(n):
        out += b"FRAME Xtest\n" if frame_param else b"FRAME\n"
        out += lumas[i].tobytes() + bytes([chroma_fill]) * chroma
    return bytes(out)


def test_y4m_roundtrip_420():
    lumas = _rng(200).integers(0, 256, size=(5, 12, 10), dtype=np.uint8)
    frames, fps, cspace = decode_video(_y4m_bytes(lumas))
    assert fps == 30.0 and cspace == "420jpeg"
    np.testing.assert_array_equal(frames, lumas)


@pytest.mark.parametrize("cspace", ["422", "444", "444alpha", "mono", "420mpeg2"])
def test_y4m_other_colorspaces(cspace):
    lumas = _rng(201).integers(0, 256, size=(3, 7, 9), dtype=np.uint8)
    frames, _, got_cs = decode_video(_y4m_bytes(lumas, cspace=cspace))
    assert got_cs == cspace
    np.testing.assert_array_equal(frames, lumas)


def test_y4m_odd_dimensions_and_frame_params():
    """Odd w/h exercise the ceil-division chroma plane sizes; FRAME
    parameter strings must be skipped."""
    lumas = _rng(202).integers(0, 256, size=(4, 5, 7), dtype=np.uint8)
    frames, fps, _ = decode_video(
        _y4m_bytes(lumas, fps=(30000, 1001), frame_param=True)
    )
    assert fps == 30000 / 1001
    np.testing.assert_array_equal(frames, lumas)


def test_y4m_malformed_and_unsupported():
    lumas = _rng(203).integers(0, 256, size=(2, 4, 4), dtype=np.uint8)
    ok = _y4m_bytes(lumas)
    with pytest.raises(ValueError):  # truncated mid-frame
        decode_video(ok[:-10])
    with pytest.raises(ValueError):  # no frames at all
        decode_video(b"YUV4MPEG2 W4 H4 F30:1 C420\n")
    with pytest.raises(ValueError):  # missing dimensions
        decode_video(b"YUV4MPEG2 F30:1\nFRAME\n")
    with pytest.raises(NotImplementedError):  # compressed container
        decode_video(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 64)  # MP4
    with pytest.raises(NotImplementedError):  # exotic colorspace
        decode_video(
            b"YUV4MPEG2 W2 H2 F30:1 C411\nFRAME\n" + b"\x00" * 16
        )
    with pytest.raises(NotImplementedError):  # 10-bit is NOT 8-bit C420
        decode_video(b"YUV4MPEG2 W2 H2 F30:1 C420p10\nFRAME\n" + b"\x00" * 12)


def test_y4m_signed_header_fields_rejected():
    """The ASCII header can carry signed ints: W-1 used to make
    frame_bytes negative and walk the frame cursor BACKWARDS — an
    infinite loop, not an exception (unkillable under quarantine).
    F0:1 used to yield fps=0 and a ZeroDivisionError escaping the
    decode contract. All must be clean ValueErrors."""
    for bad in [
        b"YUV4MPEG2 W-1 H6 F30:1 Cmono\nFRAME\n" + b"\x00" * 6,
        b"YUV4MPEG2 W4 H-2 F30:1 Cmono\nFRAME\n" + b"\x00" * 8,
        b"YUV4MPEG2 W0 H4 F30:1 Cmono\nFRAME\n",
        b"YUV4MPEG2 W2 H2 F0:1 Cmono\nFRAME\n" + b"\x00" * 4,
        b"YUV4MPEG2 W2 H2 F-30:1 Cmono\nFRAME\n" + b"\x00" * 4,
        b"YUV4MPEG2 W2 H2 F30:0 Cmono\nFRAME\n" + b"\x00" * 4,
        b"YUV4MPEG2 W2 Hx F30:1 Cmono\nFRAME\n" + b"\x00" * 4,
    ]:
        with pytest.raises(ValueError):
            decode_video(bad)


def test_y4m_bomb_dimensions_rejected():
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_video(b"YUV4MPEG2 W50000 H50000 F30:1 C420\nFRAME\n")


def test_video_features_exact():
    """mean_luma and mean_frame_delta from exact integer sums."""
    lumas = np.zeros((3, 4, 4), dtype=np.uint8)
    lumas[1] = 10
    lumas[2] = 250  # delta 240 across all pixels: exercises >int8 range
    f = _video_features(_y4m_bytes(lumas, fps=(25, 1)))
    assert (f["n_frames"], f["height"], f["width"]) == (3, 4, 4)
    assert f["duration_s"] == 3 / 25
    assert f["mean_luma"] == (0 + 10 + 250) / 3
    assert f["mean_frame_delta"] == (10 + 240) / 2
    single = _video_features(_y4m_bytes(lumas[:1]))
    assert single["mean_frame_delta"] == 0.0


def test_video_frame_sample_composes_with_image_stats(spark):
    """The cross-modality pipeline: Y4M clips fan out to per-frame PGM
    payloads (one→many, original frame indices preserved) that the
    IMAGE featurizer consumes directly — per-frame means must equal
    numpy on the source lumas."""
    from pyspark.sql import functions as F

    from flink_hiveorc_spark.functions.multimodal import (
        image_stats,
        video_frame_sample,
    )

    lumas = _rng(210).integers(0, 256, size=(7, 5, 6), dtype=np.uint8)
    df = spark.createDataFrame(
        [(800, bytearray(_y4m_bytes(lumas)))], "doc_id long, payload binary"
    )
    frames = video_frame_sample(df, every_n=3)
    rows = {r["frame_idx"]: r for r in frames.collect()}
    assert sorted(rows) == [0, 3, 6]
    feats = {
        r["doc_id"]: r
        for r in image_stats(
            frames.select(F.col("frame_idx").alias("doc_id"), "payload")
        ).collect()
    }
    for idx in (0, 3, 6):
        r = feats[idx]
        assert (r["height"], r["width"], r["channels"]) == (5, 6, 1)
        assert r["mean_byte"] == int(lumas[idx].sum(dtype="int64")) / lumas[idx].size


def test_video_frame_sample_quarantine_one_row_per_bad_clip(spark):
    from flink_hiveorc_spark.functions.multimodal import video_frame_sample

    lumas = _rng(211).integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (900, bytearray(_y4m_bytes(lumas))),
            (901, bytearray(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 16)),
        ],
        "doc_id long, payload binary",
    )
    got = video_frame_sample(df, quarantine=True).collect()
    good = [r for r in got if r["doc_id"] == 900]
    bad = [r for r in got if r["doc_id"] == 901]
    assert len(good) == 2 and all(r["error"] is None for r in good)
    assert len(bad) == 1 and bad[0]["error"].startswith("unsupported:")
    assert bad[0]["frame_idx"] is None and bad[0]["payload"] is None

    import pytest

    with pytest.raises(ValueError, match="every_n"):
        video_frame_sample(df, every_n=0)


def test_video_stats_distributed_with_quarantine(spark):
    """Third modality through the shared wrapper: good clip
    featurized, compressed clip quarantined as unsupported, truncated
    clip as malformed — same Arrow batch."""
    lumas = _rng(204).integers(0, 256, size=(6, 8, 8), dtype=np.uint8)
    good = _y4m_bytes(lumas)
    df = spark.createDataFrame(
        [
            (700, bytearray(good)),
            (701, bytearray(b"\x1aE\xdf\xa3" + b"\x00" * 32)),  # MKV/EBML magic
            (702, bytearray(good[:-5])),
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in video_stats(df, quarantine=True).collect()}
    r = got[700]
    assert r["error"] is None and r["n_frames"] == 6
    expect = _video_features(good)
    assert r["mean_luma"] == expect["mean_luma"]
    assert r["mean_frame_delta"] == expect["mean_frame_delta"]
    assert got[701]["error"].startswith("unsupported:")
    assert got[702]["error"].startswith("malformed:")
