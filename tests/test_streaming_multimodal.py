"""Streaming multimodal featurize with quarantine DLQ
(streaming/multimodal.py): real decode inside a streaming query,
bad blobs quarantined not fatal, restart on the same checkpoint
processes only new files, and the DLQ repair leg re-enters through a
stream pointed at the quarantine directory."""

from __future__ import annotations

import numpy as np

from flink_hiveorc_spark.streaming import multimodal as sm

from test_image_decode import _pgm_bytes, _rng


def _write_blobs(spark, src_dir: str, rows: list) -> None:
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "doc_id long, payload binary"
    )
    df.coalesce(1).write.mode("append").parquet(src_dir)


def _run(spark, src, out, dlq, ckpt):
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt, available_now=True
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running


def test_streaming_featurize_quarantine_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "features")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    arrs = {
        i: _rng(300 + i).integers(0, 256, size=(3, 4, 1), dtype=np.uint8)
        for i in range(5)
    }
    # batch A: three good PGMs, one truncated (malformed), one
    # arithmetic-coded JPEG (unsupported without a codec)
    _write_blobs(
        spark,
        src,
        [
            (0, _pgm_bytes(arrs[0])),
            (1, _pgm_bytes(arrs[1])),
            (2, _pgm_bytes(arrs[2])),
            (100, b"P5\n9 9\n255\n" + b"\x00" * 3),
            (101, b"\xff\xd8\xff\xc9" + b"\x00" * 16),
        ],
    )
    _run(spark, src, out, dlq, ckpt)
    feats = {r["doc_id"]: r for r in sm.read_features(spark, out).collect()}
    assert set(feats) == {0, 1, 2}
    for i in (0, 1, 2):
        assert (feats[i]["height"], feats[i]["width"], feats[i]["channels"]) == (3, 4, 1)
        assert feats[i]["mean_byte"] == int(arrs[i].sum(dtype="int64")) / arrs[i].size
    bad = {r["doc_id"]: r for r in sm.read_quarantine(spark, dlq).collect()}
    assert bad[100]["error"].startswith("malformed:")
    assert bad[101]["error"].startswith("unsupported:")
    # quarantine keeps the ORIGINAL payload bytes for the repair leg
    assert bytes(bad[100]["payload"]) == b"P5\n9 9\n255\n" + b"\x00" * 3

    # batch B arrives; restart on the SAME checkpoint: only new files
    # process (doc 0-2 would double in the sink if offsets replayed)
    _write_blobs(spark, src, [(3, _pgm_bytes(arrs[3])), (4, _pgm_bytes(arrs[4]))])
    _run(spark, src, out, dlq, ckpt)
    got = sorted(r["doc_id"] for r in sm.read_features(spark, out).collect())
    assert got == [0, 1, 2, 3, 4]
    assert sm.read_quarantine(spark, dlq).count() == 2

    # idle restart: a run with nothing new is a no-op
    _run(spark, src, out, dlq, ckpt)
    assert sorted(r["doc_id"] for r in sm.read_features(spark, out).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_streaming_featurize_dlq_repair_leg(spark, tmp_path):
    """The quarantined payload re-enters through a stream pointed at
    the DLQ dir: repair (here: rebuild the truncated blob), write to
    a repair source, featurize with a fresh checkpoint, and the fixed
    doc lands exactly once."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "features")
    dlq = str(tmp_path / "dlq")
    arr = _rng(400).integers(0, 256, size=(2, 2, 1), dtype=np.uint8)
    _write_blobs(spark, src, [(7, b"P5\n2 2\n255\n" + b"\x00")])  # truncated
    _run(spark, src, out, dlq, str(tmp_path / "ckpt"))
    [bad] = sm.read_quarantine(spark, dlq).collect()
    assert bad["doc_id"] == 7 and bad["error"].startswith("malformed:")

    repair_src = str(tmp_path / "repaired")
    _write_blobs(spark, repair_src, [(7, _pgm_bytes(arr))])
    _run(spark, repair_src, out, str(tmp_path / "dlq2"), str(tmp_path / "ckpt2"))
    feats = {r["doc_id"]: r for r in sm.read_features(spark, out).collect()}
    assert set(feats) == {7}
    assert feats[7]["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size


def test_streaming_featurize_unknown_modality_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="unknown modality"):
        sm.start_multimodal_featurize(None, "", "", "", modality="hologram")


def test_streaming_media_probe_with_quarantine(spark, tmp_path):
    """modality='probe': structural container probing inside a
    streaming query — MP4/WebM/Ogg/MP3 blobs stream to feature rows,
    an unrecognized container quarantines as 'unsupported' with the
    verbatim payload."""
    from test_media_probe import (
        _mkv,
        _mp3_bytes,
        _mp4,
        _ogg_page,
        _opus_head,
        _trak,
    )

    src = str(tmp_path / "psrc")
    out = str(tmp_path / "pfeat")
    dlq = str(tmp_path / "pdlq")
    ckpt = str(tmp_path / "pckpt")
    ogg = _ogg_page(2, 0, 5, 0, [_opus_head()]) + _ogg_page(
        4, 312 + 96000, 5, 1, [b"\x00" * 8]
    )
    _write_blobs(
        spark,
        src,
        [
            (0, _mp4([_trak(b"vide", 320, 240)], dur=5000)),
            (1, _mkv(640, 360)),
            (2, ogg),
            (3, _mp3_bytes(12)),
            (100, b"FLV\x01\x05garbage"),  # unrecognized container
        ],
    )
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="probe", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert feats[0]["container"] == "mp4" and feats[0]["width"] == 320
    assert feats[1]["container"] == "matroska" and feats[1]["height"] == 360
    assert feats[2]["container"] == "ogg" and feats[2]["duration_s"] == 2.0
    assert feats[3]["container"] == "mp3"
    assert 100 not in feats
    bad = spark.read.parquet(dlq).collect()
    assert len(bad) == 1 and bad[0]["doc_id"] == 100
    assert bad[0]["error"].startswith("unsupported:")
    assert bytes(bad[0]["payload"]).startswith(b"FLV")


def test_streaming_decompress_with_quarantine(spark, tmp_path):
    """modality='decompress' (r12): gzip/zlib/bz2/xz blobs stream to
    feature rows; a zstd frame quarantines as 'unsupported' (repair
    leg re-enters it once a codec lands), corrupt gzip as
    'malformed' — both with verbatim payloads."""
    import bz2
    import gzip
    import lzma
    import zlib

    src = str(tmp_path / "dsrc")
    out = str(tmp_path / "dfeat")
    dlq = str(tmp_path / "ddlq")
    ckpt = str(tmp_path / "dckpt")
    bad_gz = bytearray(gzip.compress(b"damaged"))
    bad_gz[-3] ^= 0xFF
    _write_blobs(
        spark,
        src,
        [
            (0, gzip.compress(b"alpha text")),
            (1, zlib.compress(b"beta")),
            (2, bz2.compress(b"gamma!")),
            (3, lzma.compress(b"delta payload")),
            (100, b"\x28\xb5\x2f\xfd zstd frame"),
            (101, bytes(bad_gz)),
        ],
    )
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="decompress", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert feats[0]["codec"] == "gzip" and feats[0]["out_len"] == 10
    assert feats[1]["codec"] == "zlib" and feats[1]["sum_byte"] == sum(b"beta")
    assert feats[2]["codec"] == "bz2"
    assert feats[3]["codec"] == "xz" and feats[3]["out_len"] == 13
    assert 100 not in feats and 101 not in feats
    dlq_rows = {r["doc_id"]: r for r in spark.read.parquet(dlq).collect()}
    assert dlq_rows[100]["error"].startswith("unsupported:")
    assert dlq_rows[101]["error"].startswith("malformed:")
    assert bytes(dlq_rows[100]["payload"]).startswith(b"\x28\xb5\x2f\xfd")


def test_streaming_warc_and_archive_with_quarantine(spark, tmp_path):
    """modality='warc'/'archive'/'columnar' (r13): crawl shards fan
    out to per-record rows IN-STREAM (one payload → many output rows),
    zip drops to member rows, parquet blobs to probe rows; junk
    quarantines with verbatim payload through the same repair leg."""
    import io
    import zipfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.test_web_archive import _warc_record

    # --- warc leg
    src, out, dlq, ckpt = (str(tmp_path / d) for d in
                           ("wsrc", "wfeat", "wdlq", "wckpt"))
    warc = _warc_record("request", "https://s.test", b"rq")
    warc += _warc_record("response", "https://s.test", b"<html>ok</html>")
    _write_blobs(spark, src, [(0, warc), (9, b"not an archive")])
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="warc", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = sorted(
        (r["doc_id"], r["record_idx"], r["rec_type"], r["sum_byte"])
        for r in spark.read.parquet(out).collect()
    )
    assert feats == [
        (0, 0, "request", sum(b"rq")),
        (0, 1, "response", sum(b"<html>ok</html>")),
    ]
    dlq_rows = {r["doc_id"]: r for r in spark.read.parquet(dlq).collect()}
    assert dlq_rows[9]["error"].startswith("malformed:")

    # --- archive + columnar legs share one stream each
    t = pa.table({"v": pa.array([4, 5], pa.int64())})
    pqb = io.BytesIO()
    pq.write_table(t, pqb)
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("inner.parquet", pqb.getvalue())
    src2, out2, dlq2, ckpt2 = (str(tmp_path / d) for d in
                               ("asrc", "afeat", "adlq", "ackpt"))
    _write_blobs(spark, src2, [(1, zbuf.getvalue())])
    q2 = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src2), out2, dlq2, ckpt2,
        modality="archive", available_now=True,
    )
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running
    members = spark.read.parquet(out2).collect()
    assert [(r["fmt"], r["name"], r["size"]) for r in members] == [
        ("zip", "inner.parquet", len(pqb.getvalue()))
    ]
    src3, out3, dlq3, ckpt3 = (str(tmp_path / d) for d in
                               ("csrc", "cfeat", "cdlq", "cckpt"))
    _write_blobs(spark, src3, [(2, pqb.getvalue())])
    q3 = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src3), out3, dlq3, ckpt3,
        modality="columnar", available_now=True,
    )
    assert q3.awaitTermination(600)  # self-terminating (availableNow); False = still running
    probe = spark.read.parquet(out3).collect()
    assert [(r["fmt"], r["n_rows"], r["sum_first_int"]) for r in probe] == [
        ("parquet", 2, 9)
    ]


def test_streaming_office_and_crawltext_with_quarantine(spark, tmp_path):
    """modality='office'/'crawltext' (r14): OOXML blobs extract text
    in-stream; crawl shards run the full charset-aware text chain
    (record split → charset sniff → UTF-8 transcode) in-stream; junk
    quarantines verbatim through the same repair leg."""
    from flink_hiveorc_spark.functions.office import build_docx

    src, out, dlq, ckpt = (str(tmp_path / d) for d in
                           ("osrc", "ofeat", "odlq", "ockpt"))
    _write_blobs(spark, src, [(0, build_docx([["stream doc"]])),
                              (9, b"not a zip")])
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="office", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = spark.read.parquet(out).collect()
    assert [(r["kind"], r["office_text"]) for r in feats] == [
        ("docx", "stream doc")
    ]
    dlq_rows = {r["doc_id"]: r for r in spark.read.parquet(dlq).collect()}
    assert dlq_rows[9]["error"].startswith("malformed:")

    # crawltext: a Shift_JIS-labeled record must transcode in-stream
    jp = "<p>流れるテキスト</p>"
    block = jp.encode("cp932")
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:t>\r\n"
        b"WARC-Target-URI: https://s.test/jp\r\n"
        b"Content-Type: text/html; charset=shift_jis\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
        + block + b"\r\n\r\n"
    )
    src2, out2, dlq2, ckpt2 = (str(tmp_path / d) for d in
                               ("tsrc", "tfeat", "tdlq", "tckpt"))
    _write_blobs(spark, src2, [(1, rec)])
    q2 = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src2), out2, dlq2, ckpt2,
        modality="crawltext", available_now=True,
    )
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running
    rows = spark.read.parquet(out2).collect()
    assert [(r["charset"], r["text"]) for r in rows] == [("shift_jis", jp)]


def test_streaming_epub_lane(spark, tmp_path):
    from flink_hiveorc_spark.functions.office import build_epub

    src, out, dlq, ckpt = (str(tmp_path / d) for d in
                           ("esrc", "efeat", "edlq", "eckpt"))
    _write_blobs(spark, src, [(0, build_epub("S", [("c.xhtml", "<p>in stream</p>")])),
                              (9, b"PK\x03\x04 bad zip")])
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="epub", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = spark.read.parquet(out).collect()
    assert [(r["title"], r["epub_text"]) for r in feats] == [("S", "in stream")]
    assert spark.read.parquet(dlq).collect()[0]["doc_id"] == 9


def test_streaming_legacy_office_lane(spark, tmp_path):
    from flink_hiveorc_spark.functions.cfb import build_doc, build_xls

    src, out, dlq, ckpt = (str(tmp_path / d) for d in
                           ("lsrc", "lfeat", "ldlq", "lckpt"))
    _write_blobs(spark, src, [
        (0, build_doc([("in ", True), ("stream", False)])),
        (1, build_xls(["cell a", "cell b"], split_in=1)),
        (9, b"\xd0\xcf\x11\xe0 truncated ole2 junk"),
    ])
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="legacy_office", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert feats[0]["kind"] == "doc" and feats[0]["office_text"] == "in stream"
    assert feats[1]["kind"] == "xls"
    assert feats[1]["office_text"] == "cell a\ncell b"
    assert spark.read.parquet(dlq).collect()[0]["doc_id"] == 9


def test_streaming_rtf_lane(spark, tmp_path):
    from flink_hiveorc_spark.functions.rtf import build_rtf

    src, out, dlq, ckpt = (str(tmp_path / d) for d in
                           ("rsrc", "rfeat", "rdlq", "rckpt"))
    _write_blobs(spark, src, [(0, build_rtf(["rtf in stream"])),
                              (9, b"{\\rtf1 broken")])
    q = sm.start_multimodal_featurize(
        sm.blob_stream(spark, src), out, dlq, ckpt,
        modality="rtf", available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    feats = spark.read.parquet(out).collect()
    assert [r["rtf_text"] for r in feats] == ["rtf in stream"]
    assert spark.read.parquet(dlq).collect()[0]["doc_id"] == 9
