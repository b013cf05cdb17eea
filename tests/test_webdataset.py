"""WebDataset tar-shard I/O (sources/webdataset.py): deterministic
write, binaryFile read-back, sample grouping, adjacency contract,
and composition with the image featurizer."""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import numpy as np
import pytest

from flink_hiveorc_spark.sources import webdataset as wd

from test_image_decode import _pgm_bytes, _rng


def _member_rows():
    rows = []
    arrs = {}
    for shard in (0, 1):
        for i in range(4):
            key = f"{shard:02d}{i:04d}"
            arr = _rng(700 + shard * 10 + i).integers(
                0, 256, size=(5, 4, 1), dtype=np.uint8
            )
            arrs[key] = arr
            rows.append((shard, key, "pgm", bytearray(_pgm_bytes(arr))))
            rows.append((shard, key, "txt", bytearray(f"caption {key}".encode())))
            rows.append((shard, key, "meta.json", bytearray(b'{"ok":true}')))
    return rows, arrs


def test_webdataset_write_read_roundtrip(spark, tmp_path):
    rows, arrs = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    manifest = {r["shard_id"]: r for r in wd.write_tar_shards(df, out).collect()}
    assert set(manifest) == {0, 1}
    for r in manifest.values():
        assert r["n_samples"] == 4 and r["n_members"] == 12
        assert os.path.exists(r["path"])
        with open(r["path"], "rb") as f:
            assert hashlib.md5(f.read()).hexdigest() == r["tar_md5"]

    members = wd.read_tar_shards(spark, out)
    got = {
        (r["shard"], r["key"], r["ext"]): bytes(r["payload"])
        for r in members.collect()
    }
    assert len(got) == 24
    for shard_id, key, ext, payload in rows:
        assert got[(f"shard-{shard_id:06d}.tar", key, ext)] == bytes(payload)

    samples = {
        (r["shard"], r["key"]): r["sample"] for r in wd.group_samples(members).collect()
    }
    assert len(samples) == 8
    s = samples[("shard-000000.tar", "000001")]
    assert set(s) == {"pgm", "txt", "meta.json"}
    assert bytes(s["txt"]) == b"caption 000001"


def test_webdataset_tar_bytes_are_deterministic(spark, tmp_path):
    """Same input → same tar md5 (fixed mtime/uid/mode, sorted
    members): the manifest checksum is reproducible evidence."""
    rows, _ = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    m1 = {r["shard_id"]: r["tar_md5"] for r in wd.write_tar_shards(df, str(tmp_path / "a")).collect()}
    m2 = {r["shard_id"]: r["tar_md5"] for r in wd.write_tar_shards(
        df.repartition(7), str(tmp_path / "b")).collect()}
    assert m1 == m2


def test_webdataset_sample_members_adjacent(spark, tmp_path):
    """The WebDataset contract: a sample's members are adjacent in
    the tar (keys sorted, exts sorted within key) so loaders can
    stream group-by-key without buffering."""
    rows, _ = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    [r0] = [r for r in wd.write_tar_shards(df, out).collect() if r["shard_id"] == 0]
    with tarfile.open(r0["path"], "r:") as tar:
        names = [m.name for m in tar if m.isfile()]
    keys = [n.partition(".")[0] for n in names]
    assert keys == sorted(keys)  # adjacency: non-interleaved, ordered


def test_webdataset_composes_with_image_stats(spark, tmp_path):
    from pyspark.sql import functions as F

    from flink_hiveorc_spark.functions.multimodal import image_stats

    rows, arrs = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    wd.write_tar_shards(df, out).collect()
    pgms = wd.read_tar_shards(spark, out).filter(F.col("ext") == "pgm")
    feats = image_stats(
        pgms.select(F.expr("cast(key as long)").alias("doc_id"), "payload")
    )
    got = {r["doc_id"]: r for r in feats.collect()}
    assert len(got) == 8
    for key, arr in arrs.items():
        r = got[int(key)]
        assert (r["height"], r["width"], r["channels"]) == (5, 4, 1)
        assert r["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size


def test_webdataset_malformed_tar_rejected(spark, tmp_path):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    # header checksum garbage: tarfile raises on open, not first read
    (bad_dir / "shard-000000.tar").write_bytes(b"\x01" * 1024)
    with pytest.raises((PythonException, Py4JJavaError)):
        wd.read_tar_shards(spark, str(bad_dir)).collect()


def _raw_tar(path, names_payloads):
    with tarfile.open(path, "w") as tar:
        for name, payload in names_payloads:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))


def test_webdataset_dotted_ext_key_split(spark, tmp_path):
    """Key is the basename up to the FIRST dot: x.seg.png → ('x',
    'seg.png') — asserted THROUGH read_tar_shards, not on a local
    re-derivation."""
    d = tmp_path / "dotted"
    d.mkdir()
    _raw_tar(str(d / "shard-000000.tar"), [("0001.seg.png", b"abc")])
    [r] = wd.read_tar_shards(spark, str(d)).collect()
    assert (r["key"], r["ext"], bytes(r["payload"])) == ("0001", "seg.png", b"abc")


def test_webdataset_truncated_mid_member_is_contract_error(spark, tmp_path):
    """tarfile opens a truncated archive lazily and raises ReadError
    during ITERATION — the malformed-tar ValueError contract must
    cover the whole walk, not just open()."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    rows, _ = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = tmp_path / "trunc"
    wd.write_tar_shards(df, str(out)).collect()
    p = out / "shard-000000.tar"
    blob = p.read_bytes()
    # cut INSIDE the first member's data region (512-byte header + 5
    # bytes of an 11+-byte payload): a multiple-of-512 cut would drop
    # whole members silently, which only a manifest can catch — the
    # contract here covers the partial-member case
    p.write_bytes(blob[:517])
    (out / "shard-000001.tar").unlink()
    with pytest.raises((PythonException, Py4JJavaError), match="malformed tar shard"):
        wd.read_tar_shards(spark, str(out)).collect()


def test_webdataset_tmp_files_excluded_from_reads(spark, tmp_path):
    """A crashed write attempt leaves `.tmp-<pid>` files behind; the
    pathGlobFilter keeps directory-level readers on committed shards
    only (the atomic-publish guarantee)."""
    rows, _ = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = tmp_path / "withtmp"
    wd.write_tar_shards(df, str(out)).collect()
    (out / "shard-000099.tar.tmp-12345").write_bytes(b"\x01" * 600)
    members = wd.read_tar_shards(spark, str(out))
    assert members.count() == 24  # the partial tmp tar is invisible
    assert set(r["shard"] for r in members.select("shard").distinct().collect()) == {
        "shard-000000.tar",
        "shard-000001.tar",
    }


def test_webdataset_duplicate_members_collapse_deterministically(spark, tmp_path):
    """Members collapsing to one (key, ext) after basename stripping
    must not kill grouping with DUPLICATED_MAP_KEY: the greatest
    payload wins deterministically and n_members > size(sample)
    flags the collision."""
    from pyspark.sql import functions as F

    d = tmp_path / "dups"
    d.mkdir()
    _raw_tar(
        str(d / "shard-000000.tar"),
        [("a/0001.txt", b"alpha"), ("b/0001.txt", b"beta"), ("0001.json", b"{}")],
    )
    members = wd.read_tar_shards(spark, str(d))
    [s] = wd.group_samples(members).collect()
    assert s["n_members"] == 3
    assert set(s["sample"]) == {"txt", "json"}  # size(sample)=2 < 3: detectable
    assert bytes(s["sample"]["txt"]) == b"beta"  # lexicographically greatest


def test_webdataset_determinism_with_duplicate_key_ext(spark, tmp_path):
    """Duplicate (key, ext) rows with different payloads: the tar sort
    includes the payload, so shuffling partitioning still yields the
    same tar md5."""
    rows = [
        (0, "0001", "txt", bytearray(b"zzz")),
        (0, "0001", "txt", bytearray(b"aaa")),
        (0, "0002", "txt", bytearray(b"mid")),
    ]
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    m1 = [r["tar_md5"] for r in wd.write_tar_shards(df, str(tmp_path / "d1")).collect()]
    m2 = [
        r["tar_md5"]
        for r in wd.write_tar_shards(df.repartition(5), str(tmp_path / "d2")).collect()
    ]
    assert m1 == m2


def test_webdataset_streaming_ingest_exactly_once(spark, tmp_path):
    """Shards arriving over time featurize incrementally: shard A
    processes in run 1; shard B added; a restart on the same
    checkpoint processes ONLY B (file-level exactly-once from the
    checkpointed file log); an idle restart is a no-op. The sink is
    the composed real-decode featurize (pgm members → image_stats)."""
    from pyspark.sql import functions as F

    from flink_hiveorc_spark.functions.multimodal import image_stats

    rows, arrs = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    src = tmp_path / "arriving"
    out = str(tmp_path / "features")
    ckpt = str(tmp_path / "ckpt")
    wd.write_tar_shards(df.filter("shard_id = 0"), str(src)).collect()

    def run_once():
        members = wd.stream_tar_shards(spark, str(src))
        pgms = members.filter(F.col("ext") == "pgm").select(
            F.expr("cast(key as long)").alias("doc_id"), "payload"
        )
        q = (
            image_stats(pgms)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running

    run_once()
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [0, 1, 2, 3]  # shard-0 keys 000000..000003

    wd.write_tar_shards(df.filter("shard_id = 1"), str(src)).collect()
    run_once()
    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert sorted(got) == [0, 1, 2, 3, 10000, 10001, 10002, 10003]
    for key, arr in arrs.items():
        r = got[int(key)]
        assert r["mean_byte"] == int(arr.sum(dtype="int64")) / arr.size

    run_once()  # idle: nothing new, nothing duplicated
    assert spark.read.parquet(out).count() == 8


def test_null_payload_quarantines_not_typeerror(spark):
    """A NULL payload row (outer join, pre-quarantined upstream) must
    land in the error channel as 'malformed: null payload', not
    escape as a raw TypeError."""
    from flink_hiveorc_spark.functions.multimodal import (
        image_stats,
        video_frame_sample,
    )

    arr = _rng(800).integers(0, 256, size=(2, 2, 1), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_pgm_bytes(arr))), (2, None)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in image_stats(df, quarantine=True).collect()}
    assert got[1]["error"] is None
    assert got[2]["error"] == "malformed: null payload"
    vgot = video_frame_sample(df, quarantine=True).collect()
    assert all(
        r["error"] == "malformed: null payload" for r in vgot if r["doc_id"] == 2
    )


def test_webdataset_streaming_writer_matches_in_memory_reference(spark, tmp_path):
    """The disk-streaming writer (r8: tarfile → _Md5Tee → tmp file,
    O(member) memory) must produce byte-identical tars to the
    original in-memory build — reference built here independently
    with BytesIO + the same fixed metadata and sort order."""
    rows, _ = _member_rows()
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    manifest = {r["shard_id"]: r for r in wd.write_tar_shards(df, out).collect()}
    for shard_id in (0, 1):
        expect_rows = sorted(
            ((k, e, bytes(p)) for s, k, e, p in rows if s == shard_id),
            key=lambda r: (r[0], r[1], r[2]),
        )
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tar:
            for key, ext, payload in expect_rows:
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tar.addfile(info, io.BytesIO(payload))
        blob = buf.getvalue()
        r = manifest[shard_id]
        with open(r["path"], "rb") as f:
            assert f.read() == blob
        assert r["tar_md5"] == hashlib.md5(blob).hexdigest()
        assert r["n_bytes"] == len(blob)


def test_webdataset_long_member_name_contract_error(spark, tmp_path):
    """ADVICE r7 #4: USTAR caps member names at 100 bytes; a long
    key/ext must fail with the descriptive contract error (not an
    opaque tarfile crash), and leave no half-written tmp litter."""
    from pyspark.errors import PythonException

    rows = [(0, "k" * 120, "txt", bytearray(b"x"))]
    df = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )
    out = str(tmp_path / "shards")
    with pytest.raises(PythonException, match="USTAR"):
        wd.write_tar_shards(df, out).collect()
    leftovers = [n for n in os.listdir(out) if ".tmp-" in n]
    assert leftovers == []


def test_webdataset_export_verify_all_shards_ok(spark):
    """The registry's e2e export query (assign_shard_idx →
    write_tar_shards → read-back + manifest diff): every shard must
    verify (tar_ok=1) and member counts must be exactly 2 per doc."""
    from flink_hiveorc_spark.registry import QUERIES

    rows = QUERIES["webdataset_export_verify"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) > 0
    assert all(r["tar_ok"] == 1 for r in rows)
    assert all(r["n_members"] == 2 * r["n_docs"] for r in rows)
