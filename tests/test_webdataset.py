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


def test_webdataset_dotted_ext_key_split():
    """Key is the basename up to the FIRST dot: x.seg.png → ('x',
    'seg.png') — the WebDataset convention for multi-part
    extensions."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        info = tarfile.TarInfo("0001.seg.png")
        info.size = 3
        tar.addfile(info, io.BytesIO(b"abc"))
    name = "0001.seg.png"
    key, _, ext = name.partition(".")
    assert (key, ext) == ("0001", "seg.png")
