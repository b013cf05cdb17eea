"""Partitioned ORC sink parity (sinks/hive_orc.py vs HiveOrcSink.java)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from flink_hiveorc_spark.flagship import city_shaped_events
from flink_hiveorc_spark.sinks.hive_orc import (
    compact_partitions,
    read_table,
    write_partitioned,
)


def test_partition_layout_and_roundtrip(spark, sf_dir, tmp_path):
    """Writes must produce Hive-style `c_date=...` dirs
    (RowTimeBucketer.scala:18 layout) and read back losslessly."""
    out = str(tmp_path / "city")
    city = city_shaped_events(spark, sf_dir)
    n_in = city.count()
    write_partitioned(city, out, "c_date", fmt="orc")

    part_dirs = [d for d in os.listdir(out) if d.startswith("c_date=")]
    assert part_dirs, "expected field=value partition directories"

    back = read_table(spark, out, fmt="orc")
    assert back.count() == n_in
    assert set(back.columns) == {"ref", "city_id", "city_name", "c_date"}
    # Round-trip content check on an aggregate (order-insensitive).
    # Partition-column type inference turns the c_date dir values into
    # DATE on read (the reference keeps a string; either way the
    # field=value layout is identical) — compare canonically as str.
    a = city.groupBy("c_date").count().collect()
    b = back.groupBy("c_date").count().collect()
    assert sorted((str(r[0]), r[1]) for r in a) == sorted((str(r[0]), r[1]) for r in b)


def test_partition_pruned_read(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune at planning time:
    the scan's partition count equals the selected dirs, not all."""
    out = str(tmp_path / "city_pruned")
    city = city_shaped_events(spark, sf_dir)
    write_partitioned(city, out, "c_date", fmt="orc")
    one_date = city.select("c_date").orderBy("c_date").first().c_date

    pruned = read_table(spark, out).filter(F.col("c_date") == one_date)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # Native ORC scans report partition filters in the plan text.
    assert "c_date" in plan
    expected = city.filter(F.col("c_date") == one_date).count()
    assert pruned.count() == expected


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "city_compact")
    city = city_shaped_events(spark, sf_dir).repartition(16)  # force many files
    write_partitioned(city, out, "c_date", fmt="orc", repartition_first=False)
    n_before_files = len(glob.glob(f"{out}/c_date=*/*.orc"))
    n_rows = read_table(spark, out).count()

    compact_partitions(spark, out, "c_date", fmt="orc")

    n_after_files = len(glob.glob(f"{out}/c_date=*/*.orc"))
    assert n_after_files < n_before_files
    assert read_table(spark, out).count() == n_rows


def test_compaction_with_predicate_touches_only_selected(spark, sf_dir, tmp_path):
    """Predicate-scoped compaction must rewrite ONLY the matching
    partitions: other partition dirs keep their exact file sets."""
    out = str(tmp_path / "city_pred")
    city = city_shaped_events(spark, sf_dir).repartition(8)
    write_partitioned(city, out, "c_date", fmt="orc", repartition_first=False)

    dates = sorted(d.split("=")[1] for d in os.listdir(out) if d.startswith("c_date="))
    target, others = dates[0], dates[1:]
    before = {d: sorted(os.listdir(f"{out}/c_date={d}")) for d in others}
    n_rows = read_table(spark, out).count()

    compact_partitions(spark, out, "c_date", fmt="orc", predicate=f"c_date = '{target}'")

    after = {d: sorted(os.listdir(f"{out}/c_date={d}")) for d in others}
    assert after == before, "untouched partitions were rewritten"
    assert len(glob.glob(f"{out}/c_date={target}/*.orc")) < 8
    assert read_table(spark, out).count() == n_rows


def test_schema_evolution_merge_read(spark, tmp_path):
    """Readers survive a widened schema (column added later): ORC
    mergeSchema read surfaces the union schema with nulls for old
    files — the evolution path the reference's reflective-POJO sink
    (HiveOrcSink.java:309-312) cannot express at all."""
    from pyspark.sql import Row

    out = str(tmp_path / "evolving")
    spark.createDataFrame([Row(ref=1, c_date="d1")]).write.format("orc").save(f"{out}/p1")
    spark.createDataFrame(
        [Row(ref=2, c_date="d2", city_name="x")]
    ).write.format("orc").save(f"{out}/p2")

    merged = spark.read.option("mergeSchema", "true").orc([f"{out}/p1", f"{out}/p2"])
    assert set(merged.columns) == {"ref", "c_date", "city_name"}
    rows = {r.ref: r.city_name for r in merged.collect()}
    assert rows == {1: None, 2: "x"}


def test_vacuum_streaming_sink_removes_only_orphans(spark, tmp_path):
    """Orphan files (crashed attempts) are reclaimed; committed files
    and the readable row set are untouched."""
    import json as _json

    from flink_hiveorc_spark.sinks.hive_orc import vacuum_streaming_sink
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        read_committed,
        start_city_ingest,
    )

    src, out, ckpt = tmp_path / "vsrc", str(tmp_path / "vout"), str(tmp_path / "vckpt")
    src.mkdir()
    with open(src / "a.txt", "w") as f:
        for i in range(50):
            inner = _json.dumps({"after": {"ref": i, "city_id": i, "city_name": "c", "c_time": 1755000000000 + i * 3_600_000}})
            f.write(_json.dumps({"value": inner}) + "\n")
    q = start_city_ingest(file_raw_stream(spark, str(src)), out, ckpt, available_now=True)
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    n = read_committed(spark, out).count()
    assert n == 50

    # Inject an orphan "crashed attempt" file into a partition dir.
    part_dir = next(d for d in os.listdir(out) if d.startswith("c_date="))
    orphan = os.path.join(out, part_dir, "part-99999-deadbeef.c000.zstd.orc")
    with open(orphan, "wb") as f:
        f.write(b"not really orc")

    removed = vacuum_streaming_sink(spark, out)
    assert removed == [orphan] and not os.path.exists(orphan)
    spark.catalog.refreshByPath(out)
    assert read_committed(spark, out).count() == n


def test_vacuum_refuses_non_streaming_dir(spark, sf_dir, tmp_path):
    """A dir with no _spark_metadata manifest must raise, not delete:
    treating 'no manifest' as 'nothing committed' would wipe any
    batch-written table passed by mistake."""
    import pytest as _pytest

    from flink_hiveorc_spark.sinks.hive_orc import vacuum_streaming_sink

    out = str(tmp_path / "batch_table")
    city = city_shaped_events(spark, sf_dir)
    write_partitioned(city, out, "c_date", fmt="orc")
    n_files = len(glob.glob(f"{out}/c_date=*/*.orc"))
    with _pytest.raises(ValueError, match="_spark_metadata"):
        vacuum_streaming_sink(spark, out)
    assert len(glob.glob(f"{out}/c_date=*/*.orc")) == n_files


def test_cluster_by_sorts_within_files(spark, sf_dir, tmp_path):
    """cluster_by must produce within-file sortedness on the cluster
    column (what makes ORC stripe min/max skipping effective)."""
    out = str(tmp_path / "city_clustered")
    city = city_shaped_events(spark, sf_dir)
    write_partitioned(city, out, "c_date", fmt="orc", cluster_by=["city_id"])

    from pyspark.sql.window import Window

    back = read_table(spark, out).withColumn("_file", F.input_file_name())
    w = Window.partitionBy("_file").orderBy(F.monotonically_increasing_id())
    # Within every physical file, city_id must be non-decreasing in
    # row order (files are read in order within a split).
    violations = (
        back.select("_file", "city_id", F.lag("city_id").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("city_id") < F.col("prev")))
        .count()
    )
    assert violations == 0
    assert read_table(spark, out).count() == city.count()


def test_compaction_refuses_streaming_sink_dir(spark, tmp_path):
    """compact_partitions must refuse a _spark_metadata dir: rewriting
    files underneath the manifest breaks manifest-based reads and
    marks the compacted files as vacuum-able orphans."""
    import pytest as _pytest

    out = str(tmp_path / "stream_like")
    os.makedirs(os.path.join(out, "_spark_metadata"))
    with _pytest.raises(ValueError, match="_spark_metadata"):
        compact_partitions(spark, out, "c_date", fmt="orc")


def test_vacuum_honors_manifest_delete_actions(spark, tmp_path):
    """A compacted manifest's 'delete' entries name files that are no
    longer part of the table — vacuum must treat them as orphans and
    reclaim the bytes, not keep them committed forever."""
    import json as _json

    from flink_hiveorc_spark.sinks.hive_orc import vacuum_streaming_sink

    out = tmp_path / "vdel"
    meta = out / "_spark_metadata"
    meta.mkdir(parents=True)
    live = out / "part-live.orc"
    dead = out / "part-dead.orc"
    live.write_bytes(b"x")
    dead.write_bytes(b"x")
    with open(meta / "0", "w") as f:
        f.write("v1\n")
        f.write(_json.dumps({"path": str(live), "action": "add"}) + "\n")
        f.write(_json.dumps({"path": str(dead), "action": "add"}) + "\n")
    with open(meta / "1.compact", "w") as f:
        f.write("v1\n")
        f.write(_json.dumps({"path": str(live), "action": "add"}) + "\n")
        f.write(_json.dumps({"path": str(dead), "action": "delete"}) + "\n")
    removed = vacuum_streaming_sink(spark, str(out))
    assert removed == [str(dead)]
    assert live.exists() and not dead.exists()


def test_vacuum_applies_manifests_in_numeric_batch_order(spark, tmp_path):
    """Manifests must apply in NUMERIC batch order: lexicographically
    '10' < '9.compact', so a file deleted by batch 9's compaction but
    re-added as a new file in batch 10 would be resurrected-then-
    deleted if applied alphabetically (ADVICE r2). With 11 batches the
    orderings genuinely diverge."""
    import json as _json

    from flink_hiveorc_spark.sinks.hive_orc import vacuum_streaming_sink

    out = tmp_path / "vorder"
    meta = out / "_spark_metadata"
    meta.mkdir(parents=True)
    f_a = out / "part-a.orc"
    f_a.write_bytes(b"x")
    # Batches 0..8: add part-a (plain manifests).
    for i in range(9):
        with open(meta / str(i), "w") as fh:
            fh.write("v1\n")
            fh.write(_json.dumps({"path": str(f_a), "action": "add"}) + "\n")
    # Batch 9 compaction: part-a deleted from the table.
    with open(meta / "9.compact", "w") as fh:
        fh.write("v1\n")
        fh.write(_json.dumps({"path": str(f_a), "action": "delete"}) + "\n")
    # Batch 10: a NEW file with the same basename story — re-adds it.
    with open(meta / "10", "w") as fh:
        fh.write("v1\n")
        fh.write(_json.dumps({"path": str(f_a), "action": "add"}) + "\n")
    # Numeric order (…9.compact, 10): part-a ends committed → kept.
    # Lexicographic order (10, …, 9.compact) would end on 'delete' and
    # wrongly reclaim it.
    removed = vacuum_streaming_sink(spark, str(out))
    assert removed == []
    assert f_a.exists()


def test_bloom_filter_columns_written(spark, sf_dir, tmp_path):
    """orc.bloom.filter.columns must materially change the written
    files (bloom streams add bytes per stripe) while read-back stays
    identical — and the option string must be accepted by the native
    ORC writer (a typo'd option name would be silently dropped by a
    lenient writer, but the size delta proves the stream exists)."""
    city = city_shaped_events(spark, sf_dir)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    write_partitioned(city, plain, "c_date", fmt="orc")
    write_partitioned(city, bloomed, "c_date", fmt="orc", bloom_filter_columns=["ref"])

    def total_bytes(root):
        return sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(root, "**", "*.orc"), recursive=True)
        )

    assert total_bytes(bloomed) > total_bytes(plain)
    a = spark.read.orc(plain).orderBy("ref").collect()
    b = spark.read.orc(bloomed).orderBy("ref").collect()
    assert a == b
