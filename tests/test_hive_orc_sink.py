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
