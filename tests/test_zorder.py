"""Z-order clustering: measurably narrower per-file bounding boxes on
BOTH key columns than a single-column sort (what makes min-max
skipping work on two predicate dimensions at once)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_hiveorc_spark.sinks.zorder import zorder_key


def _avg_relative_range(spark, path: str, col: str) -> float:
    """Mean per-file (max-min) of `col`, relative to the global range —
    1.0 ≈ every file spans the whole domain (no skipping possible),
    small ≈ files are tight boxes (most files prunable per filter)."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col(col).cast("double").alias("v")
    )
    per_file = df.groupBy("f").agg((F.max("v") - F.min("v")).alias("r"))
    g = df.agg((F.max("v") - F.min("v")).alias("g")).collect()[0].g
    return per_file.agg(F.avg("r")).collect()[0][0] / g


def test_zorder_key_interleaves_bits(spark):
    # Deterministic spot check of the bit interleave: x=0b11, y=0b01
    # with 2 bits -> positions (x1 y1 x0 y0) = 1 0 1 1 = 11.
    row = (
        spark.createDataFrame([(3, 1)], "x long, y long")
        .select(zorder_key(["x", "y"], bits=2).alias("z"))
        .collect()[0]
    )
    assert row.z == 0b1011


def test_zorder_files_are_tight_on_both_columns(spark, tmp_path):
    # Uniform 2-D grid: the adversarial case for single-column sort
    # (sorting on x leaves y ranges full-width in every file).
    n_side = 128
    grid = spark.range(n_side * n_side).select(
        (F.col("id") % n_side).alias("x"),
        (F.col("id") / n_side).cast("long").alias("y"),
    )
    xsorted, zsorted = str(tmp_path / "xsort"), str(tmp_path / "zsort")
    files = 16
    (
        grid.repartitionByRange(files, "x")
        .sortWithinPartitions("x")
        .write.parquet(xsorted)
    )
    z = zorder_key(["x", "y"], bits=7)
    (
        grid.withColumn("z", z)
        .repartitionByRange(files, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.parquet(zsorted)
    )
    x_rx = _avg_relative_range(spark, xsorted, "x")
    x_ry = _avg_relative_range(spark, xsorted, "y")
    z_rx = _avg_relative_range(spark, zsorted, "x")
    z_ry = _avg_relative_range(spark, zsorted, "y")
    # Single-column sort: x tight, y full-width.
    assert x_rx < 0.2 and x_ry > 0.9
    # Z-order: BOTH columns substantially narrowed (quarter-ish boxes
    # for 16 files on a square grid).
    assert z_rx < 0.5 and z_ry < 0.5
