"""Bucketed tables: co-located fact⋈fact joins without a shuffle.

The reference has no joins, so it never pays a join shuffle; at
100 TB the dominant cost of a fact⋈fact equi-join (lineitem⋈orders)
IS the shuffle of both sides. Bucketing is Spark's answer: write both
tables hash-bucketed on the join key, and the planner reads each
bucket pair co-located — SortMergeJoin with ZERO Exchange nodes.

Amortization math: one bucketed write shuffles each table once;
every subsequent join on that key shuffles nothing. Worth it the
moment a key is joined twice. Bucket count is fixed at write time —
size it so one bucket of the LARGER table fits an executor
(~128-512 MB); too few buckets caps join parallelism at n_buckets.

Bucketing metadata lives in the catalog (`saveAsTable`), not the
directory layout, so this composes with `partitionBy` (partition dirs
× buckets within each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    fmt: str = "parquet",
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a catalog table hash-bucketed (and optionally sorted)
    on the join key. Sorting within buckets lets SortMergeJoin skip
    its sort too."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key; with
    matching bucket counts the plan has no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def analyze_table(spark, table: str, columns: list[str] | None = None) -> dict:
    """Compute table- and column-level statistics for the CBO — the
    operational step that makes join reordering and broadcast
    decisions data-driven instead of threshold-guesswork at 100 TB
    (AQE fixes plans at runtime from shuffle sizes; CBO statistics fix
    them at PLAN time, before the first shuffle materializes).

    Runs ``ANALYZE TABLE ... COMPUTE STATISTICS`` (rowCount/sizeInBytes)
    and, when ``columns`` given, ``FOR COLUMNS`` (ndv/nulls/min/max —
    what join-reorder cardinality estimates consume). Returns the
    recorded table stats for verification."""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS {cols}")
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    stats = next(
        (r.data_type for r in rows if r.col_name == "Statistics"), None
    )
    return {"statistics": stats}
