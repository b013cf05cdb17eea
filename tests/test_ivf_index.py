"""Persisted-IVF-index tests: the amortized ANN path must (a) return
exactly what the inline oracle-checked IVF query returns and (b) read
only the probed cell partitions (partition pruning = the index)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.similarity import (
    N_QUERIES,
    build_ivf_index,
    search_ivf_index,
)
from flink_hiveorc_spark.plans import audit as A
from flink_hiveorc_spark.registry import QUERIES


def test_persisted_index_matches_inline_ivf(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf_idx")
    build_ivf_index(spark, sf_dir, idx)

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    got = search_ivf_index(spark, idx, q)
    want = QUERIES["sim_topk_cosine_ivf"](spark, sf_dir)
    g = sorted((r.query_id, r.rnk, r.neighbor_id) for r in got.collect())
    w = sorted((r.query_id, r.rnk, r.neighbor_id) for r in want.collect())
    assert g == w


def test_index_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "ivf_idx2")
    build_ivf_index(spark, sf_dir, idx)
    total_cells = spark.read.parquet(idx).select("cid").distinct().count()

    pruned = spark.read.parquet(idx).filter(F.col("cid").isin([100, 101]))
    plan = A.formatted_plan(pruned)
    assert "PartitionFilters" in plan and "cid" in plan
    # Only the two probed cell dirs' rows are readable.
    assert pruned.select("cid").distinct().count() == 2 < total_cells
