"""Plan-shape regression tests: the 100 TB posture, pinned.

A query that returns the right rows through the wrong plan (no
pushdown, accidental cartesian, Python row-UDFs in the hot path) is a
latent outage at scale — these tests fail on plan regressions even
when answers stay correct.
"""

from __future__ import annotations

import pytest

from flink_hiveorc_spark.plans import audit as A
from flink_hiveorc_spark.registry import QUERIES

# Every registered query must satisfy the global invariants.
GLOBAL_QUERIES = sorted(QUERIES)

# Queries whose plan must contain a broadcast join (dim side small).
BROADCAST_EXPECTED = [
    "join_broadcast_region_revenue",
    "join_inner_revenue",
    # the eval side of the contamination join is benchmark-sized; the
    # corpus must never shuffle for it
    "text_contamination_eval_overlap",
    # r12 TPC-DS shapes: part / customer+nation / supplier+nation dims
    # must broadcast under the fact scans
    "tpcds_rollup_topk_per_group",
    "tpcds_cumulative_channel_alignment",
    "tpcds_returned_sales_two_year_chain",
    # r13 TPC-DS shapes: part dim + 1-row scalar threshold/max frames
    # must broadcast (q14 intersect, q23 best-customer, q72 chain)
    "tpcds_crosschannel_intersect",
    "tpcds_frequent_best_customer",
    "tpcds_inventory_date_chain",
]

# ngram_jaccard self-joins on exploded shingles — it is quadratic by
# DESIGN (the scalable variant is dedup_minhash_lsh_pairs); documents
# brute-force sim likewise. Neither may use CartesianProduct though.
PUSHDOWN_EXPECTED = {
    "agg_pricing_summary": "l_shipdate",
    "join_semi_customers_with_open_orders": "o_orderstatus",
}


@pytest.mark.parametrize("name", GLOBAL_QUERIES)
def test_no_cartesian_product(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert not A.has_cartesian(df), f"{name}: CartesianProduct in plan"


@pytest.mark.parametrize("name", GLOBAL_QUERIES)
def test_no_row_python_udf(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert not A.has_python_eval(df), f"{name}: row-at-a-time Python UDF in plan"


@pytest.mark.parametrize("name", GLOBAL_QUERIES)
def test_no_loop_invariant_lambda_recompute(spark, sf_dir, name):
    """The O(n²) `split()`-inside-`transform` bug class (recurred in
    r3 AND r4 — commit ef3c584) as a mechanical invariant: no query
    plan may evaluate an expensive loop-invariant expression inside a
    higher-order lambda."""
    df = QUERIES[name](spark, sf_dir)
    hits = A.lambda_invariant_recomputes(df)
    assert not hits, f"{name}: loop-invariant expensive call(s) in lambda: {hits}"


def test_lambda_recompute_guard_fires_on_known_bad_shape(spark):
    """The guard must actually catch the historical bug shape (bigram
    construction re-splitting the document per element) and stay quiet
    on both fixed formulations."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c d",)], "text string")
    bad = df.select(
        F.expr(
            "transform(sequence(0, size(split(text, ' ')) - 2),"
            " i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1]))"
        ).alias("bigrams")
    )
    assert A.lambda_invariant_recomputes(bad), "guard missed the r3/r4 bug shape"

    fixed = df.withColumn("words", F.split("text", " ")).select(
        F.expr(
            "transform(sequence(0, size(words) - 2),"
            " i -> concat(words[i], ' ', words[i + 1]))"
        ).alias("bigrams")
    )
    assert A.lambda_invariant_recomputes(fixed) == []

    per_element = df.select(
        F.expr("transform(split(text, ' '), x -> md5(x))").alias("hashes")
    )
    assert A.lambda_invariant_recomputes(per_element) == []


@pytest.mark.parametrize("name", BROADCAST_EXPECTED)
def test_dim_joins_broadcast(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert A.has_broadcast_join(df), f"{name}: expected broadcast join"


@pytest.mark.parametrize("name,col", sorted(PUSHDOWN_EXPECTED.items()))
def test_filter_pushdown_reaches_scan(spark, sf_dir, name, col):
    df = QUERIES[name](spark, sf_dir)
    pushed = " ".join(A.pushed_filters(df))
    assert col in pushed, f"{name}: filter on {col} not pushed to scan ({pushed!r})"


def test_column_pruning_on_wide_table(spark, sf_dir):
    """lineitem has 16 columns; the pricing summary needs 7 — the scan
    must not read more than it projects + filters."""
    df = QUERIES["agg_pricing_summary"](spark, sf_dir)
    schemas = A.scan_read_schemas(df)
    assert schemas and all(len(s) <= 8 for s in schemas), schemas


def test_per_source_cap_plans_window_group_limit(spark, sf_dir):
    """sample_per_source_cap's docstring claims a WindowGroupLimit:
    each shuffle partition keeps only its per-group top-N before the
    window sort, so the exchange carries O(groups·N) rows. Pin it."""
    df = QUERIES["sample_per_source_cap"](spark, sf_dir)
    assert A.count_nodes(df, "WindowGroupLimit") >= 1


def test_kmeans_deep_assignment_is_shuffle_free(spark, sf_dir):
    """ml_kmeans_deep's returned plan must stay map-only (literal
    centroids; the per-round aggregates ran at construction time) —
    the 0-exchange property PLANS.md records, pinned."""
    df = QUERIES["ml_kmeans_deep"](spark, sf_dir)
    assert A.shuffle_count(df) == 0
