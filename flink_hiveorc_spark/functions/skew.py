"""Skew mitigation: salting recipes for hot keys at 100 TB.

The reference never aggregates or joins, so it never meets skew; its
closest analog is that one hot partition date funnels every record
through one bucket writer (HiveOrcSink.java:97 map, one writer per
dir). At Spark scale, a hot join/group key concentrates a shuffle
partition on one task. First line of defense is AQE skew-join
splitting (on in session.py); these helpers are the explicit recipe
for when AQE can't help — e.g. a skewed AGGREGATION (AQE only splits
join sides) or a key so hot it needs a deterministic fan-out.

Both transforms are semantics-preserving: the salted results are
oracle-checked in the registry against the plain GROUP BY / JOIN.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"


def _salt(buckets: int) -> Column:
    # Deterministic per-row salt (hash of a unique id) so results are
    # reproducible; a random salt would also be correct.
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Callable[[str], Column]]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a synthetic salt key.

    Phase 1 aggregates on (keys + salt) — a hot key's rows spread over
    `salt_buckets` tasks; phase 2 recombines the (tiny) partials on
    the real keys. ``aggs`` maps output name → (phase-1 aggregate,
    phase-2 recombiner over the partial column): sum/count recombine
    with sum, min with min, max with max. Non-decomposable aggregates
    (exact median, count distinct) cannot be salted this way — use
    sketches (approx_percentile / HLL) at scale instead.
    """
    salted = df.withColumn("_salt", _salt(salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[a.alias(name) for name, (a, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[recomb(name).alias(name) for name, (_, recomb) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed fact ⋈ dim equi-join with explicit salting.

    The fact side gets a salt in [0, salt_buckets); the dim side is
    EXPLODED `salt_buckets`× so every (key, salt) pair exists. The hot
    key's rows then land on `salt_buckets` different shuffle
    partitions instead of one. Use only when the dim is too big to
    broadcast and AQE skew splitting doesn't apply (it re-plans
    sort-merge joins only, post-shuffle).
    """
    salted_fact = fact.withColumn("_salt", _salt(salt_buckets))
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_fact.join(exploded_dim, on=[key, "_salt"], how="inner").drop("_salt")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_suppkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n,
           CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation, oracle-checked against the plain
    GROUP BY — proves the decomposition is semantics-preserving."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_suppkey"],
        {
            "sum_qty": (F.sum(F.col("l_quantity").cast(_DEC)), lambda c: F.sum(c)),
            "n": (F.count(F.lit(1)), lambda c: F.sum(c)),
            "min_price": (F.min("l_extendedprice"), lambda c: F.min(c)),
            "max_price": (F.max("l_extendedprice"), lambda c: F.max(c)),
        },
        salt_buckets=8,
    )
    return out.select(
        "l_suppkey",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "n",
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


@query(
    "skew_salted_join",
    oracle="""
    SELECT s.s_nationkey AS nationkey,
           count(*) AS n_li,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact⋈dim join, oracle-checked against the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("s_suppkey"), "l_extendedprice"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = salted_join(li, su, "s_suppkey", salt_buckets=8)
    return joined.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_li"),
        F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_price"),
    )
