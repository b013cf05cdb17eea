"""Classic benchmark query shapes, round 2 (SURVEY.md §2.11
"multi-join benchmark shapes"; all [ext] — the reference has no query
surface at all, SURVEY.md §0).

The corpus is a reduced TPC-H (no partsupp, no l_commitdate /
l_receiptdate / l_shipmode, no phone/comment columns — TESTDATA.md),
so queries whose predicates need those columns are adapted: the JOIN
GRAPH and plan shape are preserved, the missing predicate is replaced
by one the corpus supports (each docstring states the substitution).

Determinism: monetary sums go through DECIMAL(25,6) (exact), final
ratios/divisions in double; quantity sums/avgs stay in double (values
are small integers — exact in IEEE754); every ORDER BY carries a
unique-key tiebreak.

Scale notes (100 TB): every query here keeps dims broadcast
(part/supplier/nation/region and filtered customer survive well under
the broadcast threshold even at SF100k), pushes its date/brand/size
filters to the scans, and aggregates fact rows before any join that
would multiply them. Correlated scalar subqueries (Q17's per-part avg,
Q15/Q11's global max/total) become explicit pre-aggregations joined
back — the Spark-native form of decorrelation, with the single-row
side broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def _revenue_dec():
    return F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate, zero joins — the query
    whose entire cost is scan efficiency. All three predicates reach
    the parquet reader (PushedFilters); only 4 columns are read; the
    single global sum is a partial-agg + 1-row exchange."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated non-equi residual →
    left-semi join. Substitution: the corpus has no l_commitdate /
    l_receiptdate, so "late line" is l_shipdate > o_orderdate + 60
    days (same correlated-predicate shape). The semi join shuffles
    each order key once and short-circuits on first match — no
    row multiplication for multi-line orders."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
                / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
        AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the 8-way join with nation in
    TWO roles (customer's for the region filter, supplier's for the
    share). Every dim is broadcast; the only shuffles are the
    lineitem⋈orders key exchange and the 2-row final agg. The share
    is a conditional-sum / sum ratio computed in one pass (no
    self-join on the year)."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    s = F.broadcast(load_table(spark, sf_dir, "supplier")).select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation")).select("n_nationkey", "n_regionkey")
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("nation")
        )
    )
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") <= _ts("1997-12-31"))
    )
    # Fan-out of the lineitem scan measured a LOSS here (exec 0.37 →
    # 0.93 s: the added full-fact exchange outweighs the single-task
    # probe, unlike q5 where the probe chain is wider per row) —
    # deliberately left as the planner's single-task scan.
    l = load_table(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == n1.n_nationkey)
        .join(r, n1.n_regionkey == r.r_regionkey)
        .join(n2, s.s_nationkey == F.col("n2_nationkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    with a predicate INSIDE the join condition (zero-order customers
    must survive), double aggregation. Substitution: the corpus has
    no o_comment, so the excluded class is '1-URGENT' orders. First
    agg shuffles on custkey, second on the (tiny) count domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT")
    return (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — a reused
    aggregate ("view") compared against its own global max. The
    revenue agg is computed ONCE and self-compared via a broadcast
    1-row max (no window over the whole table, no recompute; the
    decimal max equality is exact, so ties return every tied
    supplier exactly like the SQL)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_revenue_dec().alias("total_revenue"))
        # One shuffle produces the view; localCheckpoint would pin it,
        # but at this size recompute-vs-reuse is AQE's call and both
        # branches below reference the same plan subtree (Spark reuses
        # the exchange).
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(25,6))) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — correlated scalar
    subquery (per-part average) decorrelated into a pre-aggregation
    joined back on partkey. Substitution: no p_container column, so
    the part class is p_brand alone. The per-part avg is computed
    only over lineitems of qualifying parts (identical result — the
    correlation key is a subset). l_quantity is integral, so the
    double avg is exact and engine-independent."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    li = l.join(p, l.l_partkey == p.p_partkey).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive (OR-of-ANDs) mixed-table predicate over
    an equi-join. Substitution: no p_container / l_shipmode, so each
    disjunct is (brand, size range, quantity range). The part side of
    the disjunction (brand ∈ {12,19,24}) is factored out and pushed
    to the broadcast build; the cross-table residual stays in the
    join filter — Catalyst keeps the join an equi hash join rather
    than a nested loop."""
    disj_part = (
        (F.col("p_brand") == "Brand#12")
        | (F.col("p_brand") == "Brand#19")
        | (F.col("p_brand") == "Brand#24")
    )
    p = F.broadcast(load_table(spark, sf_dir, "part").filter(disj_part)).select(
        "p_partkey", "p_brand", "p_size"
    )
    l = load_table(spark, sf_dir, "lineitem")
    full = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(full)
        .agg(_revenue_dec().cast("double").alias("revenue"))
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9','NATION_11','NATION_13')
      AND c.c_acctbal > (
        SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
        FROM customer c2
        WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY nation
    ORDER BY nation
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: wealthy-but-idle customers — scalar subquery
    (global positive-balance average) + anti join against recent
    orders. Substitution: no c_phone, so the country code is the
    nation name. The average decomposes into exact decimal sum /
    count (bit-identical across engines); the anti join shuffles
    only custkeys of the filtered date range."""
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin(
                "NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9", "NATION_11", "NATION_13"
            )
        )
    )
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")).alias("avg_bal")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    return (
        c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .join(recent, F.col("c_custkey") == recent.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH base AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(25,6)) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS value
    FROM base
    GROUP BY l_partkey
    HAVING CAST(sum(v) AS DOUBLE) > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM base)
    ORDER BY value DESC, l_partkey
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a fraction of the GLOBAL
    total over the same filtered set — group-by + HAVING against a
    broadcast scalar. Substitution: no partsupp table, so "stock
    value" is lineitem extendedprice shipped by NATION_3 suppliers.
    The filtered base is aggregated per partkey ONCE; the global
    total reuses the per-part aggregates (sum of sums — one extra
    1-row stage instead of a second scan). Both sides of the
    comparison derive from exact decimal sums cast to double, so the
    threshold is bit-deterministic."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier")).select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    ).select("n_nationkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("v_dec"))
    )
    total = per_part.agg((F.sum("v_dec").cast("double") * F.lit(0.001)).alias("thresh"))
    return (
        per_part.join(F.broadcast(total), F.col("v_dec").cast("double") > F.col("thresh"))
        .select("l_partkey", F.col("v_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "tpch_q16_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier variety per part class with
    a NOT IN exclusion → anti join. Substitution: no partsupp (the
    supplier-part relation is the one observed in lineitem) and no
    s_comment (excluded suppliers are those with negative balance).
    The exclusion list is tiny → broadcast anti join; the distinct
    count deduplicates (class, suppkey) BEFORE the final agg so the
    shuffle carries unique pairs only."""
    excl = F.broadcast(
        load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    ).select("s_suppkey")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(excl, l.l_suppkey == excl.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count("*").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q2_best_supplier",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
           CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, n.n_name AS nation
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT max(s2.s_acctbal)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, p.p_partkey, s.s_suppkey
    LIMIT 100
    """,
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part best supplier in a region —
    correlated max over the candidate set, decorrelated as a window
    max over the SAME joined relation (one pass; no second join tree
    like the SQL's correlated subquery implies). Substitution: no
    partsupp, so the supplier-part relation is distinct lineitem
    pairs and "best" is max s_acctbal (stands in for min
    ps_supplycost). Ties keep every tied supplier (equality on the
    stored double is exact in both engines)."""
    from pyspark.sql.window import Window

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
        )
    ).select("p_partkey", "p_name")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    cand = (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .join(s, s.s_suppkey == ps.l_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mx"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
               - CAST((0.4 * p.p_retailprice) * l.l_quantity AS DECIMAL(25,6)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-type profit by nation and year. Substitution:
    no partsupp, so supply cost is 0.4·p_retailprice per unit (the
    join graph — part/supplier/lineitem/orders/nation with a LIKE
    filter on part name — is unchanged; the partsupp hop collapses
    into the broadcast part side). The LIKE '%red%' filter prunes the
    broadcast BEFORE it ships; profit amounts are decimal-exact."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ).select("p_partkey", "p_retailprice")
    s = F.broadcast(load_table(spark, sf_dir, "supplier")).select("s_suppkey", "s_nationkey")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = load_table(spark, sf_dir, "lineitem")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC) - (
        (F.lit(0.4) * F.col("p_retailprice")) * F.col("l_quantity")
    ).cast(_DEC)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_class,
           count(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
           count(*) FILTER (o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: priority mix per shipping class. Substitution: no
    l_shipmode / commit/receipt dates, so the class is the ship-delay
    bucket (late = shipped >60 days after ordering) — same
    group-on-derived-class + dual conditional-count shape. The date
    filter reaches the lineitem scan; the conditional counts fold
    map-side."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ship_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), "late"
    ).otherwise("ontime")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(ship_class.alias("ship_class"))
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
      AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who SOLELY delayed multi-supplier orders —
    the double-correlated EXISTS / NOT EXISTS query. Substitution:
    lateness is ship-vs-order delay (no commit/receipt dates).

    Decorrelation: both correlated subqueries reduce to per-order
    aggregates over ONE auxiliary frame —
      EXISTS(other supplier)       ⟺ distinct suppliers in order ≥ 2,
      NOT EXISTS(other late supp)  ⟺ distinct LATE suppliers = 1
    (l1 is itself late, so 'exactly one late supplier' pins it to
    l1's). Two broadcast-joined aggregates replace two correlated
    probes per row — the 100 TB form, since each aggregate shuffles
    the fact table once on the join key instead of probing per row."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    multi_supp = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supps"))
        .filter(F.col("n_supps") >= 2)
        .select(F.col("l_orderkey").alias("ms_orderkey"))
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_late_supps"))
        .filter(F.col("n_late_supps") == 1)
        .select(F.col("l_orderkey").alias("sl_orderkey"))
    )
    return (
        late.join(multi_supp, late.l_orderkey == F.col("ms_orderkey"))
        .join(sole_late, late.l_orderkey == F.col("sl_orderkey"))
        .join(s, late.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "tpch_q20_heavy_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l.l_partkey, l.l_suppkey, sum(l.l_quantity) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%red%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    ),
    thresh AS (
      SELECT l_partkey, 1.5 * (CAST(sum(qty) AS DOUBLE) / count(*)) AS qty_thresh
      FROM sp GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s.s_suppkey IN (
        SELECT sp.l_suppkey FROM sp
        JOIN thresh t ON t.l_partkey = sp.l_partkey
        WHERE sp.qty > t.qty_thresh
      )
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers who moved disproportionate volume of a
    part class — the nested-IN-subqueries query. Substitution: no
    partsupp/availqty, so "heavy" means shipping >1.5× the per-part
    average supplier quantity of 'red' parts in 1996.

    Decorrelated as: per-(part,supplier) quantities aggregated ONCE,
    the per-part threshold derived FROM that aggregate (sum-of-sums,
    no second scan), the qualifying-supplier set distinct'd, then a
    semi join into the supplier dim. Quantities are integral doubles
    (exact), the threshold is one deterministic divide+multiply."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    sp = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = sp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(1.5) * (F.sum("qty").cast("double") / F.count("*"))).alias("qty_thresh")
    )
    heavy = (
        sp.join(F.broadcast(thresh), sp.l_partkey == F.col("t_partkey"))
        .filter(F.col("qty") > F.col("qty_thresh"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
        )
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
        .orderBy("s_suppkey")
    )
