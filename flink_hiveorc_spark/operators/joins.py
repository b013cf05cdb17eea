"""Join operators (SURVEY.md §2.3 J1-J6; all [ext] — the reference has
no joins, see SURVEY.md §0/§2.3).

Scale notes (100 TB):
- fact⋈fact equi-joins shuffle on the join key; AQE handles skew
  splitting. Both sides here are keyed on the natural key so the
  shuffle is unavoidable but minimal (pre-projected columns only).
- dimension joins are explicitly ``broadcast()`` — nation/region/
  supplier/customer remain small even at SF100k, so no shuffle of
  the fact side at all.
- the as-of join uses a conditional join + per-left-row top-1; at
  scale, range-partition both sides on (key, time-bucket) so the
  range join stays partition-local (Spark range-join hints apply on
  Databricks; stock Spark gets the window formulation below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"


@query(
    "join_inner_revenue",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_inner_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: two-level inner equi-join with manual aggregate pushdown.

    lineitem is pre-aggregated per l_orderkey BEFORE the join —
    Catalyst does not push aggregates through joins, and the rewrite
    (legal because count/sum are decomposable and l_orderkey is the
    join key) means the map-side partial agg collapses ~4 lineitems
    per order before any network, and the join carries one row per
    order instead of one per lineitem. The orders filter still pushes
    to its scan.

    Trade-off, measured: at sf0.1 the filtered orders side is small
    enough to broadcast, so the original join shuffled nothing and the
    pre-agg costs ~0.7s extra; at 8x (and a fortiori at 100 TB, where
    no fact side broadcasts) the pre-agg wins 3.2s -> 2.3s and the gap
    widens with scale. Scale-correct formulation chosen.
    """
    # Fan the single-row-group lineitem scan out before the per-order
    # partial aggregate (guide §2.5; measured 2.05 -> 1.56 s at
    # sf0.1; no-op at real scale).
    l = parallelize_small_scan(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    per_order = l.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items_o"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias(
            "rev_o"
        ),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("n_items_o").alias("n_items"),
            F.sum("rev_o").cast("double").alias("revenue"),
        )
    )


@query(
    "join_broadcast_region_revenue",
    oracle="""
    SELECT r.r_name,
           n.n_name,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: star join with explicitly broadcast dimensions — the fact
    table is never shuffled for the join (only for the final agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            (
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            ).cast("double").alias("revenue"),
        )
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey,
           c.c_mktsegment,
           count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(25,6))), 0) AS DOUBLE) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join preserving customers with zero orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(_DEC)), F.lit(0).cast(_DEC))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "join_semi_customers_with_open_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4a: left-semi join (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4b: left-anti join (NOT EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_theta_late_shipments",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_late_items
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def join_theta_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: equi-join with a non-equi (range) residual predicate —
    planned as a hash join with the range condition as post-filter,
    so it scales like a plain equi-join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return l.join(o, cond).groupBy("o_orderpriority").agg(F.count("*").alias("n_late_items"))


@query(
    "join_asof_purchase_prior_signup",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           s.event_id AS signup_id,
           CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: as-of join — for each purchase, the latest signup by the
    same user at-or-before the purchase time.

    Spark formulation: union both sides tagged, one window pass per
    user ordered by time carrying the `last signup seen so far`
    (running last_value with ignoreNulls). This is O(n log n) in the
    shuffle with NO pairwise range join — the formulation that
    survives 100 TB (a conditional join + top-1 would explode on hot
    keys; the window version shuffles each row exactly once).

    Tie semantics: ASOF matches `p.ts >= s.ts`, so a signup at the
    EXACT same timestamp as a purchase must be visible to it. The
    window order is therefore (ts_ns, side, event_id) with signups
    ordered BEFORE purchases at equal timestamps — the running
    last-signup is structurally consistent with ASOF semantics rather
    than depending on event_id assignment (ADVICE r1). Among equal-ts
    signups the highest event_id wins (deterministic, matches the
    running `last`).
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "event_type", "ts_ns"
    )
    side = F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", side, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig_id = F.when(F.col("event_type") == "signup", F.col("event_id"))
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts_ns"))
    enriched = tagged.select(
        "*",
        F.last(sig_id, ignorenulls=True).over(w).alias("signup_id"),
        F.last(sig_ts, ignorenulls=True).over(w).alias("signup_ts_ns"),
    )
    return (
        enriched.filter((F.col("event_type") == "purchase") & F.col("signup_id").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "signup_id",
            (F.expr("ts_ns div 1000") - F.expr("signup_ts_ns div 1000")).alias("lag_us"),
        )
    )


@query(
    "subquery_above_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                                      / count(*) AS DOUBLE) FROM orders)
    """,
)
def subquery_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders above the global average price.
    The single-row aggregate is broadcast against the scan (no
    shuffle of the fact side; Catalyst plans the scalar subquery as
    a broadcast nested-loop with a 1-row build — effectively a
    predicate). Average is decomposed into exact decimal sum / count
    for oracle bit-parity."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (F.sum(F.col("o_totalprice").cast(_DEC)).cast("double") / F.count("*")).alias("a")
    )
    return (
        o.join(F.broadcast(avg_price), F.col("o_totalprice") > F.col("a"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, two pushed date/segment filters,
    aggregate, total-order top-10. The customer filter broadcasts the
    surviving keys; both fact filters reach their scans (min/max
    row-group skipping); the final LIMIT plans a TakeOrderedAndProject
    — no full sort of the aggregate output."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the c_nationkey = s_nationkey
    'local supplier' condition. Dims (supplier/nation/region) are
    broadcast so only the customer⋈orders⋈lineitem chain shuffles;
    the region filter prunes the broadcast before it ships."""
    c = load_table(spark, sf_dir, "customer")
    # Fan the streamed side of the broadcast-join chain out to the core
    # count (guide §2.5): at bench scale the planner broadcasts every
    # other input and streams this single-row-group orders scan, so the
    # whole 6-way probe ran on one core. Filter first: pushdown stays
    # at the scan. No-op at real scale.
    o = parallelize_small_scan(
        load_table(spark, sf_dir, "orders").filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc())
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last half-year —
    4-way join, returnflag + date-window filters pushed to the scans,
    top-20 with unique-key tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation PAIR per year —
    the nation dim joins twice under different roles (supplier-side
    and customer-side aliases), with the symmetric pair predicate."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    cn = F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        s.join(l, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name,
           c.c_custkey,
           o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, totalprice
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregation-DRIVEN semi-join — the qualifying
    set (orders whose total quantity exceeds a threshold) is itself an
    aggregate, then drives a left-semi join before the main 3-way
    join+agg. At scale the HAVING aggregate collapses lineitem to
    order-grain before any join, and the semi-join ships only
    qualifying keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .filter(F.col("qty") > 150)
        .select("l_orderkey")
    )
    qualifying = o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
    return (
        c.join(qualifying, c.c_custkey == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"))
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT round(CAST(100.00 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))
                 ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE), 8)
           AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio over a fact⋈dim
    join — one global result from two interleaved decimal sums; the
    date window pushes to the lineitem scan and part broadcasts."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0).cast(_DEC))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            # ×100 in the DECIMAL domain (exact), matching the
            # oracle's 100.00 * sum(decimal); doing it in double
            # diverges in the last bit. The final round(.,8) absorbs
            # DuckDB's mis-rounded DECIMAL→DOUBLE cast on WIDE sums —
            # the 1-ulp drift surfaced only at sf0.1 (local replica r5).
            F.round(
                (F.sum(promo) * F.lit(100)).cast("double")
                / F.sum(disc).cast("double"),
                8,
            ).alias("promo_revenue_pct")
        )
    )


_HOUR_US = 3_600_000_000
_WIN_US = 6 * _HOUR_US  # 6-hour windows


@query(
    "join_interval_bucketed",
    oracle=f"""
    WITH w AS (
      SELECT event_id AS window_id, epoch_us(ts) AS w_start
      FROM events
      WHERE event_type = 'signup' AND user_id % 100 = 0
    ),
    p AS (
      SELECT epoch_us(ts) AS t_us, value
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT w.window_id,
           count(*) AS n_purchases,
           CAST(sum(CAST(p.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM w JOIN p
      ON p.t_us >= w.w_start AND p.t_us < w.w_start + {_WIN_US}
    GROUP BY w.window_id
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: point-in-interval join WITHOUT an equi key — purchases
    falling inside any 6-hour signup window — executed as an
    EQUI-join on time buckets plus a residual range filter.

    The naive plan for `ON t BETWEEN start AND end` is a broadcast
    nested loop: every point × every window. Bucketing rewrites it:
    each window explodes to the ~7 hour-buckets it covers, each point
    has exactly ONE bucket, and the join becomes a hash join on the
    bucket key (a point meets a window only in the point's own
    bucket, so no pair dedup is needed). At 100 TB this is the
    difference between |points|×|windows| comparisons and
    |points| + 7·|windows| shuffled rows, and the bucket key
    distributes uniformly in time (salt only if windows cluster
    pathologically). Bucket width should approximate the window
    span: too fine multiplies the window fan-out, too coarse
    multiplies residual-filter misses."""
    ev = load_table(spark, sf_dir, "events")
    w = ev.filter((F.col("event_type") == "signup") & (F.col("user_id") % 100 == 0)).select(
        F.col("event_id").alias("window_id"),
        F.expr("ts_ns div 1000").alias("w_start"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.expr("ts_ns div 1000").alias("t_us"), "value"
    )
    wb = w.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"w_start div {_HOUR_US}"),
                F.expr(f"(w_start + {_WIN_US} - 1) div {_HOUR_US}"),
            )
        ),
    )
    pb = p.withColumn("bucket", F.expr(f"t_us div {_HOUR_US}"))
    return (
        pb.join(F.broadcast(wb), "bucket")
        .filter((F.col("t_us") >= F.col("w_start")) & (F.col("t_us") < F.col("w_start") + _WIN_US))
        .groupBy("window_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
    )


@query(
    "rel_division_every_year",
    oracle="""
    SELECT o_custkey AS c_custkey, count(*) AS n_years
    FROM (
      SELECT DISTINCT o_custkey, year(o_orderdate) AS y
      FROM orders
      WHERE year(o_orderdate) BETWEEN 1996 AND 1998
    )
    GROUP BY o_custkey
    HAVING count(*) = 3
    """,
)
def rel_division_every_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: relational division ("for all") — customers with at least
    one order in EVERY year 1996-1998, via the count-distinct
    reduction (|distinct years per customer| = |required set|): one
    dedup + one aggregate, no iterated anti-joins. The year filter
    prunes at the scan; the distinct and the aggregate share the
    o_custkey shuffle."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    return (
        o.filter(y.between(1996, 1998))
        .select(F.col("o_custkey").alias("c_custkey"), y.alias("y"))
        .distinct()
        .groupBy("c_custkey")
        .agg(F.count("*").alias("n_years"))
        .filter(F.col("n_years") == 3)
    )


@query(
    "lateral_top3_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey,
           CAST(t.o_totalprice AS DOUBLE) AS totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 3
    ) t
    WHERE c.c_custkey % 10 = 0
    """,
)
def lateral_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: correlated LATERAL subquery with per-row ORDER BY + LIMIT —
    the SQL-frontend form of top-N-per-group, run through spark.sql
    over the registered views (both engines parse the IDENTICAL SQL
    text; Catalyst decorrelates the lateral into a window/limit plan
    rather than executing a per-row probe). The DataFrame-API twin is
    window_topk_orders_per_priority."""
    from flink_hiveorc_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
               CAST(t.o_totalprice AS DOUBLE) AS totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3
        ) t
        WHERE c.c_custkey % 10 = 0
        """
    )


@query(
    "join_asof_forward_tolerance",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'signup'
    ),
    m AS (
      SELECT s.event_id AS signup_id, s.user_id, s.ts_us AS s_us,
             min(p.ts_us) AS p_us
      FROM s JOIN p ON p.user_id = s.user_id
                   AND p.ts_us >= s.ts_us
                   AND p.ts_us <= s.ts_us + 172800000000
      GROUP BY 1, 2, 3
    )
    SELECT m.signup_id, m.user_id,
           min(p.event_id) AS purchase_id,
           CAST(m.p_us - m.s_us AS BIGINT) AS lead_us
    FROM m JOIN p ON p.user_id = m.user_id AND p.ts_us = m.p_us
    GROUP BY m.signup_id, m.user_id, m.p_us, m.s_us
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6b: FORWARD as-of join with a tolerance bound — for each
    signup, the FIRST purchase by the same user within 48 h at-or-
    after it (pandas merge_asof(direction='forward', tolerance=...)).

    Same single-window formulation as the backward variant
    (join_asof): union both sides tagged, scan each user's timeline
    in DESCENDING time carrying the nearest future purchase — every
    row shuffles exactly once, no pairwise range join, so hot users
    cost O(their rows), not O(rows²). The tolerance is a post-filter
    on the matched lead (the nearest future purchase is minimal, so
    if IT misses the bound, no purchase qualifies).

    Tie order (mirror of the backward ASOF fix, ADVICE r1): at equal
    timestamps the scan must pass purchases BEFORE signups so a
    same-instant purchase is visible (>= semantics); among equal-ts
    purchases event_id DESCENDING makes the running `last` resolve to
    the LOWEST event_id — "first purchase" is deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "event_type", "ts_ns"
    )
    side = F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_ns"), side, F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_id = F.when(F.col("event_type") == "purchase", F.col("event_id"))
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts_ns"))
    enriched = tagged.select(
        "*",
        F.last(p_id, ignorenulls=True).over(w).alias("purchase_id"),
        F.last(p_ts, ignorenulls=True).over(w).alias("purchase_ts_ns"),
    )
    lead_us = F.expr("purchase_ts_ns div 1000") - F.expr("ts_ns div 1000")
    return (
        enriched.filter(
            (F.col("event_type") == "signup") & F.col("purchase_id").isNotNull()
        )
        .select(
            F.col("event_id").alias("signup_id"),
            "user_id",
            "purchase_id",
            lead_us.alias("lead_us"),
        )
        .filter(F.col("lead_us") <= 48 * 3600 * 1_000_000)
    )


@query(
    "join_full_outer_daily_activity",
    oracle="""
    WITH p AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    c AS (
      SELECT CAST(ts AS DATE) AS day, count(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1
    )
    SELECT strftime(coalesce(p.day, c.day), '%Y-%m-%d') AS day,
           coalesce(p.n_purchases, 0) AS n_purchases,
           coalesce(c.n_clicks, 0) AS n_clicks
    FROM p FULL OUTER JOIN c ON p.day = c.day
    """,
)
def join_full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 completion: FULL OUTER reconciliation of two independently
    aggregated series (daily purchases vs daily clicks) — the audit
    shape where neither side may silently drop a day the other saw.
    Both inputs pre-aggregate before the join, so the full-outer
    shuffle carries day-level rows, not events; at 100 TB this is the
    only full-outer shape that scales (full outer on raw fact tables
    is a data-quality smell — reconcile aggregates, not rows)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count("*").alias("n_purchases"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count("*").alias("n_clicks"))
    )
    return p.join(c, "day", "full_outer").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
    )


# ---------------------------------------------------------------------------
# J10 [ext]: bloom-filter prefilter join (runtime row-level filtering,
# made explicit). Spark's AQE can inject this automatically
# (spark.sql.optimizer.runtime.bloomFilter.enabled) when stats warrant;
# this operator builds the same artifact declaratively so the pattern
# is testable and portable to engines/versions without the rule.
# ---------------------------------------------------------------------------

BLOOM_WORDS = 256  # 16384 bits = 2 KiB
BLOOM_BITS = BLOOM_WORDS * 64
BLOOM_K = 3  # Kirsch-Mitzenmacher: g_i = h1 + i*h2 (mod m)
_BLOOM_PRICE_MIN = 450_000.0


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """k bit positions for a bigint key via two xxhash64 draws.

    Kirsch-Mitzenmacher 2006: two independent hashes simulate k with
    no loss in the FPR bound. Both hashes are reduced mod m BEFORE the
    linear combination so the arithmetic stays far from long overflow
    (the engine runs ANSI mode: a wrapping h1 + i*h2 would throw).
    """
    h1 = F.pmod(F.xxhash64(key), F.lit(BLOOM_BITS))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(BLOOM_BITS))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(BLOOM_BITS)) for i in range(BLOOM_K)]


def build_bloom_bitmap(keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate a 16384-bit bloom bitmap over a key column, JVM-side.

    Each key explodes to its k (word, bit) contributions; a bit_or
    groupBy over at most BLOOM_WORDS=256 integer groups folds them —
    the shuffle carries <= 3 tiny rows per key into <= 256 groups, and
    the collect is bounded at 256 rows regardless of key count (the
    bounded-collect inventory in PLANS.md/VERDICT covers this site).
    """
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("p")
    )
    words = (
        pos.select(
            F.shiftright("p", 6).alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    bitmap = [0] * BLOOM_WORDS
    for row in words.collect():  # bounded: <= BLOOM_WORDS rows
        bitmap[row["w"]] = row["bits"]
    return bitmap


def bloom_prefilter(df: DataFrame, key_col: str, bitmap: list[int]) -> DataFrame:
    """Filter ``df`` to rows whose ``key_col`` might be in the bloom
    set, as pure column expressions (constant-folded literal array; no
    broadcast join, no shuffle — the probe side is filtered in place
    inside its scan stage). h1/h2 are materialized once per row so the
    k probes share them instead of re-hashing."""
    hashed = df.select(
        "*",
        F.pmod(F.xxhash64(key_col), F.lit(BLOOM_BITS)).alias("_bh1"),
        F.pmod(F.xxhash64(key_col, F.lit(1)), F.lit(BLOOM_BITS)).alias("_bh2"),
        # 256 bitmap words as one parsed expression — per-element
        # lit() costs a py4j round trip each (~0.25 s for the array)
        F.expr(
            "array(" + ", ".join(f"{int(w)}L" for w in bitmap) + ")"
        ).alias("_bloom"),
    )
    tests = [
        f"(element_at(_bloom, CAST(pmod(_bh1 + {i} * _bh2, {BLOOM_BITS}) DIV 64 AS INT) + 1)"
        f" & shiftleft(1L, CAST(pmod(_bh1 + {i} * _bh2, {BLOOM_BITS}) % 64 AS INT))) != 0"
        for i in range(BLOOM_K)
    ]
    return hashed.filter(F.expr(" AND ".join(tests))).drop("_bh1", "_bh2", "_bloom")


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O' AND o.o_totalprice > 450000
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: equi-join with an explicit bloom-filter prefilter on the
    probe side (the 100 TB "runtime filter" pattern).

    Scenario: revenue of open orders above 450k. The build side
    (filtered orders) is ~3% of orders — at SF100k that is millions
    of keys: too many rows to broadcast as a hash relation, but their
    2 KiB bloom bitmap travels free inside the probe-side filter
    expression. The probe (lineitem, the 100 TB fact) is filtered
    IN ITS SCAN STAGE to rows whose l_orderkey might match, so the
    join shuffle moves only ~selectivity + FPR of the fact table.

    Bloom has no false negatives, so the final exact join restores
    precise semantics — the oracle is the PLAIN join; the bitmap only
    prunes. Sizing rule documented, not hidden: FPR ~= (1-e^(-kn/m))^k;
    with m=16384, k=3 this is ~6e-4 at sf0.01 (n~500) and degrades to
    ~0.2 at sf0.1 (n~5000) — at real scale size m ~= 1.44*n*log2(1/eps)
    and build the bitmap with the same bit_or groupBy (m/64 groups),
    or enable spark.sql.optimizer.runtime.bloomFilter.enabled and let
    AQE inject it when the build side beats the stats thresholds.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    build = orders.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > _BLOOM_PRICE_MIN)
    ).select("o_orderkey", "o_orderpriority")
    bitmap = build_bloom_bitmap(build.select("o_orderkey"), "o_orderkey")
    probe = bloom_prefilter(
        li.select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey", bitmap
    )
    joined = probe.join(build, probe.l_orderkey == build.o_orderkey)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_DAY_US = 86_400_000_000
_IV_WEEK = 7  # bucket width (days) for the overlap-join band index


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(epoch_us(ts) // {_DAY_US} AS BIGINT) AS day
      FROM events
    ),
    runs AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM days
    ),
    iv AS (
      SELECT user_id, grp, min(day) AS d0, max(day) AS d1
      FROM runs GROUP BY user_id, grp
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_overlaps,
           CAST(sum(least(a.d1, b.d1) - greatest(a.d0, b.d0) + 1) AS BIGINT)
             AS total_overlap_days
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.d0 <= b.d1 AND b.d0 <= a.d1
    GROUP BY a.user_id, b.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: interval×interval OVERLAP join — which pairs of users have
    overlapping activity spans, and for how long. The second classic
    range-join shape after point-in-interval (join_interval_bucketed):
    campaign-overlap, co-presence, and resource-contention queries
    all reduce to it.

    Intervals are activity RUNS: consecutive active days per user
    (gaps-and-islands on the distinct-day table — day minus
    row_number is constant within a run). The overlap join itself is
    the scale-critical part: a naive theta-join `a.d0 <= b.d1 AND
    b.d0 <= a.d1` is a cross product to Spark (BNLJ), so each
    interval is EXPLODED into its covered {_IV_WEEK}-day band buckets
    and the join runs as an EQUI-join on the band — two overlapping
    intervals always share the band containing max(d0_a, d0_b), so
    band-equality is a complete candidate filter; the exact predicate
    then verifies, and requiring the matched band to BE the canonical
    band containing max(d0_a, d0_b) makes every overlapping pair
    match in EXACTLY one band — no post-join distinct at all (the
    first formulation dedup'd multi-band double-hits through a wide
    8-column distinct; at sf0.1 that shuffle was 60% of the runtime,
    9.4 s → 3.5 s dropping it). Candidate volume is O(Σ span/band) per
    band cell, never |A|×|B|; band width trades index size against
    false candidates exactly like the point-in-interval bucketer.
    The oracle states the same join as the direct theta-join (DuckDB
    runs it as an IEJoin — small enough at oracle scale).

    Overlap lengths are integer DAYS (closed intervals), so sums are
    exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr(f"ts_ns div 1000 div {_DAY_US}").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    runs = days.select("user_id", "day", (F.col("day") - F.row_number().over(w)).alias("grp"))
    iv = runs.groupBy("user_id", "grp").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    banded = iv.select(
        "user_id",
        "d0",
        "d1",
        F.explode(
            F.sequence(F.expr(f"d0 div {_IV_WEEK}"), F.expr(f"d1 div {_IV_WEEK}"))
        ).alias("band"),
    )
    # The band index is intentionally coarse, so a popular band holds
    # O(active users) entries and the within-band candidate check is
    # quadratic in that count — Σ band² residual evaluations, which AQE
    # coalesces onto ~1 probe task at bench scale (the banded table is
    # tiny in BYTES). Round-robin the PROBE side across the cluster so
    # the quadratic residual work and the post-join partial aggregation
    # parallelize (guide §2.5 — skewed build buckets are the hash-join
    # analogue of an unsplittable input). The exchanged payload is the
    # interval-band table (≈ run count, ≪ events), so the extra
    # exchange is noise at any scale; measured at sf0.1: 2.6 → 1.4 s.
    # (ADVICE r15 suggested the parallelize_small_scan-style
    # >= defaultParallelism guard here; not applicable: `banded` is a
    # WIDE frame — window + groupBy upstream — and probing .rdd
    # partition counts on a wide frame under AQE executes the upstream
    # stages, the exact hidden-job hazard that helper's wide-node
    # pass-through exists to avoid. The unconditional exchange carries
    # ≈ run-count rows of four ints; at any scale its bytes are noise
    # next to the Σband² residual work it spreads.)
    a = banded.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = banded.alias("b")
    # Join strategy deliberately left to the planner (guide §3,
    # measured): pinning sort-merge here (hint("merge")) to force
    # exchange reuse of the duplicated upstream was SLOWER (2.2 →
    # 2.7 s fresh at sf0.1) — AQE's runtime stage cache already reuses
    # the canonically-identical banded subplan under the broadcast
    # shape, so the hint only added two sorts and a shuffle join. At
    # real scale the size-based planner stops broadcasting on its own.
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.d0") <= F.col("b.d1"))
        & (F.col("b.d0") <= F.col("a.d1"))
        # canonical-band gate: each overlapping pair matches in exactly
        # the band holding the later start — no post-join distinct
        & (
            F.col("a.band")
            == F.expr(f"greatest(a.d0, b.d0) div {_IV_WEEK}")
        ),
    ).select(
        F.col("a.user_id").alias("user_a"),
        F.col("a.d0").alias("d0_a"),
        F.col("a.d1").alias("d1_a"),
        F.col("b.user_id").alias("user_b"),
        F.col("b.d0").alias("d0_b"),
        F.col("b.d1").alias("d1_b"),
    )
    return pairs.groupBy("user_a", "user_b").agg(
        F.count("*").alias("n_overlaps"),
        F.sum(
            F.least("d1_a", "d1_b") - F.greatest("d0_a", "d0_b") + 1
        ).cast("bigint").alias("total_overlap_days"),
    )


@query(
    "join_temporal_scd2_enrich",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS t_us, event_id,
             lag(event_type) OVER w AS prev_state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    changes AS (
      SELECT user_id, state, t_us, event_id
      FROM ordered
      WHERE prev_state IS NULL OR state <> prev_state
    ),
    scd2 AS (
      SELECT user_id, state,
             t_us AS valid_from_us,
             lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id)
               AS valid_to_us
      FROM changes
    )
    SELECT s.state AS state_at_event, e.event_type,
           count(*) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events e
    JOIN scd2 s
      ON s.user_id = e.user_id
     AND epoch_us(e.ts) >= s.valid_from_us
     AND (s.valid_to_us IS NULL OR epoch_us(e.ts) < s.valid_to_us)
    GROUP BY s.state, e.event_type
    """,
)
def join_temporal_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11: TEMPORAL dimension enrichment — join every fact event to
    the SCD2 dimension version valid at its event time (half-open
    [valid_from, valid_to) intervals from cdc_scd2_user_state), then
    aggregate behavior by state-at-event-time × event type. This is
    the canonical warehouse "as the world was THEN" join: pricing at
    order time, plan tier at usage time, CRM state at touch time.

    Scale shape: the join key is the EQUI key (user_id) — the
    interval predicate is a residual filter on the co-partitioned
    pair, never a cross/theta join; per-key SCD2 intervals are
    non-overlapping half-open spans, so each event matches EXACTLY
    one version (a zero-length [t, t) version — two state changes in
    the same microsecond — matches nothing, and the event binds to
    the successor version, deterministically in both engines). At
    100 TB both sides shuffle once on user_id; if the dimension is
    small it broadcasts instead. Composes the registered SCD2
    builder verbatim, so the lineage dimension-build → temporal-join
    is oracle-checked end to end."""
    from flink_hiveorc_spark.functions.analytics import cdc_scd2_user_state

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("value"), F.expr("ts_ns div 1000").alias("t_us")
    )
    scd2 = cdc_scd2_user_state(spark, sf_dir)
    joined = ev.join(
        scd2,
        (ev.user_id == scd2.user_id)
        & (ev.t_us >= scd2.valid_from_us)
        & (scd2.valid_to_us.isNull() | (ev.t_us < scd2.valid_to_us)),
    )
    return joined.groupBy(
        F.col("state").alias("state_at_event"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
    )


@query(
    "join_hint_sort_merge",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def join_hint_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§4 physical control: the SAME fact⋈fact join forced onto
    SORT-MERGE via .hint("merge") — the explicit-strategy escape
    hatch for when the optimizer's default is wrong for the workload
    (e.g., both sides pre-sorted on the key by an upstream stage, or
    a broadcast estimate that would OOM the executors). Results are
    identical by construction (hints never change semantics — the
    oracle is the plain join); the PLAN is pinned to SortMergeJoin in
    tests/test_r5c_operators.py next to a shuffle-hash-hinted twin,
    so the hint surface is regression-checked, not assumed.

    100 TB note: SMJ is the robust default for large same-size
    fact⋈fact joins (spillable sort, no hash-table build-side OOM
    risk); the hint matters when AQE's local stats mislead it —
    exactly the case this query pins."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        l.hint("merge")
        .join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .cast("double")
            .alias("revenue"),
        )
    )
