"""Aggregation operators (SURVEY.md §2.4 A1-A5; all [ext]).

Determinism: monetary sums run through DECIMAL casts (exact, order-
independent); averages/stddev are reconstructed from exact decimal
sums with the final arithmetic in IEEE double so Spark and the DuckDB
oracle produce bit-identical values. Spark executes these as
partial (map-side) + final hash aggregates automatically — at 100 TB
the partial agg collapses each of the billions of input rows into a
handful of groups per task before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"
_DEC2 = "decimal(30,6)"


def _dsum(col):
    return F.sum(F.col(col).cast(_DEC)).cast("double")


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A5 flagship: TPC-H Q1-style pricing summary. The shipdate
    filter pushes down to the parquet scan (min/max row-group skip)."""
    # Fan the single-row-group scan out to the core count before the
    # 8-aggregate pass (guide §2.5 unsplittable input; measured 2.05
    # -> 1.16 s at sf0.1 — the widest per-row aggregate battery in the
    # TPC-H set; no-op at real scale). Filter first: pushdown stays
    # at the scan.
    l = parallelize_small_scan(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity").alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price.cast(_DEC)).cast("double").alias("sum_disc_price"),
        F.sum(charge.cast(_DEC)).cast("double").alias("sum_charge"),
        (_dsum("l_quantity") / n).alias("avg_qty"),
        (_dsum("l_extendedprice") / n).alias("avg_price"),
        (_dsum("l_discount") / n).alias("avg_disc"),
        n.alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (exact): per-type distinct users. Exact distinct expands to
    a two-phase agg; the approx variant below avoids that expansion."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _dsum("value").alias("total_value"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (approx): HyperLogLog++ distinct — the 100 TB default (no
    per-group value expansion, fixed-size sketch per group).

    TOLERANCE ORACLE (r3 VERDICT #3): the raw HLL estimate is
    engine-specific, so it cannot be hash-compared — instead the
    query emits the exact count plus a boolean asserting the
    estimate landed within 5% of it (rsd=0.01, so 5% is >4 sigma).
    The oracle emits the same exact count and literal TRUE: the
    driver's value hash now FAILS if the estimate drifts out of
    tolerance, turning the old `err: no_oracle` rows-only cell into
    a real check.

    The two aggregates run as SEPARATE jobs joined on the group key:
    fused into one .agg(), Catalyst routes the HLL through the exact
    distinct's expand/regroup, maintaining one 2^14-register sketch
    per (type, user) PAIR in the partial phase — measured 1.8 s vs
    1.0 s split at sf0.1, and the waste scales with distinct pairs
    (at 100 TB it is billions of 16 KB sketches). Split, the
    approx pass is the production shape (5 sketches total) and the
    exact pass is a plain distinct rewrite."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("_approx")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return exact.join(approx, "event_type").select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_approx") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("within_5pct"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3a: hierarchical subtotals (flag → flag×status → grand total)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"), _dsum("l_quantity").alias("sum_qty")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3b: all grouping-set combinations."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"), _dsum("o_totalprice").alias("total_price")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           sqrt((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 - CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
                   * CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*))
                / (count(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: order statistics + moments. Median is exact interpolated
    percentile (quantities are .0/.5-exact so interpolation order is
    benign); stddev is reconstructed from exact decimal sums so both
    engines do the identical final double arithmetic — see registry
    docstring. At 100 TB swap `percentile` for `approx_percentile`
    (t-digest sketch, no per-group sort) and drop the oracle."""
    l = load_table(spark, sf_dir, "lineitem")
    n = F.count("*")
    sum_q = F.sum(F.col("l_quantity").cast(_DEC)).cast("double")
    sum_q2 = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(_DEC2)).cast("double")
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.sqrt((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))).alias("stddev_qty"),
    )


@query(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: keyless global aggregate (single final reduce)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        _dsum("l_extendedprice").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: collect_list made deterministic by sorting before joining
    to a string (raw collect order is nondeterministic by design)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderstatus, o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3c: explicit GROUPING SETS (the general form rollup/cube
    specialize). One pass over the input expands to one row per
    (input row × matching set) before the partial agg — at scale
    prefer the smallest set list that answers the report."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderstatus", "o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(F.count("*").alias("n_orders"), _dsum("o_totalprice").alias("total_price"))


@query(
    "agg_pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS revenue_F
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: pivot — long→wide reshaping. The value list is EXPLICIT
    (['F','O','P']): without it Spark must first scan the data to
    discover distinct values (an extra job) and the output schema
    becomes data-dependent — both wrong at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count("*") is invalid inside pivot
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.col("F_n").alias("status_F"),
        F.col("O_n").alias("status_O"),
        F.col("P_n").alias("status_P"),
        F.col("F_rev").cast("double").alias("revenue_F"),
    )


@query(
    "agg_histogram_prices",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           count(*) AS n,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: fixed-width histogram — bucket = floor(price/width), one
    hash aggregate over the scan (the profile/EDA primitive; at
    100 TB the bucket count stays tiny so the shuffle is bytes).
    floor of a single double division is deterministic; min/max of
    stored doubles are exact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("bigint").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_minby_maxby",
    oracle="""
    SELECT o_orderpriority,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: argmin/argmax aggregates (min_by/max_by ≙ DuckDB
    arg_min/arg_max) — "the key of the extreme row" without a
    self-join back to the table. Well-defined here because
    o_totalprice is unique per priority group in this corpus; with
    ties both engines pick an arbitrary winner, so tie-prone keys
    need a (value, key) struct-min instead."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_boolean_flags",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (o_totalprice > 300000) AS n_big,
           bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
           bool_and(o_totalprice > 0) AS all_positive,
           count(*) FILTER (o_orderpriority = '5-LOW' AND o_totalprice > 300000) AS n_low_big
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_boolean_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: predicate aggregates — count_if (≙ FILTER'd count),
    bool_or/any, bool_and/every. The flags fold map-side like any
    other partial aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 300000).alias("n_big"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.count_if(
                (F.col("o_orderpriority") == "5-LOW") & (F.col("o_totalprice") > 300000)
            ).alias("n_low_big"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_string_concat_regions",
    oracle="""
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def agg_string_concat_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: ordered string aggregation (listagg/string_agg). Spark has
    no ORDER BY inside the aggregate, so the deterministic form is
    sort-then-join: array_sort(collect_list(...)) → array_join —
    identical output to the oracle's ordered string_agg for any
    input partitioning."""
    n = load_table(spark, sf_dir, "nation")
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"))
        .orderBy("r_name")
    )


@query(
    "agg_bitwise_flags",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey % 256) AS band,
           bit_or(o_orderkey % 256) AS bor,
           bit_xor(o_orderkey % 256) AS bxor
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_bitwise_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: bitwise aggregates (flag-set folding) — associative and
    commutative, so partial aggregation is exact under any
    partitioning."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 256
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and(k).alias("band"),
            F.bit_or(k).alias("bor"),
            F.bit_xor(k).alias("bxor"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_mode_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC, o_orderpriority) AS rnk
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority
    )
    WHERE rnk = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: MODE (most frequent value) per group with a deterministic
    tiebreak (lowest value wins) — the two-level decomposition that
    scales: count per (group, value) partials map-side, then one
    row_number over the (tiny) per-group value counts. Never a
    collect_list; both engines' mode() builtins have unspecified tie
    order, hence the explicit formulation."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        counts.select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


@query(
    "agg_hll_union_weekly_users",
    oracle="""
    SELECT strftime(date_trunc('week', CAST(ts AS DATE)), '%Y-%m-%d') AS week_start,
           count(DISTINCT CAST(ts AS DATE)) AS n_days,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY 1
    """,
)
def agg_hll_union_weekly_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 at scale: TWO-LEVEL approximate distinct via DataSketches
    HLL — per-day user sketches unioned into per-week estimates.
    This is the re-aggregatable form exact count-distinct lacks: the
    daily sketches are tiny (~KB), persistable, and any rollup
    (week/month/rolling window) is a sketch UNION, never a re-scan of
    the raw events — the documented alternative to the exact
    fan-out in window_rolling_7d_distinct_users.

    Week key is YEAR-AWARE: date_trunc('week') (Monday of the ISO
    week, both engines) — r3 ADVICE flagged the old weekofyear()
    key, which merges late-December with January across years.

    TOLERANCE ORACLE (r3 VERDICT #3): the sketch estimate is
    engine-specific, so the emitted columns are the exact per-week
    distinct plus a boolean pinning |approx-exact| <= 5%·exact; the
    oracle emits literal TRUE, so an out-of-tolerance sketch is a
    hash FAIL, not an unverifiable cell. The exact side re-scans
    events once — acceptable for the oracle contract; production
    would emit approx_users alone."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    approx = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        approx.join(exact, "week_start")
        .select(
            F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
            "n_days",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("week_start")
    )


@query(
    "agg_corr_regr_battery",
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS yc
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             count(*) AS n_rows,
             sum(x) AS sxq, sum(yc) AS syq, sum(x * yc) AS sxyq,
             sum(x * x) AS sxxq,
             sum((yc // 10000) * (yc // 10000)) AS shh,
             sum((yc // 10000) * (yc % 10000)) AS shl,
             sum((yc % 10000) * (yc % 10000)) AS sll
      FROM q GROUP BY l_returnflag
    ),
    d AS (
      SELECT l_returnflag, n_rows,
             CAST(n_rows AS DOUBLE) AS n,
             CAST(sxq AS DOUBLE) AS sx,
             CAST(syq AS DOUBLE) / 100 AS sy,
             CAST(sxyq AS DOUBLE) / 100 AS sxy,
             CAST(sxxq AS DOUBLE) AS sxx,
             (CAST(shh AS DOUBLE) * 100000000.0
              + 2.0 * CAST(shl AS DOUBLE) * 10000.0
              + CAST(sll AS DOUBLE)) / 10000 AS syy
      FROM m
    )
    SELECT l_returnflag, n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS regr_intercept,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
    FROM d
    """,
)
def agg_corr_regr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+ bivariate statistics: covariance / correlation / least-
    squares slope+intercept of extendedprice vs quantity per return
    flag — the corr/covar_samp/regr_slope/regr_intercept aggregate
    family.

    Determinism engineering: Spark's F.corr/F.covar_samp accumulate
    running double moments whose value depends on partition order, so
    they can never hash-match another engine — and even DECIMAL sums
    fail here, because DuckDB's decimal->double conversion is not
    correctly rounded (measured 1-ulp drift on the 38-digit sums).
    Instead every moment is an exact BIGINT sum of integer-quantized
    inputs (quantities are whole, prices are whole cents): int64 ->
    double conversion IS correctly rounded in both engines, and the
    closed-form double expression is written identically on both
    sides, so the results are bit-equal. The cents-squared moment
    would overflow int64 at scale, so it is summed as three split
    parts (hi*hi, hi*lo, lo*lo with hi = cents div 10^4) and
    recombined in double — bounds stay under 10^17 even at 100x this
    benchmark's scale factor. Single map-side-partial aggregate, one
    shuffle of 8 longs per group."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    yc = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q = li.select("l_returnflag", x.alias("x"), yc.alias("yc"))
    hi, lo = F.expr("yc div 10000"), F.col("yc") % 10000
    m = q.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.sum("x").alias("sxq"),
        F.sum("yc").alias("syq"),
        F.sum(F.col("x") * F.col("yc")).alias("sxyq"),
        F.sum(F.col("x") * F.col("x")).alias("sxxq"),
        F.sum(hi * hi).alias("shh"),
        F.sum(hi * lo).alias("shl"),
        F.sum(lo * lo).alias("sll"),
    )
    d = m.select(
        "l_returnflag",
        "n_rows",
        F.col("n_rows").cast("double").alias("n"),
        F.col("sxq").cast("double").alias("sx"),
        (F.col("syq").cast("double") / 100).alias("sy"),
        (F.col("sxyq").cast("double") / 100).alias("sxy"),
        F.col("sxxq").cast("double").alias("sxx"),
        (
            (
                F.col("shh").cast("double") * F.lit(100000000.0)
                + F.lit(2.0) * F.col("shl").cast("double") * F.lit(10000.0)
                + F.col("sll").cast("double")
            )
            / 10000
        ).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return d.select(
        "l_returnflag",
        "n_rows",
        slope.alias("regr_slope"),
        ((sy - slope * sx) / n).alias("regr_intercept"),
        ((sxy - sx * sy / n) / (n - F.lit(1.0))).alias("covar_samp"),
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
               THEN l_extendedprice END) AS p50_disc,
           max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
               THEN l_extendedprice END) AS p95_disc,
           TRUE AS approx_within_2pct
    FROM ranked
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (approx): approx_percentile (Greenwald-Khanna sketch) — the
    100 TB percentile default (bounded sketch per group; the exact
    percentile fully sorts each group).

    TOLERANCE ORACLE (same contract as agg_approx_count_distinct):
    the sketch's estimate is engine/merge-order-specific, so the
    query emits the exact DISCONTINUOUS percentiles (the value at row
    ceil(q*n) — interpolation-free, hence engine-exact) plus a
    boolean asserting the sketch landed within 2% relative error of
    each; the oracle recomputes the exact values and literal TRUE.
    With accuracy 10000 the GK bound is ~0.01% of rank — 2% of value
    is generous yet still fails on any real regression.

    Scale engineering of the EXACT side: the value at rank ⌈q·n⌉ is
    the smallest value whose cumulative count reaches ⌈q·n⌉ — so it
    is computed from per-(flag, value) COUNTS (a fully parallel hash
    aggregate over the corpus) plus a cumulative sum over the
    DISTINCT values of each flag. Distinct-value cardinality doesn't
    grow with row count, so the sequential-per-flag window runs over
    a bounded frame no matter the corpus size. (A row_number window
    ranked every ROW inside 3 single-task partitions: measured 4.3×
    at the 8× stress probe; this formulation measures 1.9×, and the
    residual growth is the GK sketch's own per-row work — the
    legitimately linear part.)"""
    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy("l_returnflag", "l_extendedprice").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    cum = vc.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    exact = cum.groupBy("l_returnflag").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                F.col("l_extendedprice"),
            )
        ).alias("p50_disc"),
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.95) * F.col("n")).cast("bigint"),
                F.col("l_extendedprice"),
            )
        ).alias("p95_disc"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("ap")
    )
    rel = lambda est, ref: F.abs(est - ref) / ref  # noqa: E731
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "p50_disc",
        "p95_disc",
        (
            (rel(F.col("ap")[0], F.col("p50_disc")) <= 0.02)
            & (rel(F.col("ap")[1], F.col("p95_disc")) <= 0.02)
        ).alias("approx_within_2pct"),
    )


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_value,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
             / count(*) AS finished_frac
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 variant: FILTER-clause (conditional) aggregates — several
    differently-predicated aggregates over ONE scan/shuffle instead
    of N self-joined subqueries. Spark expresses the FILTER clause as
    when()-guarded aggregates (identical semantics: rows failing the
    predicate contribute nothing, count counts non-nulls); the SQL
    surface also accepts `count(*) FILTER (WHERE ...)` verbatim.

    Scale: this is THE pattern for one-pass multi-metric jobs — a
    naive N-subquery formulation scans 100 TB N times; this scans
    once and partial-aggregates map-side."""
    o = load_table(spark, sf_dir, "orders")
    finished = F.count(F.when(F.col("o_orderstatus") == "F", 1))
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        finished.alias("n_finished"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_large"),
        F.sum(
            F.when(
                F.col("o_orderstatus") == "O", F.col("o_totalprice").cast(_DEC)
            )
        )
        .cast("double")
        .alias("open_value"),
        (finished.cast("double") / F.count("*")).alias("finished_frac"),
    )


@query(
    "agg_grouping_id_sets",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def agg_grouping_id_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+: GROUPING() introspection over grouping sets — the bit that
    distinguishes "NULL because the data is NULL" from "NULL because
    this row is a subtotal". Without it, rollup consumers misread
    subtotal rows whenever the grouped column itself contains NULLs;
    with it, every row self-describes its aggregation level. Same
    single-pass expand-aggregate plan as agg_grouping_sets."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count("*").alias("n_orders"),
        )
    )


_ROLLUP_CUTOFF = "2000-01-01"  # base state covers < cutoff; delta covers >= cutoff


@query(
    "batch_incremental_rollup",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_price
    FROM orders
    GROUP BY month
    ORDER BY month
    """,
)
def batch_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 [ext]: incremental materialized-aggregate maintenance — the
    monthly revenue rollup is computed as BASE STATE (orders before
    2000-01-01) merged with a DELTA (orders after), and the merge of
    partial states must equal the full recompute (the oracle is the
    direct GROUP BY over everything; no split on the DuckDB side).

    Why this is its own operator: at 100 TB you never recompute years
    of history to absorb a day of new data. Keep a state table of
    DECOMPOSABLE aggregate state per group — (count, decimal sum)
    here; (n, Σx, Σx²) when variance is needed — read ONLY the delta's
    date partitions (the filter prunes at the scan: at scale the base
    is a stored table, not a re-scan), aggregate the delta, and merge
    states with a second-level sum. count/sum are commutative monoids,
    so merge order and batch boundaries can't change the result —
    which is exactly what the oracle proves. avg is DERIVED from the
    merged state (never averaged across batches — avg-of-avgs is the
    classic incremental-rollup bug). The same state shape feeds the
    streaming incremental rollup (streaming/ingest.py) via
    foreachBatch, so batch backfill and stream tail share one merge.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    cutoff = F.lit(_ROLLUP_CUTOFF).cast("timestamp")

    def partial_state(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        ).agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev_state"),
        )

    base = partial_state(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial_state(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_state").alias("rev_state"),
        )
    )
    revenue = F.col("rev_state").cast("double")
    return merged.select(
        "month",
        "n_orders",
        revenue.alias("revenue"),
        F.round(revenue / F.col("n_orders"), 6).alias("avg_price"),
    ).orderBy("month")


_CMS_WIDTH = 512  # buckets per sketch row
_CMS_DEPTH = 4  # independent hash rows
_CMS_TOPK = 20  # heavy hitters reported
_CMS_MARGIN_T = 32  # tolerance multiple of N/width (failure ≤ t^-depth per key)


@query(
    "agg_cms_heavy_hitters",
    oracle=f"""
    SELECT user_id, n_events_exact, TRUE AS cms_within_bound
    FROM (
      SELECT user_id, count(*) AS n_events_exact,
             row_number() OVER (ORDER BY count(*) DESC, user_id) AS rn
      FROM events
      GROUP BY user_id
    )
    WHERE rn <= {_CMS_TOPK}
    """,
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2'' (approx): count-min-sketch heavy hitters (Cormode &
    Muthukrishnan 2005, "An improved data stream summary: the
    count-min sketch and its applications") — the fixed-memory
    frequency summary used when per-key exact counting is too much
    state (top talkers, hot keys, trending items).

    Sketch = depth 4 hash rows × width 512 buckets (the _CMS_*
    constants above; a plain docstring, not interpolated — an
    f-string docstring would not register as ``__doc__``): one
    union'd scan hashes every event into one bucket per row
    (xxhash64 seeded by the row index) and a map-side-combined
    aggregate produces the ≤ 4·512-row sketch — fixed size
    regardless of corpus scale, the whole point. The point estimate
    for a key is min over rows of its bucket count.

    TOLERANCE ORACLE (same contract as agg_approx_count_distinct):
    the estimate depends on hash collisions, so the query emits the
    EXACT count of each true top-20 user plus a boolean asserting
    the CMS estimate obeys the sketch's guarantees: est ≥ exact
    (one-sided error is a theorem — a key's own mass is always in
    its bucket) and est ≤ exact + 32·N/512 (t=_CMS_MARGIN_T times
    N/width). The upper half is PROBABILISTIC (Markov: a single row
    exceeds t·N/w with prob ≤ 1/t, the min over the 4 independent
    rows with prob ≤ t^-4), so the margin is sized for negligible
    failure at any probe scale: t=32 gives per-key failure
    ≤ 32^-4 ≈ 1e-6, ≈ 2e-5 across the 20 probed keys — residual
    risk documented rather than zero (a hard TRUE oracle on a tail
    event tighter than this failed review in r5). The oracle emits
    the exact counts + literal TRUE, so the driver's value hash
    fails if the sketch drifts beyond even this loose envelope
    (i.e. the sketch is broken, not merely unlucky).

    100 TB: the sketch aggregate is the production shape (bounded
    state, no per-key shuffle); the exact top-k comparison side here
    exists to grade the sketch and broadcasts (20 rows)."""
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()  # one column-pruned count-star (parquet footer stats)
    margin = (_CMS_MARGIN_T * n_total) // _CMS_WIDTH
    hashed = ev.select(
        "user_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64("user_id", F.lit(r)), F.lit(_CMS_WIDTH)).alias("bucket"),
                )
                for r in range(_CMS_DEPTH)
            ])
        ).alias("rb"),
    ).select("user_id", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    sketch = hashed.groupBy("r", "bucket").agg(F.count("*").alias("c"))
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events_exact"))
        .orderBy(F.col("n_events_exact").desc(), "user_id")
        .limit(_CMS_TOPK)  # TakeOrdered — no single-partition window
    )
    probes = top.select(
        "user_id",
        "n_events_exact",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64("user_id", F.lit(r)), F.lit(_CMS_WIDTH)).alias("bucket"),
                )
                for r in range(_CMS_DEPTH)
            ])
        ).alias("rb"),
    ).select("user_id", "n_events_exact", F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("user_id")
        .agg(F.first("n_events_exact").alias("n_events_exact"), F.min("c").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "n_events_exact",
        (
            (F.col("cms_est") >= F.col("n_events_exact"))
            & (F.col("cms_est") <= F.col("n_events_exact") + F.lit(margin))
        ).alias("cms_within_bound"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH by_price AS (
      SELECT l_returnflag, l_extendedprice AS price,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      GROUP BY l_returnflag, l_extendedprice
    ),
    cum AS (
      SELECT l_returnflag, price, qty,
             CAST(sum(qty) OVER (
               PARTITION BY l_returnflag ORDER BY price
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS cum_qty,
             CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) AS total_qty
      FROM by_price
    )
    SELECT l_returnflag,
           min(price) AS weighted_median_price,
           any_value(total_qty) AS total_qty
    FROM cum
    WHERE 2 * cum_qty >= total_qty
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4': exact WEIGHTED median — the quantity-weighted median unit
    price per return flag: the smallest price p with
    Σ_{price ≤ p} quantity ≥ total_quantity / 2 (lower weighted
    median — interpolation-free, hence engine-exact; the ≥-half test
    is the integer comparison 2·cum ≥ total, no float halves).

    Shape: pre-aggregate to (group, price) cells — the shuffle
    carries distinct prices per group, not raw rows — then one
    cumulative window per group over the cell table and a min()
    pick of the first qualifying price. Quantities are whole-number
    doubles in this corpus and cast to BIGINT, keeping every
    comparison integral; prices are compared but never arithmetically
    combined, so bit-equal across engines.

    100 TB: the window runs over the (group × distinct-price) table —
    if a single group's price cardinality explodes, swap in the GK
    sketch (agg_approx_percentile) or bucket prices first; the exact
    formulation is right whenever the cell table fits comfortably,
    which 3 flags × distinct prices does at any corpus scale."""
    li = load_table(spark, sf_dir, "lineitem")
    by_price = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    wp = Window.partitionBy("l_returnflag").orderBy("price")
    cum = by_price.select(
        "l_returnflag",
        "price",
        F.sum("qty")
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum_qty"),
        F.sum("qty")
        .over(Window.partitionBy("l_returnflag"))
        .cast("bigint")
        .alias("total_qty"),
    )
    return (
        cum.filter(2 * F.col("cum_qty") >= F.col("total_qty"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.first("total_qty").alias("total_qty"),
        )
    )


@query(
    "agg_chisq_independence",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             count(*) AS observed
      FROM orders GROUP BY 1, 2
    ),
    tot AS (
      SELECT status, priority, observed,
             CAST(sum(observed) OVER (PARTITION BY status) AS BIGINT) AS row_total,
             CAST(sum(observed) OVER (PARTITION BY priority) AS BIGINT) AS col_total,
             CAST(sum(observed) OVER () AS BIGINT) AS n
      FROM obs
    ),
    cells AS (
      SELECT status, priority, observed,
             round(CAST(row_total * col_total AS DOUBLE) / n, 8) AS expected,
             CAST(n * observed - row_total * col_total AS BIGINT) AS dev_units,
             round(CAST(n * observed - row_total * col_total AS DOUBLE)
                   * CAST(n * observed - row_total * col_total AS DOUBLE)
                   / (CAST(n AS DOUBLE) * row_total * col_total), 8) AS chi2_contrib
      FROM tot
    )
    SELECT status, priority, observed, expected, chi2_contrib,
           CAST(sum(CAST(round(chi2_contrib * 1e8) AS BIGINT)) OVER () AS BIGINT)
             AS chi2_total_e8
    FROM cells
    """,
)
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4'': Pearson χ² test of independence over the status ×
    priority contingency table — the categorical-association screen
    (feature selection, drift detection between corpus slices).

    Exactness engineering: E_ij = R_i·C_j/N makes (O-E)²/E float-
    messy, so each cell's contribution is computed as the
    algebraically identical (N·O − R·C)² / (N·R·C) — numerator and
    denominator are exact BIGINT products, the single division is one
    correctly-rounded double op, and the round(…, 8) absorbs nothing
    more than formatting. The GLOBAL statistic is the sum of
    PER-CELL values quantized to integer 1e-8 units first
    (chi2_total_e8) — an integer sum, hence partition- and
    engine-order independent, sidestepping the order-dependent
    float-sum trap documented in SURVEY §7.5.

    Shape: one count aggregate (map-side combined), three window
    passes over the CELL table (|statuses|×|priorities| rows — tiny
    at any corpus scale), no second scan of the facts."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("observed"))
    tot = obs.select(
        "*",
        F.sum("observed").over(Window.partitionBy("status")).cast("bigint").alias("row_total"),
        F.sum("observed").over(Window.partitionBy("priority")).cast("bigint").alias("col_total"),
        F.sum("observed").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    dev = F.col("n") * F.col("observed") - F.col("row_total") * F.col("col_total")
    cells = tot.select(
        "status",
        "priority",
        "observed",
        F.round((F.col("row_total") * F.col("col_total")).cast("double") / F.col("n"), 8).alias(
            "expected"
        ),
        dev.cast("bigint").alias("dev_units"),
        # dev² is squared in DOUBLE: dev itself is an exact BIGINT
        # (N·O and R·C each fit long far beyond this corpus), but its
        # square overflows int64 already at the 16× stress scale —
        # caught by the probe. |dev| ≪ 2^53, so the double conversion
        # is exact and both engines compute the identical square.
        F.round(
            dev.cast("double") * dev.cast("double")
            / (F.col("n").cast("double") * F.col("row_total") * F.col("col_total")),
            8,
        ).alias("chi2_contrib"),
    )
    return cells.select(
        "status",
        "priority",
        "observed",
        "expected",
        "chi2_contrib",
        F.sum(F.round(F.col("chi2_contrib") * 1e8).cast("bigint"))
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("chi2_total_e8"),
    )


_BOOT_B = 32  # bootstrap replicas
# Poisson(1) CDF thresholds in 2^20 units: u20 < T[k] → weight k
# (floor(CDF(k)·2^20) for k = 0..4; the tail lands on weight 5).
_BOOT_T = (385749, 771499, 964373, 1028665, 1044738)

_BOOT_W_SQL = """
      CASE WHEN u20 < 385749 THEN 0
           WHEN u20 < 771499 THEN 1
           WHEN u20 < 964373 THEN 2
           WHEN u20 < 1028665 THEN 3
           WHEN u20 < 1044738 THEN 4
           ELSE 5 END
"""


@query(
    "agg_poisson_bootstrap_ci",
    oracle=f"""
    WITH ex AS (
      SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             b,
             CAST(('0x' || substr(md5(event_id || ':' || b), 1, 8)) AS BIGINT)
               % 1048576 AS u20
      FROM events, UNNEST(range(0, {_BOOT_B})) AS t(b)
    ),
    weighted AS (
      SELECT event_type, b, cents, {_BOOT_W_SQL} AS w FROM ex
    ),
    reps AS (
      SELECT event_type, b,
             CAST(sum(w * cents) AS DOUBLE) / sum(w) AS mean_b
      FROM weighted
      GROUP BY event_type, b
      HAVING sum(w) > 0
    ),
    ranked AS (
      SELECT event_type, mean_b,
             row_number() OVER (PARTITION BY event_type ORDER BY mean_b, b) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n_reps
      FROM reps
    ),
    ci AS (
      SELECT event_type,
             round(min(CASE WHEN rn = 2 THEN mean_b END), 8) AS ci_lo_cents,
             round(min(CASE WHEN rn = n_reps - 1 THEN mean_b END), 8) AS ci_hi_cents
      FROM ranked GROUP BY event_type
    ),
    pt AS (
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / count(*) AS mean_cents
      FROM events GROUP BY event_type
    )
    SELECT pt.event_type, pt.n_events, pt.mean_cents,
           ci.ci_lo_cents, ci.ci_hi_cents
    FROM pt JOIN ci ON ci.event_type = pt.event_type
    """,
)
def agg_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4''': bootstrap confidence interval for the per-type mean
    event value via the POISSON bootstrap (Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams"; Kleiner et
    al.'s BLB is the other member of the family) — THE resampling
    scheme for data that cannot be indexed for classic with-
    replacement draws: each row independently joins replica b with
    multiplicity ~ Poisson(1), so one scan computes all B replicas
    as weighted partial aggregates.

    Determinism engineering: the multiplicity is the inverse-CDF
    bucket of an md5-derived 20-bit uniform (same engine-portable
    hash family as MinHash), thresholds precomputed as integer
    constants — both engines draw IDENTICAL weights, so the replica
    means (exact-int sums, one double division) and hence the CI
    bounds hash-match; no tolerance oracle needed even though the
    method is statistical. The 2nd/31st order statistics of the 32
    replica means give a ~94% percentile CI.

    Scale: the explode is ×B on the scanned rows but the shuffle is
    only B·|groups| partial-agg rows (map-side combine) — at 100 TB
    this is the textbook one-pass uncertainty estimate; B scales the
    CPU, never the shuffle."""
    # Fan the single-row-group events scan out before the ×B explode:
    # each of the |events|·B exploded rows computes an md5 + base-16
    # conv (~3.2M hashes at sf0.1), which otherwise runs on ONE task
    # (guide §2.5). The shuffle is unchanged — map-side combine still
    # reduces each task to ≤ |groups|·B partial rows. Measured:
    # 3.1-4.0 → 1.3-1.6 s at sf0.1; no-op at real scale.
    ev = parallelize_small_scan(load_table(spark, sf_dir, "events")).select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    ex = ev.select(
        "event_type",
        "event_id",
        "cents",
        F.explode(F.array(*[F.lit(b) for b in range(_BOOT_B)])).alias("b"),
    ).select(
        "event_type",
        "cents",
        "b",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", "event_id", "b")), 1, 8), 16, 10
            ).cast("bigint")
            % 1048576
        ).alias("u20"),
    )
    w = (
        F.when(F.col("u20") < _BOOT_T[0], 0)
        .when(F.col("u20") < _BOOT_T[1], 1)
        .when(F.col("u20") < _BOOT_T[2], 2)
        .when(F.col("u20") < _BOOT_T[3], 3)
        .when(F.col("u20") < _BOOT_T[4], 4)
        .otherwise(5)
    )
    reps = (
        ex.select("event_type", "b", "cents", w.alias("w"))
        .groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type", "b", (F.col("swc").cast("double") / F.col("sw")).alias("mean_b")
        )
    )
    wr = Window.partitionBy("event_type").orderBy("mean_b", "b")
    ranked = reps.select(
        "event_type",
        "mean_b",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_reps"),
    )
    ci = ranked.groupBy("event_type").agg(
        F.round(F.min(F.when(F.col("rn") == 2, F.col("mean_b"))), 8).alias("ci_lo_cents"),
        F.round(
            F.min(F.when(F.col("rn") == F.col("n_reps") - 1, F.col("mean_b"))), 8
        ).alias("ci_hi_cents"),
    )
    pt = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum("cents").cast("double") / F.count("*")).alias("mean_cents"),
    )
    return pt.join(ci, "event_type").select(
        "event_type", "n_events", "mean_cents", "ci_lo_cents", "ci_hi_cents"
    )


@query(
    "agg_hll_intersection_estimate",
    oracle="""
    WITH pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b
        ON a.event_type < b.event_type
    ),
    users AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT p.type_a, p.type_b,
           (SELECT count(*) FROM users ua JOIN users ub
             ON ua.user_id = ub.user_id
            WHERE ua.event_type = p.type_a AND ub.event_type = p.type_b)
             AS exact_intersection,
           TRUE AS within_tolerance
    FROM pairs p
    ORDER BY p.type_a, p.type_b
    """,
)
def agg_hll_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2''': sketch SET ALGEBRA — estimated audience OVERLAP between
    every pair of event types from HLL sketches alone, via
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B). The
    union is a sketch merge (hll_union_agg), so overlap matrices over
    N segments need N sketches + N² tiny merges, never N² re-scans —
    the audience-overlap / cross-segment-reach primitive at 100 TB.

    TOLERANCE ORACLE (the agg_approx_count_distinct contract):
    inclusion-exclusion compounds THREE estimates, each with error
    relative to its own SET size, so the bound is relative to the
    UNION: |est∩ − exact∩| ≤ 5% · |A∪B| (rsd 0.01 per sketch leaves
    wide margin). The oracle emits the exact pairwise intersections
    + literal TRUE; a drifting sketch is a hash FAIL."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_n"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("exact_n").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("exact_n").alias("n_b"),
    )
    est = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.hll_sketch_estimate("sk_a").alias("est_a"),
            F.hll_sketch_estimate("sk_b").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union("sk_a", "sk_b")
            ).alias("est_union"),
        )
        .select(
            "type_a",
            "type_b",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("est_inter"),
            "est_union",
        )
    )
    users = ev.select("event_type", "user_id").distinct()
    ua = users.select(F.col("event_type").alias("type_a"), "user_id")
    ub = users.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("exact_intersection"))
    )
    return (
        est.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_intersection",
            (
                F.abs(F.col("est_inter") - F.col("exact_intersection"))
                <= 0.05 * F.col("est_union")
            ).alias("within_tolerance"),
        )
        .orderBy("type_a", "type_b")
    )
