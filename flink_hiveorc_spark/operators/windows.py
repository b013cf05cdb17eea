"""Window-function operators (SURVEY.md §2.5-2.6; all [ext]).

Every window here has a total order (unique-key tiebreak) so results
are deterministic. Scale notes: a window = one shuffle on its
partition key + a per-partition sort; top-k-per-group via row_number
is rank-pushdown-friendly (Spark inserts a WindowGroupLimit so each
map task keeps only k rows per group before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"


@query(
    "window_topk_orders_per_priority",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority,
             o_orderkey,
             o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per priority (rank + filter → Spark
    plans a WindowGroupLimit: only 3 rows/group survive the map side)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS r,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS dr,
           ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
    FROM customer
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one shared window (single sort, three fns)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("r"),
        F.dense_rank().over(w).alias("dr"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_lag_lead_session_gaps",
    oracle="""
    SELECT event_id,
           user_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-event gap per user in exact integer
    microseconds (bigint arithmetic — no float, no precision loss;
    µs because DuckDB reads the parquet ns timestamps at µs)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_running_spend",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame aggregate; DECIMAL accumulator keeps the
    running sum exact (and therefore engine-independent)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last order per customer via frame-spanning window."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    ).distinct()


@query(
    "sort_limit_top_lineitems",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit plans as TakeOrderedAndProject —
    each task keeps its local top-100, the driver merges; no total
    sort ever materializes (this is why it survives 100 TB)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "window_range_trailing_revenue",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_4d_revenue
    FROM orders
    """,
)
def window_range_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 RANGE frame: per priority, revenue over the trailing 4-day
    VALUE window (rangeBetween — peers defined by order-date distance,
    not row position; rows sharing a date share a frame, which a
    rowsBetween formulation cannot express)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-3, 0)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double").alias(
            "trailing_4d_revenue"
        ),
    )


@query(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           percent_rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS pr,
           cume_dist() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal, c_custkey) AS cd
    FROM customer
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 relative-position analytics: percent_rank / cume_dist with
    a totally-ordered frame (unique-key tiebreak keeps both engines'
    rank denominators identical)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "window_mom_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             sum(CAST(o_totalprice AS DECIMAL(25,6))) AS rev
      FROM orders
      GROUP BY 1
    )
    SELECT month,
           CAST(rev AS DOUBLE) AS revenue,
           (CAST(rev AS DOUBLE) - CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE))
             / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_growth
    FROM m
    ORDER BY month
    """,
)
def window_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series shape: month-over-month revenue growth — lag over
    the AGGREGATED month series, not the raw facts. The unpartitioned
    window is safe exactly because it runs post-aggregation (~tens of
    rows at any scale factor: the aggregate shrinks first, then the
    single-partition window costs nothing). Growth = (rev-prev)/prev
    on doubles derived from exact decimal sums; first month is NULL."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("rev")
    )
    w = Window.orderBy("month")
    rev_d = F.col("rev").cast("double")
    prev_d = F.lag("rev").over(w).cast("double")
    return m.select(
        "month",
        rev_d.alias("revenue"),
        ((rev_d - prev_d) / prev_d).alias("mom_growth"),
    ).orderBy("month")


@query(
    "window_percent_rank_spend",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(25,6))) AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(total AS DOUBLE) AS total_spend,
           percent_rank() OVER (ORDER BY total, o_custkey) AS pct_rank,
           cume_dist() OVER (ORDER BY total, o_custkey) AS cume
    FROM spend
    """,
)
def window_percent_rank_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics: percent_rank + cume_dist over customer
    spend. Both are (rank-1)/(n-1)- and rows≤current/n-style ratios of
    integer ranks — engine-exact. The order key is (total, custkey):
    the DECIMAL total makes ties exact, the key makes the order TOTAL
    (unique), so rank == row_number and the two ratios reduce to
    (rn-1)/(n-1) and rn/n.

    DISTRIBUTED global rank (VERDICT r6 optional-depth (a)): a plain
    ``Window.orderBy(...)`` percent_rank is a single-partition
    WindowExec — dimension-sized here (one row per customer), but ~1e8
    rows through one task at 100x the customer dimension. Instead the
    global row_number is assigned with the same two-pass bucketed
    prefix sum proven in dedup_sorted_neighborhood
    (functions/dedup.py) and shard packing: bucket by VALUE range
    (width_bucket over the spend's own min..max, taken from a 1-row
    bounds collect — a deterministic pure function of the row, so no
    partitioner-state coupling between the two passes; quantile cut
    points would drop in for a heavy-tailed key), per-bucket
    row_number in parallel, then broadcast the tiny per-bucket size
    table's exclusive prefix sum and add. n rides the same bounds
    row. Cost, stated plainly: the bounds pass re-aggregates orders
    (two-pass algorithms pay a second pass — same trade as
    dedup_sorted_neighborhood's rank), ~3x this query's sf0.1 wall
    time vs the old single-window form; what it buys is that no task
    ever sorts more than ~1/32 of the customer dimension, vs ALL of
    it through one task before — the version that survives a 100x
    dimension. Equality with the single-window formulation is
    pytest-pinned (tests/test_windows_distributed_rank.py)."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(_DEC)).alias("total")
    )
    lo, hi, n_rows = spend.agg(
        F.min(F.col("total").cast("double")),
        F.max(F.col("total").cast("double")),
        F.count(F.lit(1)),
    ).first()  # 1-row bounds collect (repo's bounded-collect convention)
    base = spend.select(
        "o_custkey", "total", F.col("total").cast("double").alias("total_spend")
    )
    if n_rows == 0:
        return base.select(
            "o_custkey",
            "total_spend",
            F.lit(0.0).alias("pct_rank"),
            F.lit(0.0).alias("cume"),
        )
    # hi+1 keeps lo < hi even in the all-equal degenerate case (one
    # bucket — any value-bucketing collapses there). Monotone:
    # a <= b (decimal) => double(a) <= double(b) => bucket(a) <=
    # bucket(b), and equal totals share a bucket, so bucket order IS
    # key order. NULL totals (all-null price groups) take bucket 0
    # explicitly: Spark's ascending window sorts NULLS FIRST, and a
    # null bucket would silently DROP those rows at the equi-join.
    # lo is None iff every total is null — any constant bounds then.
    # The explicit repartition on _bucket is the ONE data-sized
    # exchange; both consumers below (the per-bucket rank window and
    # the bucket-size aggregate) require exactly that distribution,
    # so neither adds a shuffle and the exchange is reusable between
    # them. The upper bound must sit STRICTLY above hi even when
    # hi + 1.0 == hi (doubles >= 2^53 absorb +1.0, and
    # width_bucket(x, b, b, n) is NULL -> every row silently dropped
    # at the join), hence the nextafter fallback.
    import math

    span_lo = lo if lo is not None else 0.0
    span_hi = hi + 1.0 if hi is not None else 1.0
    if span_hi <= span_lo:
        span_hi = math.nextafter(span_lo, math.inf)
    b = base.withColumn(
        "_bucket",
        F.when(F.col("total_spend").isNull(), F.lit(0)).otherwise(
            F.width_bucket(
                F.col("total_spend"),
                F.lit(span_lo),
                F.lit(span_hi),
                F.lit(32),
            )
        ),
    ).repartition(F.col("_bucket"))
    wb = Window.partitionBy("_bucket").orderBy("total", "o_custkey")
    local = b.select(
        "o_custkey", "total_spend", "_bucket", F.row_number().over(wb).alias("_rn")
    )
    sizes = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bn"))
    wo = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_bucket", F.coalesce(F.sum("_bn").over(wo), F.lit(0)).alias("_off")
    )  # <=33 rows: the only global window runs over the bucket-size table
    rn = F.col("_off") + F.col("_rn")
    n = F.lit(n_rows)
    return local.join(F.broadcast(offsets), "_bucket").select(
        "o_custkey",
        "total_spend",
        (
            F.when(n > 1, (rn - 1).cast("double") / (n - 1)).otherwise(F.lit(0.0))
        ).alias("pct_rank"),
        (rn.cast("double") / n).alias("cume"),
    )


@query(
    "gapfill_daily_event_value",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           coalesce(d.n_events, 0) AS n_events,
           coalesce(d.total_value, 0.0) AS total_value
    FROM spine s
    LEFT JOIN daily d ON s.day = d.day
    ORDER BY day
    """,
)
def gapfill_daily_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated calendar spine LEFT-joined
    to the daily aggregate so zero-activity days appear explicitly
    (what dashboards and window-over-time consumers need — a missing
    day silently breaks moving averages).

    The spine derives from the data's own min/max (one tiny agg,
    sequence() explode — rows = days, never more); the daily agg
    shrinks the fact table to one row per day BEFORE the join, so the
    daily side is the broadcast build side (rows = days at any corpus
    scale). The hint must sit on the RIGHT side: Spark cannot build
    the preserved side of a left-outer broadcast join, so a hint on
    the spine would be silently ignored (r3 ADVICE). Dates are
    compared as DATE and emitted as strings."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"), F.max(F.col("ts").cast("date")).alias("d1")
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("total_value"),
        )
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


@query(
    "window_nth_value_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_order_key,
           CAST(first_value(CASE WHEN o_orderpriority = '1-URGENT'
                                 THEN o_totalprice END IGNORE NULLS)
                OVER w AS DOUBLE) AS first_urgent_price,
           CAST(last_value(CASE WHEN o_orderstatus = 'O'
                                THEN o_totalprice END IGNORE NULLS)
                OVER w AS DOUBLE) AS last_open_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_nth_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 completion: nth_value + IGNORE NULLS navigation — per
    customer (ordered by date, keyed tiebreak), the 2nd order ever
    placed, the first urgent order's price, and the latest
    still-open order's price. The IGNORE NULLS + conditional-CASE
    combination is how 'first/last matching event per entity' is
    expressed without a second join. Frame pinned to the full
    partition and a unique total order on both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    open_ = F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order_key"),
        F.first(urgent, ignorenulls=True).over(w).cast("double").alias("first_urgent_price"),
        F.last(open_, ignorenulls=True).over(w).cast("double").alias("last_open_price"),
    )


@query(
    "gapfill_interpolate_linear",
    oracle="""
    WITH bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    g AS (
      SELECT s.day, d.v,
             last_value(d.v IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER wp AS prev_day,
             first_value(d.v IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
               OVER wn AS next_day
      FROM spine s LEFT JOIN daily d ON s.day = d.day
      WINDOW wp AS (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                        / date_diff('day', prev_day, next_day))
           END AS value_filled
    FROM g ORDER BY day
    """,
)
def gapfill_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR INTERPOLATION over the calendar spine: days
    with no purchases get prev + (next-prev)·(Δdays/span); leading/
    trailing gaps take the nearest known value (ffill/bfill at the
    edges). The pandas `interpolate(method='time')` shape, as two
    IGNORE-NULLS window passes — no UDF, no driver loop.

    The global (unpartitioned) window sorts only the SPINE — rows =
    days, bounded by the calendar, not the fact table — so the
    single-partition sort is safe at any corpus scale (the fact table
    was already reduced by the daily aggregate). The arithmetic is
    the same IEEE expression tree on both engines; Δday ratios are
    exact small-int divisions."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast(_DEC)).cast("double") / F.count("*")).alias("v")
        )
    )
    # daily = one row per day — broadcast the RIGHT side (the build
    # side Spark can legally use for a left-outer join; a hint on the
    # preserved spine side would be ignored — r3 ADVICE).
    g = spine.join(F.broadcast(daily), "day", "left")
    wp = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wn = Window.orderBy("day").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    known_day = F.when(F.col("v").isNotNull(), F.col("day"))
    g = g.select(
        "day",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(known_day, ignorenulls=True).over(wp).alias("prev_day"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(known_day, ignorenulls=True).over(wn).alias("next_day"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "next_day", "prev_day"
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * frac)
    )
    return g.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.when(F.col("v").isNotNull(), 0).otherwise(1).alias("interpolated"),
        filled.alias("value_filled"),
    ).orderBy("day")


@query(
    "window_rolling_7d_distinct_users",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bounds AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           count(DISTINCT p.user_id) AS users_7d
    FROM spine s
    LEFT JOIN pairs p ON p.day BETWEEN s.day - 6 AND s.day
    GROUP BY s.day
    """,
)
def window_rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day DISTINCT users per day — the windowed
    count-distinct no window frame can express (DISTINCT aggregates
    are unsupported over frames in both engines): daily-deduped
    (day, user) pairs range-joined to the calendar spine, then an
    exact distinct count per spine day.

    Scale shape: the dedup to (day, user) collapses the fact table
    FIRST (the only full-size shuffle); the range join is an INNER
    join with the calendar spine as the broadcast build side (rows =
    days, bounded by time), so the 7× fan-out costs 7·|daily
    actives|, never 7·|events|. Inner, not left-outer: Spark cannot
    broadcast the preserved side of an outer join (r3 ADVICE — the
    old left-outer formulation's hint was ignored and risked
    broadcasting the fact-derived pairs). Zero-activity spine days
    are restored afterwards by a tiny days×days left join against
    the aggregated counts. (The HLL alternative — merge 7 daily
    sketches per day — drops the exact answer but removes the
    fan-out; see agg_hll_union_weekly_users.)"""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("sday")
    )
    cond = (F.col("day") >= F.date_sub(F.col("sday"), 6)) & (
        F.col("day") <= F.col("sday")
    )
    counts = (
        pairs.join(F.broadcast(spine), cond, "inner")
        .groupBy("sday")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )
    return spine.join(F.broadcast(counts), "sday", "left").select(
        F.date_format("sday", "yyyy-MM-dd").alias("day"),
        F.coalesce("users_7d", F.lit(0)).alias("users_7d"),
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
    SELECT bucket,
           count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM (
      SELECT o_totalprice,
             ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders
    )
    GROUP BY bucket
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDA companion to the fixed-width histogram: EQUI-DEPTH buckets
    (deciles) via ntile over a total order — same row count per
    bucket, data-driven boundaries (what an optimizer's histogram
    statistics and feature-binning pipelines use).

    The global ntile sorts one column pair in a single partition —
    fine into the tens of millions; at true 100 TB scale swap in
    approx_percentile boundaries + a range join (sketch-based
    equi-depth), trading exactness for the distributed sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )
