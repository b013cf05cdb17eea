"""Set operations, distinct, and the ORC table-roundtrip operators
(SURVEY.md §2.7 + §2.1 S3-S6).

The roundtrip queries exercise the reference's actual core surface —
write Hive-layout partitioned ORC, read it back with partition
pruning — as oracle-checked queries (the oracle computes the same
answer straight from the source parquet, so a bug anywhere in the
write→read cycle shows up as a hash mismatch).
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.flagship import city_shaped_events
from flink_hiveorc_spark.registry import query
from flink_hiveorc_spark.sinks.hive_orc import read_table, write_partitioned


@query(
    "set_union_nations_served",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (dedup): nations with a customer or a supplier."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations with both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_inactive_customers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT user_id FROM events
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): customer keys with no event activity."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    e = load_table(spark, sf_dir, "events").select(F.col("user_id").alias("custkey"))
    return c.distinct().subtract(e.distinct())


@query(
    "distinct_flag_status",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT → hash aggregate on the pair (partial+final)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


def _roundtrip_warehouse(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), "fhs_warehouse", f"city_{tag}")


def _city_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-once-per-sf_dir city ORC table (S3/S4), then read back (S5).

    The populate is write-to-unique-dir + atomic rename so two queries
    racing on a cold cache can't overwrite each other's in-flight
    output (loser's attempt is discarded). Cache key is the sf_dir
    path — regenerating DIFFERENT data at the SAME path requires
    clearing /tmp/fhs_warehouse (test corpus is immutable, so this is
    a documented non-case rather than a mtime check).
    """
    wh = _roundtrip_warehouse(sf_dir)
    if not os.path.exists(os.path.join(wh, "_SUCCESS")):
        attempt = f"{wh}__attempt_{os.getpid()}_{id(spark)}"
        write_partitioned(city_shaped_events(spark, sf_dir), attempt, "c_date", fmt="orc")
        try:
            os.rename(attempt, wh)  # atomic publish; fails if winner exists
        except OSError:
            import shutil

            shutil.rmtree(attempt, ignore_errors=True)
    from flink_hiveorc_spark.sources.cdc import CITY_SCHEMA

    return read_table(spark, wh, fmt="orc", schema=CITY_SCHEMA)


@query(
    "orc_roundtrip_counts",
    oracle="""
    SELECT strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d') AS c_date,
           count(*) AS n_rows,
           count(DISTINCT user_id) AS n_cities
    FROM events
    GROUP BY 1
    """,
)
def orc_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4+S5 parity: events → partitioned ORC (c_date=... layout,
    byte-identical to RowTimeBucketer.scala:18's) → read back →
    aggregate. Oracle computes the same straight from parquet."""
    city = _city_table(spark, sf_dir)
    return city.groupBy("c_date").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("city_id").alias("n_cities"),
    )


@query(
    "orc_partition_pruning",
    oracle="""
    SELECT lower(event_type) AS city_name,
           count(*) AS n
    FROM events
    WHERE strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d') = '2024-01-15'
    GROUP BY 1
    """,
)
def orc_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read: the c_date filter prunes to ONE
    `c_date=2024-01-15` directory (check .explain → PartitionFilters;
    at 100 TB this is the difference between scanning one day and
    scanning the table)."""
    city = _city_table(spark, sf_dir)
    return (
        city.filter(F.col("c_date") == "2024-01-15")
        .groupBy("city_name")
        .agg(F.count("*").alias("n"))
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT count(*) AS n_sampled,
           count(DISTINCT o_custkey) AS n_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sampled_revenue
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 5
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample by key hash — the sampling pattern
    that matters at 100 TB: reproducible across runs/engines (md5 of
    the key, not a seeded RNG), stable under repartitioning, and
    consistent for a key across tables (sampling orders and lineitem
    by the same orderkey hash yields JOINABLE samples). Spark's
    df.sample() guarantees none of those."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 100
    return o.filter(bucket < 5).agg(
        F.count("*").alias("n_sampled"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("sampled_revenue"),
    )


@query(
    "set_union_byname_evolving",
    oracle="""
    SELECT event_id, user_id, value, source_batch
    FROM (
      SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
             'with_value' AS source_batch
      FROM events WHERE event_id % 3 = 0
      UNION ALL
      SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value,
             'legacy' AS source_batch
      FROM events WHERE event_id % 3 = 1
    )
    """,
)
def set_union_byname_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 + schema evolution: unionByName(allowMissingColumns=True)
    merges frames whose schemas diverged (a column added later) —
    position-based union would mis-align or reject; missing columns
    fill with NULL. The batch-side twin of the mergeSchema read path
    (tests/test_hive_orc_sink.py)."""
    ev = load_table(spark, sf_dir, "events")
    with_value = (
        ev.filter(F.col("event_id") % 3 == 0)
        .select("event_id", "user_id", F.col("value").cast("double").alias("value"))
        .withColumn("source_batch", F.lit("with_value"))
    )
    legacy = (
        ev.filter(F.col("event_id") % 3 == 1)
        .select("event_id", "user_id")  # no `value` column: older schema
        .withColumn("source_batch", F.lit("legacy"))
    )
    return with_value.unionByName(legacy, allowMissingColumns=True)


@query(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS value
    FROM lineitem WHERE l_orderkey <= 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey <= 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey <= 1000
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey <= 1000
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (the inverse of agg_pivot_status_by_priority):
    four measure columns unpivoted to (key, measure, value) rows via
    DataFrame.unpivot — planned as a single Expand node (one scan,
    rows×4 generated in-place), NOT the 4-scan UNION ALL the oracle
    spells out. At 100 TB that's 4 fewer fact-table scans; the
    orderkey filter is pushed below the Expand to the scan."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return l.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "json_source_roundtrip",
    oracle="""
    SELECT strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d') AS c_date,
           count(*) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS ref_sum
    FROM events
    GROUP BY 1
    """,
)
def json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-batch parity: the city table written as JSON LINES and read
    back with an EXPLICIT StructType (never schema inference — on a
    100 TB lake, inference is a full extra scan and a schema-drift
    hazard; the reference's reflective schema, HiveOrcSink.java:309,
    is the same trap). Integer fields round-trip exactly through
    JSON; the aggregate proves row and value fidelity against the
    source-of-truth parquet."""
    from pyspark.sql import types as T

    wh = _roundtrip_warehouse(sf_dir) + "_json"
    if not os.path.exists(os.path.join(wh, "_SUCCESS")):
        attempt = f"{wh}__attempt_{os.getpid()}_{id(spark)}"
        city_shaped_events(spark, sf_dir).write.mode("overwrite").json(attempt)
        try:
            os.rename(attempt, wh)
        except OSError:
            import shutil

            shutil.rmtree(attempt, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("ref", T.LongType()),
            T.StructField("city_id", T.LongType()),
            T.StructField("city_name", T.StringType()),
            T.StructField("c_date", T.StringType()),
        ]
    )
    city = spark.read.schema(schema).json(wh)
    return city.groupBy("c_date").agg(
        F.count("*").alias("n_rows"), F.sum("ref").alias("ref_sum")
    )


@query(
    "dq_referential_check",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders) AS n_orders,
      (SELECT count(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      ) AS n_orphan_orders,
      (SELECT count(*) FROM orders WHERE o_orderpriority IS NULL) AS n_null_priority,
      (SELECT count(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1
      )) AS n_dup_orderkeys
    """,
)
def dq_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: one-row contract summary a pipeline asserts
    on before publishing — row count, referential orphans
    (orders→customer anti join), null-constraint violations, and
    primary-key duplicates. Each check is a count aggregate; the
    orphan check broadcasts the customer KEY COLUMN only. One JOB
    instead of four: each branch scans orders pruned to the single
    column it needs (1-col scans in the plan audit) and the 1-row
    results cross-join for free — at 100 TB the bill is three narrow
    column reads, not four full validation jobs."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).alias(
            "n_null_priority"
        ),
    )
    orphans = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_orphan_orders"))
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count("*").alias("n_dup_orderkeys"))
    )
    return (
        base.crossJoin(F.broadcast(orphans))
        .crossJoin(F.broadcast(dups))
        .select("n_orders", "n_orphan_orders", "n_null_priority", "n_dup_orderkeys")
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct
    FROM orders"""
    for c in _PROFILE_COLS
)


@query("profile_orders_columns", oracle=_PROFILE_ORACLE)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column null and distinct counts in ONE scan
    (the oracle spells out the 6-scan UNION ALL; Spark computes all
    12 aggregates in a single pass — multiple COUNT(DISTINCT)s plan
    as one Expand, so the table is read once regardless of column
    count). The EDA/contract primitive run before onboarding any new
    source at scale."""
    o = load_table(spark, sf_dir, "orders")
    total = F.count("*")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append((total - F.count(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
    )


@query(
    "sample_stratified_per_lang",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 10
    """,
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly 10 docs per language, chosen by
    md5-of-key rank — reproducible across runs, engines, and
    partitionings (no RNG seed semantics to match), and uniform
    within each stratum because the hash order is unrelated to any
    data attribute. The eval-set / debugging-slice builder for a
    100 TB corpus where per-stratum quotas matter more than a global
    fraction (rare languages survive)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "lang", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "csv_source_roundtrip",
    oracle="""
    SELECT strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d') AS c_date,
           count(*) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS ref_sum
    FROM events
    GROUP BY 1
    """,
)
def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2-batch parity for the CSV source: the city table written as
    headered CSV and read back with an EXPLICIT StructType (same
    no-inference policy as json_source_roundtrip — on a 100 TB lake
    schema inference is an extra full scan). CSV is the lowest-common-
    denominator interchange a reference user will eventually point at
    the engine; integers and the yyyy-MM-dd date string round-trip
    exactly, and the aggregate proves it against the source parquet."""
    from pyspark.sql import types as T

    wh = _roundtrip_warehouse(sf_dir) + "_csv"
    if not os.path.exists(os.path.join(wh, "_SUCCESS")):
        attempt = f"{wh}__attempt_{os.getpid()}_{id(spark)}"
        city_shaped_events(spark, sf_dir).write.mode("overwrite").option(
            "header", "true"
        ).csv(attempt)
        try:
            os.rename(attempt, wh)
        except OSError:
            import shutil

            shutil.rmtree(attempt, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("ref", T.LongType()),
            T.StructField("city_id", T.LongType()),
            T.StructField("city_name", T.StringType()),
            T.StructField("c_date", T.StringType()),
        ]
    )
    city = spark.read.schema(schema).option("header", "true").csv(wh)
    return city.groupBy("c_date").agg(
        F.count("*").alias("n_rows"), F.sum("ref").alias("ref_sum")
    )


@query(
    "dq_expectations_report",
    oracle="""
    WITH base AS (
      SELECT count(*) AS row_count,
             count(*) - count(DISTINCT o_orderkey) AS pk_dupes,
             sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
             sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bad_status,
             sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
             CAST(date_diff('day', DATE '1995-01-01', CAST(max(o_orderdate) AS DATE)) AS BIGINT) AS fresh_days
      FROM orders
    ),
    orph AS (
      SELECT count(*) AS orphans FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      SELECT 'row_count_positive' AS check_name, 'orders' AS target,
             CAST(row_count AS BIGINT) AS observed, row_count > 0 AS passed FROM base
      UNION ALL
      SELECT 'pk_unique_orderkey', 'orders', CAST(pk_dupes AS BIGINT), pk_dupes = 0 FROM base
      UNION ALL
      SELECT 'not_null_custkey', 'orders', CAST(null_custkey AS BIGINT), null_custkey = 0 FROM base
      UNION ALL
      SELECT 'accepted_values_status', 'orders', CAST(bad_status AS BIGINT), bad_status = 0 FROM base
      UNION ALL
      SELECT 'positive_totalprice', 'orders', CAST(nonpos_price AS BIGINT), nonpos_price = 0 FROM base
      UNION ALL
      SELECT 'freshness_orderdate', 'orders', fresh_days, fresh_days >= 1826 FROM base
      UNION ALL
      SELECT 'referential_custkey', 'orders->customer', CAST(orphans AS BIGINT), orphans = 0 FROM orph
    ) ORDER BY check_name
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ [ext]: dbt/Great-Expectations-style check REPORT — one row
    per expectation (check_name, target, observed, passed) so a
    publish gate can assert `WHERE NOT passed` is empty and a
    dashboard can trend `observed` per check over runs.

    Seven checks across five classes: volume (row count), uniqueness
    (pk duplicate count), completeness (null count), validity
    (accepted values, positive range), freshness (days from epoch
    anchor to max o_orderdate, gated at >= 5 years), and referential
    integrity (orders→customer anti join). All single-table checks
    fold into ONE multi-aggregate pass over orders (one scan at
    100 TB, map-side combined); the anti-join broadcasts the customer
    key column; the 1-row results cross-join for free and unpivot via
    stack() into the report rows — the report itself is 7 rows, so
    everything after the aggregates is driver-trivial."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = o.agg(
        F.count("*").alias("row_count"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("pk_dupes"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("null_custkey"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos_price"),
        F.datediff(F.max("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("fresh_days"),
    )
    orph = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    joined = base.crossJoin(F.broadcast(orph))
    return joined.select(
        F.expr(
            """stack(7,
              'row_count_positive',     'orders',           CAST(row_count AS BIGINT),    row_count > 0,
              'pk_unique_orderkey',     'orders',           CAST(pk_dupes AS BIGINT),     pk_dupes = 0,
              'not_null_custkey',       'orders',           CAST(null_custkey AS BIGINT), null_custkey = 0,
              'accepted_values_status', 'orders',           CAST(bad_status AS BIGINT),   bad_status = 0,
              'positive_totalprice',    'orders',           CAST(nonpos_price AS BIGINT), nonpos_price = 0,
              'freshness_orderdate',    'orders',           fresh_days,                   fresh_days >= 1826,
              'referential_custkey',    'orders->customer', CAST(orphans AS BIGINT),      orphans = 0
            ) AS (check_name, target, observed, passed)"""
        )
    ).orderBy("check_name")


_SQL_PARITY = """
    WITH nation_rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE)
               AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT region, nation, revenue,
           ROW_NUMBER() OVER (PARTITION BY region ORDER BY revenue DESC, nation)
             AS rank_in_region
    FROM nation_rev
"""


@query("sql_api_parity", oracle=_SQL_PARITY)
def sql_api_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2/front-end: the SQL STRING API end to end — the tables are
    registered as temp views and the IDENTICAL ANSI text that serves
    as the DuckDB oracle runs through spark.sql(): one source string,
    two engines, hash-equal results. This pins the engine's SQL
    front-end (parser → Catalyst) as a first-class entry point next
    to the DataFrame API every other query uses; users of the
    reference's SQL-ish config surface get the same capability as a
    real ANSI dialect.

    Catalyst plans this exactly like the DataFrame formulation of the
    same star join (join_broadcast_region_revenue): dims broadcast,
    one shuffle for the aggregate, one for the per-region window —
    the front-end choice is syntax, not a different engine path."""
    for t in ("lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_PARITY)
