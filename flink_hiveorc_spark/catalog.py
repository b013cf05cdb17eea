"""Table loading for the test corpus (TPC-H-ish star schema + events +
documents + embeddings parquet, see /root/repo/TESTDATA.md).

Normalization rules applied on load:

- ``events.ts`` is parquet TIMESTAMP(NANOS); the session reads it as
  bigint nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``) and we
  surface BOTH the raw nanos (``ts_ns``) and a microsecond-precision
  ``ts`` timestamp_ntz. Queries that must hash-match a DuckDB oracle
  should derive strings/dates from ``ts`` (micro precision) or use
  ``ts_ns`` arithmetic, never project a truncated timestamp next to
  the oracle's nano timestamp.
- everything else is taken as-is; parquet TIMESTAMP(MILLIS/MICROS)
  columns surface as timestamp_ntz which matches DuckDB's naive
  timestamps.

At 100 TB these reads become partitioned-table scans; the helpers keep
the read declarative (``spark.read.parquet``) so partition pruning,
predicate pushdown and column pruning all apply unchanged.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CONST_COLUMNS: dict[tuple, tuple[object, Column]] = {}


def memo_constant_column(fn):
    """Memoize a NULLARY builder of a constant Column expression tree.

    The big payload-construction expressions (the 18-branch image
    container CASE, the VP8L bitstream concat, …) are pure functions
    of unresolved column references and literals — no data, no
    session state, nothing keyed on any input path — yet building one
    costs up to ~1.4 s of driver time, because every F.concat/F.lit
    node is a py4j round trip (the driver-side "very large query
    plan" cost class, optimization guide §7.3). One process builds
    each such tree once and re-aliases it per query invocation;
    Catalyst expressions are immutable, so sharing one tree across
    plans is safe, and every invocation still analyzes, optimizes and
    EXECUTES from the parquet inputs exactly as before — this caches
    plan text, never results.

    Keyed on the py4j gateway identity: if the JVM ever restarts
    (fresh gateway object), stale JVM expression handles are dropped
    and the tree is rebuilt. The gateway itself is stored alongside
    the entry and compared with ``is`` (ADVICE r15: an ``id()`` key
    without a retained reference could alias a dead gateway whose id
    the allocator reused, returning a Column bound to a dead JVM);
    an entry whose gateway is no longer current is evicted."""

    @functools.wraps(fn)
    def wrapper() -> Column:
        from pyspark import SparkContext

        gw = SparkContext._gateway
        key = (fn.__module__, fn.__qualname__)
        entry = _CONST_COLUMNS.get(key)
        if entry is not None and entry[0] is gw:
            return entry[1]
        col = fn()
        _CONST_COLUMNS[key] = (gw, col)
        return col

    return wrapper

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table, applying the normalization rules above.

    The resolved reader FRAME is memoized per session: each
    ``spark.read.parquet`` call costs ~75-105 ms of driver time (py4j +
    file listing + footer schema inference — measured per table at
    sf0.1), paid again for every table reference of every query; a
    46-query bench run makes ~115 such calls, ~10 s of pure
    plan-construction overhead (guide §7.3's driver-cost class). The
    cache holds the immutable resolved PLAN — file listing + schema —
    never data: every execution still scans the parquet inputs. It is
    keyed on (path, mtime), so a directory rewritten mid-session (the
    degenerate-corpus fixtures write once, but defensively) rebuilds
    the listing, and it lives ON the session object, so it dies with
    the session and never crosses JVMs. A fresh bench/oracle process
    always starts cold."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = None
    cache = getattr(spark, "_fhs_table_cache", None)
    if cache is None:
        cache = {}
        spark._fhs_table_cache = cache
    key = (path, mtime)
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, path, name)
    if mtime is not None:
        cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, path: str, name: str) -> DataFrame:
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            # Corpus generations that wrote TIMESTAMP(NANOS): the session
            # reads them as raw nanos (nanosAsLong) — surface both.
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            )
        elif ts_type.startswith("timestamp"):
            # Corpus generations that write TIMESTAMP(MICROS) (NTZ): keep
            # ``ts`` as the native timestamp and derive bigint nanos for
            # the epoch-arithmetic operators. The NTZ->TZ cast binds the
            # wall-clock to the session zone, which the engine pins to
            # UTC (session.py), so unix_micros is the same epoch DuckDB's
            # epoch_us(ts) computes on its naive timestamp.
            df = df.withColumn(
                "ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
    return df


def parallelize_small_scan(df: DataFrame) -> DataFrame:
    """Spread a SMALL scan across the cluster before heavy per-row
    compute (shingling, per-shingle md5, per-word hashing).

    A file scan parallelizes by bytes (`maxPartitionBytes`), so a table
    that is small on disk but compute-heavy per row (5 MB of documents
    → hundreds of md5 calls per row) can land in fewer tasks than the
    cluster has cores, serializing the dominant compute stage. When the
    scan already yields at least `defaultParallelism` partitions — i.e.
    at any real scale, where 100 TB / 128 MB ≫ cores — this is a
    literal no-op: no shuffle is added and the plan is unchanged. The
    round-robin shuffle only exists in the small-input regime, where
    its payload is by definition tiny.

    Partition-count introspection is plan-side only (file listing),
    not a job.

    Streaming frames pass through untouched (micro-batch partitioning
    is the planner's business and `.rdd` is undefined on them), so the
    shared decode/extract helpers can call this unconditionally.

    Frames whose plan already contains a wide (shuffle-inducing) node
    also pass through untouched: their downstream parallelism is the
    shuffle partitioning's business, an extra round-robin exchange on
    top would be pure overhead — and, critically, probing `.rdd` on
    such a frame under AQE EXECUTES the upstream query stages to
    resolve the final partitioning (a real hidden job; measured 10×
    on a decode query that was wrapped twice). The wide-node walk is
    a plan-only py4j traversal, so the probe below runs exclusively
    on narrow scan chains where it is free.
    """
    if df.isStreaming:
        return df
    wide = {
        "Repartition",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Join",
        "Aggregate",
        "Window",
        "Sort",
        "Deduplicate",
        "Distinct",
        "Intersect",
        "Except",
        "GlobalLimit",
        "CoGroup",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInArrow",
    }
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() in wide:
                return df
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
    except Exception:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
