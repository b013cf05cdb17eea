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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """Load one corpus table, applying the normalization rules above."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
