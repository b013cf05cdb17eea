"""Flagship end-to-end pipeline (M0): the reference's whole job,
re-expressed in ~40 lines of declarative Spark.

Reference job (App.txt:26-73): Kafka JSON → parse envelope → derive
UTC+8 date string → HiveOrcSink partitioned by c_date. Here: events
table → CDC-shaped transform (P1-P4) → partitioned ORC write (S3/S4)
→ read-back (S5) → per-partition aggregate (A1). This exercises every
operator the reference actually implements, plus the read path it
leaves open.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.sinks.hive_orc import read_table, write_partitioned
from flink_hiveorc_spark.sources.cdc import epoch_ms_to_local_date


def city_shaped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → the reference's City row shape (P1-P4 parity).

    event_id≙ref, user_id≙city_id, event_type≙city_name, and c_date
    derived from the event timestamp at fixed UTC+8 exactly as
    App.txt:66-68 derives it from epoch millis.
    """
    ev = load_table(spark, sf_dir, "events")
    epoch_ms = F.expr("ts_ns div 1000000")
    return ev.select(
        F.col("event_id").alias("ref"),
        F.col("user_id").alias("city_id"),
        F.lower(F.col("event_type")).alias("city_name"),  # App.txt:59 lowercase
        epoch_ms_to_local_date(epoch_ms).alias("c_date"),
    )


def run(spark: SparkSession, sf_dir: str, warehouse: str | None = None) -> DataFrame:
    """Write the City-shaped table as c_date-partitioned ORC, read it
    back, and aggregate rows per partition (the smoke query)."""
    warehouse = warehouse or os.path.join(
        tempfile.gettempdir(), "flink_hiveorc_spark_warehouse", "city"
    )
    city = city_shaped_events(spark, sf_dir)
    write_partitioned(city, warehouse, "c_date", fmt="orc")
    from flink_hiveorc_spark.sources.cdc import CITY_SCHEMA

    back = read_table(spark, warehouse, fmt="orc", schema=CITY_SCHEMA)
    return (
        back.groupBy("c_date")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("city_id").alias("n_cities"),
        )
        .orderBy("c_date")
    )
