"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke pipeline at sf0.001.
``queries()`` — named operators from SURVEY.md §2 (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the engine's session conf to a driver-provided session.

    The driver may hand us a bare SparkSession; the full ENGINE_CONF
    (UTC timezone, nanos-as-long, AQE, broadcast threshold, …) lives
    in flink_hiveorc_spark.session as the single source of truth so
    driver runs execute the same plans the bench and PLANS.md audit
    ran.
    """
    from flink_hiveorc_spark.session import apply_runtime_conf

    return apply_runtime_conf(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_hiveorc_spark import flagship

    return flagship.run(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from flink_hiveorc_spark.registry import QUERIES

    def _wrap(fn):
        def call(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return call

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per queries() key."""
    from flink_hiveorc_spark.registry import ORACLES

    return dict(ORACLES)
