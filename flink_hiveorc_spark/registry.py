"""Query registry: the driver-facing inventory of implemented operators.

Every operator from SURVEY.md §2 registers here as a named query
(spark, sf_dir) -> DataFrame, optionally paired with a DuckDB-runnable
ANSI-SQL oracle string. ``__spark_entry__.py`` exposes these to the
driver's correctness harness.

Determinism contract (why the oracle hashes match):
- monetary/quantity sums go through DECIMAL casts (exact arithmetic),
  final division/sqrt in double (IEEE-identical across engines),
- every window/sort has a total order (unique-key tiebreaks),
- no approx algorithms in oracle-checked queries (approx variants are
  registered without an oracle → rows-only check),
- timestamps are projected as strings/dates/epoch integers, never as
  sub-second timestamps with engine-specific precision.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Imported for registration side effects.
    from flink_hiveorc_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        relational,
        scalar,
        tpch_extra,
        windows,
    )
    from flink_hiveorc_spark.functions import (  # noqa: F401
        analytics,
        cluster,
        dedup,
        multimodal,
        pipeline,
        similarity,
        skew,
        text,
    )
    from flink_hiveorc_spark.streaming import batch_checks  # noqa: F401


_load_all()
