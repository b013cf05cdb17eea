"""Oracle-checked batch twins of the streaming operators (T7).

`window()` and `session_window()` compute identical results in batch
and streaming (streaming only adds watermark-driven emission/state
eviction), so running the streaming/windows.py builders on the static
`events` table puts the window SEMANTICS under the DuckDB oracle —
the streaming runtime behavior (watermarks, restarts) is covered by
tests/test_streaming.py and tools/stream_smoke.py.

events.ts is parquet TIMESTAMP(NANOS): Spark surfaces it as bigint
ts_ns (session.py nanosAsLong), DuckDB reads it at ns precision —
both sides truncate to µs before bucketing so values agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query
from flink_hiveorc_spark.streaming import windows as sw


def _events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_table already derives the µs-precision ts for events.
    return load_table(spark, sf_dir, "events")


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY window_start, event_type
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7a: hourly tumbling counts per event type — the streaming
    builder run in batch, value-checked against time_bucket."""
    out = sw.tumbling_counts(
        _events_with_ts(spark, sf_dir), window_dur="1 hour", key="event_type"
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "n_users",
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH t AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             -- Spark merges an event into a session iff it lands
             -- STRICTLY before prev_ts + gap, so >= starts a new one.
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM t
    ),
    islands AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7c: 30-min-gap session windows per user — session_window() in
    batch, value-checked against the gaps-and-islands SQL formulation
    (proves Spark's session semantics: end = last event + gap)."""
    out = sw.session_windows(_events_with_ts(spark, sf_dir), gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


@query(
    "stream_sliding_10m_5m",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS b5, *
      FROM events
    ),
    w AS (
      SELECT unnest([b5, b5 - INTERVAL '5 minutes']) AS window_start, event_id
      FROM b
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n
    FROM w
    GROUP BY 1
    """,
)
def stream_sliding_10m_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7b: 10-minute windows sliding every 5 — each event lands in
    exactly two windows (starts at floor5(ts) and floor5(ts)-5m, the
    identity the oracle replays with unnest)."""
    out = sw.sliding_rate(
        _events_with_ts(spark, sf_dir), window_dur="10 minutes", slide="5 minutes"
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
    )
