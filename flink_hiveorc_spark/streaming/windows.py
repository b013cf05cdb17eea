"""Event-time streaming operators (SURVEY.md §2.8 T7-T8).

The reference is purely processing-time (HiveOrcSink.java timers at
:419-422; no watermark/event-time concept anywhere). These are the
[ext] operators a streaming warehouse needs beyond it: watermarked
tumbling/sliding/session windows, late-data handling, streaming dedup,
and a custom stateful per-key operator via applyInPandasWithState.

Each builder takes an already-constructed streaming DataFrame with an
event-time timestamp column, so batch tests can exercise identical
expressions on static frames (window()/session_window are valid in
batch too — that is the unit-test path), while streaming tests run
them through a file-source stream with a memory sink.

100 TB posture: watermark bounds state (expired windows are evicted);
sliding windows multiply state by overlap factor (slide=1/6 duration
→ 6 live windows per key) — size `spark.sql.shuffle.partitions` for
the keyspace, and keep watermark delay as tight as late-data SLAs
allow, because state size ∝ keys × windows-in-delay.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_dur: str = "1 hour",
    watermark: str = "10 minutes",
    key: str = "event_type",
    approx_distinct: bool = False,
) -> DataFrame:
    """Watermarked tumbling-window counts per key (T7).

    Late rows beyond the watermark are dropped; in append mode a
    window emits once, when the watermark passes its end.

    ``approx_distinct=True`` is REQUIRED on a streaming DataFrame:
    Spark rejects exact distinct aggregation on streams
    (UnsupportedOperationChecker), so the streaming path counts users
    with HyperLogLog++. The exact default serves the batch twin,
    which the oracle value-checks.
    """
    n_users = (
        F.approx_count_distinct("user_id")
        if approx_distinct
        else F.countDistinct("user_id")
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur).alias("w"), F.col(key))
        .agg(F.count("*").alias("n"), n_users.alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key,
            "n",
            "n_users",
        )
    )


def sliding_rate(
    events: DataFrame,
    ts_col: str = "ts",
    window_dur: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rate (T7): overlapping windows, each row
    contributes to duration/slide windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_dur, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Session windows per user (T7): a session closes after `gap` of
    inactivity; dynamic window extent, watermark evicts closed state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once-style streaming dedup (T7/L1 on streams): drops
    duplicates of `keys` arriving within the watermark horizon; state
    for a key is evicted once the watermark passes it (bounded state —
    a plain dropDuplicates on a stream would grow forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


# ---- T8: custom stateful per-key operator ---------------------------------

_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals_per_user(events: DataFrame, timeout_ms: int = 3_600_000) -> DataFrame:
    """Custom stateful operator (T8): running per-user event count and
    value sum, maintained across micro-batches in keyed state.

    The closest reference analog is the per-bucket state map
    (HiveOrcSink.java:97 `Map<Path,BucketState>`); here the runtime
    checkpoints/restores state for us instead of the hand-rolled
    snapshotState/recovery (HiveOrcSink.java:438-446).
    GroupStateTimeout.ProcessingTimeTimeout + `timeout_ms` evicts idle
    users so state stays bounded.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
