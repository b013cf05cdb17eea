"""Stream-stream joins (SURVEY.md §2.8 [ext]; absent in the
reference, which has no joins at all — SURVEY.md §2.3).

A stream⋈stream equi-join must buffer both sides in state until the
watermark proves no more matches can arrive; the time-bound predicate
is what makes that state FINITE. Without it Spark would keep every
row forever (unbounded state — the streaming analog of a cross join).

100 TB posture: state size ≈ input rate × join window per key-side;
keep the event-time bound as tight as the semantics allow, and size
`spark.sql.shuffle.partitions` for the keyed state store (one RocksDB
/ HDFS store per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_after_signup(
    signups: DataFrame,
    purchases: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner stream⋈stream join: purchases matched to the same user's
    signup within `max_lag` AFTER it.

    Both sides carry watermarks (required: the engine needs both to
    bound buffering) and the join predicate carries the event-time
    range — signup_ts <= purchase_ts <= signup_ts + max_lag — which
    lets the state manager evict signups older than the watermark plus
    the lag, and purchases older than the watermark.
    """
    s = signups.withWatermark("ts", watermark).select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("signup_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return s.join(p, cond, "inner").select(
        F.col("p_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        "signup_ts",
        "purchase_ts",
    )


def signups_with_first_hour_purchase(
    signups: DataFrame,
    purchases: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream⋈stream: every signup, with its first-hour
    purchase or NULLs if none arrived.

    The outer (unmatched) row for a signup can only emit once the
    watermark proves no matching purchase can still arrive — i.e.
    after watermark passes signup_ts + max_lag. Until then the signup
    sits in state; results therefore trail the input by up to
    lag + watermark delay. That latency is inherent to outer
    stream-stream semantics, not an implementation choice.
    """
    s = signups.withWatermark("ts", watermark).select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("signup_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return s.join(p, cond, "leftOuter").select(
        F.col("s_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        "signup_ts",
        "purchase_ts",
    )


def signup_purchase_full_outer(
    signups: DataFrame,
    purchases: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """FULL OUTER stream⋈stream: matched pairs, signups that never
    converted, AND purchases with no in-window signup (the audit /
    reconciliation shape — neither side may silently drop).

    Unmatched rows from EITHER side emit only once the watermark
    proves no counterpart can arrive; state eviction follows the same
    time bound as the inner join. Spark requires the time constraint
    on both outer sides for exactly this reason — without it neither
    side's state could ever be released.
    """
    s = signups.withWatermark("ts", watermark).select(
        F.col("user_id").alias("s_user"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("signup_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return s.join(p, cond, "fullOuter").select(
        F.coalesce(F.col("s_user"), F.col("p_user")).alias("user_id"),
        "signup_id",
        "purchase_id",
        "signup_ts",
        "purchase_ts",
    )


def enrich_stream_with_static_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Stream-STATIC join: enrich a stream with a batch dimension
    table (the CDC-ingest shape the reference's sample job stops just
    short of — App.txt:58-70 transforms each event in isolation; any
    real pipeline's next step is attaching dimension attributes).

    Unlike stream⋈stream, this is STATELESS: each micro-batch joins
    against the static side with no watermark and no state store —
    Spark re-plans the join per batch, so a small dimension is
    broadcast (asserted by the test) and the stream side never
    shuffles. Supported join types from the stream side: inner and
    left_outer (the static side cannot drive output rows — right/full
    would need to re-emit static rows per batch).

    100 TB posture: the dimension is loaded once per micro-batch from
    the warehouse — point `dim` at a compacted table, not a raw CDC
    stream; for a mutable dimension re-read it inside foreachBatch so
    every batch sees the latest snapshot (slowly-changing attributes
    use the as-of join in operators/joins.py on the batch side).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"stream-static join supports inner/left_outer, got {how!r}"
        )
    return stream.join(F.broadcast(dim), on=on, how=how)
