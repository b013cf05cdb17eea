"""CDC-envelope decoding (the reference's only transform path).

The reference job (``/root/reference/.../sample/App.txt:58-70``)
consumes Kafka JSON strings shaped like

    {"value": "{\\"after\\": {\\"ref\\": 1001, \\"city_id\\": 42,
                \\"city_name\\": \\"Shanghai\\", \\"c_time\\": 1755043200000}}"}

lowercases the raw event (App.txt:59), pulls ``value.after.*``
(App.txt:60-67) and converts the epoch-millisecond ``c_time`` to a
``yyyy-MM-dd`` string at fixed UTC+8 (App.txt:66-68). We re-express
that declaratively: ``from_json`` with explicit schemas (no reflective
ObjectInspector — see HiveOrcSink.java:309-312 for what we are NOT
doing) so the whole decode stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schema replacing the reference's reflective POJO schema
# (City.java:9-12).
CITY_SCHEMA = T.StructType(
    [
        T.StructField("ref", T.LongType()),
        T.StructField("city_id", T.LongType()),
        T.StructField("city_name", T.StringType()),
        T.StructField("c_date", T.StringType()),
    ]
)

# The double-encoded envelope: outer {"value": "<json string>"},
# inner {"after": {...}} (App.txt:60-61).
OUTER_SCHEMA = T.StructType([T.StructField("value", T.StringType())])
AFTER_SCHEMA = T.StructType(
    [
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("ref", T.LongType()),
                    T.StructField("city_id", T.LongType()),
                    T.StructField("city_name", T.StringType()),
                    T.StructField("c_time", T.LongType()),  # epoch millis
                ]
            ),
        )
    ]
)


def epoch_ms_to_local_date(col: Column, utc_offset_hours: int = 8) -> Column:
    """epoch-ms → 'yyyy-MM-dd' string at a fixed UTC offset.

    Mirrors App.txt:66-68 (``Instant.ofEpochMilli`` at
    ``ZoneOffset.ofHours(8)`` → ``LocalDate.toString``). Computed with
    pure integer day arithmetic — floor((ms + offset) / 86_400_000)
    days since epoch — because any timestamp-rendering route
    (``date_format``/``cast to string``) formats in the SESSION
    timezone and would shift the date again on non-UTC sessions,
    breaking the fixed-offset contract this function exists to keep.
    """
    col = F.col(col) if isinstance(col, str) else col
    days = F.floor(
        (col + F.lit(utc_offset_hours * 3_600_000)) / F.lit(86_400_000)
    ).cast("int")
    return F.date_add(F.lit("1970-01-01").cast("date"), days).cast("string")


def decode_city_envelope(
    raw: DataFrame, value_col: str = "value", with_seq: bool = False
) -> DataFrame:
    """Decode the reference's CDC envelope into City rows.

    ``raw`` carries one JSON string per row in ``value_col``. Returns
    columns (ref, city_id, city_name, c_date) — the City POJO shape
    with the partition date derived exactly as App.txt:63-68 does.
    ``with_seq`` additionally keeps the raw epoch-ms as ``seq_ms``
    (the per-key ordering an upsert consumer needs; the reference
    discards it after deriving the date)."""
    lowered = F.lower(F.col(value_col))  # App.txt:59
    inner = F.from_json(lowered, OUTER_SCHEMA)["value"]
    after = F.from_json(inner, AFTER_SCHEMA)["after"]
    cols = [
        after["ref"].alias("ref"),
        after["city_id"].alias("city_id"),
        after["city_name"].alias("city_name"),
        epoch_ms_to_local_date(after["c_time"]).alias("c_date"),
    ]
    if with_seq:
        cols.append(after["c_time"].alias("seq_ms"))
    return raw.select(*cols)


def latest_state(df: DataFrame, keys: list[str], seq_col: str) -> DataFrame:
    """Materialize current state from a CDC change stream: the latest
    record per key wins (Debezium-style upsert compaction — the step
    the reference never does; it appends every change to ORC and
    leaves compaction to the reader, SURVEY.md §1.3).

    ``seq_col`` must be a total order per key (LSN / offset / event
    id); ties broken by nothing — supply a unique sequence. Expressed
    as max_by over every column, which Spark executes as a partial +
    final hash aggregate: one shuffle of (key, latest-row) pairs, no
    window sort — at 100 TB this beats row_number() OVER (which must
    sort every partition's full history).
    """
    from pyspark.sql import functions as F

    others = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.max_by(c, F.col(seq_col)).alias(c) for c in others]
    )


def decode_city_envelope_with_dlq(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Decode with a DEAD-LETTER channel: returns (good, bad).

    ``from_json`` is PERMISSIVE — a malformed envelope, a non-JSON
    line, or a payload missing ``after`` silently decodes to NULLs,
    which the plain decoder would happily write into the warehouse as
    ghost rows. This variant splits the stream instead: rows whose
    envelope fails to produce ``after.ref`` go to ``bad`` VERBATIM
    (the raw line, plus the failure stage) so they can be quarantined
    to a dead-letter dir and replayed after a schema fix — the
    operational half the reference leaves out entirely (its
    JsonDeserializationSchema would throw and fail the whole job,
    App.txt:35).

    Both frames derive from one projection of the same scan; a
    streaming caller quarantines with
    ``bad.writeStream.format("json")`` next to the main sink, or in
    foreachBatch writes both sides of the split in the same batch.
    The split predicate is codegen'd column logic — no UDF, no second
    parse."""
    lowered = F.lower(F.col(value_col))
    inner = F.from_json(lowered, OUTER_SCHEMA)["value"]
    after = F.from_json(inner, AFTER_SCHEMA)["after"]
    annotated = raw.select(
        F.col(value_col).alias("raw_value"),
        inner.alias("_inner"),
        after.alias("_after"),
    )
    ok = annotated["_after"]["ref"].isNotNull()
    good = annotated.filter(ok).select(
        F.col("_after")["ref"].alias("ref"),
        F.col("_after")["city_id"].alias("city_id"),
        F.col("_after")["city_name"].alias("city_name"),
        epoch_ms_to_local_date(F.col("_after")["c_time"]).alias("c_date"),
    )
    bad = annotated.filter(~ok).select(
        "raw_value",
        F.when(F.col("_inner").isNull(), "outer_envelope")
        .when(F.col("_after").isNull(), "inner_payload")
        .otherwise("missing_ref")
        .alias("failure_stage"),
    )
    return good, bad
