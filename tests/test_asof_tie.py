"""ASOF tie semantics: a signup at the EXACT purchase timestamp must
match (p.ts >= s.ts), regardless of how event_ids happen to be
assigned. The corpus has no same-nanosecond pairs, so this is the
synthetic regression for the window-order fix (ADVICE r1)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from flink_hiveorc_spark.registry import QUERIES

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos; load_table renames to ts_ns
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_asof_matches_signup_at_identical_timestamp(spark, tmp_path):
    ns = 1_755_000_000_000_000_000
    rows = [
        # purchase has the LOWER event_id — the old (ts, event_id)
        # order would sort it before the signup and drop the match.
        Row(event_id=5, ts=ns, user_id=1, event_type="purchase", value=1.0, props="{}"),
        Row(event_id=10, ts=ns, user_id=1, event_type="signup", value=0.0, props="{}"),
        # control: strictly-before signup still matches.
        Row(event_id=20, ts=ns - 1_000_000, user_id=2, event_type="signup", value=0.0, props="{}"),
        Row(event_id=21, ts=ns, user_id=2, event_type="purchase", value=1.0, props="{}"),
        # purchase strictly BEFORE the only signup: no match.
        Row(event_id=30, ts=ns - 1, user_id=3, event_type="purchase", value=1.0, props="{}"),
        Row(event_id=31, ts=ns, user_id=3, event_type="signup", value=0.0, props="{}"),
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    out = {
        r.purchase_id: (r.signup_id, r.lag_us)
        for r in QUERIES["join_asof_purchase_prior_signup"](spark, sf_dir).collect()
    }
    assert out == {5: (10, 0), 21: (20, 1000)}
