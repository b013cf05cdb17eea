"""CDC envelope decode parity (sources/cdc.py vs App.txt:58-70)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from flink_hiveorc_spark.sources.cdc import decode_city_envelope, epoch_ms_to_local_date


def _envelope(ref, city_id, name, c_time_ms) -> str:
    inner = json.dumps({"after": {"ref": ref, "city_id": city_id, "city_name": name, "c_time": c_time_ms}})
    return json.dumps({"value": inner})


def test_decode_city_envelope(spark):
    # 2025-08-12 23:00 UTC = 2025-08-13 07:00 UTC+8 → partition date
    # rolls to the NEXT day under the reference's fixed-offset rule
    # (App.txt:66-68).
    ts = 1755039600000
    raw = spark.createDataFrame([Row(value=_envelope(1001, 42, "Shanghai", ts))])
    out = decode_city_envelope(raw).collect()[0]
    assert out.ref == 1001
    assert out.city_id == 42
    # App.txt:59 lowercases the whole raw event before parsing.
    assert out.city_name == "shanghai"
    assert out.c_date == "2025-08-13"


def test_decode_malformed_envelope_yields_nulls(spark):
    raw = spark.createDataFrame([Row(value="not json at all")])
    out = decode_city_envelope(raw).collect()[0]
    assert out.ref is None and out.c_date is None


def test_epoch_ms_boundary_utc_offset(spark):
    # 15:59:59.999 UTC is still the same day at UTC+8; 16:00:00.000 is
    # the next day — the exact boundary of ZoneOffset.ofHours(8).
    df = spark.createDataFrame(
        [Row(ms=1754927999999), Row(ms=1754928000000)]
    ).select(epoch_ms_to_local_date("ms").alias("d"))
    days = [r.d for r in df.collect()]
    assert days == ["2025-08-11", "2025-08-12"]


def test_epoch_ms_date_is_session_timezone_independent(spark):
    """The fixed-UTC+8 date must not shift with the session timezone
    (date_format-based formulations render in session tz and would)."""
    ms = 1755039600000  # 2025-08-12 23:00 UTC -> 2025-08-13 at UTC+8
    df = spark.createDataFrame([Row(ms=ms)])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            results[tz] = df.select(epoch_ms_to_local_date("ms").alias("d")).first().d
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert set(results.values()) == {"2025-08-13"}, results


def test_decode_with_dlq_splits_good_and_bad(spark):
    """Malformed envelopes land in the dead-letter frame VERBATIM with
    a failure stage; well-formed rows decode exactly as the plain
    decoder would; nothing is dropped or duplicated."""
    import json as _json

    from pyspark.sql import Row

    from flink_hiveorc_spark.sources.cdc import (
        decode_city_envelope,
        decode_city_envelope_with_dlq,
    )

    good_line = _json.dumps(
        {"value": _json.dumps({"after": {"ref": 1, "city_id": 2, "city_name": "x", "c_time": 1755043200000}})}
    )
    lines = [
        good_line,
        "not json at all",                                  # outer fails
        _json.dumps({"value": "{broken inner"}),            # inner fails
        _json.dumps({"value": _json.dumps({"after": {"city_id": 9}})}),  # no ref
        _json.dumps({"other": 1}),                          # no value field
    ]
    raw = spark.createDataFrame([Row(value=ln) for ln in lines])
    good, bad = decode_city_envelope_with_dlq(raw)

    g = good.collect()
    assert len(g) == 1 and (g[0].ref, g[0].city_id, g[0].c_date) == (1, 2, "2025-08-13")
    # Parity with the plain decoder on the well-formed row.
    from pyspark.sql import functions as F

    plain = decode_city_envelope(raw.filter(F.col("value") == good_line)).collect()
    assert g[0] == plain[0]

    b = {r.raw_value: r.failure_stage for r in bad.collect()}
    assert len(b) == 4
    assert b["not json at all"] == "outer_envelope"
    assert set(b.values()) <= {"outer_envelope", "inner_payload", "missing_ref"}
    # Raw lines preserved byte-for-byte for replay.
    assert set(b) == set(lines) - {good_line}
