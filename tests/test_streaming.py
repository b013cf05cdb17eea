"""Structured Streaming parity tests (SURVEY.md §5.3): the reference
pipeline via a file-source stream, kill-and-restart exactly-once, and
the T7/T8 event-time operators."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_hiveorc_spark.streaming.ingest import (
    file_raw_stream,
    read_committed,
    start_city_ingest,
)
from flink_hiveorc_spark.streaming import windows as sw


def _write_events(path, lo, hi):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"batch_{lo}_{hi}.txt", "w") as f:
        for i in range(lo, hi):
            inner = json.dumps(
                {"after": {"ref": i, "city_id": i % 7, "city_name": f"City{i}", "c_time": 1755000000000 + i * 3_600_000}}
            )
            # Each line is the full Kafka event: the double-encoded
            # outer envelope {"value": "<inner json>"} (App.txt:60-61).
            f.write(json.dumps({"value": inner}) + "\n")


def test_streaming_ingest_exactly_once_across_restart(spark, tmp_path):
    """T4/T5 parity: stop the query, add more input, restart with the
    same checkpoint — no duplicates, no losses."""
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(src, 0, 100)

    q = start_city_ingest(file_raw_stream(spark, str(src)), out, ckpt, available_now=True)
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    assert read_committed(spark, out).count() == 100

    _write_events(src, 100, 150)  # new data while "down"
    q2 = start_city_ingest(file_raw_stream(spark, str(src)), out, ckpt, available_now=True)
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running

    back = read_committed(spark, out)
    assert back.count() == 150  # old files not re-ingested, new ones exactly once
    assert back.select("ref").distinct().count() == 150
    # Partition layout on disk is field=value (reference parity).
    assert back.select("c_date").distinct().count() > 1


def _static_events(spark, rows):
    return spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))


def test_tumbling_counts_batch_semantics(spark):
    rows = [
        Row(ts="2025-08-12 10:05:00", event_type="view", user_id=1, value=1.0),
        Row(ts="2025-08-12 10:55:00", event_type="view", user_id=2, value=1.0),
        Row(ts="2025-08-12 11:05:00", event_type="view", user_id=1, value=1.0),
    ]
    out = sw.tumbling_counts(_static_events(spark, rows)).collect()
    by_start = {str(r.window_start): (r.n, r.n_users) for r in out}
    assert by_start["2025-08-12 10:00:00"] == (2, 2)
    assert by_start["2025-08-12 11:00:00"] == (1, 1)


def test_session_windows_gap_semantics(spark):
    rows = [
        Row(ts="2025-08-12 10:00:00", event_type="view", user_id=1, value=1.0),
        Row(ts="2025-08-12 10:10:00", event_type="view", user_id=1, value=1.0),
        # 40 min gap > 30 min session gap → new session
        Row(ts="2025-08-12 10:50:00", event_type="view", user_id=1, value=1.0),
    ]
    out = sw.session_windows(_static_events(spark, rows)).collect()
    sessions = sorted((str(r.session_start), r.n_events) for r in out)
    assert [n for _, n in sessions] == [2, 1]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark needs a real stream; memory sink."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for ref in [1, 1, 2, 2, 2, 3]:
            f.write(json.dumps({"value": str(ref)}) + "\n")
    stream = (
        spark.readStream.schema("value string")
        .json(str(src))
        .select(
            F.col("value").alias("k"),
            F.lit("2025-08-12 10:00:00").cast("timestamp").alias("ts"),
        )
    )
    deduped = sw.streaming_dedup(stream, ["k"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    assert spark.table("dedup_sink").count() == 3


def test_running_totals_stateful(spark, tmp_path):
    """T8: applyInPandasWithState accumulates across micro-batches."""
    src = tmp_path / "state_src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for uid, val in [(1, 10.0), (1, 5.0), (2, 7.0)]:
            f.write(json.dumps({"user_id": uid, "value": val}) + "\n")
    stream = spark.readStream.schema("user_id long, value double").json(str(src))
    q = (
        sw.running_totals_per_user(stream)
        .writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    got = {r.user_id: (r.n_events, r.total_value) for r in spark.table("state_sink").collect()}
    assert got == {1: (2, 15.0), 2: (1, 7.0)}


def test_managed_ingest_registers_partitions(spark, tmp_path):
    """foreachBatch variant: batches append, catalog table sees new
    partitions after each run (S6), per-date file counts stay low."""
    from flink_hiveorc_spark.streaming.ingest import start_city_ingest_managed

    src, out, ckpt = tmp_path / "msrc", str(tmp_path / "mout"), str(tmp_path / "mckpt")
    _write_events(src, 0, 60)
    spark.sql(
        f"""CREATE TABLE city_managed (ref BIGINT, city_id BIGINT, city_name STRING)
            USING ORC PARTITIONED BY (c_date STRING) LOCATION '{out}'"""
    )
    try:
        q = start_city_ingest_managed(
            file_raw_stream(spark, str(src)), out, ckpt,
            table="city_managed", available_now=True,
        )
        assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
        assert spark.table("city_managed").count() == 60

        _write_events(src, 60, 90)
        q2 = start_city_ingest_managed(
            file_raw_stream(spark, str(src)), out, ckpt,
            table="city_managed", available_now=True,
        )
        assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running
        # foreachBatch runs in a cloned session: its MSCK registers
        # partitions globally (catalog-level), but THIS session's
        # file-listing cache for already-known partitions is stale —
        # a reader refreshes to see files appended by another session
        # (standard Spark external-write semantics).
        spark.sql("REFRESH TABLE city_managed")
        got = spark.table("city_managed")
        assert got.count() == 90
        assert got.select("ref").distinct().count() == 90
        n_parts = spark.sql("SHOW PARTITIONS city_managed").count()
        assert n_parts == got.select("c_date").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS city_managed")


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Stream⋈stream with watermarks on both sides: purchases join
    their user's signup only within the 1-hour lag bound."""
    from flink_hiveorc_spark.streaming.joins import purchases_after_signup

    sdir, pdir = tmp_path / "signups", tmp_path / "purchases"
    sdir.mkdir(), pdir.mkdir()
    with open(sdir / "s.json", "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 7, "ts": "2025-08-12 10:00:00"}) + "\n")
        f.write(json.dumps({"event_id": 2, "user_id": 8, "ts": "2025-08-12 10:00:00"}) + "\n")
    with open(pdir / "p.json", "w") as f:
        # in-window (30 min after signup), out-of-window (2h after), other-user
        f.write(json.dumps({"event_id": 10, "user_id": 7, "ts": "2025-08-12 10:30:00"}) + "\n")
        f.write(json.dumps({"event_id": 11, "user_id": 7, "ts": "2025-08-12 12:00:00"}) + "\n")
        f.write(json.dumps({"event_id": 12, "user_id": 9, "ts": "2025-08-12 10:15:00"}) + "\n")

    schema = "event_id long, user_id long, ts timestamp"
    signups = spark.readStream.schema(schema).json(str(sdir))
    purchases = spark.readStream.schema(schema).json(str(pdir))
    q = (
        purchases_after_signup(signups, purchases)
        .writeStream.format("memory")
        .queryName("ssj_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    got = [(r.user_id, r.signup_id, r.purchase_id) for r in spark.table("ssj_sink").collect()]
    assert got == [(7, 1, 10)]


def test_stream_stream_left_outer_emits_after_watermark(spark, tmp_path):
    """Outer stream⋈stream: the unmatched signup emits with NULLs only
    once the watermark passes signup_ts + lag — driven by later
    batches advancing event time (maxFilesPerTrigger=1 forces
    file-per-batch order)."""
    import time as _time

    from flink_hiveorc_spark.streaming.joins import signups_with_first_hour_purchase

    sdir, pdir = tmp_path / "osignups", tmp_path / "opurchases"
    sdir.mkdir(), pdir.mkdir()
    with open(sdir / "a_early.json", "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 7, "ts": "2025-08-12 10:00:00"}) + "\n")
        f.write(json.dumps({"event_id": 2, "user_id": 8, "ts": "2025-08-12 10:00:00"}) + "\n")
    _time.sleep(1.1)
    # Later signup files push the event-time watermark far past
    # 10:00 + 1h lag + 10m delay across successive micro-batches.
    with open(sdir / "b_later.json", "w") as f:
        f.write(json.dumps({"event_id": 3, "user_id": 9, "ts": "2025-08-12 14:00:00"}) + "\n")
    _time.sleep(1.1)
    with open(sdir / "c_latest.json", "w") as f:
        f.write(json.dumps({"event_id": 4, "user_id": 10, "ts": "2025-08-12 18:00:00"}) + "\n")
    with open(pdir / "p.json", "w") as f:
        f.write(json.dumps({"event_id": 10, "user_id": 7, "ts": "2025-08-12 10:30:00"}) + "\n")
        # The GLOBAL watermark is the MIN over all inputs — without a
        # late purchase the purchases-side watermark pins it at 10:20
        # and no outer row ever emits. A real pipeline has the same
        # property: a stalled input stalls outer emission.
        f.write(json.dumps({"event_id": 11, "user_id": 99, "ts": "2025-08-12 18:00:00"}) + "\n")

    schema = "event_id long, user_id long, ts timestamp"
    signups = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(sdir))
    purchases = spark.readStream.schema(schema).json(str(pdir))
    # NOT availableNow: it terminates after the data batches, before
    # the no-data micro-batch that advances the watermark and emits
    # outer results. A running trigger gets those no-data batches
    # (spark.sql.streaming.noDataMicroBatches.enabled default).
    q = (
        signups_with_first_hour_purchase(signups, purchases)
        .writeStream.format("memory")
        .queryName("ossj_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 120
        got = {}
        while _time.time() < deadline:
            got = {r.signup_id: r.purchase_id for r in spark.table("ossj_sink").collect()}
            if 2 in got:
                break
            _time.sleep(1)
    finally:
        q.stop()
    # u7 matched; u8 emitted unmatched (watermark passed its bound).
    assert got.get(1) == 10
    assert 2 in got and got[2] is None


def test_tumbling_counts_runs_on_real_stream(spark, tmp_path):
    """The streaming path must actually start: exact countDistinct is
    rejected on streams, so approx_distinct=True is the streaming
    form (HLL). Guards the operator's stated purpose."""
    src = tmp_path / "tumbling_src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"ts": "2025-08-12 10:05:00", "event_type": "view", "user_id": i % 5, "value": 1.0}) + "\n")
    stream = spark.readStream.schema("ts timestamp, event_type string, user_id long, value double").json(str(src))
    q = (
        sw.tumbling_counts(stream, approx_distinct=True)
        .writeStream.format("memory")
        .queryName("tumbling_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    rows = spark.table("tumbling_sink").collect()
    assert rows and rows[0].n == 20 and rows[0].n_users >= 4  # HLL approx of 5


def test_stream_stream_full_outer_emits_both_sides(spark, tmp_path):
    """Full outer stream⋈stream: matched pair, unmatched signup, AND
    unmatched purchase must all emit (the two outer classes only
    after the watermark passes their bound)."""
    import time as _time

    from flink_hiveorc_spark.streaming.joins import signup_purchase_full_outer

    sdir, pdir = tmp_path / "fsignups", tmp_path / "fpurchases"
    sdir.mkdir(), pdir.mkdir()
    with open(sdir / "a_early.json", "w") as f:
        f.write(json.dumps({"event_id": 1, "user_id": 7, "ts": "2025-08-12 10:00:00"}) + "\n")
        f.write(json.dumps({"event_id": 2, "user_id": 8, "ts": "2025-08-12 10:00:00"}) + "\n")
    _time.sleep(1.1)
    with open(sdir / "b_later.json", "w") as f:
        f.write(json.dumps({"event_id": 3, "user_id": 9, "ts": "2025-08-12 14:00:00"}) + "\n")
    _time.sleep(1.1)
    with open(sdir / "c_latest.json", "w") as f:
        f.write(json.dumps({"event_id": 4, "user_id": 10, "ts": "2025-08-12 18:00:00"}) + "\n")
    with open(pdir / "p.json", "w") as f:
        # matched (u7), orphan purchase (u55 — no signup at all), and a
        # late row to push the purchases-side watermark forward.
        f.write(json.dumps({"event_id": 10, "user_id": 7, "ts": "2025-08-12 10:30:00"}) + "\n")
        f.write(json.dumps({"event_id": 12, "user_id": 55, "ts": "2025-08-12 10:15:00"}) + "\n")
        f.write(json.dumps({"event_id": 11, "user_id": 99, "ts": "2025-08-12 18:00:00"}) + "\n")

    schema = "event_id long, user_id long, ts timestamp"
    signups = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(str(sdir))
    purchases = spark.readStream.schema(schema).json(str(pdir))
    q = (
        signup_purchase_full_outer(signups, purchases)
        .writeStream.format("memory")
        .queryName("fossj_sink")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 120
        sign_to_purch, purch_to_sign = {}, {}
        while _time.time() < deadline:
            rows = spark.table("fossj_sink").collect()
            sign_to_purch = {r.signup_id: r.purchase_id for r in rows if r.signup_id is not None}
            purch_to_sign = {r.purchase_id: r.signup_id for r in rows if r.purchase_id is not None}
            if 2 in sign_to_purch and 12 in purch_to_sign:
                break
            _time.sleep(1)
    finally:
        q.stop()
    assert sign_to_purch.get(1) == 10  # matched pair
    assert 2 in sign_to_purch and sign_to_purch[2] is None  # signup never converted
    assert 12 in purch_to_sign and purch_to_sign[12] is None  # orphan purchase


def test_streaming_upsert_latest_state_across_restart(spark, tmp_path):
    """foreachBatch upsert snapshot: later CDC events for the same key
    win; a RESTART on the same checkpoint merges new batches into the
    existing snapshot without duplicating or losing keys."""
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        read_city_snapshot,
        start_city_upsert,
    )

    def envelope(ref, name, t_ms):
        inner = json.dumps(
            {"after": {"ref": ref, "city_id": ref, "city_name": name, "c_time": t_ms}}
        )
        return json.dumps({"value": inner})

    src, out, ckpt = tmp_path / "usrc", str(tmp_path / "uout"), str(tmp_path / "uckpt")
    src.mkdir()
    t0 = 1755000000000
    with open(src / "a.txt", "w") as f:
        f.write(envelope(1, "old_one", t0) + "\n")
        f.write(envelope(2, "two", t0 + 1) + "\n")
    with open(src / "b.txt", "w") as f:
        f.write(envelope(1, "new_one", t0 + 10) + "\n")  # supersedes old_one
        f.write(envelope(3, "three", t0 + 11) + "\n")

    q = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    state = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    assert state == {1: "new_one", 2: "two", 3: "three"}

    # Restart on the same checkpoint with one more file: only the new
    # batch is processed; key 2 is upserted, the rest survive.
    with open(src / "c.txt", "w") as f:
        f.write(envelope(2, "two_v2", t0 + 20) + "\n")
    q2 = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running
    state = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    assert state == {1: "new_one", 2: "two_v2", 3: "three"}
    # Out-of-order late event (older seq) must NOT regress the state.
    with open(src / "d.txt", "w") as f:
        f.write(envelope(2, "stale_two", t0 + 5) + "\n")
    q3 = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q3.awaitTermination(600)  # self-terminating (availableNow); False = still running
    state = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    assert state[2] == "two_v2"


def test_streaming_upsert_replay_after_publish_before_commit(spark, tmp_path):
    """Crash-recovery hole (r2 ADVICE, medium): a crash AFTER the
    _LATEST pointer publishes v{N} but BEFORE the checkpoint commits
    batch N replays batch N with prev == vdir. The old code then read
    the v{N} snapshot while overwriting the same directory — Spark
    fails every restart with 'Cannot overwrite a path that is also
    being read from', permanently wedging the stream. Now the replay
    detects prev == vdir and skips the write (snapshot already
    complete). Simulated faithfully: delete commits/<last> from the
    checkpoint (the exact on-disk state such a crash leaves) and
    restart."""
    import os

    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        read_city_snapshot,
        start_city_upsert,
    )

    def envelope(ref, name, t_ms):
        inner = json.dumps(
            {"after": {"ref": ref, "city_id": ref, "city_name": name, "c_time": t_ms}}
        )
        return json.dumps({"value": inner})

    src, out, ckpt = tmp_path / "rsrc", str(tmp_path / "rout"), str(tmp_path / "rckpt")
    src.mkdir()
    t0 = 1755000000000
    with open(src / "a.txt", "w") as f:
        f.write(envelope(1, "one", t0) + "\n")
    with open(src / "b.txt", "w") as f:
        f.write(envelope(1, "one_v2", t0 + 10) + "\n")
        f.write(envelope(2, "two", t0 + 11) + "\n")

    q = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    state = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    assert state == {1: "one_v2", 2: "two"}

    # Forge the crash window: pointer published, offsets uncommitted.
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-FS checksum shadow of the commit file
        os.remove(crc)

    # Restart MUST replay the last batch as a no-op (not crash) and
    # leave the state intact.
    q2 = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running
    assert q2.exception() is None
    state = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    assert state == {1: "one_v2", 2: "two"}


def test_managed_ingest_output_is_compactable(spark, tmp_path):
    """The foreachBatch (managed) ingest writes a PLAIN table dir —
    the one compact_partitions may rewrite (the manifest-based sink's
    dir is refused; ADVICE r1). End-to-end: many small per-batch
    files -> compaction -> fewer files, identical rows."""
    import glob as _glob

    from flink_hiveorc_spark.sinks.hive_orc import compact_partitions
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        start_city_ingest_managed,
    )

    src, out, ckpt = tmp_path / "csrc", str(tmp_path / "cout"), str(tmp_path / "cckpt")
    src.mkdir()
    for b in range(4):  # 4 files -> 4 micro-batches (maxFilesPerTrigger=1)
        with open(src / f"b{b}.txt", "w") as f:
            for i in range(25):
                ref = b * 25 + i
                inner = json.dumps(
                    {"after": {"ref": ref, "city_id": ref, "city_name": "c",
                               "c_time": 1755000000000 + (ref % 2) * 86_400_000}}
                )
                f.write(json.dumps({"value": inner}) + "\n")
    q = start_city_ingest_managed(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    n_files_before = len(_glob.glob(f"{out}/c_date=*/*.orc"))
    rows_before = sorted(
        r.ref for r in spark.read.orc(out).collect()
    )
    assert len(rows_before) == 100 and n_files_before >= 8  # per-batch fan-out

    compact_partitions(spark, out, "c_date", fmt="orc")
    spark.catalog.refreshByPath(out)
    n_files_after = len(_glob.glob(f"{out}/c_date=*/*.orc"))
    rows_after = sorted(r.ref for r in spark.read.orc(out).collect())
    assert rows_after == rows_before
    assert n_files_after < n_files_before


def test_upsert_snapshot_time_travel(spark, tmp_path):
    """Retained snapshot versions are readable: the previous version
    shows the pre-update state (rollback/diff point)."""
    from flink_hiveorc_spark.streaming.ingest import (
        file_raw_stream,
        list_snapshot_versions,
        read_city_snapshot,
        start_city_upsert,
    )

    def envelope(ref, name, t_ms):
        inner = json.dumps(
            {"after": {"ref": ref, "city_id": ref, "city_name": name, "c_time": t_ms}}
        )
        return json.dumps({"value": inner})

    import time as _time

    src, out, ckpt = tmp_path / "tsrc", str(tmp_path / "tout"), str(tmp_path / "tckpt")
    src.mkdir()
    t0 = 1755000000000
    with open(src / "a.txt", "w") as f:
        f.write(envelope(1, "v1", t0) + "\n")
    _time.sleep(1.1)  # distinct mtimes pin file-source batch order
    with open(src / "b.txt", "w") as f:
        f.write(envelope(1, "v2", t0 + 10) + "\n")
    q = start_city_upsert(
        file_raw_stream(spark, str(src), max_files_per_trigger=1), out, ckpt,
        available_now=True, keep_versions=2,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    versions = list_snapshot_versions(out)
    assert len(versions) == 2
    cur = {r.ref: r.city_name for r in read_city_snapshot(spark, out).collect()}
    old = {r.ref: r.city_name for r in read_city_snapshot(spark, out, versions[0]).collect()}
    assert cur == {1: "v2"} and old == {1: "v1"}


def test_stream_static_join_broadcasts_and_enriches(spark, tmp_path):
    """Stream-static enrichment: a real file-source city stream joined
    with a static dimension — stateless (no watermark needed), the
    static side broadcast, left-outer keeps unmatched stream rows."""
    from flink_hiveorc_spark.sources.cdc import decode_city_envelope
    from flink_hiveorc_spark.streaming.joins import enrich_stream_with_static_dim

    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(src, 0, 40)  # city_id = i % 7 -> 0..6
    dim = spark.createDataFrame(
        [Row(city_id=c, tier=("metro" if c < 3 else "rural")) for c in range(5)]
    )
    city = decode_city_envelope(file_raw_stream(spark, str(src)))
    enriched = enrich_stream_with_static_dim(city, dim, on="city_id", how="left")
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running

    back = spark.read.parquet(out)
    assert back.count() == 40
    got = {r.city_id: r.tier for r in back.select("city_id", "tier").distinct().collect()}
    # city_id 0..4 enriched, 5..6 survive the left join with NULL tier.
    assert got == {0: "metro", 1: "metro", 2: "metro", 3: "rural", 4: "rural",
                   5: None, 6: None}

    # The static side must be BROADCAST (stateless per-batch join, no
    # stream-side shuffle): assert on the batch twin's physical plan
    # (same join expression the micro-batch planner compiles).
    batch_plan = enrich_stream_with_static_dim(
        spark.createDataFrame([Row(city_id=1, x=1)]), dim, on="city_id", how="left"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in batch_plan

    def test_rejects_unsupported_type():
        import pytest as _pytest
        with _pytest.raises(ValueError, match="inner/left_outer"):
            enrich_stream_with_static_dim(city, dim, on="city_id", how="full")

    test_rejects_unsupported_type()


def test_streaming_rollup_matches_batch_recompute_across_restart(spark, tmp_path):
    """Incremental materialized rollup (foreachBatch + merge_into):
    after multi-batch ingest with a mid-stream restart, the snapshot
    must equal a from-scratch batch groupBy over ALL events — counts
    added per batch, never double-applied on replay."""
    from flink_hiveorc_spark.sources.cdc import decode_city_envelope
    from flink_hiveorc_spark.streaming.ingest import (
        read_city_snapshot,
        start_city_rollup,
    )

    src, out, ckpt = tmp_path / "src", str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    _write_events(src, 0, 60)
    _write_events(src, 60, 110)  # second file -> second micro-batch

    q = start_city_rollup(
        file_raw_stream(spark, str(src), max_files_per_trigger=1),
        out, ckpt, available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running

    _write_events(src, 110, 150)  # arrives while "down"
    q2 = start_city_rollup(
        file_raw_stream(spark, str(src), max_files_per_trigger=1),
        out, ckpt, available_now=True,
    )
    assert q2.awaitTermination(600)  # self-terminating (availableNow); False = still running

    got = {
        (r.c_date, r.city_id): (r.n_events, r.max_seq)
        for r in read_city_snapshot(spark, out).collect()
    }
    # Batch twin over the full history.
    raw_all = spark.read.text(str(src)).withColumnRenamed("value", "value")
    expect = {
        (r.c_date, r.city_id): (r.n_events, r.max_seq)
        for r in decode_city_envelope(raw_all, with_seq=True)
        .groupBy("c_date", "city_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("seq_ms").alias("max_seq"))
        .collect()
    }
    assert got == expect
    assert sum(n for n, _ in got.values()) == 150


def test_streaming_ingest_with_dlq_quarantines_bad_lines(spark, tmp_path):
    """Corrupt envelopes quarantine to the DLQ with their original
    line intact while good rows flow to the ORC table; counts add up
    exactly and a DLQ re-ingest recovers fixed lines."""
    import json as _json

    from flink_hiveorc_spark.streaming.ingest import start_city_ingest_with_dlq

    src, out, dlq, ckpt = (
        tmp_path / "src",
        str(tmp_path / "out"),
        str(tmp_path / "dlq"),
        str(tmp_path / "ckpt"),
    )
    _write_events(src, 0, 30)  # 30 good lines
    with open(src / "bad.txt", "w") as f:
        f.write("totally broken\n")
        f.write(_json.dumps({"value": "{nope"}) + "\n")
        f.write(_json.dumps({"value": _json.dumps({"after": {"city_id": 5}})}) + "\n")

    q = start_city_ingest_with_dlq(
        file_raw_stream(spark, str(src)), out, dlq, ckpt, available_now=True
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running

    good = spark.read.orc(out)
    assert good.count() == 30
    assert good.filter(F.col("ref").isNull()).count() == 0  # no ghost rows

    bad = spark.read.json(dlq)
    assert bad.count() == 3
    stages = {r.raw_value: r.failure_stage for r in bad.collect()}
    assert stages["totally broken"] == "outer_envelope"
    # Original lines preserved verbatim -> replayable after a fix.
    assert all(isinstance(k, str) and k for k in stages)


def test_ingest_progress_report_rates_and_observed_metrics(spark, tmp_path):
    """r8 verdict #7: streaming-rate/backpressure observability. Three
    input files at one file per trigger → three micro-batches; the
    report must account for every input row, carry positive drain
    rates and batch durations, and the observe() accumulators must
    count decoded rows and classify ghost rows (malformed envelopes
    that decode to NULL ref) per batch — all without a second scan."""
    import json as _json

    from flink_hiveorc_spark.streaming.ingest import ingest_progress_report

    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(src, 0, 40)
    _write_events(src, 40, 70)
    # third file: 10 good rows + 3 malformed lines (ghost-row class)
    _write_events(src, 70, 80)
    with open(src / "batch_70_80.txt", "a") as f:
        f.write("this is not json\n")
        f.write(_json.dumps({"value": "also not an envelope"}) + "\n")
        f.write(_json.dumps({"wrong": "shape"}) + "\n")

    q = start_city_ingest(
        file_raw_stream(spark, str(src), max_files_per_trigger=1),
        out, ckpt, available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    report = ingest_progress_report(q)

    rows = [r for r in report if (r["num_input_rows"] or 0) > 0]
    assert len(rows) == 3
    assert [r["batch_id"] for r in rows] == sorted(r["batch_id"] for r in rows)
    assert sum(r["num_input_rows"] for r in rows) == 83
    assert sum(r["rows_decoded"] for r in rows) == 83
    assert sum(r["ghost_rows"] for r in rows) == 3
    for r in rows:
        assert r["processed_rps"] > 0
        assert r["batch_duration_ms"] > 0
        assert r["max_c_date"] is not None
    # the ghost rows land in the batch that carried the bad file
    bad_batch = [r for r in rows if r["ghost_rows"] == 3]
    assert len(bad_batch) == 1 and bad_batch[0]["rows_decoded"] == 13


def test_ingest_observe_metrics_optional(spark, tmp_path):
    """observe_metrics=False keeps the plan clean; the report still
    carries rates with NULL observed fields."""
    from flink_hiveorc_spark.streaming.ingest import ingest_progress_report

    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_events(src, 0, 25)
    q = start_city_ingest(
        file_raw_stream(spark, str(src)), out, ckpt,
        available_now=True, observe_metrics=False,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    report = [r for r in ingest_progress_report(q) if (r["num_input_rows"] or 0) > 0]
    assert report and report[0]["num_input_rows"] == 25
    assert report[0]["rows_decoded"] is None
    assert read_committed(spark, out).count() == 25
