"""Streaming CEP (streaming/cep.py) pinned to its batch oracle twin:
the per-key automaton over a real multi-batch stream must report
exactly the sessions (and view counts) the batch regex query reports.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.analytics import events_pattern_cep
from flink_hiveorc_spark.streaming.cep import pattern_matches_per_user

SF_DIR = "/root/testdata/sf0.001"


def _bump_mtime(path, i: int) -> None:
    """Give chunk i a distinct, strictly increasing mtime. Spark's
    FileStreamSource picks up files in MODIFICATION-TIME order, not
    name order; chunks written in a tight loop can share an mtime and
    arrive out of order, violating the automaton's per-key
    in-order-arrival contract and making the batch-equality assertion
    flaky (ADVICE r5)."""
    import os
    import time

    t = time.time() - 3600 + i * 10  # well-separated, all in the past
    os.utime(path, (t, t))


def _run_stream(spark, tmp_path, n_chunks=4):
    qname = f"cep_out_{n_chunks}"  # unique per variant: memory sink names are session-global
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("t_us"))
        .orderBy("t_us", "event_id")
        .collect()
    )
    src = tmp_path / "cep_src"
    src.mkdir()
    chunk = (len(ev) + n_chunks - 1) // n_chunks
    import json

    for i in range(n_chunks):
        rows = ev[i * chunk : (i + 1) * chunk]
        with open(src / f"part-{i:04d}.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r.asDict()) + "\n")
        _bump_mtime(src / f"part-{i:04d}.json", i)
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, t_us long"
        )
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        pattern_matches_per_user(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "cep_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    return spark.sql(f"SELECT * FROM {qname}").collect()


def test_streaming_cep_equals_batch_regex(spark, tmp_path):
    got = {
        (r["user_id"], r["session_seq"], r["n_views"])
        for r in _run_stream(spark, tmp_path)
    }
    want = set()
    for r in events_pattern_cep(spark, SF_DIR).collect():
        steps = r["matched"].split(">")
        want.add((r["user_id"], r["session_seq"], len(steps) - 2))
    assert got == want
    assert want  # non-vacuous


def test_streaming_cep_match_windows_are_ordered(spark, tmp_path):
    for r in _run_stream(spark, tmp_path, n_chunks=2):
        assert r["start_us"] <= r["end_us"]
        assert r["n_views"] >= 0


def test_streaming_ewma_equals_batch_window(spark, tmp_path):
    """The keyed-state EWMA on a 3-batch stream equals the batch
    window formulation row for row."""
    import json

    from flink_hiveorc_spark.functions.analytics import events_ewma_smoothing
    from flink_hiveorc_spark.streaming.cep import ewma_per_user

    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "event_id",
            "user_id",
            F.expr("ts_ns div 1000").alias("t_us"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
        )
        .orderBy("t_us", "event_id")
        .collect()
    )
    src = tmp_path / "ewma_src"
    src.mkdir()
    chunk = (len(ev) + 2) // 3
    for i in range(3):
        with open(src / f"part-{i:04d}.json", "w") as f:
            for r in ev[i * chunk : (i + 1) * chunk]:
                f.write(json.dumps(r.asDict()) + "\n")
        _bump_mtime(src / f"part-{i:04d}.json", i)
    stream = (
        spark.readStream.schema("event_id long, user_id long, t_us long, v_cents long")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        ewma_per_user(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    got = {
        (r["event_id"], r["ewma_units"])
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    want = {
        (r["event_id"], r["ewma_units"])
        for r in events_ewma_smoothing(spark, SF_DIR).collect()
    }
    assert got == want
