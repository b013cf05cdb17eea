"""Streaming-sink compaction service (sinks/compaction.py): the
landing→serving rewrite must preserve content exactly, shrink file
count, stay incremental, and converge after simulated crashes.
"""

from __future__ import annotations

import json
import os
import shutil

from flink_hiveorc_spark.sinks.compaction import (
    compact_streaming_sink,
    data_file_count,
    read_compacted,
)
from flink_hiveorc_spark.streaming.ingest import (
    file_raw_stream,
    read_committed,
    start_city_ingest,
)


def _write_events(path, lo, hi, files=1):
    path.mkdir(parents=True, exist_ok=True)
    per = max(1, (hi - lo) // files)
    for fi, start in enumerate(range(lo, hi, per)):
        with open(path / f"batch_{lo}_{hi}_{fi}.txt", "w") as f:
            for i in range(start, min(start + per, hi)):
                inner = json.dumps(
                    {
                        "after": {
                            "ref": i,
                            "city_id": i % 7,
                            "city_name": f"City{i}",
                            "c_time": 1755000000000 + i * 3_600_000,
                        }
                    }
                )
                f.write(json.dumps({"value": inner}) + "\n")


def _ingest(spark, src, out, ckpt):
    # one input file per micro-batch -> many small committed files
    q = start_city_ingest(
        file_raw_stream(spark, str(src), max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running


def _rows(df):
    return {tuple(r) for r in df.select("ref", "city_id", "city_name", "c_date").collect()}


def test_minor_compaction_preserves_content_and_shrinks_files(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    dst = str(tmp_path / "serving")
    _write_events(src, 0, 120, files=6)
    _ingest(spark, src, out, ckpt)

    landing_files = data_file_count(out)
    assert landing_files >= 6  # one+ per micro-batch per partition

    rep = compact_streaming_sink(spark, out, dst, "c_date")
    assert rep["committed"] and rep["n_new_batches"] >= 6
    assert _rows(read_compacted(spark, out, dst)) == _rows(read_committed(spark, out))
    # one run: at most one file per c_date partition
    n_dates = read_committed(spark, out).select("c_date").distinct().count()
    assert data_file_count(dst) <= n_dates < landing_files


def test_incremental_minor_then_landing_tail(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    dst = str(tmp_path / "serving")
    _write_events(src, 0, 60, files=3)
    _ingest(spark, src, out, ckpt)
    rep1 = compact_streaming_sink(spark, out, dst, "c_date")
    assert rep1["committed"]

    _write_events(src, 60, 100, files=2)
    _ingest(spark, src, out, ckpt)
    # before the next run, the serving read must still be complete via
    # the landing tail...
    assert _rows(read_compacted(spark, out, dst)) == _rows(read_committed(spark, out))
    # ...and excluding the tail shows only the compacted prefix
    assert (
        read_compacted(spark, out, dst, include_landing_tail=False).count() == 60
    )

    rep2 = compact_streaming_sink(spark, out, dst, "c_date")
    assert rep2["committed"] and rep2["through"] > rep1["through"]
    assert rep2["n_new_batches"] >= 2  # incremental: only the new batches
    assert _rows(
        read_compacted(spark, out, dst, include_landing_tail=False)
    ) == _rows(read_committed(spark, out))


def test_noop_when_nothing_new_and_major_folds_runs(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    dst = str(tmp_path / "serving")
    _write_events(src, 0, 40, files=2)
    _ingest(spark, src, out, ckpt)
    compact_streaming_sink(spark, out, dst, "c_date")
    _write_events(src, 40, 80, files=2)
    _ingest(spark, src, out, ckpt)
    compact_streaming_sink(spark, out, dst, "c_date")

    noop = compact_streaming_sink(spark, out, dst, "c_date")
    assert not noop["committed"] and noop["n_new_batches"] == 0

    rep = compact_streaming_sink(spark, out, dst, "c_date", major=True)
    assert rep["committed"] and len(rep["runs"]) == 1
    # retired run dirs are gone; content intact
    run_dirs = [d for d in os.listdir(dst) if d.startswith("run-") and "__tmp" not in d]
    assert run_dirs == [os.path.basename(rep["run_dir"])]
    assert _rows(read_compacted(spark, out, dst)) == _rows(read_committed(spark, out))


def test_crash_between_rename_and_commit_converges(spark, tmp_path):
    """Simulate the worst crash window: the run dir was renamed into
    place but the manifest commit never landed. The retry must
    overwrite the debris and commit exactly-once semantics for
    readers (content equality, no duplicates)."""
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    dst = str(tmp_path / "serving")
    _write_events(src, 0, 50, files=2)
    _ingest(spark, src, out, ckpt)

    rep = compact_streaming_sink(spark, out, dst, "c_date")
    # un-commit: delete the manifest, keep the run dir (crash replica)
    os.remove(os.path.join(dst, "_compaction", os.listdir(os.path.join(dst, "_compaction"))[0]))
    assert read_compacted(spark, out, dst, include_landing_tail=False).count() == 0

    rep2 = compact_streaming_sink(spark, out, dst, "c_date")
    assert rep2["committed"] and rep2["run_dir"] == rep["run_dir"]
    assert _rows(read_compacted(spark, out, dst)) == _rows(read_committed(spark, out))


def test_crashed_tmp_dir_is_invisible_and_cleaned(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", str(tmp_path / "out"), str(tmp_path / "ckpt")
    dst = str(tmp_path / "serving")
    _write_events(src, 0, 30, files=1)
    _ingest(spark, src, out, ckpt)

    # fake a crashed write attempt
    debris = os.path.join(dst, "run-0000000000-0000__tmp")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-junk.orc"), "w") as fh:
        fh.write("not orc")

    rep = compact_streaming_sink(spark, out, dst, "c_date")
    assert rep["committed"]
    assert not os.path.isdir(debris)
    assert _rows(read_compacted(spark, out, dst)) == _rows(read_committed(spark, out))
