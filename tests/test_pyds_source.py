"""Custom Python DataSource (sources/pyds.py): pushdown pruning and
end-to-end read semantics the value oracle can't see."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.sources.pyds import (
    CdcSynthReader,
    cdc_row,
    register,
)


def test_pushdown_prunes_splits_before_read():
    """An EqualTo filter on `part` must shrink partitions() to one
    split — pruning happens at planning, not as a post-read filter."""
    from pyspark.sql.datasource import EqualTo

    r = CdcSynthReader({"rows": "1000", "partitions": "8"})
    assert len(r.partitions()) == 8
    rest = list(r.pushFilters([EqualTo(("part",), 3)]))
    assert rest == []  # fully consumed
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].part == 3


def test_unsupported_filters_returned():
    from pyspark.sql.datasource import EqualTo

    r = CdcSynthReader({"rows": "100", "partitions": "4"})
    rest = list(r.pushFilters([EqualTo(("city",), "berlin")]))
    assert len(rest) == 1  # city filter NOT consumed -> Spark reapplies it


def test_filtered_scan_matches_direct_generation(spark):
    """Reading with part=3 through Spark returns exactly the rows the
    generator produces for that split."""
    register(spark)
    df = (
        spark.read.format("cdc_synth")
        .option("rows", 1000)
        .option("partitions", 8)
        .load()
        .filter(F.col("part") == 3)
    )
    got = {tuple(r) for r in df.collect()}
    want = {cdc_row(i, 125) for i in range(3 * 125, 4 * 125)}
    assert got == want


def test_city_filter_correct_above_scan(spark):
    """A non-pushable filter still evaluates correctly above the scan."""
    register(spark)
    df = (
        spark.read.format("cdc_synth")
        .option("rows", 500)
        .option("partitions", 4)
        .load()
        .filter(F.col("city") == "berlin")
    )
    rows = df.collect()
    assert rows and all(r["city"] == "berlin" for r in rows)
    want = sum(1 for i in range(500) if cdc_row(i, 125)[3] == "berlin")
    assert len(rows) == want


def test_streaming_source_exactly_once_across_restart(spark, tmp_path):
    """MID-stream restart exactly-once (ADVICE r5: the old test only
    restarted after full completion): the feed "arrives" 200 rows per
    latestOffset call via broker-side arrival state (advance_path),
    and each availableNow run snapshots ONE arrival — so every
    run_once() after the first is a restart on the same checkpoint
    with the source mid-stream. Four restarts drain 800 rows; a fifth
    proves no re-delivery. Every row arrives exactly once, equal to
    the batch generation."""
    from flink_hiveorc_spark.sources.pyds import cdc_row, register_streaming

    register_streaming(spark)
    ckpt = str(tmp_path / "pyds_ckpt")
    out = str(tmp_path / "pyds_out")  # parquet sink: commit log -> restartable
    arrival = str(tmp_path / "pyds_arrival")

    def run_once():
        stream = (
            spark.readStream.format("cdc_synth_stream")
            .option("rows", 800)
            .option("batch_rows", 200)
            .option("partitions", 4)
            .option("advance_path", arrival)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
        return spark.read.parquet(out).count()

    counts = [run_once() for _ in range(5)]
    # Progress is monotone, resumes MID-stream, and the extra runs
    # re-deliver nothing. How many times an availableNow run probes
    # latestOffset is an engine internal, not contractual — so bound
    # the first run (>=1 arrival, <=2 probes => mid-stream restart is
    # still exercised) instead of pinning it to exactly one snapshot.
    assert 200 <= counts[0] <= 400  # first run mid-stream, not drained
    assert counts == sorted(counts) and counts[3] == 800 and counts[4] == 800
    rows = spark.read.parquet(out).collect()
    got = sorted(tuple(r) for r in rows)
    want = sorted(cdc_row(i, 200) for i in range(800))
    assert got == want
