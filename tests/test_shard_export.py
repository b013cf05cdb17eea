"""Shard export + manifest verification roundtrip (sinks/shards.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.analytics import (
    SHARD_TOKEN_BUDGET,
    assign_shard_idx,
)
from flink_hiveorc_spark.sinks.shards import (
    shard_manifest,
    verify_shards,
    write_training_shards,
)
from pyspark.sql.window import Window


def _sized(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", "source", "text",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )


def _packed(spark, sf_dir):
    return assign_shard_idx(_sized(spark, sf_dir))


def _packed_sequential_reference(spark, sf_dir):
    """The original one-window-per-stream formulation — kept here as
    the semantic model the distributed two-pass prefix sum must
    reproduce bit-for-bit."""
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _sized(spark, sf_dir).select(
        "*",
        ((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SHARD_TOKEN_BUDGET)
        .cast("bigint")
        .alias("shard_idx"),
    )


def test_two_pass_assignment_matches_sequential_model(spark, sf_dir):
    cols = ["doc_id", "lang", "source", "shard_idx"]
    got = {tuple(r) for r in _packed(spark, sf_dir).select(cols).collect()}
    want = {
        tuple(r)
        for r in _packed_sequential_reference(spark, sf_dir).select(cols).collect()
    }
    assert got == want


def test_two_pass_plan_splits_streams_and_broadcasts_offsets(spark, sf_dir):
    """VERDICT r4 #2 pin: the only corpus-sized window must be keyed
    on (lang, source, _bucket) — never (lang, source) alone, which
    serializes a hot stream onto one task — and the per-cell offsets
    must come in via a broadcast join."""
    plan = _packed(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    corpus_windows = [
        ln for ln in plan.splitlines()
        if "Window [sum(n_tokens" in ln and "windowspecdefinition" in ln
    ]
    assert corpus_windows, plan
    for ln in corpus_windows:
        assert "_bucket" in ln.split("windowspecdefinition", 1)[1], ln
    assert "BroadcastHashJoin" in plan, plan


def test_shard_export_roundtrip_verifies(spark, sf_dir, tmp_path):
    packed = _packed(spark, sf_dir)
    expected = shard_manifest(packed)
    out = str(tmp_path / "shards")
    write_training_shards(packed, out)
    diffs = verify_shards(spark, out, expected)
    assert diffs.count() == 0
    # partition layout: lang=<l>/source=<s> dirs exist
    back = spark.read.parquet(out)
    assert back.count() == packed.count()
    assert {r.lang for r in back.select("lang").distinct().collect()} == {
        r.lang for r in packed.select("lang").distinct().collect()
    }


def test_shard_verify_detects_corruption(spark, sf_dir, tmp_path):
    """Dropping one document from the store must surface exactly the
    affected shard (and only it)."""
    packed = _packed(spark, sf_dir)
    expected = shard_manifest(packed)
    victim = packed.orderBy("doc_id").limit(1).collect()[0]
    out = str(tmp_path / "shards_corrupt")
    write_training_shards(packed.filter(F.col("doc_id") != victim.doc_id), out)
    diffs = verify_shards(spark, out, expected).collect()
    assert len(diffs) == 1
    d = diffs[0]
    assert (d.lang, d.source, d.shard_idx) == (
        victim.lang,
        victim.source,
        victim.shard_idx,
    )
    assert d.actual_n_docs == d.expected_n_docs - 1
    assert d.actual_content_checksum != d.expected_content_checksum
