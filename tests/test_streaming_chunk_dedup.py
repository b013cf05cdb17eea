"""Streaming chunk-level dedup (streaming/dedup.py) vs its batch
model (functions/dedup.py): identical surviving chunk SET, exactly
one survivor per distinct chunk content, duplicates dropped across
micro-batch boundaries, and state keyed on digests only.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.dedup import _CHUNK_WORDS
from flink_hiveorc_spark.streaming.dedup import (
    doc_chunk_stream,
    streaming_chunk_dedup,
)


def _doc_frame(spark, sf_dir, n=120):
    # event time advances with doc_id so the watermark horizon covers
    # the whole replay (all docs within one hour)
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n)
        .select(
            "doc_id",
            "text",
            F.timestamp_micros(
                (F.lit(1_755_000_000) + F.col("doc_id")) * 1_000_000
            ).alias("ts"),
        )
    )


def _batch_chunk_hashes(docs):
    wd = docs.select("doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.ceil(F.size("w") / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice("w", i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "),
    )
    return wd.select(F.explode(chunks).alias("chunk")).select(
        F.md5("chunk").alias("chunk_h")
    )


def _run_stream(spark, tmp_path, docs, name, files=4):
    src = str(tmp_path / f"{name}_src")
    docs.repartition(files).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = (
        streaming_chunk_dedup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600)  # self-terminating (availableNow); False = still running
    return spark.table(name)


def test_stream_survivor_set_matches_batch_distinct(spark, sf_dir, tmp_path):
    docs = _doc_frame(spark, sf_dir)
    got = _run_stream(spark, tmp_path, docs, "chunk_dedup_sink")
    want = {r.chunk_h for r in _batch_chunk_hashes(docs).distinct().collect()}
    rows = got.collect()
    assert {r.chunk_h for r in rows} == want
    assert len(rows) == len(want)  # exactly one survivor per content


def test_duplicates_dropped_across_micro_batches(spark, sf_dir, tmp_path):
    """Replaying the same documents under new doc_ids in LATER
    micro-batches must add zero new survivors — the cross-batch
    state is the point of the watermark variant."""
    docs = _doc_frame(spark, sf_dir, n=60)
    copies = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "text",
        # arrive later but inside the watermark horizon
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("ts"),
    )
    both = docs.unionByName(copies.select("doc_id", "text", "ts"))
    got = _run_stream(spark, tmp_path, both, "chunk_dedup_replay_sink", files=6)
    want = {r.chunk_h for r in _batch_chunk_hashes(docs).distinct().collect()}
    rows = got.collect()
    assert {r.chunk_h for r in rows} == want
    assert len(rows) == len(want)


def test_chunk_stream_carries_digests_not_text(spark, sf_dir):
    cols = doc_chunk_stream(
        _doc_frame(spark, sf_dir).limit(0)
    ).columns
    assert "chunk_h" in cols and "chunk" not in cols and "text" not in cols
