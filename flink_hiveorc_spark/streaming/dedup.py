"""Streaming sub-document dedup: the chunk-level first-writer-wins
pipeline (functions/dedup.py:chunk_level_stats) as a continuous
operator over a document stream.

Batch chunk dedup re-reads the whole corpus; a pretraining ingest
pipeline instead sees documents ARRIVE and must drop repeated
passages (boilerplate, licenses, templated paragraphs) on the fly.
Spark-first shape: chunk + hash inside the stream projection (same
fixed-stride chunker and md5 discipline as the batch path — shuffles
carry 32-byte digests, never chunk text), then
`dropDuplicatesWithinWatermark` keyed on the digest: the FIRST
arrival of a chunk content survives, later copies are dropped, and a
chunk's dedup state is evicted once the watermark passes its event
time — state is bounded by the watermark horizon's distinct-chunk
count, not by corpus history (a plain dropDuplicates would hold every
chunk hash ever seen; at 100 TB/day that's the difference between a
job and an outage).

The batch twin (dedup_chunk_level, oracle-checked by the driver) is
the semantic model: within one watermark horizon the surviving chunk
SET is identical; attribution differs only in that batch
first-writer-wins is by doc_id order while the stream's is by arrival
order — the same guarantee Flink's `deduplicate` operator documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_hiveorc_spark.functions.dedup import _CHUNK_WORDS


def doc_chunk_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ts) stream → (doc_id, ts, chunk_h) stream: one
    row per fixed-stride chunk, md5-hashed in the same projection so
    no downstream operator ever shuffles chunk text. The words array
    is materialized BEFORE the slicing transform (the in-lambda
    split() O(words²) trap, pytest-guarded)."""
    wd = docs.select("doc_id", "ts", F.split("text", " ").alias("w"))
    n_chunks = F.ceil(F.size("w") / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice("w", i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "),
    )
    return wd.select(
        "doc_id", "ts", F.explode(chunks).alias("chunk")
    ).select("doc_id", "ts", F.md5("chunk").alias("chunk_h"))


def streaming_chunk_dedup(
    docs: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Surviving chunks of a document stream: first arrival of each
    chunk content within the watermark horizon wins; duplicates are
    dropped with state bounded by the horizon."""
    return (
        doc_chunk_stream(docs)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["chunk_h"])
    )
