"""Streaming multimodal featurize with a quarantine DLQ (T5 × L5).

Composes the decode→featurize operators (functions/multimodal.py:
image_stats / audio_stats / video_stats, quarantine mode) with the
repo's streaming DLQ pattern (streaming/ingest.py:
start_city_ingest_with_dlq): a file stream of (doc_id, payload)
blobs fans into per-clip feature rows, and payloads the decoders
reject — 'unsupported' (needs a codec this cluster lacks) or
'malformed' (corrupt blob) — land VERBATIM in a parquet DLQ with
their classified error, instead of killing the query (a raw decode
exception inside a streaming task would fail the whole run; one bad
blob among billions must not).

Both sides are written in ONE foreachBatch, so features and
quarantined rows from the same source offsets commit together;
delivery is at-least-once on crash replay (same contract as the CDC
services — downstream dedup keys on doc_id, DLQ rows are idempotent
to reprocess). The repair leg mirrors the CDC one: the DLQ keeps
the ORIGINAL payload bytes, so after installing a codec (or fixing
the producer) the quarantined blobs re-enter by pointing a new
stream at the DLQ directory.

100 TB posture: the stream partitions by source files; each task
decodes its own blobs (no shuffle anywhere — the plan is scan →
mapInPandas → sink); feature rows are a few dozen bytes regardless
of blob size, so the sink stays small even when the source is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_hiveorc_spark.functions.multimodal import (
    audio_stats,
    decompress_stats,
    image_stats,
    media_probe,
    video_stats,
)

_FEATURIZERS = {
    "image": image_stats,
    "audio": audio_stats,
    "video": video_stats,
    # structural container probing (r11): route/budget codec-gated
    # assets in-stream; unrecognized containers quarantine as
    # 'unsupported' and re-enter via the repair leg once a codec
    # cluster picks them up
    "probe": media_probe,
    # blob decompression (r12): gzip/zlib/bz2/xz text shards decode
    # in-stream; zstd/lz4 quarantine as 'unsupported' until a codec
    # lands, corrupt streams as 'malformed' — same repair leg
    "decompress": decompress_stats,
}


def _register_r13_modalities() -> None:
    # archive.py/columnar.py import LAZILY (they reach back into
    # multimodal mid-import on workers — the registry circular-import
    # hazard), so their featurizers register here at call time instead
    # of at module load.
    from flink_hiveorc_spark.functions.archive import (
        archive_member_stats,
        web_archive_stats,
    )
    from flink_hiveorc_spark.functions.columnar import columnar_blob_stats
    from flink_hiveorc_spark.functions.mail import mail_part_stats
    from flink_hiveorc_spark.functions.pdf import pdf_stats

    # WARC/ARC envelope splitting (r13): crawl shards fan out to
    # per-record stat rows in-stream; zip/tar drops expand to member
    # rows; parquet/ORC blobs probe footers + values; mbox/MIME mail
    # dumps split to decoded part rows — all with the same
    # quarantine/repair contract
    _FEATURIZERS.setdefault("warc", web_archive_stats)
    _FEATURIZERS.setdefault("archive", archive_member_stats)
    _FEATURIZERS.setdefault("columnar", columnar_blob_stats)
    _FEATURIZERS.setdefault("mail", mail_part_stats)
    _FEATURIZERS.setdefault("pdf", pdf_stats)

    # r14: OOXML text extraction and the charset-aware crawl text
    # chain (WARC/ARC split → HTTP peel → charset sniff → UTF-8
    # transcode) run in-stream with the same quarantine/repair
    # contract
    from flink_hiveorc_spark.functions.charset import (
        web_archive_text_records,
    )
    from flink_hiveorc_spark.functions.office import epub_stats, office_stats

    _FEATURIZERS.setdefault("office", office_stats)
    _FEATURIZERS.setdefault("epub", epub_stats)
    _FEATURIZERS.setdefault("crawltext", web_archive_text_records)

    # r15: legacy binary Office (MS-CFB .doc/.xls) + RTF in-stream
    from flink_hiveorc_spark.functions.cfb import legacy_office_stats
    from flink_hiveorc_spark.functions.rtf import rtf_stats

    _FEATURIZERS.setdefault("legacy_office", legacy_office_stats)
    _FEATURIZERS.setdefault("rtf", rtf_stats)


def blob_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File stream of (doc_id, payload) parquet blobs — the stand-in
    for a Kafka/object-store blob feed, same role as file_raw_stream
    for the CDC path."""
    return spark.readStream.schema("doc_id long, payload binary").parquet(src_dir)


def start_multimodal_featurize(
    blobs: DataFrame,
    out_path: str,
    dlq_path: str,
    checkpoint: str,
    modality: str = "image",
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Stream blobs → decoded feature rows (parquet) + quarantine DLQ.

    The per-batch featurize runs the REAL decoders in quarantine
    mode; rows with a non-null `error` are joined back to the batch
    on doc_id to recover the original payload bytes for the DLQ
    (doc_id is the blob key and must be unique within a batch — the
    same uniqueness the downstream exactly-once dedup keys on)."""
    _register_r13_modalities()
    featurize = _FEATURIZERS.get(modality)
    if featurize is None:
        raise ValueError(f"unknown modality {modality!r} (want {sorted(_FEATURIZERS)})")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        stats = featurize(batch_df, quarantine=True).cache()
        try:
            good = stats.filter(F.col("error").isNull()).drop("error")
            good.write.mode("append").parquet(out_path)
            bad = stats.filter(F.col("error").isNotNull()).select("doc_id", "error")
            if bad.isEmpty():
                return
            (
                bad.join(batch_df.select("doc_id", "payload"), "doc_id")
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(dlq_path)
            )
        finally:
            stats.unpersist()

    writer = blobs.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def read_features(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(out_path)


def read_quarantine(spark: SparkSession, dlq_path: str) -> DataFrame:
    return spark.read.parquet(dlq_path)
