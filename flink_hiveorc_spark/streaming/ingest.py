"""Streaming ingestion: the reference job as Structured Streaming.

The reference (App.txt:26-73 + HiveOrcSink.java:34-465) is a Flink
job: Kafka JSON CDC events → parse → derive UTC+8 date → exactly-once
partitioned ORC sink. Its 465 lines of sink code (size/time file
rolling, tmp→pending→final rename, checkpointed row buffers) collapse
onto Structured Streaming built-ins:

- exactly-once (HiveOrcSink.java:438-455 two-phase commit)
  → file sink `_spark_metadata` manifest + `checkpointLocation`:
  a restarted query re-plans from the last committed offset range and
  never double-publishes a file. Recovery replays SOURCE offsets, not
  heap-buffered rows (HiveOrcSink.java:329-335) — same guarantee,
  strictly smaller state.
- processing-time timers / inactivity roll (HiveOrcSink.java:419-422,
  137-145) → trigger cadence; each micro-batch closes its files.
- size roll (HiveOrcSink.java:215-218) → `maxRecordsPerFile`;
  periodic compaction (sinks/hive_orc.py:compact_partitions) applies
  to the foreachBatch-committed variant only — the manifest-based
  file sink must not be rewritten underneath its `_spark_metadata`.

Kafka vs file source: the decode path is source-agnostic — both yield
a `value: string` column, so `decode_city_envelope` is shared. Tests
use the file source (no broker in the harness); `kafka_raw_stream`
carries the production wiring.

100 TB posture: ingestion parallelism = Kafka partitions (or file
count); the partitioned sink fans out via `partitionBy` with
`maxRecordsPerFile` bounding file size. State is O(offsets), not
O(buffered rows), so checkpoint size is independent of throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_hiveorc_spark.sources.cdc import decode_city_envelope


def kafka_raw_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic(s) → one `value: string` column per event.

    Mirrors the reference's consumer config (App.txt:27-37: topic
    list, group id, setStartFromEarliest). Requires the
    spark-sql-kafka package on the cluster classpath.
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def file_raw_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Text-lines directory → `value: string` stream (test stand-in
    for the Kafka source). Deliberately a TEXT source, not a JSON one:
    Kafka hands the sink the raw event string and the decode path owns
    all parsing (App.txt:59-67), so the stand-in must too."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.text(path)


INGEST_METRICS = "city_ingest_metrics"


def start_city_ingest(
    raw: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
    max_records_per_file: int = 1_000_000,
    observe_metrics: bool = True,
) -> StreamingQuery:
    """Decode the CDC envelope and stream into c_date-partitioned ORC.

    The whole reference job (App.txt:58-70 map + HiveOrcSink) in one
    declarative pipeline. Exactly-once: `checkpointLocation` commits
    the offset range and the `_spark_metadata` manifest atomically per
    micro-batch; a crash between the two replays the batch into the
    same file names (idempotent).

    ``observe_metrics`` (default on) rides Spark ``observe()``
    accumulators on the decoded stream — rows decoded, ghost rows
    (envelope decoded to a NULL ref: the DLQ-bound class), and max
    partition date (data freshness) — surfaced per micro-batch in the
    progress stream at one accumulator update per row, the engine
    twin of the reference framework's operator metrics. Read them
    with `ingest_progress_report`."""
    city = decode_city_envelope(raw)
    if observe_metrics:
        city = city.observe(
            INGEST_METRICS,
            F.count(F.lit(1)).alias("rows_decoded"),
            F.sum(F.col("ref").isNull().cast("long")).alias("ghost_rows"),
            F.max("c_date").alias("max_c_date"),
        )
    writer = (
        city.writeStream.format("orc")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy("c_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def read_committed(spark: SparkSession, out_path: str) -> DataFrame:
    """Read back ONLY committed files (the `_spark_metadata` manifest
    filters uncommitted/orphaned files automatically when the dir is
    read as a streaming-sink output)."""
    return spark.read.format("orc").load(out_path)


def ingest_progress_report(query: StreamingQuery) -> list[dict]:
    """Per-micro-batch rate/backpressure report from the query's
    retained progress history — the operational dashboard row the
    reference framework surfaces as operator metrics (records-in,
    throughput, lag) re-expressed over Structured Streaming's
    progress events. One dict per batch:

    - ``batch_id``, ``num_input_rows``
    - ``input_rps`` / ``processed_rps``: arrival vs drain rate. A
      sustained ``backpressure`` ratio > 1 (arrivals outpacing
      processing) is THE falling-behind signal — on Kafka it shows up
      as growing offset lag, on the file source as growing file
      backlog; either way this ratio is source-agnostic.
    - ``batch_duration_ms``: trigger latency (the reference's
      inactivity-roll knob is a time bound on the same quantity).
    - the `observe()` metrics when present: ``rows_decoded``,
      ``ghost_rows`` (NULL-ref envelopes — DLQ-bound), ``max_c_date``
      (freshness watermark of what actually landed).

    Pure driver-side JSON extraction — reading it costs nothing on
    the executors; availableNow batch runs and live triggers share
    the same shape."""
    import json as _json

    out = []
    for p in query.recentProgress:
        prog = _json.loads(p.json) if hasattr(p, "json") else dict(p)
        obs = (prog.get("observedMetrics") or {}).get(INGEST_METRICS) or {}
        dur = (prog.get("durationMs") or {}).get("triggerExecution")
        in_rps = prog.get("inputRowsPerSecond")
        proc_rps = prog.get("processedRowsPerSecond")
        out.append(
            {
                "batch_id": prog.get("batchId"),
                "num_input_rows": prog.get("numInputRows"),
                "input_rps": in_rps,
                "processed_rps": proc_rps,
                "backpressure": (
                    round(in_rps / proc_rps, 4)
                    if in_rps and proc_rps
                    else None
                ),
                "batch_duration_ms": dur,
                "rows_decoded": obs.get("rows_decoded"),
                "ghost_rows": obs.get("ghost_rows"),
                "max_c_date": obs.get("max_c_date"),
            }
        )
    return out


def start_city_ingest_managed(
    raw: DataFrame,
    out_path: str,
    checkpoint: str,
    table: str | None = None,
    available_now: bool = False,
    trigger_seconds: int | None = None,
    max_records_per_file: int = 1_000_000,
) -> StreamingQuery:
    """Managed variant of the ingest: foreachBatch gives each
    micro-batch a BATCH writer, which buys what the plain file-sink
    cannot do (SURVEY.md M2): catalog partition registration after
    every batch (S6 — the reference never registers partitions,
    SURVEY.md §1.3) and per-batch repartition-by-partition-key so each
    `c_date` dir gets few, large files (the reference's size-roll
    concern, HiveOrcSink.java:215-218, solved at the planner level).

    Delivery contract — weaker than `start_city_ingest`, stated
    plainly: foreachBatch is AT-LEAST-ONCE (a crash between the batch
    write and the offset commit replays the batch, appending
    duplicates; partition-overwrite per batch would instead DELETE
    earlier batches sharing the partition date — worse). Use this
    variant when downstream consumes through a compaction that makes
    duplicates harmless (e.g. sources/cdc.py:latest_state upsert
    semantics keyed by a unique sequence); use the plain file-sink
    variant when raw exactly-once file semantics are required.

    Visibility: partition registration is catalog-global, but Spark
    caches per-session file listings — a reader session that has
    already scanned the table sees appended files only after its own
    `REFRESH TABLE` (normal external-write semantics).
    """
    from flink_hiveorc_spark.sinks.hive_orc import register_partitions

    city = decode_city_envelope(raw)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.repartition(F.col("c_date"))
            .write.format("orc")
            .mode("append")
            .partitionBy("c_date")
            .option("maxRecordsPerFile", str(max_records_per_file))
            .save(out_path)
        )
        if table is not None:
            register_partitions(batch_df.sparkSession, table, out_path)

    writer = city.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


_SNAPSHOT_PTR = "_LATEST"


def list_snapshot_versions(out_path: str) -> list[str]:
    """Retained snapshot version dirs, oldest→newest (the last one is
    what `_LATEST` points at unless a write is mid-publish)."""
    import os

    return sorted(d for d in os.listdir(out_path) if d.startswith("v"))


def read_city_snapshot(
    spark: SparkSession, out_path: str, version: str | None = None
) -> DataFrame:
    """Read the current upsert snapshot (see start_city_upsert), or a
    retained older ``version`` (from list_snapshot_versions) — the
    poor-man's time travel the versioned layout buys: roll back or
    diff against the previous state without any table format."""
    import os

    if version is None:
        with open(os.path.join(out_path, _SNAPSHOT_PTR)) as fh:
            version = fh.read().strip()
    return spark.read.parquet(os.path.join(out_path, version))


def start_city_upsert(
    raw: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = False,
    trigger_seconds: int | None = None,
    keep_versions: int = 2,
) -> StreamingQuery:
    """Streaming CDC UPSERT: maintain a latest-state-per-key snapshot
    across micro-batches — the materialized table the reference's
    append-only sink leaves to downstream readers (SURVEY.md §1.3;
    batch twin: cdc_upsert_latest_state).

    Mechanics per batch: merge the incoming city rows (with their
    epoch-ms sequence) into the previous snapshot via
    sources/cdc.py:latest_state (max_by per key — one hash aggregate,
    no window sort), write the NEW snapshot to a versioned dir, then
    atomically repoint the `_LATEST` pointer file. Readers
    (read_city_snapshot) follow the pointer, so they always see a
    complete, consistent version — never a half-written one.

    Delivery: effectively exactly-once THROUGH IDEMPOTENCE — a crash
    between snapshot publish and offset commit replays the batch. The
    replayed batch N finds the pointer already at v{N} (prev == vdir)
    and SKIPS the write: the published snapshot already merged exactly
    these rows (same offset range ⇒ same batch content), so rewriting
    it would add nothing — and naively re-deriving it would read the
    v{N} parquet while overwriting the same directory, which Spark
    rejects ("Cannot overwrite a path that is also being read from").
    The skip is what makes restart-after-publish actually work. Old
    versions are pruned, keeping the previous one as the rollback
    point.

    100 TB note: full-snapshot rewrite per batch is right for
    dimension-sized state (the City table). Fact-sized streaming
    upserts belong in a format with row-level merge (Iceberg/Delta
    MERGE INTO) — out of scope for the parquet-only harness, stated
    rather than faked.
    """
    import os

    city = decode_city_envelope(raw, with_seq=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from flink_hiveorc_spark.sources.cdc import latest_state

        spark = batch_df.sparkSession
        os.makedirs(out_path, exist_ok=True)
        ptr = os.path.join(out_path, _SNAPSHOT_PTR)
        vdir = f"v{batch_id:020d}"
        merged = batch_df
        prev: str | None = None
        if os.path.exists(ptr):
            with open(ptr) as fh:
                prev = fh.read().strip()
            if prev != vdir:
                merged = spark.read.parquet(
                    os.path.join(out_path, prev)
                ).unionByName(batch_df)
        if prev != vdir:
            snapshot = latest_state(merged, keys=["ref"], seq_col="seq_ms")
            snapshot.write.mode("overwrite").parquet(os.path.join(out_path, vdir))
            tmp = ptr + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(vdir)
            os.replace(tmp, ptr)  # atomic publish
        # else: crash-replay of an already-published batch (pointer
        # committed, offsets not) — snapshot v{batch_id} is complete
        # and live; writing again would overwrite a dir we'd also be
        # reading. Fall through to pruning only.
        #
        # Retain the newest `keep_versions` dirs as rollback /
        # time-travel points. Read-safety under concurrent ingestion:
        # only the pointer-referenced version (and anything newer) is
        # guaranteed stable for a reader's whole scan — the OLDEST
        # retained version is pruned by a later batch and may vanish
        # mid-scan. Readers doing time travel on old versions must
        # tolerate retries or pause ingestion. Version names sort
        # chronologically (zero-padded batch ids).
        versions = sorted(d for d in os.listdir(out_path) if d.startswith("v"))
        for d in versions[: -max(1, keep_versions)]:
            import shutil

            shutil.rmtree(os.path.join(out_path, d), ignore_errors=True)

    writer = city.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_city_rollup(
    raw: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = False,
    trigger_seconds: int | None = None,
    keep_versions: int = 2,
) -> StreamingQuery:
    """Streaming INCREMENTAL AGGREGATE (materialized rollup): maintain
    per-(c_date, city_id) event counts across micro-batches by MERGING
    each batch's partial aggregate into the running snapshot — the
    composition of the CDC ingest path with operators/merge.py's
    join-based MERGE, i.e. incremental view maintenance without a
    table format.

    Per batch: aggregate ONLY the new rows (a partial agg over the
    micro-batch — tiny), then merge_into the previous snapshot:
    matched keys add counts / take the max sequence, unmatched keys
    insert. The snapshot is published exactly like start_city_upsert
    (versioned dir + atomic pointer swap, idempotent replay skip), so
    restart safety and read consistency are inherited unchanged.

    100 TB posture: the expensive side (raw events) is touched once,
    at ingest; the merge joins a batch-sized change set (broadcast)
    against a rollup whose cardinality is bounded by the key space,
    not the event count. This is the standard lambda-collapse: the
    batch twin (groupBy over all history) never has to run again.
    """
    return start_incremental_rollup(
        decode_city_envelope(raw, with_seq=True),
        out_path,
        checkpoint,
        available_now=available_now,
        trigger_seconds=trigger_seconds,
        keep_versions=keep_versions,
    )


def start_incremental_rollup(
    city: DataFrame,
    out_path: str,
    checkpoint: str,
    available_now: bool = False,
    trigger_seconds: int | None = None,
    keep_versions: int = 2,
    seq_col: str = "seq_ms",
) -> StreamingQuery:
    """The incremental-rollup half of ``start_city_rollup``, decoupled
    from the CDC envelope decode so it composes with ANY decoded
    streaming source — in particular with the LANDING dir itself read
    back as a file stream (Spark's file-sink→file-source chaining: the
    source lists files through the sink's ``_spark_metadata`` manifest,
    so only COMMITTED landing files ever enter the rollup). That chain
    is the reference's full operational loop — ingest → table service →
    derived aggregate (HiveOrcSink.java:386-455 plus the Hive rollup it
    defers to downstream) — as one restartable pipeline, e2e-tested in
    tests/test_e2e_operational_loop.py.

    ``city`` must carry (c_date, city_id, ``seq_col``); ``seq_col`` is
    any per-row monotone-enough sequence (epoch-ms for the CDC path,
    a CDC ref / offset for chained replays) whose per-key max the
    snapshot tracks as ``max_seq``. Delivery and publish semantics are
    documented on ``start_city_rollup`` (versioned snapshot dirs +
    atomic pointer swap; replay of a published batch_id is a no-op).
    """
    import os

    from flink_hiveorc_spark.operators.merge import merge_into

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(out_path, exist_ok=True)
        ptr = os.path.join(out_path, _SNAPSHOT_PTR)
        vdir = f"v{batch_id:020d}"
        delta = batch_df.groupBy("c_date", "city_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(seq_col).alias("max_seq"),
        )
        prev: str | None = None
        if os.path.exists(ptr):
            with open(ptr) as fh:
                prev = fh.read().strip()
        if prev != vdir:
            if prev is None:
                snapshot = delta
            else:
                target = spark.read.parquet(os.path.join(out_path, prev))
                snapshot = merge_into(
                    target,
                    delta,
                    on=["c_date", "city_id"],
                    when_matched_update={
                        "n_events": F.col("n_events") + F.col("s_n_events"),
                        "max_seq": F.greatest(F.col("max_seq"), F.col("s_max_seq")),
                    },
                    when_not_matched_insert={
                        "n_events": F.col("s_n_events"),
                        "max_seq": F.col("s_max_seq"),
                    },
                    broadcast_source=True,
                    # delta is a groupBy output — unique keys by
                    # construction; skip the guard's extra Spark job
                    # per micro-batch (r3 ADVICE).
                    check_duplicate_source=False,
                )
            snapshot.write.mode("overwrite").parquet(os.path.join(out_path, vdir))
            tmp = ptr + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(vdir)
            os.replace(tmp, ptr)  # atomic publish
        # else: replay of an already-published batch — skip (see
        # start_city_upsert: same offsets ⇒ same delta ⇒ the live
        # snapshot already contains this batch exactly once).
        versions = sorted(d for d in os.listdir(out_path) if d.startswith("v"))
        for d in versions[: -max(1, keep_versions)]:
            import shutil

            shutil.rmtree(os.path.join(out_path, d), ignore_errors=True)

    writer = city.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def start_city_ingest_with_dlq(
    raw: DataFrame,
    out_path: str,
    dlq_path: str,
    checkpoint: str,
    available_now: bool = False,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Ingest with a DEAD-LETTER queue: well-formed envelopes stream
    into c_date-partitioned ORC; malformed ones (broken outer JSON,
    broken inner payload, missing ref) land VERBATIM as JSON lines
    under `dlq_path` with their failure stage — instead of decoding
    into NULL ghost rows (what PERMISSIVE from_json alone would do) or
    failing the job (what the reference's JsonDeserializationSchema
    does, App.txt:35).

    Both sides are written in ONE foreachBatch, so good and bad rows
    from the same source offsets commit together; delivery is
    at-least-once on replay (same contract and rationale as
    start_city_ingest_managed — exact dedup downstream keys on ref,
    DLQ lines are idempotent to reprocess). After a schema fix the
    quarantined raw lines re-enter the pipeline by pointing a new
    stream at `dlq_path` (the `raw_value` column IS the original
    line)."""
    import os

    from flink_hiveorc_spark.sources.cdc import decode_city_envelope_with_dlq

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = decode_city_envelope_with_dlq(batch_df)
        good.write.mode("append").format("orc").partitionBy("c_date").save(out_path)
        if bad.isEmpty():
            return
        os.makedirs(dlq_path, exist_ok=True)
        bad.withColumn("batch_id", F.lit(batch_id)).write.mode("append").json(
            dlq_path
        )

    writer = raw.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
