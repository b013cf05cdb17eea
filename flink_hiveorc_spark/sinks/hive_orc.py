"""Hive-partitioned ORC sink — the reference's core artifact, Spark-first.

The reference implements 465 lines of bucketed ORC writing with
size/time file rolling and a tmp→pending→final two-phase commit
(HiveOrcSink.java:34-465). On Spark every one of those concerns maps
to a built-in:

- partition-dir layout ``field=value`` (RowTimeBucketer.scala:18)
  → ``df.write.partitionBy(key)``; byte-identical directory layout,
- size-based file roll (HiveOrcSink.java:215-218)
  → ``spark.sql.files.maxRecordsPerFile`` + AQE output coalescing,
- atomic publish (HiveOrcSink.java:321-327,342-345)
  → Spark's FileCommitProtocol (task attempt dirs + job commit),
- exactly-once streaming (HiveOrcSink.java:438-455)
  → Structured Streaming file sink `_spark_metadata` manifest
  (see streaming/ingest.py).

What the reference leaves open and we DO implement:
- metastore partition registration (the reference never registers
  partitions, SURVEY.md §1.3) → ``register_partitions``,
- small-file compaction for batch/foreachBatch-written table dirs →
  ``compact_partitions`` (manifest-based streaming-sink dirs are
  refused — see its docstring).

100 TB posture: a partitioned write's parallelism = upstream
partitions × distinct partition values per task. ``write_partitioned``
optionally repartitions by the partition key first so each output dir
is written by few tasks (fewer, bigger files; no 10k-open-writers
blowup — the exact problem the reference's per-bucket writer map,
HiveOrcSink.java:97, hand-manages).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    fmt: str = "orc",
    mode: str = "overwrite",
    max_records_per_file: int | None = 1_000_000,
    repartition_first: bool = True,
    cluster_by: list[str] | None = None,
    bloom_filter_columns: list[str] | None = None,
) -> None:
    """Write a Hive-layout partitioned table directory.

    ``repartition_first`` hash-partitions on the partition key so each
    ``field=value`` dir receives data from few tasks. For skewed
    partition keys at scale, add a salt column to the repartition
    (not the directory layout) — see functions/skew.py.

    ``cluster_by`` sorts rows WITHIN each write task on the given
    columns before writing. ORC/parquet keep per-stripe/row-group
    min-max statistics; clustering on a hot filter column makes those
    ranges narrow and disjoint, so point/range predicates skip most of
    each file's stripes — the second level of data skipping after
    partition pruning, and at 100 TB often the bigger one (partitions
    are coarse, stripes are ~64 MB).

    ``bloom_filter_columns`` writes per-stripe ORC bloom filters
    (``orc.bloom.filter.columns``; these options belong to the
    OrcFile.writerOptions surface the reference exposes at
    HiveOrcSink.java:313-314 — the reference itself never sets bloom
    filter columns, this is an [ext] addition on that surface).
    Min-max skipping fails on high-cardinality point lookups (every
    stripe's [min,max] spans the probe value); a bloom filter rejects
    stripes by membership instead — the third level of data skipping,
    for needle-in-100-TB id probes. Parquet's equivalent is
    ``parquet.bloom.filter.enabled#col``, applied when fmt is parquet.
    """
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    writer = df
    if repartition_first:
        writer = df.repartition(*[F.col(k) for k in keys])
    if cluster_by:
        writer = writer.sortWithinPartitions(*keys, *cluster_by)
    w = writer.write.format(fmt).mode(mode).partitionBy(*keys)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if bloom_filter_columns:
        if fmt == "orc":
            w = w.option("orc.bloom.filter.columns", ",".join(bloom_filter_columns))
            w = w.option("orc.bloom.filter.fpp", "0.05")
        else:  # parquet: per-column enable flags
            for c in bloom_filter_columns:
                w = w.option(f"parquet.bloom.filter.enabled#{c}", "true")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "orc", schema=None
) -> DataFrame:
    """Read a partitioned table dir back; partition pruning applies to
    any filter on the ``field=value`` columns.

    Pass ``schema`` (StructType, including partition columns) wherever
    the expected shape is known: inference needs at least one data
    file, so a legitimately EMPTY table (zero rows written) breaks
    schemaless readers — the same explicit-schema rule the engine
    applies to JSON sources (SURVEY.md §1.4: no reflective schemas)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def register_partitions(spark: SparkSession, table: str, path: str) -> None:
    """Register on-disk partitions with the catalog (MSCK semantics).

    Fills the operational gap the reference leaves open (it writes
    ``field=value`` dirs but never calls the metastore — SURVEY.md
    §1.3). Requires a Hive-backed catalog; on the in-memory catalog
    used in tests we fall back to refreshing the path-based table.

    Only catalog-capability errors (AnalysisException: MSCK
    unsupported / table not found in the in-memory catalog) trigger
    the fallback. Genuine metastore failures — connectivity,
    permissions — propagate, so partitions can never silently stay
    unregistered while the caller believes they are visible
    (ADVICE r1).
    """
    from pyspark.errors import AnalysisException

    try:
        spark.sql(f"MSCK REPAIR TABLE {table}")
        # MSCK only discovers NEW partition dirs; files appended to
        # already-registered partitions stay hidden behind the cached
        # listing until an explicit refresh.
        spark.sql(f"REFRESH TABLE {table}")
    except AnalysisException:
        # In-memory catalog (tests): path-based tables pick up new
        # partitions on refresh. Any non-analysis error (RPC failure,
        # auth) has already propagated above.
        spark.catalog.refreshByPath(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: str | list[str],
    fmt: str = "orc",
    target_file_mb: int = 256,
    predicate: str | None = None,
) -> None:
    """Rewrite (a slice of) a partitioned table into ~target-size files.

    Applies to BATCH-written (or foreachBatch-written) table dirs
    only. A streaming file-sink dir is defined by its
    `_spark_metadata` manifest: rewriting data files underneath it
    would leave the manifest pointing at deleted files (manifest-based
    reads break) and mark the new files as orphans (a later vacuum
    would delete them). We refuse such dirs outright — compact a
    streaming sink by switching ingestion to the foreachBatch
    committer (streaming/ingest.py) whose output is a plain table dir
    (ADVICE r1).
    """
    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is a streaming file-sink directory (_spark_metadata "
            "present); compacting would desync the manifest. Use the "
            "foreachBatch ingestion variant for compactable output."
        )
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    df = spark.read.format(fmt).load(path)
    if predicate:
        df = df.filter(predicate)
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        df.repartition(*[F.col(k) for k in keys])
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy(*keys)
        .option("maxRecordsPerFile", str(target_file_mb * 4096))
        .save(tmp)
    )
    # Atomic-ish swap of the rewritten partition dirs. The final write
    # must carry the file-size cap too — repartition(key) funnels each
    # partition value into one task, and without maxRecordsPerFile a
    # hot partition becomes a single unbounded file (the exact problem
    # compaction exists to fix).
    compacted = spark.read.format(fmt).load(tmp)
    (
        compacted.repartition(*[F.col(k) for k in keys])
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy(*keys)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", str(target_file_mb * 4096))
        .save(path)
    )
    _rm_tree(tmp)


def _rm_tree(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def vacuum_streaming_sink(
    spark: SparkSession, path: str, dry_run: bool = False
) -> list[str]:
    """Delete data files a streaming file-sink dir does NOT list in
    its `_spark_metadata` commit manifest.

    Reference parity: HiveOrcSink deletes stale tmp/pending files on
    writer init (HiveOrcSink.java:291-307) so crashed attempts never
    leak into the table. Spark's file sink already EXCLUDES orphans
    from reads (the manifest is the table), but the bytes linger on
    disk after crashes — this reclaims them. Returns the removed
    (or, with dry_run, removable) paths.

    Only call while no query is actively writing to `path` (a file
    written by an in-flight, not-yet-committed batch looks identical
    to an orphan).
    """
    import glob as _glob
    import json as _json

    meta_dir = os.path.join(path, "_spark_metadata")
    # Sort manifests NUMERICALLY by batch id ("9.compact" before "10"):
    # lexicographic order applies add/delete actions for the same
    # basename out of batch order once ids reach double digits
    # (ADVICE r2). Compacted manifests sort before the same-id plain
    # manifest (they summarize batches <= id).
    manifest_files = sorted(
        _glob.glob(os.path.join(meta_dir, "*")),
        key=lambda p: (
            int(os.path.basename(p).split(".")[0])
            if os.path.basename(p).split(".")[0].isdigit()
            else -1,
            not os.path.basename(p).endswith(".compact"),
        ),
    )
    if not manifest_files:
        # Without a manifest EVERY file would look uncommitted and the
        # "vacuum" would delete the whole table — refuse instead (the
        # caller probably pointed at a batch-written dir or a typo'd
        # path).
        raise ValueError(
            f"{path} has no _spark_metadata manifest — not a streaming-sink "
            "directory; refusing to vacuum (would delete every data file)"
        )
    committed: set[str] = set()
    for mf in manifest_files:
        name = os.path.basename(mf)
        if not name.isdigit() and not name.endswith(".compact"):
            continue
        with open(mf) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                entry = _json.loads(line)
                # Compacted manifests carry an action field; a
                # 'delete' entry names a file that is NOT part of the
                # committed table anymore — keeping it in the
                # committed set would leak those bytes forever
                # (ADVICE r1). Absent action field == 'add'.
                base = os.path.basename(entry["path"])
                if entry.get("action", "add") == "delete":
                    committed.discard(base)
                else:
                    committed.add(base)
    removed = []
    for f in _glob.glob(os.path.join(path, "**", "*.orc"), recursive=True) + _glob.glob(
        os.path.join(path, "**", "*.parquet"), recursive=True
    ):
        if os.path.basename(f) not in committed:
            removed.append(f)
            if not dry_run:
                os.remove(f)
    return removed
