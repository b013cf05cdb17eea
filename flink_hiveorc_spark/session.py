"""SparkSession factory with scale-oriented defaults.

The reference engine hand-manages memory and file sizes
(HiveOrcSink.java:39,215-218 rolls files at ~5 MB of estimated heap);
on Spark all of that is delegated to Tungsten + AQE, so the session
factory is the single place we encode the 100 TB posture:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast-join demotion/promotion),
- explicit shuffle partition count sized to the local harness but
  overridable via env for a real cluster,
- UTC session timezone so results are reproducible against any
  oracle regardless of host timezone (the reference hardcodes UTC+8
  at App.txt:67 — we pin the session to UTC and apply UTC+8 only in
  the CDC date-derivation, see sources/cdc.py),
- Arrow enabled for the few pandas-UDF operators,
- parquet TIMESTAMP(NANOS) surfaced as bigint (Spark has no native
  nanosecond timestamp; the events table carries one).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# The engine's semantic + scale conf, single source of truth: applied
# at build time by get_spark and at runtime (runtime-settable subset)
# by __spark_entry__._configure to driver-provided bare sessions, so
# driver runs execute the same plans the bench/audit ran.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.orc.impl": "native",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.int96RebaseModeInRead": "CORRECTED",
    # Required for Python DataSource readers that implement
    # pushFilters() (sources/pyds.py) — without it Spark refuses to
    # initialize the reader at all (DATA_SOURCE_PUSHDOWN_DISABLED).
    "spark.sql.python.filterPushdown.enabled": "true",
    # Checkpoint files of garbage-collected DataFrames are deleted by
    # the context cleaner, so long sessions running many iterative
    # operators don't accumulate dead checkpoint data.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
}


def reliable_checkpoint(df: DataFrame) -> DataFrame:
    """Directory-backed checkpoint for the inter-iteration frames of
    iterative operators (connected components, PageRank — see
    functions/dedup.py).

    Why not ``localCheckpoint``: it cuts lineage by storing blocks on
    executors WITHOUT replication, so at 100 TB with preemptible
    executors a single lost executor kills the job mid-iteration (the
    truncated lineage cannot be recomputed). A reliable ``checkpoint``
    writes the frame to the checkpoint directory — set
    ``SPARK_GRAFT_CHECKPOINT_DIR`` to an HDFS/S3 path on a real
    cluster so the data survives any executor loss; the local-mode
    fallback is a temp dir (same durability class as local disk,
    which is all local mode can offer).

    Lazily sets the context checkpoint dir on first use so
    driver-provided bare sessions work without a build-time hook.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR") or tempfile.mkdtemp(
            prefix="spark_graft_ckpt_"
        )
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=True)


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply every runtime-settable ENGINE_CONF key to an existing
    session (static keys like legacy.parquet.nanosAsLong are attempted
    too — Spark accepts them via conf.set when unchanged-from-static
    or runtime-settable; genuinely static rejections are ignored)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on a live session; build-time only
    return spark


def get_spark(
    app_name: str = "flink-hiveorc-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    warehouse_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster, ``master`` comes from spark-submit and the
    local[] fallback here is ignored; shuffle partitions should then
    be ~2-3x total executor cores (or left to AQE's coalescing with a
    high initial count).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    # Only force a local master when nothing else configured one
    # (spark-submit / cluster deployments set spark.master themselves).
    if "SPARK_MASTER" not in os.environ and not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    if warehouse_dir:
        builder = builder.config("spark.sql.warehouse.dir", warehouse_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
