"""reliable_checkpoint: the durable-lineage-cut contract for iterative
operators (connected components / PageRank, functions/dedup.py).

The contract that matters at 100 TB: after the checkpoint, the frame's
logical plan must have NO upstream ancestors (no LSH self-join, no
parquet scan) — it reads back from the checkpoint *files*, which live
in a directory (``SPARK_GRAFT_CHECKPOINT_DIR`` → HDFS/S3 on a real
cluster) rather than in unreplicated executor block storage the way
``localCheckpoint`` blocks do.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.dedup import dedup_cluster_components
from flink_hiveorc_spark.session import reliable_checkpoint


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_checkpoint_truncates_lineage(spark, sf_dir):
    """A join+agg pipeline checkpoints to a plan with no join/scan
    ancestors — the iterative loop's per-round cost can't silently
    re-include upstream stages."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    joined = d.alias("a").join(d.alias("b"), "lang").groupBy("lang").count()
    before = _optimized_plan(joined)
    assert "Join" in before and "Relation" in before

    ck = reliable_checkpoint(joined)
    after = _optimized_plan(ck)
    assert "Join" not in after and "parquet" not in after
    assert "LogicalRDD" in after  # reads back from checkpoint data

    # Same rows either side of the cut.
    assert sorted(map(tuple, ck.collect())) == sorted(map(tuple, joined.collect()))


def test_checkpoint_dir_is_directory_backed(spark):
    """The checkpoint is reliable (directory-backed), not executor-
    block-backed: the context has a checkpoint dir and the checkpointed
    RDD reports a checkpoint file under it."""
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    ck = reliable_checkpoint(df)
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir is not None
    env_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if env_dir:
        assert ckpt_dir.rstrip("/").endswith(env_dir.rstrip("/").lstrip("/").split("/")[-1])
    # The materialized checkpoint produced files in the directory tree.
    local = ckpt_dir.replace("file:", "")
    found = any(files for _, _, files in os.walk(local))
    assert found, f"no checkpoint files under {local}"
    assert ck.count() == 100


def test_cluster_components_green_after_checkpoint_swap(spark, sf_dir):
    """End-to-end: the iterative operator still converges to the same
    component structure with reliable checkpoints in the loop."""
    comp = dedup_cluster_components(spark, sf_dir)
    rows = comp.collect()
    assert len(rows) > 0
    by_id = {r["doc_id"]: r["component"] for r in rows}
    # Component representative is a member of the component.
    for comp_id in set(by_id.values()):
        assert by_id[comp_id] == comp_id
    # Labels are min-reachable: component <= doc_id always.
    assert all(c <= d for d, c in by_id.items())
