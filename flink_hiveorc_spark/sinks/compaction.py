"""Streaming-sink small-file compaction: the table service that turns
a micro-batch ORC landing zone into a read-optimized serving table.

Reference parity ([ext] on SURVEY §4.1): the reference bounds file
count by size-rolling each open writer at ~5 MB (HiveOrcSink.java:39,
215-218), which caps file SIZE but still emits one file per bucket
per roll — its table accretes small files forever and relies on Hive
compaction downstream. Spark's streaming file sink has the same
dynamic (one file per partition per micro-batch, `maxRecordsPerFile`
caps size only), and `compact_partitions` (hive_orc.py) must refuse
manifest-based sink dirs: rewriting data files underneath
`_spark_metadata` desyncs the manifest. This module is the missing
piece — an INCREMENTAL landing→serving compactor that never touches
the landing dir.

Protocol (the reference's tmp→pending→final rename two-phase commit,
HiveOrcSink.java:438-455, re-expressed over run directories):

- Each compaction run covers a contiguous range of the landing sink's
  committed micro-batches and writes its output to
  ``dst/run-<through>-<gen>__tmp`` → ``os.rename`` → final run dir.
- The run COMMITS by atomically publishing a JSON manifest
  ``dst/_compaction/<through>-<gen>.json`` (write tmp + rename — the
  same pointer-file pattern as streaming/ingest.py's upsert
  snapshots) listing the run dirs that constitute the table and the
  landing batch id it covers through.
- Readers (`read_compacted`) resolve the latest manifest and read
  exactly its run dirs, optionally unioned with the not-yet-compacted
  landing tail — so a crashed run (tmp dir, renamed-but-uncommitted
  run dir) is invisible, and re-running the compactor converges:
  deterministic names mean the retry overwrites the debris.
- ``major=True`` folds all committed runs plus the new tail into ONE
  run, commits, then deletes retired run dirs (deletion is AFTER
  commit; a crash between the two leaves orphan dirs that readers
  ignore and the next major sweep removes).

100 TB posture: a minor run reads only the NEW micro-batch files
(incremental — cost is proportional to ingest since the last run, not
to table size) and repartitions them by partition key with
`maxRecordsPerFile`, so serving-file count per partition grows by ~1
per run instead of ~1 per micro-batch. Majors are the heavy,
infrequent full rewrite and scale with table size by nature.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_compaction"


def _landing_batches(sink_path: str) -> dict[int, list[str]]:
    """Per committed micro-batch id, the ABSOLUTE data-file paths the
    landing sink's `_spark_metadata` manifest records for it.

    Plain manifest `N` lists batch N's adds; `N.compact` summarizes
    everything ≤ N (the sink's own log compaction) — for batch
    attribution we prefer the plain file and fall back to attributing
    a compact-only batch's files to its id."""
    meta = os.path.join(sink_path, "_spark_metadata")
    out: dict[int, list[str]] = {}
    if not os.path.isdir(meta):
        raise ValueError(
            f"{sink_path} has no _spark_metadata — not a streaming sink dir"
        )
    seen: set[str] = set()
    names = sorted(
        (n for n in os.listdir(meta) if n.split(".")[0].isdigit()),
        key=lambda n: (int(n.split(".")[0]), n.endswith(".compact")),
    )
    for name in names:
        bid = int(name.split(".")[0])
        with open(os.path.join(meta, name)) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("v"):
                    continue
                entry = json.loads(line)
                p = entry["path"]
                p = p[len("file:") :] if p.startswith("file:") else p
                if entry.get("action", "add") == "delete":
                    continue
                if p not in seen:
                    seen.add(p)
                    out.setdefault(bid, []).append(p)
    return out


def _manifests(dst: str) -> list[str]:
    d = os.path.join(dst, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        (p for p in glob.glob(os.path.join(d, "*.json")) if "__tmp" not in p),
        key=lambda p: tuple(int(x) for x in os.path.basename(p)[:-5].split("-")),
    )


def _load_state(dst: str) -> dict:
    ms = _manifests(dst)
    if not ms:
        return {"through": -1, "gen": -1, "runs": []}
    with open(ms[-1]) as fh:
        return json.load(fh)


def compact_streaming_sink(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_by: str | list[str],
    fmt: str = "orc",
    target_file_mb: int = 256,
    major: bool = False,
) -> dict:
    """One compaction run (see module docstring). Returns a report:
    {"through", "gen", "n_new_batches", "run_dir", "committed"}.

    Safe to re-run after any crash; a no-op (no new batches, minor)
    commits nothing."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    state = _load_state(dst)
    batches = _landing_batches(src)
    new_ids = sorted(b for b in batches if b > state["through"])
    new_files = [f for b in new_ids for f in batches[b]]
    if not new_files and not (major and len(state["runs"]) > 1):
        return {**state, "n_new_batches": 0, "run_dir": None, "committed": False}

    through = new_ids[-1] if new_ids else state["through"]
    gen = state["gen"] + 1
    run_name = f"run-{through:010d}-{gen:04d}"
    run_dir = os.path.join(dst, run_name)
    tmp_dir = run_dir + "__tmp"

    parts = []
    if new_files:
        parts.append(
            spark.read.format(fmt).option("basePath", src).load(new_files)
        )
    if major:
        for r in state["runs"]:
            parts.append(
                spark.read.format(fmt)
                .option("basePath", os.path.join(dst, r))
                .load(os.path.join(dst, r))
            )
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)

    # Debris from a crashed previous attempt at this same run name
    # (deterministic) is overwritten, never accumulated.
    shutil.rmtree(tmp_dir, ignore_errors=True)
    shutil.rmtree(run_dir, ignore_errors=True)
    (
        df.repartition(*[F.col(k) for k in keys])
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy(*keys)
        .option("maxRecordsPerFile", str(target_file_mb * 4096))
        .save(tmp_dir)
    )
    os.rename(tmp_dir, run_dir)

    runs = [run_name] if major else state["runs"] + [run_name]
    manifest = {"through": through, "gen": gen, "runs": runs}
    mdir = os.path.join(dst, _MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"{through:010d}-{gen:04d}.json")
    mtmp = mpath + "__tmp"
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(mtmp, mpath)  # COMMIT point

    if major:  # retire folded-in runs only after the commit landed
        for r in state["runs"]:
            if r != run_name:
                shutil.rmtree(os.path.join(dst, r), ignore_errors=True)
    return {**manifest, "n_new_batches": len(new_ids), "run_dir": run_dir, "committed": True}


def read_compacted(
    spark: SparkSession,
    src: str,
    dst: str,
    fmt: str = "orc",
    include_landing_tail: bool = True,
) -> DataFrame:
    """The serving table: all committed compaction runs, plus (by
    default) the landing batches not yet covered by any run — readers
    always see exactly the landing sink's committed content, just
    through fewer, bigger files for the compacted prefix."""
    state = _load_state(dst)
    parts = []
    for r in state["runs"]:
        rd = os.path.join(dst, r)
        parts.append(spark.read.format(fmt).option("basePath", rd).load(rd))
    if include_landing_tail:
        batches = _landing_batches(src)
        tail = [f for b, fs in batches.items() if b > state["through"] for f in fs]
        if tail:
            parts.append(
                spark.read.format(fmt).option("basePath", src).load(tail)
            )
    if not parts:
        return spark.read.format(fmt).load(src).limit(0)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def data_file_count(root: str, fmt: str = "orc") -> int:
    """Data files under a dir tree (tmp dirs excluded) — the metric
    compaction exists to shrink."""
    return sum(
        1
        for f in glob.glob(os.path.join(root, "**", f"*.{fmt}"), recursive=True)
        if "__tmp" not in f and "_spark_metadata" not in f
    )
