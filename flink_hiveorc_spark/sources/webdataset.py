"""WebDataset-style tar-shard I/O (L5 × shard packing).

WebDataset is the de-facto packaging for multimodal training
corpora: a dataset is a set of ``.tar`` shards; each SAMPLE is a
group of adjacent members sharing a key — ``000017.jpg`` +
``000017.txt`` + ``000017.json`` — and loaders stream shards
sequentially. This module provides both directions with stdlib
``tarfile`` only:

- ``write_tar_shards``: one tar per shard id via ``applyInPandas``
  (one task per shard — write parallelism scales with shard count,
  the same posture as sinks/shards.py), members sorted by (key,
  ext) so samples are adjacent per the WebDataset contract, and
  BYTE-DETERMINISTIC output (fixed mtime/uid/gid/mode, USTAR
  format): the same input always produces the same tar md5, so the
  returned manifest checksum is reproducible evidence, not a
  timestamp lottery.
- ``read_tar_shards``: Spark's built-in ``binaryFile`` source scans
  the shard files (one row per tar, whole-file content), and an
  Arrow ``mapInPandas`` expands members into (shard, key, ext,
  payload) rows.
- ``group_samples``: groupBy (shard, key) → ``map<ext, binary>`` —
  the sample dict a training loader sees.

100 TB posture: shards are the parallelism unit in BOTH directions
(a real deployment sizes them ~100 MB-1 GB, one task each); the
binaryFile scan holds one shard per task in memory — bound
``spark.sql.files.maxPartitionBytes`` has no effect on binaryFile
(whole files), so shard SIZE is the knob. Member payloads prune
away unless the plan touches them.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

# PUBLIC: the schema of the manifest frame write_tar_shards returns —
# part of its contract (callers rebuilding a manifest DataFrame from
# collected rows, e.g. for an empty corpus, need it explicitly)
WRITE_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_members", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("tar_md5", T.StringType()),
    ]
)
_WRITE_MANIFEST_SCHEMA = WRITE_MANIFEST_SCHEMA


class _Md5Tee:
    """Write-only file wrapper that md5s and counts bytes as they
    stream through to the underlying file — the incremental checksum
    for the disk-streaming shard writer (no whole-tar buffer ever
    exists)."""

    def __init__(self, fh):
        self._fh = fh
        self.md5 = hashlib.md5()
        self.n_bytes = 0

    def write(self, b) -> int:
        self._fh.write(b)
        self.md5.update(b)
        self.n_bytes += len(b)
        return len(b)

    def tell(self) -> int:
        # tarfile reads the start offset at open; writes are strictly
        # sequential so position == bytes written
        return self.n_bytes


def write_tar_shards(members: DataFrame, out_dir: str) -> DataFrame:
    """Write (shard_id, key, ext, payload) member rows as one
    ``shard-<id>.tar`` per shard id; returns the write manifest
    (ACTION-style: the returned frame must be consumed to drive the
    write — it IS the job). Deterministic bytes; tmp→rename commit
    so readers never see a partial tar.

    Memory bound: members stream through ``tarfile`` straight onto
    disk with the md5 folded in incrementally, so per-task peak
    memory is O(largest member) + the Arrow batch — INDEPENDENT of
    shard size (a fat video shard no longer buffers 2× its bytes in
    the Python worker)."""

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        # payload participates in the sort key: duplicate (key, ext)
        # rows would otherwise keep their nondeterministic
        # post-shuffle order and break the tar_md5 determinism claim
        rows = sorted(
            zip(pdf["key"], pdf["ext"], pdf["payload"]),
            key=lambda r: (str(r[0]), str(r[1]), bytes(r[2])),
        )
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"shard-{shard_id:06d}.tar")
        tmp = f"{path}.tmp-{os.getpid()}"
        try:
            with open(tmp, "wb") as f:
                tee = _Md5Tee(f)
                with tarfile.open(
                    fileobj=tee, mode="w", format=tarfile.USTAR_FORMAT
                ) as tar:
                    for key, ext, payload in rows:
                        name = f"{key}.{ext}"
                        if len(name.encode("utf-8", "surrogateescape")) > 100:
                            # USTAR caps member names at 100 bytes; fail
                            # with the contract error instead of letting
                            # tarfile raise opaquely inside the executor
                            raise ValueError(
                                f"WebDataset member name {name!r} exceeds "
                                "the 100-byte USTAR limit — shorten the "
                                "key/ext or repack with shorter keys"
                            )
                        data = bytes(payload)
                        info = tarfile.TarInfo(name=name)
                        info.size = len(data)
                        info.mtime = 0  # determinism: no wall-clock
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        info.mode = 0o644
                        tar.addfile(info, io.BytesIO(data))
        except BaseException:
            try:
                os.remove(tmp)  # no half-written litter on failure
            except OSError:
                pass
            raise
        os.replace(tmp, path)  # atomic publish
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [path],
                "n_samples": [len({str(k) for k, _, _ in rows})],
                "n_members": [len(rows)],
                "n_bytes": [tee.n_bytes],
                "tar_md5": [tee.md5.hexdigest()],
            }
        )

    return members.groupBy("shard_id").applyInPandas(
        write_shard, _WRITE_MANIFEST_SCHEMA
    )


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan ``.tar`` shards with the built-in binaryFile source and
    expand members: one row per member, (shard, key, ext, payload).
    The WebDataset key is the basename up to the FIRST dot (so
    ``x.seg.png`` → key ``x``, ext ``seg.png``).

    Damage detection: a member whose data is cut short length-fails
    loudly (tarfile alone returns SHORT data silently). A tar
    truncated exactly at a 512-block boundary reads as a valid
    shorter archive — only the write manifest (``tar_md5`` /
    ``n_members``) can catch that class; diff against it for full
    integrity, the same posture as sinks/shards.py verify_shards."""

    files = (
        spark.read.format("binaryFile")
        # exclude in-flight/leftover `.tmp-<pid>` files from crashed
        # write attempts — the atomic-publish guarantee for
        # directory-level readers
        .option("pathGlobFilter", "*.tar")
        .load(path_glob)
    )
    return files.select("path", "content").mapInPandas(
        _expand_tar_batches, _MEMBER_SCHEMA
    )


def _expand_tar_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Shared member expansion for the batch and streaming readers."""
    for pdf in batches:
        # one yield PER TAR: binaryFile can pack several shards
        # into one batch, and accumulating all their members in
        # one dict would double peak memory beyond the
        # one-shard-per-task posture
        for path, content in zip(pdf["path"], pdf["content"]):
            out = {k: [] for k in ("shard", "key", "ext", "payload")}
            try:
                # iteration and extractfile().read() raise lazily
                # on truncated archives — the whole walk stays
                # inside the malformed-tar contract, not just open
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(content)), mode="r:"
                ) as tar:
                    for info in tar:
                        if not info.isfile():
                            continue
                        name = os.path.basename(info.name)
                        key, _, ext = name.partition(".")
                        member = tar.extractfile(info)
                        data = member.read() if member else b""
                        if len(data) != info.size:
                            # tarfile returns SHORT data for a
                            # member cut by truncation — silent
                            # loss unless length-checked here
                            raise ValueError(
                                f"malformed tar shard {path}: member "
                                f"{info.name} is {len(data)} of "
                                f"{info.size} bytes"
                            )
                        out["shard"].append(os.path.basename(str(path)))
                        out["key"].append(key)
                        out["ext"].append(ext)
                        out["payload"].append(data)
            except tarfile.TarError as e:
                raise ValueError(f"malformed tar shard {path}: {e}") from e
            yield pd.DataFrame(out)


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_tar_shards(spark: SparkSession, src_dir: str) -> DataFrame:
    """STREAMING shard ingestion: tar shards arriving in `src_dir`
    over time expand into member rows incrementally — binaryFile as
    a file-stream source (schema must be explicit on the streaming
    side), with the same `.tar`-only glob (in-flight `.tmp-*` files
    invisible) and the same Arrow member expansion as the batch
    reader. File-level exactly-once comes from the checkpointed file
    log: a shard is processed exactly once per checkpoint lineage,
    which composes with foreachBatch sinks exactly like
    streaming/multimodal.start_multimodal_featurize.

    100 TB posture: one task per shard per micro-batch; ingest
    parallelism = shards per trigger."""

    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.tar")
        .load(src_dir)
    )
    return files.select("path", "content").mapInPandas(
        _expand_tar_batches, _MEMBER_SCHEMA
    )


def group_samples(members: DataFrame) -> DataFrame:
    """WebDataset samples: (shard, key) → map<ext, payload> plus the
    member count — the per-sample dict a training loader consumes.

    Collision policy: externally-produced tars can hold members that
    collapse to the same (key, ext) after basename stripping (e.g.
    ``a/0001.txt`` + ``b/0001.txt``); a naive map_from_entries would
    kill the job with DUPLICATED_MAP_KEY. Duplicates resolve
    DETERMINISTICALLY to the lexicographically greatest payload, and
    stay DETECTABLE: ``n_members`` counts raw members, so
    ``n_members > size(sample)`` flags every collapsed sample."""
    uniq = members.groupBy("shard", "key", "ext").agg(
        F.max("payload").alias("payload"),
        F.count("*").alias("n_dup"),
    )
    return uniq.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ext", "payload")))
        ).alias("sample"),
        F.sum("n_dup").alias("n_members"),
    )
