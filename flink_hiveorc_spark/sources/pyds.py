"""Custom Python DataSource (§2.1 [ext]): the Spark-4-native way to
bring a NEW source format into the engine from pure Python — the
PySpark twin of the reference's source/sink extension surface (the
reference registers a Flink source/sink pair around Kafka JSON;
here the DataSource V2 Python API registers a first-class reader
with schema, partition planning, and filter-pushdown-driven
partition PRUNING).

The source generates a deterministic synthetic CDC-envelope feed
(op/city/ts/value rows — the same event shape the reference's Kafka
topic carries, App.txt:27-37) derived entirely from md5(row index):
every field is a pure function of i, so a SQL oracle can regenerate
the identical rows from range(n) + md5 and the whole custom-source
scan is VALUE-CHECKED, not just smoke-tested.

Scale notes: partitions() plans `partitions` independent splits, so
the scan parallelizes like any file source; pushFilters() consumes
equality filters on the partition column and prunes splits BEFORE
read — the DataSource-V2 contract that keeps a selective scan from
touching every split at 100 TB. Rows stream from a generator (no
per-partition materialization).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

CDC_CITIES = (
    "amsterdam",
    "berlin",
    "chengdu",
    "denver",
    "essen",
    "fukuoka",
    "geneva",
    "harbin",
)
CDC_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

CDC_SCHEMA = (
    "part int, row_id bigint, op string, city string, ts_us bigint, value_cents bigint"
)


def cdc_row(i: int, rows_per_part: int) -> tuple:
    """The shared row derivation: every field is a function of md5(i).
    Mirrored character-for-character by the SQL oracle."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    d0 = int(h[0], 16)
    op = "insert" if d0 < 10 else ("update" if d0 < 13 else "delete")
    city = CDC_CITIES[int(h[1], 16) % len(CDC_CITIES)]
    value_cents = int(h[2:10], 16) % 100_000
    return (
        i // rows_per_part,
        i,
        op,
        city,
        CDC_BASE_US + i * 1_000_000,
        value_cents,
    )


class CdcPartition(InputPartition):
    def __init__(self, part: int, start: int, end: int, rows_per_part: int):
        self.part = part
        self.start = start
        self.end = end
        self.rows_per_part = rows_per_part


class CdcSynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_parts = int(options.get("partitions", 4))
        self.part_filter: int | None = None

    def pushFilters(self, filters):  # noqa: N802 — DataSource API name
        """Consume `part = <k>` equality filters (split pruning); every
        other filter is returned as unsupported so Spark re-applies it
        above the scan — the standard V2 pushdown contract."""
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("part",):
                self.part_filter = int(f.value)
            else:
                unsupported.append(f)
        return iter(unsupported)

    def partitions(self):
        rpp = (self.rows + self.num_parts - 1) // self.num_parts
        parts = []
        for p in range(self.num_parts):
            start, end = p * rpp, min((p + 1) * rpp, self.rows)
            if start >= end:
                continue
            if self.part_filter is not None and p != self.part_filter:
                continue  # pruned split: never read
            parts.append(CdcPartition(p, start, end, rpp))
        return parts

    def read(self, partition: CdcPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield cdc_row(i, partition.rows_per_part)


class CdcSynthSource(DataSource):
    """spark.read.format("cdc_synth").option("rows", N) source."""

    @classmethod
    def name(cls) -> str:
        return "cdc_synth"

    def schema(self) -> str:
        return CDC_SCHEMA

    def reader(self, schema) -> CdcSynthReader:
        return CdcSynthReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(CdcSynthSource)


# ---- registered, value-oracled query over the custom source -------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_hiveorc_spark.registry import query  # noqa: E402

_PYDS_ROWS = 5000
_PYDS_PARTS = 8

_CITY_SQL = "['" + "','".join(CDC_CITIES) + "']"


@query(
    "pyds_custom_source_scan",
    oracle=f"""
    WITH gen AS (
      SELECT i, md5(CAST(i AS VARCHAR)) AS h
      FROM range(0, {_PYDS_ROWS}) t(i)
    ),
    r AS (
      SELECT CASE WHEN CAST(('0x' || substr(h, 1, 1)) AS INT) < 10 THEN 'insert'
                  WHEN CAST(('0x' || substr(h, 1, 1)) AS INT) < 13 THEN 'update'
                  ELSE 'delete' END AS op,
             {_CITY_SQL}[CAST(('0x' || substr(h, 2, 1)) AS INT) % {len(CDC_CITIES)} + 1] AS city,
             CAST(('0x' || substr(h, 3, 8)) AS BIGINT) % 100000 AS value_cents
      FROM gen
    )
    SELECT city, op, count(*) AS n_events,
           CAST(sum(value_cents) AS BIGINT) AS total_cents
    FROM r GROUP BY city, op
    """,
)
def pyds_custom_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 [ext]: scan a CUSTOM Python DataSource end to end — register
    the format, plan {8} splits, stream-generate rows, aggregate.
    The source's rows are pure functions of md5(row index), so the
    DuckDB oracle regenerates the identical feed from range()+md5 and
    the custom-source path is hash-checked like any table scan (the
    sf_dir parameter is unused — this source IS the data).

    This is the §2.1 extension-surface proof: where the reference
    contributes a custom Flink source/sink pair, the PySpark engine
    registers a DataSource-V2 Python source with schema, partition
    planning, and pushFilters-driven split pruning (pruning verified
    separately in tests/test_pyds_source.py — the reader drops
    non-matching splits before read when filtered on `part`)."""
    register(spark)
    df = (
        spark.read.format("cdc_synth")
        .option("rows", _PYDS_ROWS)
        .option("partitions", _PYDS_PARTS)
        .load()
    )
    return df.groupBy("city", "op").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").cast("bigint").alias("total_cents"),
    )


# ---- streaming half: offset-tracked micro-batch reader ------------------

from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class CdcSynthStreamReader(DataSourceStreamReader):
    """Micro-batch reader over the same deterministic feed: the offset
    IS the row index, each trigger advances by `batch_rows`, capped at
    `rows` total — the Kafka-shaped contract (monotone offsets,
    planner-chosen ranges, replayable reads) that gives Structured
    Streaming exactly-once on restart: after a crash the engine
    re-plans from the last COMMITTED offset and the read is a pure
    function of the range, so replays are byte-identical.

    The reference's source half (FlinkKafkaConsumer011 with earliest
    offsets, App.txt:27-37) is exactly this contract; with no broker
    in the harness, this synthetic offset source is the testable
    stand-in that exercises the engine's offset/commit machinery for
    a CUSTOM Python connector (the file-source ingest path covers the
    built-in connector side).

    Arrival model (ADVICE r5: batch_rows was read but unused — the
    whole feed ran as one micro-batch and the restart test never
    exercised a MID-stream offset resume): `latestOffset` answers
    "how much data exists right now", which for a real topic is
    broker-side state that survives consumer restarts. With the
    `advance_path` option set, that state lives in a small file —
    each `latestOffset` call "arrives" `batch_rows` more rows (capped
    at `rows`), monotone across reader instances, so a restarted
    query resumes mid-stream from the checkpoint against a feed that
    keeps growing. Without the option, all rows are available
    immediately (single-batch semantics — the honest default when
    nothing external owns arrival state: an in-memory mark would
    reset below the checkpoint on restart, and a planned end-offset
    behind the committed one would re-commit backwards and duplicate
    rows through the sink's batch-id log)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 100))
        self.num_parts = int(options.get("partitions", 4))
        self.advance_path = options.get("advance_path")  # broker-side arrival state

    def _arrived(self) -> int:
        try:
            with open(self.advance_path) as fh:
                return int(fh.read().strip() or 0)
        except (OSError, ValueError):
            return 0

    def initialOffset(self) -> dict:  # noqa: N802
        return {"idx": 0}

    def latestOffset(self) -> dict:  # noqa: N802
        # The planner persists the returned offset to the checkpoint
        # BEFORE the batch runs (WAL), which is what makes restart
        # exactly-once: replays re-plan the same (start, end] range
        # and the read is a pure function of the range.
        if self.advance_path is None:
            return {"idx": self.rows}  # steady: all rows available
        arrived = min(self._arrived() + self.batch_rows, self.rows)
        with open(self.advance_path, "w") as fh:
            fh.write(str(arrived))
        return {"idx": arrived}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["idx"]), int(end["idx"])
        rpp = (self.rows + self.num_parts - 1) // self.num_parts
        span = (hi - lo + self.num_parts - 1) // self.num_parts
        parts = []
        for p in range(self.num_parts):
            s, e = lo + p * span, min(lo + (p + 1) * span, hi)
            if s < e:
                parts.append(CdcPartition(p, s, e, rpp))
        return parts

    def read(self, partition: CdcPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield cdc_row(i, partition.rows_per_part)

    def commit(self, end: dict) -> None:
        pass  # nothing external to ack; the checkpoint owns progress


def _streaming_source_cls():
    class CdcSynthStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "cdc_synth_stream"

        def schema(self) -> str:
            return CDC_SCHEMA

        def streamReader(self, schema) -> CdcSynthStreamReader:
            return CdcSynthStreamReader(self.options)

    return CdcSynthStreamSource


def register_streaming(spark) -> None:
    spark.dataSource.register(_streaming_source_cls())
