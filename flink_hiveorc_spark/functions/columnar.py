"""Columnar-blob probing: parquet and ORC files carried INSIDE a
binary column — the data-lake twin of the archive envelope
(functions/archive.py). Real pipelines meet these constantly: parquet
shards inside tar/zip drops, ORC files exported from Hive pipelines
(the reference repo's own output format — HiveOrcSink.java:309-314
writes exactly such ORC files; this operator can PROBE what that sink
produced), vendor deliveries of "a zip of parquet".

The probe reads real footers/postscripts via pyarrow (pyarrow.parquet
/ pyarrow.orc — both present in this container, re-probed r13) inside
the standard mapInPandas featurize-with-DLQ path: per blob it reports
the format, row/column/rowgroup(stripe) counts, schema column names,
and the exact sum of the first int64 column (proving VALUES decode,
not just metadata). Bomb posture: only declared metadata plus one
column materialize; the column read is capped by MAX_BLOB_ROWS.

Magic routing: parquet = 'PAR1' leading magic; ORC = 'ORC' leading
magic (the format writes its magic at the head and in the tail
postscript). Anything else is not a columnar blob (ValueError);
a missing pyarrow reader on a stripped-down cluster gates with
NotImplementedError (unsupported, not corrupt).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

MAX_BLOB_ROWS = 10_000_000  # value-read cap per blob

_COLUMNAR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_cols", T.LongType()),
        T.StructField("n_groups", T.LongType()),
        T.StructField("col_names", T.StringType()),
        T.StructField("sum_first_int", T.LongType()),
    ]
)


def probe_columnar_blob(payload: bytes) -> dict:
    """One blob → metadata + first-int64-column sum (see module doc)."""
    import io

    if payload[:4] == b"PAR1":
        try:
            import pyarrow.parquet as pq
        except ImportError:
            raise NotImplementedError(
                "parquet blob probing needs pyarrow.parquet"
            )
        try:
            f = pq.ParquetFile(io.BytesIO(payload))
            meta = f.metadata
            names = list(f.schema_arrow.names)
            n_rows, n_groups = meta.num_rows, meta.num_row_groups
            if n_rows > MAX_BLOB_ROWS:
                raise ValueError(
                    f"parquet blob declares {n_rows} rows > "
                    f"{MAX_BLOB_ROWS} (bomb guard)"
                )
            table = f.read()
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:  # ArrowInvalid etc.
            raise ValueError(f"malformed parquet blob: {e}") from e
        fmt = "parquet"
    elif payload[:3] == b"ORC":
        try:
            import pyarrow.orc as orc
        except ImportError:
            raise NotImplementedError("ORC blob probing needs pyarrow.orc")
        try:
            f = orc.ORCFile(io.BytesIO(payload))
            names = list(f.schema.names)
            n_rows, n_groups = f.nrows, f.nstripes
            if n_rows > MAX_BLOB_ROWS:
                raise ValueError(
                    f"ORC blob declares {n_rows} rows > "
                    f"{MAX_BLOB_ROWS} (bomb guard)"
                )
            table = f.read()
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"malformed ORC blob: {e}") from e
        fmt = "orc"
    else:
        raise ValueError("not a columnar blob (no PAR1/ORC magic)")
    import pyarrow as pa

    sum_first = None
    for col in table.itercolumns():
        if pa.types.is_int64(col.type):
            import pyarrow.compute as pc

            s = pc.sum(col).as_py()
            sum_first = int(s) if s is not None else 0
            break
    return {
        "fmt": fmt,
        "n_rows": int(n_rows),
        "n_cols": len(names),
        "n_groups": int(n_groups),
        "col_names": ",".join(names),
        "sum_first_int": sum_first,
    }


def columnar_blob_stats(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """(doc_id, payload) parquet/ORC blobs → per-blob probe rows
    through the shared featurize-with-DLQ path (map-only, Arrow
    batches, quarantine contract identical to the media decoders)."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    return _stats_df(
        payloads, _COLUMNAR_SCHEMA, probe_columnar_blob, quarantine
    )


# ---------------------------------------------- oracle construction
#
# Payloads cannot be synthesized as Spark byte-expressions (a parquet
# footer is thrift, an ORC postscript protobuf), so the rotation uses
# the constant-leg discipline (the bz2/xz decompress precedent)
# UPGRADED to digest KEYING: 16 blobs per format are built at module
# load with nibble-determined shapes — blob k holds k+1 rows of
# v = k..2k (sum 3k(k+1)/2) plus a string column — and each doc picks
# the blob of its md5 digest's first nibble. DuckDB recomputes every
# expected stat from the same nibble arithmetic, so the REAL pyarrow
# read path (footer walk + value decode) stays externally
# value-checked per doc.


def _blob_fixtures() -> tuple[list[bytes], list[bytes]]:
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.orc as orc

    pq_blobs, orc_blobs = [], []
    for k in range(16):
        t = pa.table(
            {
                "v": pa.array(list(range(k, 2 * k + 1)), pa.int64()),
                "s": pa.array([f"r{i}" for i in range(k + 1)]),
            }
        )
        b = io.BytesIO()
        pq.write_table(t, b)
        pq_blobs.append(b.getvalue())
        b2 = io.BytesIO()
        orc.write_table(t, b2)
        orc_blobs.append(b2.getvalue())
    return pq_blobs, orc_blobs


@query(
    "multimodal_columnar_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS k,
             doc_id % 2 AS m
      FROM documents
    )
    SELECT doc_id,
           CASE m WHEN 0 THEN 'parquet' ELSE 'orc' END AS fmt,
           CAST(k + 1 AS BIGINT) AS n_rows,
           CAST(2 AS BIGINT) AS n_cols,
           CAST(1 AS BIGINT) AS n_groups,
           'v,s' AS col_names,
           CAST(3 * k * (k + 1) / 2 AS BIGINT) AS sum_first_int
    FROM base
    """,
)
def multimodal_columnar_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet/ORC blob probing under the external oracle: each doc
    routes (doc_id % 2) to a parquet or an ORC blob keyed by its md5
    digest's first nibble k — blob k carries k+1 rows with
    v = k..2k — and the REAL pyarrow footer walk + value decode must
    report exactly (k+1, 2 cols, 1 group, sum 3k(k+1)/2) per doc or
    the value hash dies. See module doc for why the blobs are
    build-time fixtures (binary footers aren't Spark-expressible).
    Scale: map-only fan-in, zero exchanges; blob dictionary is 32
    tiny literals broadcast with the plan."""
    pq_blobs, orc_blobs = _blob_fixtures()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hx")
    )
    k = F.conv(F.substring("hx", 1, 1), 16, 10).cast("int")
    pq_pick = None
    orc_pick = None
    for i in range(16):
        pq_i, orc_i = F.lit(pq_blobs[i]), F.lit(orc_blobs[i])
        pq_pick = (
            pq_i if pq_pick is None else F.when(k == i, pq_i).otherwise(pq_pick)
        )
        orc_pick = (
            orc_i
            if orc_pick is None
            else F.when(k == i, orc_i).otherwise(orc_pick)
        )
    payload = F.when(F.col("doc_id") % 2 == 0, pq_pick).otherwise(orc_pick)
    return columnar_blob_stats(docs.select("doc_id", payload.alias("payload")))
