"""Clustering-adjacent operators over the dedup/embedding surface
(SURVEY.md §2.10 L3 extension): per-label embedding centroids —
the E-step building block of k-means / IVF training.

Scale notes (100 TB): posexplode streams (vec_id, dim, value) triples
straight into a partial aggregate — state is O(labels × dims), never
O(vectors). One shuffle on (label, dim). Connected-component dedup
clustering lives in dedup.py (same pair graph, same oracle CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query


@query(
    "embed_label_centroids",
    oracle="""
    SELECT label, i AS dim,
           CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1073741824) AS BIGINT)) AS DOUBLE)
             / count(*) / 1073741824 AS mean_val
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    GROUP BY label, i
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3d: per-label embedding centroid, long format (label, dim,
    mean) — one row per (label, dimension) so the oracle compare is
    scalar, not array-typed.

    Determinism: elements are quantized by floor(v·2³⁰) and summed as
    integers — exact, order-independent, and TIE-FREE (scaling a
    float by a power of two is exact in double, and floor needs no
    half-rounding rule — unlike decimal casts, where Spark rounds
    half-up but DuckDB half-to-even, which diverges on boundary
    values). The 2⁻³⁰ (~1e-9) quantization is far below float32
    input precision; the two final divides are deterministic IEEE
    ops in identical order."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", (F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(
            (
                F.sum(F.floor(F.col("val").cast("double") * 1073741824).cast("bigint")).cast(
                    "double"
                )
                / F.count("*")
                / F.lit(1073741824)
            ).alias("mean_val")
        )
    )
