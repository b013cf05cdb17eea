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


_Q_CENT = 1073741824  # 2^30 — centroid-mean quantization
_Q_DIST = 1099511627776  # 2^40 — squared-distance-term quantization
_KMEANS_K = 4

# Shared CTE text: quantized squared distance between a vector and a
# centroid ARRAY, as an exact BIGINT (each term floor-quantized, so
# the sum is order-independent — double sums would drift between
# engines/partitionings).
_KMEANS_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, embedding FROM embeddings
    ),
    c0 AS (
      SELECT vec_id AS cluster_id, embedding AS cent FROM embeddings
      WHERE vec_id < {_KMEANS_K}
    ),
    d1 AS (
      SELECT e.vec_id, c0.cluster_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
               CAST(floor((CAST(e.embedding[i] AS DOUBLE) - CAST(c0.cent[i] AS DOUBLE))
                          * (CAST(e.embedding[i] AS DOUBLE) - CAST(c0.cent[i] AS DOUBLE))
                          * {_Q_DIST}) AS BIGINT))) AS dist_q
      FROM e CROSS JOIN c0
    ),
    a1 AS (
      SELECT vec_id, cluster_id FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist_q, cluster_id) AS rn
        FROM d1
      ) WHERE rn = 1
    ),
    c1 AS (
      SELECT a1.cluster_id, i AS dim,
             CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {_Q_CENT}) AS BIGINT)) AS DOUBLE)
               / count(*) / {_Q_CENT} AS m
      FROM a1 JOIN e USING (vec_id), UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
      GROUP BY a1.cluster_id, i
    ),
    d2 AS (
      SELECT e.vec_id, c1.cluster_id,
             sum(CAST(floor((CAST(e.embedding[c1.dim] AS DOUBLE) - c1.m)
                            * (CAST(e.embedding[c1.dim] AS DOUBLE) - c1.m)
                            * {_Q_DIST}) AS BIGINT)) AS dist_q
      FROM e CROSS JOIN c1
      GROUP BY e.vec_id, c1.cluster_id
    )
    SELECT vec_id, cluster_id, CAST(dist_q AS BIGINT) AS dist_q FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist_q, cluster_id) AS rn
      FROM d2
    ) WHERE rn = 1
"""


def _emb_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dist_q(emb, cent):
    """Σᵢ floor((eᵢ-cᵢ)² · 2⁴⁰) as a long — exact, order-free."""
    return F.aggregate(
        F.zip_with(emb, cent, lambda x, y: F.floor((x - y) * (x - y) * F.lit(float(_Q_DIST))).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


@query("ml_kmeans_two_rounds", oracle=_KMEANS_ORACLE)
def ml_kmeans_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3e: two unrolled Lloyd iterations of k-means (k=4, init =
    vectors 0..3) — the iterative-ML pattern as declarative Spark,
    VALUE-checked against a recursive-free SQL oracle.

    Determinism engineering (what makes an FP-iterative algorithm
    hash-comparable across engines): every accumulation is integer —
    squared-distance terms floor-quantized at 2⁻⁴⁰ before summing,
    centroid means from 2⁻³⁰-quantized element sums — so no result
    depends on float summation order; argmin breaks ties on
    (dist_q, cluster_id).

    Scale: assignment is embeddings ⋈ broadcast(centroids) (k·dims
    doubles — trivially broadcastable for any practical k), one
    shuffle per recompute on (cluster, dim). Each Lloyd round is one
    broadcast join + one aggregate; rounds are driver-sequenced like
    dedup_cluster_components' loop."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    c0 = e.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("emb").alias("cent")
    )

    def assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        d = vectors.join(F.broadcast(cents)).select(
            "vec_id", "cluster_id", "emb", _dist_q(F.col("emb"), F.col("cent")).alias("dist_q")
        )
        w = Window.partitionBy("vec_id").orderBy("dist_q", "cluster_id")
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    a1 = assign(e, c0)
    c1 = (
        a1.select("cluster_id", F.posexplode("emb").alias("pos", "v"))
        .groupBy("cluster_id", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.floor(F.col("v") * _Q_CENT).cast("long")).cast("double")
                / F.count("*")
                / F.lit(_Q_CENT)
            ).alias("m")
        )
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s.getField("m")
            ).alias("cent")
        )
    )
    a2 = assign(e, c1)
    return a2.select("vec_id", "cluster_id", "dist_q")



_KMEANS_DEEP_K = 6
_KMEANS_DEEP_ROUNDS = 4


def _kmeans_deep_oracle(k: int, rounds: int) -> str:
    """Unrolled Lloyd-iteration oracle: the same quantized distance /
    centroid CTEs as _KMEANS_ORACLE, generated for any (k, rounds).
    The text is assembled once at import — the oracle stays a plain
    ANSI-SQL string, just not hand-unrolled."""
    ctes = [
        "e AS (SELECT vec_id, embedding FROM embeddings)",
        f"""c0 AS (
      SELECT vec_id AS cluster_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM embeddings WHERE vec_id < {k}
    )""",
    ]
    for r in range(1, rounds + 1):
        prev_c = f"c{r - 1}"
        if r == 1:
            dist = f"""d1 AS (
      SELECT e.vec_id, c0.cluster_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1), i ->
               CAST(floor((CAST(e.embedding[i] AS DOUBLE) - c0.cent[i])
                          * (CAST(e.embedding[i] AS DOUBLE) - c0.cent[i])
                          * {_Q_DIST}) AS BIGINT))) AS dist_q
      FROM e CROSS JOIN c0
    )"""
        else:
            dist = f"""d{r} AS (
      SELECT e.vec_id, {prev_c}.cluster_id,
             sum(CAST(floor((CAST(e.embedding[{prev_c}.dim] AS DOUBLE) - {prev_c}.m)
                            * (CAST(e.embedding[{prev_c}.dim] AS DOUBLE) - {prev_c}.m)
                            * {_Q_DIST}) AS BIGINT)) AS dist_q
      FROM e CROSS JOIN {prev_c}
      GROUP BY e.vec_id, {prev_c}.cluster_id
    )"""
        ctes.append(dist)
        ctes.append(
            f"""a{r} AS (
      SELECT vec_id, cluster_id, dist_q FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist_q, cluster_id) AS rn
        FROM d{r}
      ) WHERE rn = 1
    )"""
        )
        if r < rounds:
            ctes.append(
                f"""c{r} AS (
      SELECT a{r}.cluster_id, i AS dim,
             CAST(sum(CAST(floor(CAST(e.embedding[i] AS DOUBLE) * {_Q_CENT}) AS BIGINT)) AS DOUBLE)
               / count(*) / {_Q_CENT} AS m
      FROM a{r} JOIN e USING (vec_id),
           UNNEST(range(1, len(e.embedding) + 1)) AS t(i)
      GROUP BY a{r}.cluster_id, i
    )"""
            )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT vec_id, cluster_id, CAST(dist_q AS BIGINT) AS dist_q FROM a{rounds}\n"
    )


@query(
    "ml_kmeans_deep",
    oracle=_kmeans_deep_oracle(_KMEANS_DEEP_K, _KMEANS_DEEP_ROUNDS),
)
def ml_kmeans_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3e deepened (r3 VERDICT #7): k=6, FOUR unrolled Lloyd rounds
    — demonstrates the integer-quantized cross-engine oracle
    technique generalizes past two iterations (quantization error
    cannot accumulate into divergent assignments: every round's
    distances and centroid means are re-derived from exact integer
    sums, so both engines walk the identical assignment sequence).

    Scale posture identical to ml_kmeans_two_rounds: per round, one
    broadcast-centroid join (k·dims doubles) + one (cluster, dim)
    aggregate; rounds sequenced by the driver. The per-round frames
    are NOT checkpointed — four rounds of narrow lineage over a
    re-scannable source stays cheap, whereas k-means at 100 TB would
    cache the vectors once (`.persist(DISK_ONLY)`) and still never
    checkpoint mid-loop."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    cents = e.filter(F.col("vec_id") < _KMEANS_DEEP_K).select(
        F.col("vec_id").alias("cluster_id"), F.col("emb").alias("cent")
    )

    assigned = None
    for r in range(_KMEANS_DEEP_ROUNDS):
        d = e.join(F.broadcast(cents)).select(
            "vec_id", "cluster_id", "emb",
            _dist_q(F.col("emb"), F.col("cent")).alias("dist_q"),
        )
        w = Window.partitionBy("vec_id").orderBy("dist_q", "cluster_id")
        assigned = (
            d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
        )
        if r < _KMEANS_DEEP_ROUNDS - 1:
            cents = (
                assigned.select("cluster_id", F.posexplode("emb").alias("pos", "v"))
                .groupBy("cluster_id", (F.col("pos") + 1).alias("dim"))
                .agg(
                    (
                        F.sum(F.floor(F.col("v") * _Q_CENT).cast("long")).cast("double")
                        / F.count("*")
                        / F.lit(_Q_CENT)
                    ).alias("m")
                )
                .groupBy("cluster_id")
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "m"))),
                        lambda s: s.getField("m"),
                    ).alias("cent")
                )
            )
    return assigned.select("vec_id", "cluster_id", "dist_q")
