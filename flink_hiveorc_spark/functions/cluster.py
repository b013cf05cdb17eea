"""Clustering-adjacent operators over the dedup/embedding surface
(SURVEY.md §2.10 L2/L3 extensions): per-label embedding centroids
(the E-step building block of k-means / IVF training) and connected-
component labeling over the near-duplicate pair graph (turning
pairwise LSH matches into dedup GROUPS — the form a 100 TB dedup job
actually needs: keep one doc per component, not one per pair).

Scale notes (100 TB):
- centroids: posexplode streams (vec_id, dim, value) triples straight
  into a partial aggregate — state is O(labels × dims), never
  O(vectors). One shuffle on (label, dim).
- connected components: iterative min-label propagation, the simple
  member of the large-star/small-star family (Kiveris et al., "CC in
  MapReduce and Beyond"). Each iteration is one join + one aggregate
  on the edge list; iterations = graph diameter (near-dup graphs are
  shallow — dup clusters are cliques-ish, diameter ≤ ~3). Lineage is
  cut per iteration with localCheckpoint so plans don't grow
  unboundedly; convergence is detected with a count of changed
  labels (an action per iteration — the loop is driver-coordinated
  by design, like every iterative Spark algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions import dedup as _dedup  # noqa: F401 (registers pairs oracle)
from flink_hiveorc_spark.registry import ORACLES, QUERIES, query

_PAIRS_SQL = ORACLES["dedup_minhash_lsh_pairs"]


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


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS doc_id, min(dst) AS component
    FROM reach
    GROUP BY src
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2f: near-duplicate GROUPS — connected components over the
    MinHash-LSH pair graph; component id = min doc_id reachable.
    Docs with no near-dup partner are not emitted (singletons are
    the complement — at scale you anti-join them out anyway).

    Spark side: iterative min-label propagation (see module
    docstring). DuckDB side: transitive closure via recursive CTE —
    O(n·component) rows, fine at oracle scale, and an exact oracle
    for an algorithm SQL can't express iteratively."""
    pairs = QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .unionAll(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
        .localCheckpoint(eager=True)  # pair generation (LSH) runs ONCE, not per iteration
    )
    labels = edges.select("u").distinct().select(
        F.col("u").alias("doc_id"), F.col("u").alias("component")
    )
    for _ in range(20):  # diameter bound; near-dup graphs converge in ~3
        nbr_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels
