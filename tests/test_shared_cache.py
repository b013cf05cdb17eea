"""Session-wide cache sharing, pinned.

Five query families materialize a shared intermediate once per
session via a lazy `persist(MEMORY_AND_DISK)` — the LSH near-dup
pair table (seven consumers), the embedding cosine pair table, the
SimHash fingerprint table, the brute-force top-k ground truth, and
the prefix-filter shingle-set table. Spark's CacheManager dedupes
every consumer's identical logical subtree onto ONE cache entry, so
the expensive build (a banded self-join, a blocked cosine join, an
explode-32-bits vote aggregate, a corpus scan) runs once per session
instead of once per consumer.

These tests pin that posture: a refactor that drops a persist (or
perturbs a consumer's subtree so it no longer matches the cached
plan) silently reverts to per-consumer recompute — correct answers,
N× the cost, the regression class plan audits exist to catch.

Two consumer shapes need two kinds of evidence:
- LAZY consumers (the pair table flows into the returned plan): the
  consumer's plan must contain InMemoryTableScan.
- EAGER consumers (reliable_checkpoint materializes edges at
  build time, so the returned plan reads checkpoint files): calling
  the consumer must MATERIALIZE the producer's cache entry — proof
  the checkpoint build read the shared cache rather than recomputing.
"""

from __future__ import annotations

import pytest

from flink_hiveorc_spark.plans import audit as A
from flink_hiveorc_spark.registry import QUERIES

# (producer, consumer) where the producer's persisted subtree stays in
# the consumer's RETURNED plan.
LAZY_CONSUMERS = [
    ("dedup_minhash_lsh_pairs", "dedup_minhash_accuracy"),
    ("dedup_simhash", "dedup_simhash_pairs"),
    ("sim_topk_cosine_bruteforce", "sim_ivf_recall_report"),
]

# (producer, consumer) where the consumer checkpoints edges eagerly at
# build time (min_label_components / the unrolled graph iterations).
EAGER_CONSUMERS = [
    ("dedup_minhash_lsh_pairs", "dedup_cluster_components"),
    ("dedup_minhash_lsh_pairs", "graph_label_propagation"),
    ("dedup_minhash_lsh_pairs", "graph_kcore_peel"),
    ("dedup_minhash_lsh_pairs", "dedup_canonical_longest"),
    ("dedup_minhash_lsh_pairs", "graph_pagerank_two_rounds"),
    ("dedup_minhash_lsh_pairs", "graph_pagerank_deep"),
    ("sim_neardup_pairs_cosine", "dedup_semantic_canonical"),
]


def _cached_rdd_count(spark) -> int:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return len([r for r in infos if r.numCachedPartitions() > 0])


@pytest.mark.parametrize("producer,consumer", LAZY_CONSUMERS)
def test_lazy_consumer_reads_producer_cache(spark, sf_dir, producer, consumer):
    """Building the producer then planning the consumer must yield
    InMemoryTableScan(s) in the consumer's plan — the CacheManager
    substitution that makes the shared build compute-once."""
    QUERIES[producer](spark, sf_dir)  # registers the lazy persist
    df = QUERIES[consumer](spark, sf_dir)
    assert A.count_nodes(df, "InMemoryTableScan") >= 1, (
        f"{consumer} no longer reads {producer}'s persisted build — "
        "a dropped persist() or a perturbed subtree reverts this to "
        "per-consumer recompute"
    )


@pytest.mark.parametrize("producer,consumer", EAGER_CONSUMERS)
def test_eager_consumer_materializes_producer_cache(
    spark, sf_dir, producer, consumer
):
    """Checkpoint-based consumers execute the pair build while being
    CONSTRUCTED; that execution must fill the producer's cache entry
    (numCachedPartitions > 0) — proof the checkpoint read the shared
    cache instead of recomputing the pipeline privately."""
    spark.catalog.clearCache()
    assert _cached_rdd_count(spark) == 0
    QUERIES[consumer](spark, sf_dir)  # builds edges -> checkpoint
    assert _cached_rdd_count(spark) >= 1, (
        f"building {consumer} did not materialize {producer}'s "
        "persisted pair table — the shared persist was dropped or its "
        "subtree no longer matches"
    )


def test_producer_self_cache_dedupes(spark, sf_dir):
    """Two invocations of the same producer must share one cache entry
    (CacheManager keys on the canonicalized plan), not stack a second
    persisted copy."""
    spark.catalog.clearCache()
    QUERIES["dedup_simhash"](spark, sf_dir).count()
    n_after_first = _cached_rdd_count(spark)
    QUERIES["dedup_simhash"](spark, sf_dir).count()
    n_after_second = _cached_rdd_count(spark)
    assert n_after_first >= 1
    assert n_after_second == n_after_first, (
        "re-invoking dedup_simhash created a new cache entry instead of "
        "deduping onto the existing one"
    )


def test_cached_consumer_matches_uncached_values(spark, sf_dir):
    """Cache substitution must be value-neutral: the consumer computed
    in a cache-warm session equals the same consumer computed with the
    cache cleared (fresh recompute)."""
    warm = sorted(
        map(tuple, QUERIES["dedup_simhash_pairs"](spark, sf_dir).collect())
    )
    spark.catalog.clearCache()
    cold = sorted(
        map(tuple, QUERIES["dedup_simhash_pairs"](spark, sf_dir).collect())
    )
    assert warm == cold
