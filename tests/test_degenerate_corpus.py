"""Adversarial degenerate-input robustness (VERDICT r2 #8).

Three shapes the empty-corpus suite can't catch:

1. SINGLE-ROW tables — every window/agg/join runs with exactly one
   row per table: frames of size 1, lag/lead all-NULL, self-joins with
   no second row, avg == the row itself.
2. ALL-IDENTICAL documents — the dedup worst case: every doc pairs
   with every other doc, the LSH pair graph is ONE clique, connected
   components must converge to a single giant component (stresses the
   iteration bound at dedup.py: a 120-doc clique has diameter 1 but
   O(N²) = 7140 undirected edges), and the canonical corpus must keep
   exactly one representative.
3. SINGLE-KEY skew — every row carries the same hot key, so the
   salted operators' whole reason to exist is exercised: the salt
   must spread one key over all buckets and STILL recombine to the
   exact unsalted answer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_hiveorc_spark.registry import QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SRC = "/root/testdata/sf0.001"

# 120 identical docs → C(120,2) undirected near-dup pairs.
N_IDENTICAL = 120
N_PAIRS = N_IDENTICAL * (N_IDENTICAL - 1) // 2
DOC_TEXT = (
    "the quick brown fox jumps over the lazy dog near the river bank today"
)


@pytest.fixture(scope="module")
def one_row_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("one_row_corpus"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.limit(1).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def identical_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("identical_docs"))
    for t in TABLES:
        if t == "documents":
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    docs = spark.createDataFrame(
        [
            Row(
                doc_id=1000 + i,
                text=DOC_TEXT,
                lang="en",
                source="web",
                n_chars=len(DOC_TEXT),
            )
            for i in range(N_IDENTICAL)
        ]
    )
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


# ---------------------------------------------------------------------------
# 1. Single-row corpus: every registered query must execute.


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_single_row_corpus(spark, one_row_dir, name):
    n = QUERIES[name](spark, one_row_dir).count()
    assert n >= 0


# ---------------------------------------------------------------------------
# 2. All-identical documents: one giant dedup clique.


def test_identical_docs_lsh_emits_full_clique(spark, identical_docs_dir):
    """Identical docs share every minhash signature, so every band
    buckets them together and the verify step sees Jaccard == 1.0 for
    every pair: the output must be EXACTLY the full clique."""
    pairs = QUERIES["dedup_minhash_lsh_pairs"](spark, identical_docs_dir)
    rows = pairs.collect()
    assert len(rows) == N_PAIRS
    assert all(r.doc_a < r.doc_b for r in rows)


def test_identical_docs_collapse_to_one_component(spark, identical_docs_dir):
    """The 7140-edge clique must converge to a single component whose
    label is the min doc_id — and must converge (break out of the
    20-iteration diameter bound; a clique has diameter 1)."""
    comp = QUERIES["dedup_cluster_components"](spark, identical_docs_dir)
    rows = comp.collect()
    assert len(rows) == N_IDENTICAL
    assert {r.component for r in rows} == {1000}
    assert sorted(r.doc_id for r in rows) == [1000 + i for i in range(N_IDENTICAL)]


def test_identical_docs_canonical_keeps_one(spark, identical_docs_dir):
    corpus = QUERIES["dedup_canonical_corpus"](spark, identical_docs_dir)
    rows = corpus.collect()
    assert [r.doc_id for r in rows] == [1000]


def test_identical_docs_simhash_full_clique_at_zero_distance(
    spark, identical_docs_dir
):
    """Identical fingerprints agree on every block: blocking must not
    double-count a pair found in multiple blocks (the .distinct() in
    the candidate stage), and every Hamming distance is 0."""
    pairs = QUERIES["dedup_simhash_pairs"](spark, identical_docs_dir).collect()
    assert len(pairs) == N_PAIRS
    assert all(r.hamming == 0 for r in pairs)


def test_identical_docs_ngram_df_cap_drops_viral_shingles(spark, identical_docs_dir):
    """With every shingle in all 120 docs, a df_cap below 120 drops
    EVERY shingle — the documented undercount becomes a full miss.
    This is the cap's contract (viral shingles carry no signal), so
    the result must be EMPTY, not an error; the uncapped variant must
    still emit the full clique."""
    from flink_hiveorc_spark.catalog import load_table
    from flink_hiveorc_spark.functions.dedup import ngram_jaccard_pairs

    d = load_table(spark, identical_docs_dir, "documents")
    assert ngram_jaccard_pairs(d, df_cap=8).count() == 0
    assert ngram_jaccard_pairs(d, df_cap=None).count() == N_PAIRS


def test_identical_docs_single_stream_analytics_survive(spark, identical_docs_dir):
    """All docs in one (lang, source) stream: the per-stream window in
    pack_shards degenerates to a single sequential stream, and tf-idf's
    idf term is log(N/df) == 0 for every term. Both must run."""
    assert QUERIES["pipeline_pack_shards"](spark, identical_docs_dir).count() > 0
    QUERIES["text_tfidf_top_terms"](spark, identical_docs_dir).count()


# ---------------------------------------------------------------------------
# 3. Single-key skew: the salt must spread one hot key and recombine
#    to the exact unsalted answer.


def test_salted_agg_single_hot_key_matches_plain(spark):
    from flink_hiveorc_spark.functions.skew import salted_agg

    n = 20_000
    df = spark.range(n).select(
        F.lit(7).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    out = salted_agg(
        df,
        ["k"],
        {
            "s": (F.sum("v"), lambda c: F.sum(c)),
            "n": (F.count(F.lit(1)), lambda c: F.sum(c)),
            "mn": (F.min("v"), lambda c: F.min(c)),
            "mx": (F.max("v"), lambda c: F.max(c)),
        },
        salt_buckets=16,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.k, r.s, r.n, r.mn, r.mx) == (7, sum(i % 100 for i in range(n)), n, 0, 99)


def test_salted_join_single_hot_key_matches_plain(spark):
    from flink_hiveorc_spark.functions.skew import salted_join

    n = 20_000
    fact = spark.range(n).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([Row(k=7, name="hot"), Row(k=8, name="cold")])
    joined = salted_join(fact, dim, "k", salt_buckets=16)
    agg = joined.groupBy("name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()
    assert len(agg) == 1
    assert (agg[0].name, agg[0].n, agg[0].s) == ("hot", n, n * (n - 1) // 2)


def test_hll_weekly_close_to_exact(spark):
    """The two-level HLL rollup (daily sketches unioned per week) must
    land within 5% of the exact per-week distinct count. As of r4 the
    query itself emits the tolerance boolean (value-checked by the
    driver); this pins the same contract independently, against an
    exact recomputation with the year-aware week key."""
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["agg_hll_union_weekly_users"](spark, sf).collect()
    from flink_hiveorc_spark.catalog import load_table

    ev = load_table(spark, sf, "events")
    exact = {
        r.week: r.n
        for r in ev.groupBy(
            F.date_format(
                F.date_trunc("week", F.col("ts").cast("date")), "yyyy-MM-dd"
            ).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.week_start for r in rows} == set(exact)
    for r in rows:
        assert r.within_5pct, (r.week_start, r.exact_users)
        assert r.exact_users == exact[r.week_start], r
