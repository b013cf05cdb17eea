"""Semantic invariants for the round-5 second-batch operators
(bloom-prefilter join, boilerplate n-grams, transition matrix,
incremental rollup). The value oracle runs in tools/check_oracle.py +
the driver; these pin the operator contracts a hash can't explain."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.operators.joins import (
    BLOOM_WORDS,
    bloom_prefilter,
    build_bloom_bitmap,
)
from flink_hiveorc_spark.registry import QUERIES


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every inserted key must pass the probe test — the property the
    exact-result claim rests on."""
    keys = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(500)
    bitmap = build_bloom_bitmap(keys, "o_orderkey")
    assert len(bitmap) == BLOOM_WORDS
    assert bloom_prefilter(keys, "o_orderkey", bitmap).count() == keys.count()


def test_bloom_prunes_non_members(spark, sf_dir):
    """A bitmap built from a small key set must reject most of a
    disjoint key universe (FPR sanity, not just no-false-negatives)."""
    orders = load_table(spark, sf_dir, "orders")
    members = orders.filter(F.col("o_orderkey") % 100 == 0).select("o_orderkey")
    non_members = orders.filter(F.col("o_orderkey") % 100 == 50).select("o_orderkey")
    bitmap = build_bloom_bitmap(members, "o_orderkey")
    n_non = non_members.count()
    passed = bloom_prefilter(non_members, "o_orderkey", bitmap).count()
    # with n~15 keys in 16384 bits, k=3, FPR is ~1e-8; allow slack
    assert passed <= max(1, n_non // 20)


def test_bloom_join_equals_plain_join(spark, sf_dir):
    """The prefiltered join must equal the same join without the bloom
    (false positives are removed by the exact join; no false negatives)."""
    got = {tuple(r) for r in QUERIES["join_bloom_prefilter"](spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(
            orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 450_000)),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(25,6)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    assert got == {tuple(r) for r in plain.collect()}


def test_boilerplate_ngrams_exact_df(spark, sf_dir):
    """Returned grams carry their exact document frequency, and the
    bucket-pruned result equals the direct (unpruned) computation."""
    out = QUERIES["text_boilerplate_ngrams"](spark, sf_dir)
    rows = out.collect()
    assert rows, "corpus should contain boilerplate trigrams"
    assert all(r.df >= 5 for r in rows)
    assert len({r.gram for r in rows}) == len(rows)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", r"\s+").alias("ws")
    )
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    direct = (
        d.select("doc_id", F.explode(grams).alias("gram"))
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= 5)
    )
    assert {(r.gram, r.df) for r in rows} == {(r.gram, r.df) for r in direct.collect()}


def test_transition_matrix_rows_normalize(spark, sf_dir):
    """Each prev_type's outgoing probabilities sum to ~1 and the
    matrix is bounded by |event_types|²."""
    rows = QUERIES["events_transition_matrix"](spark, sf_dir).collect()
    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert 0 < len(rows) <= n_types * n_types
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n >= 1 and 0.0 < r.p <= 1.0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
    for total in by_prev.values():
        assert abs(total - 1.0) < 1e-6


def test_incremental_rollup_matches_full_recompute(spark, sf_dir):
    """Merged base+delta partial states == single-pass full aggregate,
    and avg derives from the merged state."""
    got = QUERIES["batch_incremental_rollup"](spark, sf_dir).collect()
    full = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")).cast("double").alias("revenue"),
        )
        .collect()
    )
    full_by_month = {r.month: r for r in full}
    assert {r.month for r in got} == set(full_by_month)
    for r in got:
        f = full_by_month[r.month]
        assert r.n_orders == f.n_orders
        assert r.revenue == f.revenue
        assert abs(r.avg_price - r.revenue / r.n_orders) < 1e-6


def test_pq_adc_topk_shape(spark, sf_dir):
    """4 queries × exactly 10 ranked neighbors, contiguous ranks,
    monotone approx distance, no self-matches."""
    rows = QUERIES["sim_topk_pq_adc"](spark, sf_dir).collect()
    assert len(rows) == 4 * 10
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.vec_id != r.qid
        by_q.setdefault(r.qid, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, 11))
        dists = [r.approx_dist_q for r in rs]
        assert dists == sorted(dists)


def test_pq_recall_bounds(spark, sf_dir):
    """Recall is in (0, 1]; PQ on this corpus should beat random
    (random recall@10 over 500 vectors ~ 0.02)."""
    rows = QUERIES["sim_pq_recall_report"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4
    for r in rows:
        assert 1 <= r.n_overlap <= 10
        assert abs(r.recall_at_10 - r.n_overlap / 10) < 1e-9
    avg = sum(r.n_overlap for r in rows) / (4 * 10)
    assert avg >= 0.2, f"PQ recall suspiciously low: {avg}"


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference BPE merge learning (greedy leftmost application),
    plain Python — the model the distributed job must match."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for r in range(1, rounds + 1):
        counts: dict[tuple, int] = {}
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (p1, p2), freq = best
        merges.append((r, f"{p1} {p2}", freq))
        for w in syms:
            s, out = syms[w], []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_matches_python_model(spark, sf_dir):
    """The distributed merge table equals a plain-Python BPE run over
    the same word-frequency table (greedy leftmost merge semantics)."""
    import re as _re

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    wc: dict[str, int] = {}
    for r in docs:
        for w in _re.findall(r"[a-z]+", r.text):
            wc[w] = wc.get(w, 0) + 1
    expected = _python_bpe(wc, 3)
    got = [(r.rnk, r.pair, r.freq) for r in QUERIES["text_bpe_merges"](spark, sf_dir).collect()]
    assert got == expected


def test_bpe_freq_non_increasing(spark, sf_dir):
    rows = QUERIES["text_bpe_merges"](spark, sf_dir).collect()
    assert [r.rnk for r in rows] == [1, 2, 3]
    freqs = [r.freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert len(r.pair.split(" ")) == 2


def test_dq_expectations_all_pass_on_clean_corpus(spark, sf_dir):
    """The synthetic corpus satisfies every expectation; observed
    values are consistent with the verdicts."""
    rows = QUERIES["dq_expectations_report"](spark, sf_dir).collect()
    assert len(rows) == 7
    by_name = {r.check_name: r for r in rows}
    assert set(by_name) == {
        "row_count_positive", "pk_unique_orderkey", "not_null_custkey",
        "accepted_values_status", "positive_totalprice",
        "freshness_orderdate", "referential_custkey",
    }
    assert all(r.passed for r in rows)
    assert by_name["row_count_positive"].observed > 0
    for zero_check in ("pk_unique_orderkey", "not_null_custkey",
                       "accepted_values_status", "positive_totalprice",
                       "referential_custkey"):
        assert by_name[zero_check].observed == 0
    assert by_name["freshness_orderdate"].observed >= 1826


def test_variant_shred_lossless_roundtrip(spark, sf_dir):
    """The to_json → parse_json → variant_get loop loses nothing:
    per-type counts equal the raw groupBy, and sum_k equals the
    from_json sum."""
    got = {r.event_type: r for r in QUERIES["scalar_variant_shred"](spark, sf_dir).collect()}
    raw = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
        .collect()
    }
    assert set(got) == set(raw)
    for t in got:
        assert got[t].n == raw[t].n
        assert got[t].sum_k == raw[t].sum_k


def test_ivf_pq_shape_and_adc_consistency(spark, sf_dir):
    """IVF-PQ returns ≤ top-10 per query with contiguous ranks, no
    self-matches; for pairs that also appear in the unpruned PQ-ADC
    top-10, the approximate distance is IDENTICAL (same codebooks,
    same ADC tables — cell pruning only restricts the candidate set)."""
    ivfpq = QUERIES["sim_topk_ivf_pq"](spark, sf_dir).collect()
    assert ivfpq
    by_q: dict[int, list] = {}
    for r in ivfpq:
        assert r.vec_id != r.qid
        by_q.setdefault(r.qid, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        dists = [r.approx_dist_q for r in rs]
        assert dists == sorted(dists)
    pq = {(r.qid, r.vec_id): r.approx_dist_q for r in QUERIES["sim_topk_pq_adc"](spark, sf_dir).collect()}
    shared = [(r.qid, r.vec_id, r.approx_dist_q) for r in ivfpq if (r.qid, r.vec_id) in pq]
    assert shared, "pruned and unpruned top-10 should overlap somewhere"
    for qid, vid, d in shared:
        assert d == pq[(qid, vid)]


def test_pack_shards_oracle_floor_semantics(spark, tmp_path):
    """Regression (r5, caught by the local sf0.1 oracle replica):
    DuckDB CAST(double AS BIGINT) ROUNDS while Spark truncates, so a
    bare CAST(cum/budget AS BIGINT) oracle diverges from the engine as
    soon as a stream accumulates >= budget/2 tokens (invisible at
    sf0.01 where no stream reaches 1000). Pin floor semantics by
    running the REGISTERED oracle text in DuckDB on a corpus that
    crosses the half-budget line and comparing engines exactly."""
    import duckdb

    from flink_hiveorc_spark.registry import ORACLES

    # one stream, 60 docs x 25 tokens = 1500 tokens: start offsets
    # cross 1000 (= budget/2) at doc 40 — the rounding trap region.
    text = " ".join(["tok"] * 25)
    rows = [(i, text, "en", "src0", len(text)) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    got = {
        (r.doc_id, r.shard_idx)
        for r in QUERIES["pipeline_pack_shards"](spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    exp = {
        (r[0], r[4])
        for r in con.execute(ORACLES["pipeline_pack_shards"]).fetchall()
    }
    assert got == exp
    # the boundary doc itself: start 1000 -> shard 0 under floor
    by_doc = dict(got)
    assert by_doc[40] == 0  # start = 40*25 = 1000; floor(1000/2000) = 0
    assert by_doc[59] == 0  # start = 1475 < 2000


def test_jl_recall_report_bounds(spark, sf_dir):
    """JL recall rows are well-formed; the report never overclaims
    (recall is derived exactly from the overlap count)."""
    rows = QUERIES["sim_topk_jl_recall"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4
    for r in rows:
        assert 1 <= r.n_overlap <= 10
        assert abs(r.recall_at_10 - r.n_overlap / 10) < 1e-9


def test_top_paths_consistent_with_transitions(spark, sf_dir):
    """Every 3-step path's count is bounded by the counts of both of
    its constituent 2-step transitions (an a>b>c journey contains an
    a>b and a b>c within the same session gap)."""
    paths = QUERIES["events_top_paths"](spark, sf_dir).collect()
    assert paths and all(r.n >= 1 for r in paths)
    trans = {
        (r.prev_type, r.next_type): r.n
        for r in QUERIES["events_transition_matrix"](spark, sf_dir).collect()
    }
    for r in paths:
        a, b, c = r.path.split(">")
        assert r.n <= trans.get((a, b), 0)
        assert r.n <= trans.get((b, c), 0)


def test_triangle_count_bounds(spark, sf_dir):
    """Triangles are bounded by C(edges-per-label, 3)-free sanity:
    n_triangles <= n_edges*(n_edges-1)/3 loose bound, nonneg, and a
    label with < 3 edges has 0 triangles."""
    rows = QUERIES["graph_triangle_count"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_edges >= 1 and r.n_triangles >= 0
        if r.n_edges < 3:
            assert r.n_triangles == 0
        assert 3 * r.n_triangles <= r.n_edges * (r.n_edges - 1)


def test_native_session_window_equals_gaps_and_islands(spark, sf_dir):
    """The native session_window operator and the hand-rolled
    formulation produce identical sessions on this corpus."""
    native = {
        (r.user_id, r.start_us, r.n_events, r.duration_us)
        for r in QUERIES["sessionize_native_window"](spark, sf_dir).collect()
    }
    rolled = {
        (r.user_id, r.start_us, r.n_events, r.duration_us)
        for r in QUERIES["sessionize_events"](spark, sf_dir).collect()
    }
    assert native == rolled
