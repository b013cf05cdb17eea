"""Semantic invariants for the round-5 third-batch operators (prefix-
filtered set-similarity join, label propagation, CEP pattern match,
integer EWMA, interval-overlap join, CMS heavy hitters, BM25, BPE
apply). The value oracle runs in tools/check_oracle.py + the driver;
these pin the operator contracts a hash can't explain."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.functions.dedup import (
    PREFIX_JACCARD_THRESHOLD,
    dedup_prefix_filter_jaccard,
    graph_label_propagation,
    dedup_cluster_components,
    ngram_jaccard_pairs,
)
from flink_hiveorc_spark.functions.analytics import (
    events_ewma_smoothing,
    events_pattern_cep,
    text_bm25_topk,
    _EWMA_TAPS,
)
from flink_hiveorc_spark.functions.tokenizer import (
    text_bpe_apply,
    text_bpe_merges,
    _merge_fold,
)
from flink_hiveorc_spark.operators.aggregates import agg_cms_heavy_hitters
from flink_hiveorc_spark.operators.joins import join_interval_overlap


def test_prefix_filter_equals_unfiltered(spark, sf_dir):
    """The prefix filter is candidate PRUNING, not approximation: at
    the same threshold its output must equal the plain inverted-index
    formulation row for row."""
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    full = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(d).collect()
        if r["jaccard"] >= PREFIX_JACCARD_THRESHOLD
    }
    pref = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in dedup_prefix_filter_jaccard(spark, sf_dir).collect()
    }
    assert pref == full
    assert pref  # non-vacuous: the corpus has >= one J>=0.5 pair


def test_label_propagation_refines_components(spark, sf_dir):
    """Two LPA communities never span two connected components (a
    label can only travel along edges), and every labeled node is a
    clustered node."""
    comp = {
        r["doc_id"]: r["component"]
        for r in dedup_cluster_components(spark, sf_dir).collect()
    }
    lpa = graph_label_propagation(spark, sf_dir).collect()
    assert {r["doc_id"] for r in lpa} == set(comp)
    # community label is itself a node id inside the same component
    for r in lpa:
        assert comp[r["community"]] == comp[r["doc_id"]]


def test_cep_matches_are_real_subsequences(spark, sf_dir):
    """Every reported match is a click→(view…)→purchase run, and at
    least one session in the corpus matches."""
    rows = events_pattern_cep(spark, sf_dir).collect()
    assert rows
    for r in rows:
        steps = r["matched"].split(">")
        assert steps[0] == "click" and steps[-1] == "purchase"
        assert all(s == "view" for s in steps[1:-1])


def test_ewma_matches_python_model(spark, sf_dir):
    """ewma_units equals the 16-tap dyadic convolution computed by a
    plain Python replay of each user's ordered stream."""
    rows = events_ewma_smoothing(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for _, rs in list(by_user.items())[:10]:
        rs.sort(key=lambda r: (r["t_us"], r["event_id"]))
        hist: list[int] = []
        for r in rs:
            hist.append(r["v_cents"])
            want = sum(
                v * (1 << (_EWMA_TAPS - 1 - k))
                for k, v in enumerate(reversed(hist[-_EWMA_TAPS:]))
            )
            assert r["ewma_units"] == want
            checked += 1
    assert checked > 100


def test_interval_overlap_symmetric_exact(spark, sf_dir):
    """Band-bucketed overlap join equals the direct O(n²) predicate on
    the same interval table (driver-side replay)."""
    out = {
        (r["user_a"], r["user_b"]): (r["n_overlaps"], r["total_overlap_days"])
        for r in join_interval_overlap(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    days = sorted(
        (r["user_id"], r["day"])
        for r in ev.select(
            "user_id", F.expr("ts_ns div 1000 div 86400000000").alias("day")
        )
        .distinct()
        .collect()
    )
    ivs: list[tuple[int, int, int]] = []
    cur = None
    for u, day in days:
        if cur and cur[0] == u and day == cur[2] + 1:
            cur = (u, cur[1], day)
        else:
            if cur:
                ivs.append(cur)
            cur = (u, day, day)
    if cur:
        ivs.append(cur)
    from collections import defaultdict

    want: dict = defaultdict(lambda: [0, 0])
    for i, (ua, a0, a1) in enumerate(ivs):
        for ub, b0, b1 in ivs[i + 1 :]:
            if ua == ub or max(a0, b0) > min(a1, b1):
                continue
            key = (min(ua, ub), max(ua, ub))
            want[key][0] += 1
            want[key][1] += min(a1, b1) - max(a0, b0) + 1
    assert out == {k: tuple(v) for k, v in want.items()}


def test_cms_bound_holds_and_estimates_tight(spark, sf_dir):
    """All top-k rows report the sketch inside its guarantee band."""
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = agg_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == min(20, n_users)
    assert all(r["cms_within_bound"] for r in rows)


def test_bm25_scores_ranked_and_positive(spark, sf_dir):
    rows = text_bm25_topk(spark, sf_dir).collect()
    assert len(rows) == 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_query_terms_hit"] <= 3 for r in rows)


def test_bpe_apply_consistent_with_merges(spark, sf_dir):
    """Applying the learned merge table by hand to each reported word
    reproduces the reported segmentation (greedy-leftmost, in merge
    order)."""
    merges = [r["pair"] for r in text_bpe_merges(spark, sf_dir).collect()]
    rows = text_bpe_apply(spark, sf_dir).collect()
    assert rows

    def apply(word: str) -> list[str]:
        syms = list(word)
        for pair in merges:
            p1, p2 = pair.split(" ", 1)
            out: list[str] = []
            for s in syms:
                if out and out[-1] == p1 and s == p2:
                    out[-1] = p1 + p2
                else:
                    out.append(s)
            syms = out
        return syms

    for r in rows:
        assert r["tokens"].split(" ") == apply(r["word"])
        assert r["n_tokens"] == len(r["tokens"].split(" "))


def test_merge_fold_splices_leftmost(spark):
    """'a a a' under pair (a,a) folds to 'aa a' — standard BPE
    greedy-leftmost, pinned directly on the fold expression."""
    df = spark.createDataFrame([(["a", "a", "a"],)], "ws array<string>")
    assert df.select(_merge_fold("a", "a").alias("s")).first()["s"] == "aa a"


def test_weighted_median_matches_python_model(spark, sf_dir):
    """The lower weighted median equals a driver-side replay of the
    definition on the raw rows."""
    from flink_hiveorc_spark.operators.aggregates import agg_weighted_median

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows:
        groups[r["l_returnflag"]].append((r["l_extendedprice"], int(r["l_quantity"])))
    want = {}
    for flag, pairs in groups.items():
        total = sum(q for _, q in pairs)
        cum = 0
        by_price = defaultdict(int)
        for p, q in pairs:
            by_price[p] += q
        for p in sorted(by_price):
            cum += by_price[p]
            if 2 * cum >= total:
                want[flag] = (p, total)
                break
    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_qty"])
        for r in agg_weighted_median(spark, sf_dir).collect()
    }
    assert got == want


def test_kcore_peel_monotone_and_dense(spark, sf_dir):
    """Every surviving node has degree >= k-after-peel is NOT
    guaranteed mid-iteration, but survivors must be a subset of the
    round-1 survivors and all degrees positive; and peeling must not
    INVENT nodes."""
    from flink_hiveorc_spark.functions.dedup import (
        dedup_minhash_lsh_pairs,
        graph_kcore_peel,
    )

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).collect()
    from collections import defaultdict

    deg = defaultdict(int)
    for r in pairs:
        deg[r["doc_a"]] += 1
        deg[r["doc_b"]] += 1
    out = graph_kcore_peel(spark, sf_dir).collect()
    nodes = {r["doc_id"] for r in out}
    assert nodes <= set(deg)
    for r in out:
        assert r["degree"] >= 1
        assert r["degree"] <= deg[r["doc_id"]]


def test_kcore_fixpoint_on_triangle_plus_tail(spark):
    """A triangle with a pendant tail peels to exactly the triangle
    under k=2 (hand-checkable fixture, exercised through the same
    peel loop shape)."""
    from flink_hiveorc_spark.session import reliable_checkpoint

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u bigint, v bigint"
    )
    sym = reliable_checkpoint(
        edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    for _ in range(3):
        deg = sym.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= 2).select("u")
        sym = (
            sym.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
        )
    survivors = {r["u"] for r in sym.select("u").distinct().collect()}
    assert survivors == {1, 2, 3}


def test_mmr_matches_python_greedy_replay(spark, sf_dir):
    """The whole greedy trajectory (pool, picks, scores) equals a
    plain-Python replay of quantize → relevance → greedy MMR."""
    import math

    from flink_hiveorc_spark.functions.similarity import (
        _MMR_K,
        _MMR_POOL,
        _MMR_QUERY_VEC,
        sim_mmr_rerank,
    )

    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def quant(v):
        s = max(abs(x) for x in v)
        if s == 0:
            return None
        return [math.floor(x * 127.0 / s + 0.5) for x in v]

    q = {vid: quant(v) for vid, v in vecs.items()}
    qq = q[_MMR_QUERY_VEC]
    rel = {
        vid: sum(a * b for a, b in zip(qv, qq))
        for vid, qv in q.items()
        if vid != _MMR_QUERY_VEC and qv is not None
    }
    pool = sorted(rel, key=lambda v: (-rel[v], v))[:_MMR_POOL]
    picked = []
    want = []
    for r in range(1, _MMR_K + 1):
        if not picked:
            best = min(pool, key=lambda v: (-rel[v], v))
            want.append((1, best, rel[best], rel[best]))
            picked.append(best)
            continue
        cands = [v for v in pool if v not in picked]
        if not cands:
            break

        def mmr(v):
            return rel[v] - max(
                sum(a * b for a, b in zip(q[v], q[s])) for s in picked
            )

        best = min(cands, key=lambda v: (-mmr(v), v))
        want.append((r, best, rel[best], mmr(best)))
        picked.append(best)
    got = [
        (r["rnk"], r["vec_id"], r["rel_dot"], r["mmr_score"])
        for r in sim_mmr_rerank(spark, sf_dir).collect()
    ]
    assert got == want
    assert len({v for _, v, _, _ in got}) == len(got)  # no duplicates


def test_chisq_matches_python_model(spark, sf_dir):
    import math
    from collections import Counter

    from flink_hiveorc_spark.operators.aggregates import agg_chisq_independence

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect()
    obs = Counter((r["o_orderstatus"], r["o_orderpriority"]) for r in rows)
    n = sum(obs.values())
    row_t = Counter()
    col_t = Counter()
    for (s, p), c in obs.items():
        row_t[s] += c
        col_t[p] += c
    got = agg_chisq_independence(spark, sf_dir).collect()
    assert len(got) == len(obs)
    total_e8 = 0
    for r in got:
        o = obs[(r["status"], r["priority"])]
        assert r["observed"] == o
        rt, ct = row_t[r["status"]], col_t[r["priority"]]
        want_contrib = round((n * o - rt * ct) ** 2 / (float(n) * rt * ct), 8)
        assert abs(r["chi2_contrib"] - want_contrib) < 1e-9
        assert abs(r["expected"] - round(rt * ct / n, 8)) < 1e-9
        total_e8 += round(want_contrib * 1e8)
    assert all(r["chi2_total_e8"] == total_e8 for r in got)


def test_entropy_matches_python_model(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    from flink_hiveorc_spark.functions.analytics import agg_entropy_mixing

    rows = load_table(spark, sf_dir, "documents").select("lang", "source").collect()
    cells = Counter((r["lang"], r["source"]) for r in rows)
    per_lang = defaultdict(list)
    for (lang, _), c in cells.items():
        per_lang[lang].append(c)
    got = {r["lang"]: r for r in agg_entropy_mixing(spark, sf_dir).collect()}
    for lang, cs in per_lang.items():
        if len(cs) <= 1:
            assert lang not in got
            continue
        n = sum(cs)
        s_e9 = sum(round(c * math.log(c) * 1e9) for c in cs)
        h = math.log(n) - (s_e9 / 1e9) / n
        r = got[lang]
        assert r["n_docs"] == n and r["n_sources"] == len(cs)
        assert abs(r["entropy_nats"] - round(h, 8)) < 1e-9
        assert abs(r["norm_entropy"] - round(h / math.log(len(cs)), 8)) < 1e-9
        # balanced-ish synthetic corpus: entropy within (0, ln k]
        assert 0.0 < r["entropy_nats"] <= math.log(len(cs)) + 1e-9


def test_canonical_longest_keeps_longest_member(spark, sf_dir):
    from flink_hiveorc_spark.functions.dedup import (
        dedup_canonical_longest,
        dedup_cluster_components,
    )

    comp = dedup_cluster_components(spark, sf_dir).collect()
    lengths = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        ).collect()
    }
    from collections import defaultdict

    clusters = defaultdict(list)
    for r in comp:
        clusters[r["component"]].append(r["doc_id"])
    kept = {r["doc_id"] for r in dedup_canonical_longest(spark, sf_dir).collect()}
    clustered = {d for ds in clusters.values() for d in ds}
    # singletons all pass through
    assert set(lengths) - clustered <= kept
    # exactly one survivor per cluster: the longest (ties -> min id)
    for ds in clusters.values():
        best = min(ds, key=lambda d: (-lengths[d], d))
        assert kept & set(ds) == {best}


def test_poisson_bootstrap_ci_brackets_mean(spark, sf_dir):
    """The ~94% CI should bracket the point estimate (a replica-mean
    order statistic strictly outside the data range would be a
    weight-scheme bug), and lo <= hi always."""
    from flink_hiveorc_spark.operators.aggregates import agg_poisson_bootstrap_ci

    rows = agg_poisson_bootstrap_ci(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["ci_lo_cents"] <= r["ci_hi_cents"]
        assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"]


def test_poisson_weights_are_poisson_ish(spark, sf_dir):
    """Empirical weight distribution over all (row, replica) draws
    must match Poisson(1) within a few percent — pins the inverse-CDF
    thresholds (a transposed digit would shift the masses)."""
    import math

    from flink_hiveorc_spark.operators.aggregates import _BOOT_T

    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.select(
        "event_id",
        F.explode(F.array(*[F.lit(i) for i in range(8)])).alias("b"),
    ).select(
        (
            F.conv(F.substring(F.md5(F.concat_ws(":", "event_id", "b")), 1, 8), 16, 10)
            .cast("bigint") % 1048576
        ).alias("u20")
    )
    w = (
        F.when(F.col("u20") < _BOOT_T[0], 0)
        .when(F.col("u20") < _BOOT_T[1], 1)
        .when(F.col("u20") < _BOOT_T[2], 2)
        .when(F.col("u20") < _BOOT_T[3], 3)
        .when(F.col("u20") < _BOOT_T[4], 4)
        .otherwise(5)
    )
    counts = {r["w"]: r["c"] for r in b.select(w.alias("w")).groupBy("w").agg(F.count("*").alias("c")).collect()}
    n = sum(counts.values())
    p = math.exp(-1.0)
    for k in (0, 1, 2):
        assert abs(counts.get(k, 0) / n - p) < 0.03
        p /= k + 1  # Poisson(1): p_{k+1} = p_k / (k+1)


def test_temporal_scd2_every_event_matches_exactly_once(spark, sf_dir):
    """The SCD2 intervals tile each user's timeline, so the temporal
    join is lossless: aggregate event counts equal the raw count."""
    from flink_hiveorc_spark.operators.joins import join_temporal_scd2_enrich

    n_events = load_table(spark, sf_dir, "events").count()
    out = join_temporal_scd2_enrich(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in out) == n_events
    # state_at_event equals event_type whenever the event itself
    # caused the state change — so the diagonal cells must be nonempty
    diag = {r["state_at_event"] for r in out if r["state_at_event"] == r["event_type"]}
    assert diag


def test_observed_metrics_match_counts(spark, sf_dir):
    """The observe() accumulators equal independently-computed counts
    (rows_in / rows_kept / null_texts) on the same data."""
    from pyspark.sql import Observation

    d = load_table(spark, sf_dir, "documents")
    kept = (F.col("n_chars") >= 120) & F.col("lang").isin("en", "de")
    obs = Observation()
    out = (
        d.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(kept.cast("long")).alias("rows_kept"),
            F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        )
        .filter(kept)
        .count()
    )
    m = obs.get
    assert m["rows_in"] == d.count()
    assert m["rows_kept"] == out
    assert m["null_texts"] == d.filter(F.col("text").isNull()).count()


def test_join_hints_pin_physical_strategy(spark, sf_dir):
    """merge-hinted join plans SortMergeJoin; a shuffle_hash-hinted
    twin plans ShuffledHashJoin — the hint surface actually steers
    the planner."""
    from flink_hiveorc_spark.operators.joins import join_hint_sort_merge

    smj_plan = join_hint_sort_merge(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in smj_plan
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    shj = l.hint("shuffle_hash").join(o.hint("shuffle_hash"), l.l_orderkey == o.o_orderkey)
    shj_plan = shj._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in shj_plan
