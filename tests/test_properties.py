"""Property-based tests (hypothesis): engine expressions vs
independent Python models on randomized inputs.

Each example ships a BATCH of values through one Spark job (a
per-value roundtrip would cost ~100 ms/example), so max_examples
stays low while value coverage stays high.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings, strategies as st

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_hiveorc_spark.sources.cdc import epoch_ms_to_local_date

# 1990..2100, away from the int64-ns edges the testdata never nears.
EPOCH_MS = st.integers(min_value=631_152_000_000, max_value=4_102_444_800_000)


@settings(max_examples=5, deadline=None)
@given(st.lists(EPOCH_MS, min_size=1, max_size=64))
def test_epoch_ms_to_local_date_matches_python(spark, ms_list):
    """The UTC+8 date derivation (App.txt:66-68 parity) agrees with an
    independent Python datetime model for arbitrary epochs."""
    df = spark.createDataFrame([Row(ms=m) for m in ms_list]).select(
        "ms", epoch_ms_to_local_date("ms").alias("d")
    )
    got = {r.ms: r.d for r in df.collect()}
    for m in ms_list:
        expect = (
            datetime.fromtimestamp(m / 1000, tz=timezone.utc) + timedelta(hours=8)
        ).date().isoformat()
        assert got[m] == expect, f"epoch {m}: {got[m]} != {expect}"


TEXTS = st.lists(
    st.text(alphabet="ab c\t\n", min_size=0, max_size=40), min_size=1, max_size=64
)


@settings(max_examples=5, deadline=None)
@given(TEXTS)
def test_normalization_idempotent_and_copy_invariant(spark, texts):
    """The dedup normalization (lower + collapse whitespace + trim) is
    idempotent, and duplicate inputs always collapse to one hash."""
    rows = [Row(i=i, text=t) for i, t in enumerate(texts + texts)]  # every text twice
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    df = spark.createDataFrame(rows).select(
        "text", norm.alias("n1")
    ).select("text", "n1", F.trim(F.regexp_replace(F.lower("n1"), r"\s+", " ")).alias("n2"))
    for r in df.collect():
        assert r.n1 == r.n2, f"not idempotent: {r.text!r} -> {r.n1!r} -> {r.n2!r}"
    n_distinct_norm = df.select("n1").distinct().count()
    assert n_distinct_norm <= len(set(texts))


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=200
    )
)
def test_salted_agg_equals_plain_agg(spark, pairs):
    """Salting is semantics-preserving for decomposable aggregates on
    ARBITRARY key/value distributions (including all-one-key skew)."""
    from flink_hiveorc_spark.functions.skew import salted_agg

    df = spark.createDataFrame([Row(k=k, v=v) for k, v in pairs])
    plain = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n, r.mn, r.mx)
        for r in salted_agg(
            df,
            ["k"],
            {
                "s": (F.sum("v"), lambda c: F.sum(c)),
                "n": (F.count(F.lit(1)), lambda c: F.sum(c)),
                "mn": (F.min("v"), lambda c: F.min(c)),
                "mx": (F.max("v"), lambda c: F.max(c)),
            },
            salt_buckets=4,
        ).collect()
    }
    assert plain == salted


def test_sessionize_invariants(spark):
    """Within a session: consecutive gaps ≤ 30 min; across consecutive
    sessions of a user: the boundary gap > 30 min. Checked on the real
    corpus, not just the oracle's value hash."""
    from flink_hiveorc_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    sess = QUERIES["sessionize_events"](spark, sf).collect()
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r.user_id, []).append(r)
    gap = 30 * 60 * 1_000_000
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.session_seq)
        # session_seq is dense 1..n per user
        assert [r.session_seq for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            # next session starts strictly more than `gap` after the
            # previous session's LAST event (start + duration).
            assert b.start_us - (a.start_us + a.duration_us) > gap


def test_pack_shards_budget_invariant(spark):
    """Greedy packing property: within every (lang, source, shard),
    the tokens BEFORE the last doc fit the budget (a doc lands in a
    shard iff its start offset is inside it), and shard indices are
    contiguous from 0 per stream."""
    from flink_hiveorc_spark.functions.analytics import SHARD_TOKEN_BUDGET
    from flink_hiveorc_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["pipeline_pack_shards"](spark, sf).collect()
    streams: dict[tuple, list] = {}
    for r in rows:
        streams.setdefault((r.lang, r.source), []).append(r)
    for key, docs in streams.items():
        docs.sort(key=lambda r: r.doc_id)
        cum = 0
        for d in docs:
            assert d.shard_idx == cum // SHARD_TOKEN_BUDGET, (key, d)
            cum += d.n_tokens
        shard_ids = sorted({d.shard_idx for d in docs})
        assert shard_ids == list(range(len(shard_ids)))


# ---------------------------------------------------------------------------
# merge_into vs an independent Python dict model.

_MERGE_KEYS = st.integers(min_value=0, max_value=12)


@settings(max_examples=5, deadline=None)
@given(
    tgt=st.dictionaries(_MERGE_KEYS, st.integers(-100, 100), max_size=10),
    src=st.dictionaries(
        _MERGE_KEYS,
        st.tuples(st.integers(-100, 100), st.booleans()),
        max_size=10,
    ),
)
def test_merge_into_matches_dict_model(spark, tgt, src):
    """ANSI MERGE vs the obvious dict model: delete wins over update
    for matched keys, unmatched source inserts, unmatched target
    passes through — for arbitrary overlapping key sets (including
    empty target, empty source, full overlap, no overlap)."""
    from flink_hiveorc_spark.operators.merge import merge_into
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    schema_s = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("delta", T.LongType()),
            T.StructField("kill", T.BooleanType()),
        ]
    )
    target = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in tgt.items()], schema=schema_t
    )
    source = spark.createDataFrame(
        [Row(k=k, delta=d, kill=x) for k, (d, x) in src.items()], schema=schema_s
    )
    out = merge_into(
        target,
        source,
        on="k",
        when_matched_delete=F.col("s_kill"),
        when_matched_update={"v": F.col("v") + F.col("s_delta")},
        when_not_matched_insert={"v": F.col("s_delta")},
    )
    got = {r.k: r.v for r in out.collect()}

    model = dict(tgt)
    for k, (d, kill) in src.items():
        if k in model:
            if kill:
                del model[k]
            else:
                model[k] = model[k] + d
        else:
            model[k] = d
    assert got == model


DOC_TEXTS = st.lists(
    st.text(alphabet="abc xyz", min_size=1, max_size=80).map(str.strip).filter(bool),
    min_size=1,
    max_size=24,
)


@settings(max_examples=5, deadline=None)
@given(DOC_TEXTS)
def test_chunk_dedup_matches_python_model(spark, texts):
    """dedup_chunk_level's core vs an independent Python model on
    arbitrary corpora: per-doc totals, uniques, and first-writer-wins
    kept counts must match exactly (including duplicate texts across
    docs and duplicate chunks inside one doc)."""
    from flink_hiveorc_spark.functions.dedup import _CHUNK_WORDS, chunk_level_stats
    from pyspark.sql import Row

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: r
        for r in chunk_level_stats(spark.createDataFrame(rows)).collect()
    }

    # Python model (split(' ') keeps empties, mirroring the engine)
    def chunks(t):
        w = t.split(" ")
        k = -(-len(w) // _CHUNK_WORDS)
        return [" ".join(w[i * _CHUNK_WORDS : (i + 1) * _CHUNK_WORDS]) for i in range(k)]

    per_doc = {i: chunks(t) for i, t in enumerate(texts)}
    keeper = {}
    for i in sorted(per_doc):
        for c in per_doc[i]:
            keeper.setdefault(c, i)
    for i, cs in per_doc.items():
        uniq = set(cs)
        kept = sum(1 for c in uniq if keeper[c] == i)
        r = got[i]
        assert r.n_chunks == len(cs)
        assert r.n_unique_in_doc == len(uniq)
        assert r.n_kept == kept, (i, texts[i])


MIX_DOCS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000_000),  # doc_id
        st.integers(min_value=0, max_value=7),           # source number
        st.text(alphabet="ab ", min_size=1, max_size=30).map(str.strip).filter(bool),
    ),
    min_size=1,
    max_size=48,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None)
@given(MIX_DOCS)
def test_weighted_mixture_matches_hashlib_model(spark, docs):
    """sample_weighted_mixture's core vs an independent hashlib model:
    the md5 keep-gate and per-source rates must agree exactly for
    arbitrary doc_ids and sources (the reproducibility guarantee IS
    the operator — a drifting hash silently changes the corpus)."""
    import hashlib

    from flink_hiveorc_spark.functions.pipeline import weighted_mixture_stats
    from pyspark.sql import Row

    rows = [Row(doc_id=i, source=f"src{s}", text=t) for i, s, t in docs]
    got = {
        r.source: r for r in weighted_mixture_stats(spark.createDataFrame(rows)).collect()
    }

    rates = {0: 100, 1: 60, 2: 30, 3: 10}
    model: dict[str, list[int]] = {}
    for i, s, t in docs:
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
        kept = bucket < rates[s % 4]
        n_tokens = len(t.split())  # texts have single spaces, no empties
        model.setdefault(f"src{s}", []).append((kept, n_tokens))
    for src, entries in model.items():
        r = got[src]
        assert r.n_docs == len(entries)
        assert r.n_sampled == sum(1 for k, _ in entries if k)
        expect_tokens = sum(n for k, n in entries if k)
        assert (r.sampled_tokens or 0) == expect_tokens, (src, entries)


SHARD_DOCS = st.lists(
    st.tuples(
        # sparse, clustered, and huge doc_ids — the range-bucketing in
        # assign_shard_idx must be a pure no-op on the OUTPUT for any
        # id distribution, including all-ids-in-one-bucket (width
        # collapse) and one-id-per-bucket
        st.integers(min_value=0, max_value=2**40),
        st.sampled_from(["en", "de"]),
        st.sampled_from(["src1", "src2", "src3"]),
        st.integers(min_value=0, max_value=5000),  # n_tokens (0 = empty doc)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],  # doc_id is a key
)


@settings(max_examples=5, deadline=None)
@given(SHARD_DOCS)
def test_assign_shard_idx_matches_python_model(spark, docs):
    """The two-pass distributed prefix sum vs an independent Python
    model of greedy sequential packing (per-stream doc_id order,
    shard = floor(start_offset / budget)) on arbitrary id
    distributions — bucket boundaries must never leak into the
    output."""
    from flink_hiveorc_spark.functions.analytics import (
        SHARD_TOKEN_BUDGET,
        assign_shard_idx,
    )
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, lang=l, source=s, n_tokens=n) for i, l, s, n in docs
    ]
    got = {
        r.doc_id: r.shard_idx
        for r in assign_shard_idx(spark.createDataFrame(rows)).collect()
    }

    want = {}
    streams: dict[tuple, int] = {}
    for i, l, s, n in sorted(docs):
        cum = streams.get((l, s), 0)
        want[i] = cum // SHARD_TOKEN_BUDGET
        streams[(l, s)] = cum + n
    assert got == want


DOC_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["red", "blue", "green", "dog", "cat", "sun"]),
        min_size=1,
        max_size=10,
    ).map(" ".join),
    min_size=2,
    max_size=24,
)


@settings(max_examples=5, deadline=None)
@given(DOC_TEXTS)
def test_prefix_filter_lossless_on_random_corpora(spark, texts):
    """The PPJoin prefix filter must equal brute-force Jaccard >= 0.5
    on arbitrary small-vocabulary corpora (the losslessness theorem,
    checked empirically beyond the fixed testdata)."""
    from flink_hiveorc_spark.functions.dedup import (
        PREFIX_JACCARD_THRESHOLD,
        prefix_filter_jaccard_pairs,
    )

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows)
    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in prefix_filter_jaccard_pairs(df).collect()
    }

    def shingles(t):
        w = t.split(" ")
        if len(w) < 3:
            return {t}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = shingles(texts[i]), shingles(texts[j])
            jac = len(a & b) / len(a | b)
            if jac >= PREFIX_JACCARD_THRESHOLD:
                want.add((i, j, round(jac, 9)))
    assert got == want


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user
        st.integers(min_value=0, max_value=60),  # start day
        st.integers(min_value=0, max_value=20),  # length
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=5, deadline=None)
@given(INTERVALS)
def test_interval_band_join_complete_on_random_intervals(spark, ivs):
    """The canonical-band equi-join finds exactly the overlapping
    cross-user interval pairs the O(n²) predicate finds — on random
    interval sets, including touching and contained spans."""
    rows = [
        Row(user_id=u, grp=i, d0=s, d1=s + ln)
        for i, (u, s, ln) in enumerate(ivs)
    ]
    iv = spark.createDataFrame(rows)
    banded = iv.select(
        "*",
        F.explode(F.sequence(F.expr("d0 div 7"), F.expr("d1 div 7"))).alias("band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    got = {
        (r["ua"], r["ga"], r["ub"], r["gb"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.d0") <= F.col("b.d1"))
            & (F.col("b.d0") <= F.col("a.d1"))
            & (F.col("a.band") == F.expr("greatest(a.d0, b.d0) div 7")),
        )
        .select(
            F.col("a.user_id").alias("ua"),
            F.col("a.grp").alias("ga"),
            F.col("b.user_id").alias("ub"),
            F.col("b.grp").alias("gb"),
        )
        .collect()
    }
    want = set()
    for i, (u1, s1, l1) in enumerate(ivs):
        for j, (u2, s2, l2) in enumerate(ivs):
            if u1 < u2 and s1 <= s2 + l2 and s2 <= s1 + l1:
                want.add((u1, i, u2, j))
    assert got == want
