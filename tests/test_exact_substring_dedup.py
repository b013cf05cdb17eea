"""exact_substring_spans (Lee et al. 2022 class, L1c): hand-built
corpora pin the span semantics — cross-doc duplication, within-doc
repeats, overlap merging into maximal spans, and the min-length gate."""

from __future__ import annotations

import pytest

from flink_hiveorc_spark.functions.dedup import exact_substring_spans


def _spans(spark, rows, min_tokens=3):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = exact_substring_spans(df, min_tokens=min_tokens)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in out.collect()
    )


def test_cross_doc_duplicate_span(spark):
    rows = [
        (1, "a b c d e unique1 tail1"),
        (2, "prefix2 a b c d e tail2"),
    ]
    # 'a b c d e' (5 tokens) duplicated across docs; with L=3 every
    # 3-gram inside it is duplicated -> one maximal span each
    assert _spans(spark, rows) == [
        (1, 1, 5, 5),
        (2, 2, 6, 5),
    ]


def test_within_doc_repeat_counts(spark):
    # the gram repeats only inside one document: still a duplicate
    rows = [(7, "x y z filler1 filler2 x y z")]
    assert _spans(spark, rows) == [(7, 1, 3, 3), (7, 6, 8, 3)]


def test_adjacent_matches_merge_into_maximal_span(spark):
    # two overlapping duplicated regions merge into one island
    rows = [
        (1, "a b c d mid e f g h"),
        (2, "a b c d other1 other2"),
        (3, "zz e f g h"),
    ]
    got = _spans(spark, rows)
    assert (1, 1, 4, 4) in got and (1, 6, 9, 4) in got
    assert (2, 1, 4, 4) in got and (3, 2, 5, 4) in got
    # doc 1's two spans stay separate (position 5 'mid' uncovered)
    assert not any(r[0] == 1 and r[1] == 1 and r[2] == 9 for r in got)


def test_short_docs_and_no_duplicates(spark):
    rows = [(1, "a b"), (2, "c d e f g"), (3, "h i j k l")]
    assert _spans(spark, rows) == []


def test_min_tokens_gate(spark):
    # 4-token repeat is invisible at L=5, visible at L=4
    rows = [(1, "p q r s one"), (2, "two p q r s")]
    assert _spans(spark, rows, min_tokens=5) == []
    assert _spans(spark, rows, min_tokens=4) == [
        (1, 1, 4, 4),
        (2, 2, 5, 4),
    ]


def test_full_doc_duplicate(spark):
    rows = [(1, "same doc text here"), (2, "same doc text here")]
    assert _spans(spark, rows, min_tokens=4) == [
        (1, 1, 4, 4),
        (2, 1, 4, 4),
    ]


@pytest.mark.parametrize("min_tokens", [2, 3])
def test_viral_gram_is_linear_not_quadratic(spark, min_tokens):
    # one gram occurring k times yields k spans (k*L coverage rows),
    # never k^2 pairs — the no-df_cap-needed property
    k = 40
    rows = [(i, f"viral gram here sep{i}") for i in range(k)]
    got = _spans(spark, rows, min_tokens=min_tokens)
    assert len(got) == k
    assert all(r[1] == 1 and r[2] == 3 for r in got)


def _clean(spark, rows, min_tokens=3):
    from flink_hiveorc_spark.functions.dedup import exact_substring_clean

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = exact_substring_clean(df, min_tokens=min_tokens)
    return {
        r.doc_id: (r.cleaned_text, r.n_tokens_kept, r.n_tokens_removed)
        for r in out.collect()
    }


def test_clean_removes_spans_and_keeps_rest(spark):
    rows = [
        (1, "a b c d e unique1 tail1"),
        (2, "prefix2 a b c d e tail2"),
    ]
    got = _clean(spark, rows)
    assert got[1] == ("unique1 tail1", 2, 5)
    assert got[2] == ("prefix2 tail2", 2, 5)


def test_clean_untouched_docs_pass_through(spark):
    rows = [(1, "totally unique text one"), (2, "and another thing here")]
    got = _clean(spark, rows)
    assert got[1] == ("totally unique text one", 4, 0)
    assert got[2] == ("and another thing here", 4, 0)


def test_clean_fully_duplicated_doc_empties(spark):
    rows = [(1, "same doc text"), (2, "same doc text")]
    got = _clean(spark, rows)
    assert got[1] == ("", 0, 3) and got[2] == ("", 0, 3)


def test_clean_matches_spans_accounting(spark):
    from flink_hiveorc_spark.functions.dedup import exact_substring_spans

    rows = [
        (i, f"head{i} x y z common run here tail{i} x y z")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = exact_substring_spans(df, min_tokens=3).collect()
    removed_by_doc = {}
    for r in spans:
        removed_by_doc[r.doc_id] = removed_by_doc.get(r.doc_id, 0) + r.span_tokens
    got = _clean(spark, rows)
    for doc_id, (_, kept, removed) in got.items():
        assert removed == removed_by_doc.get(doc_id, 0)
        assert kept + removed == 11


def test_chunk_token_windows_semantics(spark):
    from flink_hiveorc_spark.functions.pipeline import chunk_token_windows

    rows = [
        (1, " ".join(f"t{i}" for i in range(1, 11))),  # 10 tokens
        (2, "a b c"),                                   # short doc
        (3, " ".join(f"u{i}" for i in range(1, 9))),    # exact grid
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {}
    for r in chunk_token_windows(df, window=4, stride=3).collect():
        out.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_pos, r.n_tokens, r.chunk_text)
        )
    for v in out.values():
        v.sort()
    # doc 1: n=10, w=4, s=3 -> regular starts 1,4,7 + tail 7 (dup) -> 1,4,7
    assert out[1] == [
        (0, 1, 4, "t1 t2 t3 t4"),
        (1, 4, 4, "t4 t5 t6 t7"),
        (2, 7, 4, "t7 t8 t9 t10"),
    ]
    # doc 2: short -> single whole-doc chunk
    assert out[2] == [(0, 1, 3, "a b c")]
    # doc 3: n=8 -> starts 1,4 + tail 5
    assert out[3] == [
        (0, 1, 4, "u1 u2 u3 u4"),
        (1, 4, 4, "u4 u5 u6 u7"),
        (2, 5, 4, "u5 u6 u7 u8"),
    ]


def test_chunk_token_windows_full_coverage_property(spark):
    from flink_hiveorc_spark.functions.pipeline import chunk_token_windows

    rows = [(n, " ".join(f"w{i}" for i in range(1, n + 1)))
            for n in (1, 5, 6, 7, 12, 13, 29)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_token_windows(df, window=6, stride=4).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, rs in by_doc.items():
        covered = set()
        for r in rs:
            assert r.start_pos + r.n_tokens - 1 <= n
            covered.update(range(r.start_pos, r.start_pos + r.n_tokens))
        assert covered == set(range(1, n + 1)), n  # no token left behind
        idxs = sorted(r.chunk_idx for r in rs)
        assert idxs == list(range(len(rs)))  # dense numbering


def _brute_force_spans(rows, min_tokens):
    """Position-level reference (the pre-r13 formulation): mark every
    token position covered by a corpus-duplicated L-gram, merge
    consecutive positions."""
    from collections import Counter

    grams = Counter()
    per_doc = {}
    for doc_id, text in rows:
        w = text.split(" ")
        per_doc[doc_id] = w
        for i in range(len(w) - min_tokens + 1):
            grams[" ".join(w[i : i + min_tokens])] += 1
    out = []
    for doc_id, w in per_doc.items():
        covered = set()
        for i in range(len(w) - min_tokens + 1):
            if grams[" ".join(w[i : i + min_tokens])] >= 2:
                covered.update(range(i + 1, i + min_tokens + 1))
        for j in sorted(covered):
            if j - 1 in covered:
                out[-1] = (doc_id, out[-1][1], j, out[-1][3] + 1)
            else:
                out.append((doc_id, j, j, 1))
    return sorted(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_interval_merge_matches_position_reference(spark, seed):
    """Randomized corpora over a tiny alphabet (dense duplication,
    plenty of exactly-adjacent and overlapping intervals): the r13
    interval-merge formulation must equal the per-position reference
    it replaced."""
    import random

    rng = random.Random(seed)
    rows = [
        (d, " ".join(rng.choice("abc") for _ in range(rng.randint(1, 30))))
        for d in range(12)
    ]
    got = _spans(spark, rows, min_tokens=3)
    assert got == _brute_force_spans(rows, min_tokens=3)


def test_exactly_adjacent_intervals_merge(spark):
    """Two duplicated grams whose intervals touch end-to-end with no
    overlap ([1,3] then [4,6]) form ONE span — the s <= max_end + 1
    boundary case of the interval merge."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c zz1 zz2 zz3"),
        (3, "yy1 yy2 yy3 d e f"),
    ]
    got = _spans(spark, rows, min_tokens=3)
    assert (1, 1, 6, 6) in got
    assert (2, 1, 3, 3) in got and (3, 4, 6, 3) in got
