"""merge_into (operators/merge.py): ANSI MERGE semantics over frames."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_hiveorc_spark.operators.merge import merge_into


def _target(spark):
    return spark.createDataFrame(
        [Row(k=1, v=10, tag="a"), Row(k=2, v=20, tag="b"), Row(k=3, v=30, tag="c")]
    )


def test_merge_all_three_clauses(spark):
    src = spark.createDataFrame(
        [
            Row(k=1, delta=5, kill=False),   # matched -> update
            Row(k=2, delta=0, kill=True),    # matched -> delete
            Row(k=9, delta=99, kill=False),  # unmatched -> insert
        ]
    )
    out = merge_into(
        _target(spark),
        src,
        on="k",
        when_matched_delete=F.col("s_kill"),
        when_matched_update={"v": F.col("v") + F.col("s_delta")},
        when_not_matched_insert={"v": F.col("s_delta"), "tag": F.lit("new")},
    )
    rows = {r.k: (r.v, r.tag) for r in out.collect()}
    assert rows == {1: (15, "a"), 3: (30, "c"), 9: (99, "new")}
    assert out.columns == ["k", "v", "tag"]


def test_merge_without_insert_discards_unmatched_source(spark):
    src = spark.createDataFrame([Row(k=1, delta=1), Row(k=9, delta=9)])
    out = merge_into(
        _target(spark), src, on="k",
        when_matched_update={"v": F.col("v") + F.col("s_delta")},
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 11, 2: 20, 3: 30}


def test_merge_delete_only(spark):
    src = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=3)])
    out = merge_into(
        _target(spark), src, on="k", when_matched_delete=F.lit(True)
    )
    assert out.count() == 0


def test_merge_duplicate_source_key_raises(spark):
    src = spark.createDataFrame([Row(k=1, delta=1), Row(k=1, delta=2)])
    with pytest.raises(ValueError, match="duplicate key"):
        merge_into(
            _target(spark), src, on="k",
            when_matched_update={"v": F.col("s_delta")},
        )


def test_merge_null_delete_predicate_keeps_row(spark):
    """ANSI: a NULL (UNKNOWN) delete condition does not fire the
    clause — the matched row falls through to UPDATE instead of being
    silently dropped (r3 ADVICE, medium)."""
    src = spark.createDataFrame(
        [
            Row(k=1, delta=5, kill=None),    # NULL predicate -> update, not delete
            Row(k=2, delta=7, kill=False),   # FALSE -> update
            Row(k=3, delta=0, kill=True),    # TRUE -> delete
        ]
    )
    out = merge_into(
        _target(spark),
        src,
        on="k",
        when_matched_delete=F.col("s_kill"),
        when_matched_update={"v": F.col("v") + F.col("s_delta")},
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 15, 2: 27}


def test_merge_source_prefix_collision_raises(spark):
    """A target column literally named s_<x> while the source has <x>
    must raise instead of binding ambiguously (r3 ADVICE)."""
    tgt = spark.createDataFrame([Row(k=1, s_v=10, v=1)])
    src = spark.createDataFrame([Row(k=1, v=99)])
    with pytest.raises(ValueError, match="collides"):
        merge_into(tgt, src, on="k", when_matched_update={"v": F.col("s_v")})


def test_merge_skip_duplicate_guard(spark):
    """check_duplicate_source=False skips the guard job; semantics
    unchanged for a unique-key source."""
    src = spark.createDataFrame([Row(k=1, delta=1)])
    out = merge_into(
        _target(spark),
        src,
        on="k",
        when_matched_update={"v": F.col("v") + F.col("s_delta")},
        check_duplicate_source=False,
    )
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 11, 2: 20, 3: 30}


def test_merge_composite_key_and_broadcast(spark):
    tgt = spark.createDataFrame(
        [Row(k1=1, k2="x", v=1), Row(k1=1, k2="y", v=2)]
    )
    src = spark.createDataFrame([Row(k1=1, k2="x", nv=100), Row(k1=2, k2="z", nv=200)])
    out = merge_into(
        tgt,
        src,
        on=["k1", "k2"],
        when_matched_update={"v": F.col("s_nv")},
        when_not_matched_insert={"v": F.col("s_nv")},
        broadcast_source=True,
    )
    rows = {(r.k1, r.k2): r.v for r in out.collect()}
    assert rows == {(1, "x"): 100, (1, "y"): 2, (2, "z"): 200}
