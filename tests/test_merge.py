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
