"""Empty-corpus robustness: every registered query must execute (and
return zero-or-more rows) against a corpus whose tables have the right
schemas but ZERO rows.

This is the degenerate case every 100 TB pipeline eventually hits — a
new partition, a fully-filtered source, a table created-but-not-yet-
loaded — and it flushes out empty-input bugs the oracle corpus can't:
schema inference with no data files, division/avg on empty aggregates,
sequence()/explode on absent bounds, max_by over nothing.
"""

from __future__ import annotations

import os

import pytest

from flink_hiveorc_spark.registry import QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_corpus"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.limit(0).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_corpus(spark, empty_dir, name):
    n = QUERIES[name](spark, empty_dir).count()
    assert n >= 0
