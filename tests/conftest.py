"""Shared Spark fixture: one small local session for the whole run
(Spark startup is ~8s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import pytest

from flink_hiveorc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
