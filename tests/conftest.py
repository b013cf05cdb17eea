"""Shared Spark fixture: one small local session for the whole run
(Spark startup is ~8s; per-test sessions would dominate runtime)."""

from __future__ import annotations

import tempfile

import pytest

from flink_hiveorc_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # Warehouse in a tmp dir so saveAsTable tests never write into the
    # repo checkout.
    wh = tempfile.mkdtemp(prefix="spark_graft_wh_")
    s = get_spark("pytest", cpus=8, shuffle_partitions=8, warehouse_dir=wh)
    yield s
    ckpt = s.sparkContext.getCheckpointDir()
    s.stop()
    import shutil

    shutil.rmtree(wh, ignore_errors=True)
    if ckpt and ckpt.replace("file:", "").startswith(tempfile.gettempdir()):
        shutil.rmtree(ckpt.replace("file:", ""), ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
