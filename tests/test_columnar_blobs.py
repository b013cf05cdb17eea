"""Parquet/ORC blob probing: metadata + value-sum pinned against
pyarrow-built fixtures, the error contract, and composition with the
archive envelope (zip-of-parquet)."""

from __future__ import annotations

import io
import zipfile

import pyarrow as pa
import pyarrow.orc as orc
import pyarrow.parquet as pq
import pytest

from flink_hiveorc_spark.functions.columnar import (
    columnar_blob_stats,
    probe_columnar_blob,
)


def _pq_blob(table, **kw) -> bytes:
    b = io.BytesIO()
    pq.write_table(table, b, **kw)
    return b.getvalue()


def _orc_blob(table) -> bytes:
    b = io.BytesIO()
    orc.write_table(table, b)
    return b.getvalue()


def test_parquet_probe_metadata_and_sum():
    t = pa.table(
        {
            "name": ["a", "b", "c", "d"],
            "qty": pa.array([10, 20, 30, 40], pa.int64()),
            "price": pa.array([1.5, 2.5, 3.5, 4.5]),
        }
    )
    got = probe_columnar_blob(_pq_blob(t, row_group_size=2))
    assert got == {
        "fmt": "parquet",
        "n_rows": 4,
        "n_cols": 3,
        "n_groups": 2,  # row_group_size=2 over 4 rows
        "col_names": "name,qty,price",
        "sum_first_int": 100,  # first int64 column is qty
    }


def test_orc_probe_metadata_and_sum():
    t = pa.table({"v": pa.array([7, 8], pa.int64()), "s": ["x", "y"]})
    got = probe_columnar_blob(_orc_blob(t))
    assert got["fmt"] == "orc" and got["n_rows"] == 2
    assert got["n_groups"] == 1 and got["col_names"] == "v,s"
    assert got["sum_first_int"] == 15


def test_no_int64_column_yields_null_sum():
    t = pa.table({"s": ["only", "strings"]})
    got = probe_columnar_blob(_pq_blob(t))
    assert got["sum_first_int"] is None and got["n_cols"] == 1


def test_error_contract():
    with pytest.raises(ValueError, match="not a columnar blob"):
        probe_columnar_blob(b"CSV,is,not,columnar")
    # PAR1 magic with garbage body is malformed, not a crash
    with pytest.raises(ValueError, match="malformed parquet"):
        probe_columnar_blob(b"PAR1" + b"\x00" * 64 + b"PAR1")
    with pytest.raises(ValueError, match="malformed ORC"):
        probe_columnar_blob(b"ORC" + b"\x01\x02\x03\x04\x05")
    # declared-row bomb guard (header read only, no value decode)
    import flink_hiveorc_spark.functions.columnar as C

    t = pa.table({"v": pa.array(range(100), pa.int64())})
    blob = _pq_blob(t)
    orig = C.MAX_BLOB_ROWS
    try:
        C.MAX_BLOB_ROWS = 10
        with pytest.raises(ValueError, match="bomb guard"):
            probe_columnar_blob(blob)
    finally:
        C.MAX_BLOB_ROWS = orig


def test_operator_quarantine_and_fanin(spark):
    t = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    rows = columnar_blob_stats(
        spark.createDataFrame(
            [
                (1, bytearray(_pq_blob(t))),
                (2, bytearray(_orc_blob(t))),
                (3, b"not columnar"),
            ],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[1].fmt == "parquet" and by_doc[1].sum_first_int == 6
    assert by_doc[2].fmt == "orc" and by_doc[2].n_rows == 3
    assert by_doc[3].fmt is None and by_doc[3].error.startswith("malformed")


def test_zip_of_parquet_composes_with_archive_members(spark):
    """The data-lake drop shape: a zip containing parquet shards flows
    archive_members → columnar_blob_stats."""
    from flink_hiveorc_spark.functions.archive import archive_members

    t1 = pa.table({"v": pa.array([5, 5], pa.int64())})
    t2 = pa.table({"v": pa.array([9], pa.int64())})
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("part-0.parquet", _pq_blob(t1))
        zf.writestr("part-1.parquet", _pq_blob(t2))
    members = archive_members(
        spark.createDataFrame(
            [(7, bytearray(buf.getvalue()))], "doc_id long, payload binary"
        )
    )
    out = columnar_blob_stats(
        members.selectExpr("member_idx AS doc_id", "content AS payload")
    ).collect()
    sums = {r.doc_id: r.sum_first_int for r in out}
    assert sums == {0: 10, 1: 9}
