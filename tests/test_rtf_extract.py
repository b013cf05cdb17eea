"""RTF text extraction: group/state machinery, escapes (\\'xx, \\uN
with \\uc fallbacks), destination skipping, \\bin runs, the honest
gates, fuzz, and the Spark DLQ path."""

from __future__ import annotations

import pytest

from flink_hiveorc_spark.functions.rtf import (
    build_rtf,
    parse_rtf,
    rtf_stats,
    rtf_text,
)


def test_roundtrip_and_escapes():
    t, n = rtf_text(build_rtf(["Doc café 中", "second ¶ßü"]))
    assert t == "Doc café 中\nsecond ¶ßü"
    assert n == 2
    t2, _ = rtf_text(build_rtf(["a{b}c\\d"]))
    assert t2 == "a{b}c\\d"


def test_destinations_do_not_leak():
    # font table, color table, info, ignorable {\*\...}: none of it
    # is document text
    raw = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}{\\f1 Times New Roman;}}"
        b"{\\colortbl ;\\red255\\green0\\blue0;}"
        b"{\\info{\\title Secret Title}{\\author Someone}}"
        b"{\\*\\unknowndest with text inside}"
        b"\\f1\\fs20 visible\\par}"
    )
    t, n = rtf_text(raw)
    assert t == "visible" and n == 1
    for leak in ("Arial", "Times", "Secret", "Someone", "inside"):
        assert leak not in t


def test_unicode_fallback_skipping():
    # \uc1: one fallback char after \uN is skipped
    assert rtf_text(b"{\\rtf1\\uc1 \\u20013?x\\par}")[0] == "中x"
    # \uc2 skips two; scoped per group
    assert rtf_text(b"{\\rtf1\\uc2 \\u20013 aZtail\\par}")[0] == "中tail"
    assert (
        rtf_text(b"{\\rtf1\\uc1 {\\uc2 \\u20013 ab}\\u233?e\\par}")[0]
        == "中ée"
    )
    # negative codepoints wrap mod 2^16 (the spec's signed 16-bit)
    assert rtf_text(b"{\\rtf1 \\u-24643?\\par}")[0] == chr(-24643 + 65536)
    # \'hex escape and the fallback interplay
    assert rtf_text(b"{\\rtf1\\uc1 \\u20013\\'3fz\\par}")[0] == "中z"


def test_par_line_tab_and_bin():
    t, n = rtf_text(b"{\\rtf1 a\\line b\\tab c\\par d\\par}")
    assert t == "a\nb\tc\nd" and n == 2
    # \binN swallows raw bytes (even braces)
    t2, _ = rtf_text(b"{\\rtf1 x\\bin5 }}{{\\y\\par}")
    assert t2.startswith("x")
    assert "y" in t2 or t2 == "x"


def test_gates_and_errors():
    with pytest.raises(ValueError, match="not an RTF"):
        rtf_text(b"plain text")
    with pytest.raises(NotImplementedError, match="version"):
        rtf_text(b"{\\rtf2 x}")
    with pytest.raises(NotImplementedError, match="codepage"):
        rtf_text(b"{\\rtf1\\ansicpg932 x}")
    with pytest.raises(ValueError, match="unclosed"):
        rtf_text(b"{\\rtf1 {x}")
    with pytest.raises(ValueError, match="underflow"):
        rtf_text(b"{\\rtf1 x}}")
    with pytest.raises(ValueError, match="hex"):
        rtf_text(b"{\\rtf1 \\'zq}")
    with pytest.raises(ValueError, match="overruns"):
        rtf_text(b"{\\rtf1 \\bin999 x}")
    with pytest.raises(ValueError, match="nest"):
        rtf_text(b"{\\rtf1 " + b"{" * 200 + b"}" * 200 + b"}")


def test_fuzz_contract():
    import random

    rng = random.Random(1516)
    base = build_rtf(["fuzz target text", "second paragraph café"])
    for _ in range(200):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            rtf_text(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(0, len(base), 7):
        try:
            rtf_text(base[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_spark_dlq_path(spark):
    rows = [
        (1, bytearray(build_rtf(["good rtf"]))),
        (2, bytearray(b"{\\rtf1 broken")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in rtf_stats(df, quarantine=True).collect()}
    assert got[1]["rtf_text"] == "good rtf" and got[1]["error"] is None
    assert got[2]["rtf_text"] is None
    assert got[2]["error"].startswith("malformed")
    with pytest.raises(Exception):
        rtf_stats(df, quarantine=False).collect()
