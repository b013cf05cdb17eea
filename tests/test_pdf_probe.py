"""PDF structural probe + simple-text extraction: string escapes,
TJ arrays, Flate streams, xref offset verification, the honest gates
(xref streams, non-Flate filters), bomb guards, fuzz, quarantine."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from flink_hiveorc_spark.functions.pdf import parse_pdf, pdf_stats


def _pdf(
    stream: bytes,
    filter_flate: bool = False,
    pages: int = 1,
    filter_name: bytes | None = None,
) -> bytes:
    head = b"%PDF-1.4\n"
    body = stream
    filt = b" /Filter /FlateDecode" if filter_flate else b""
    if filter_flate:
        body = zlib.compress(stream, 6)
    if filter_name is not None:
        filt = b" /Filter /" + filter_name
    kids = b" ".join(b"3 0 R" for _ in range(pages))
    o1 = b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    o2 = (
        b"2 0 obj\n<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(pages).encode() + b" >>\nendobj\n"
    )
    o3 = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"
        b"endobj\n"
    )
    o4 = (
        b"4 0 obj\n<< /Length " + str(len(body)).encode() + filt
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )
    o5 = (
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        b"endobj\n"
    )
    offs = [len(head)]
    for o in (o1, o2, o3, o4):
        offs.append(offs[-1] + len(o))
    xref_off = offs[4] + len(o5)
    xref = b"xref\n0 6\n0000000000 65535 f \n" + b"".join(
        b"%010d 00000 n \n" % o for o in offs
    )
    tr = (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
        + str(xref_off).encode() + b"\n%%EOF\n"
    )
    return head + o1 + o2 + o3 + o4 + o5 + xref + tr


def test_basic_structure_and_text():
    got = parse_pdf(_pdf(b"BT /F1 12 Tf (Hello) Tj (World) Tj ET"))
    assert got["n_objects"] == 5 and got["n_pages"] == 1
    assert got["n_streams"] == 1
    assert got["pdf_text"] == "Hello World"


def test_string_escapes_and_tj_array():
    s = (
        rb"BT [(a\(b\)) (c\\d)] TJ 0 -14 Td (tab\there \101\102) Tj ET"
    )
    got = parse_pdf(_pdf(s))
    assert got["pdf_text"] == "a(b) c\\d tab\there AB"


def test_nested_parens_unescaped():
    got = parse_pdf(_pdf(b"BT (outer (inner) tail) Tj ET"))
    assert got["pdf_text"] == "outer (inner) tail"


def test_flate_stream_decodes():
    got = parse_pdf(_pdf(b"BT (compressed body) Tj ET", filter_flate=True))
    assert got["pdf_text"] == "compressed body"
    assert got["n_streams"] == 1


def test_stream_body_lookalike_not_rescanned():
    # regression (r13 advice): stream BODY bytes containing a
    # '<<..>> stream\n' lookalike must not be rescanned — the old
    # scan advanced only past the keyword and would count the fake
    # (inflating n_streams) or trip its bogus /Length bomb guard
    body = b"BT (clean) Tj ET << /Length 99999999 >>\nstream\nX"
    got = parse_pdf(_pdf(body))
    assert got["n_streams"] == 1
    assert got["pdf_text"] == "clean"
    # a lookalike WITHOUT /Length used to raise 'lacks a literal
    # /Length' on a valid PDF
    body2 = b"BT (ok) Tj ET << /Type /Fake >>\nstream\nY"
    got2 = parse_pdf(_pdf(body2))
    assert got2["n_streams"] == 1 and got2["pdf_text"] == "ok"


def test_xref_offset_verification_catches_lies():
    good = _pdf(b"BT (x) Tj ET")
    # corrupt object 3's xref offset by one
    bad = good.replace(b" 00000 n \n", b" 00000 n \n", 1)
    i = good.index(b"xref\n")
    entry_start = good.index(b"0000000000 65535 f \n", i) + 20
    # bump the first in-use entry's offset by 1
    off = int(good[entry_start : entry_start + 10])
    bad = (
        good[:entry_start]
        + b"%010d" % (off + 1)
        + good[entry_start + 10 :]
    )
    with pytest.raises(ValueError, match="not its header"):
        parse_pdf(bad)


def test_honest_gates_and_errors():
    good = _pdf(b"BT (y) Tj ET")
    with pytest.raises(ValueError, match="not a PDF"):
        parse_pdf(b"PK\x03\x04 not a pdf")
    with pytest.raises(ValueError, match="%%EOF"):
        parse_pdf(good[:-8])
    # a filter we do not own gates as unsupported
    with pytest.raises(NotImplementedError, match="FlateDecode"):
        parse_pdf(_pdf(b"stub", filter_name=b"DCTDecode"))
    # xref STREAM (PDF 1.5) gates as unsupported, not corrupt
    xs = good.replace(b"xref\n0 6\n", b"7 0 obj\n<< /Type /XRef >>\n")
    sx = xs.rindex(b"startxref\n")
    off = xs.index(b"7 0 obj")
    xs = xs[:sx] + b"startxref\n" + str(off).encode() + b"\n%%EOF\n"
    with pytest.raises(NotImplementedError, match="cross-reference STREAM"):
        parse_pdf(xs)
    # stream length bomb guard
    import flink_hiveorc_spark.functions.pdf as P

    orig = P.MAX_PDF_STREAM_BYTES
    try:
        P.MAX_PDF_STREAM_BYTES = 8
        with pytest.raises(ValueError, match="bomb guard"):
            parse_pdf(good)
    finally:
        P.MAX_PDF_STREAM_BYTES = orig


def test_fuzz_byte_flips_stay_classified():
    rng = np.random.default_rng(45)
    good = _pdf(b"BT (fuzz target text) Tj ET", filter_flate=True)
    for _ in range(200):
        b = bytearray(good)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            parse_pdf(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_spark_operator_quarantine(spark):
    rows = pdf_stats(
        spark.createDataFrame(
            [
                (1, bytearray(_pdf(b"BT (spark side) Tj ET"))),
                (2, b"%PDF-1.4 truncated garbage"),
            ],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert by_doc[1].pdf_text == "spark side" and by_doc[1].n_pages == 1
    assert by_doc[2].pdf_text is None and by_doc[2].error.startswith(
        "malformed"
    )


def test_pdf_budget_matches_decompress_budget():
    from flink_hiveorc_spark.functions import pdf
    from flink_hiveorc_spark.functions.multimodal import (
        MAX_DECOMPRESSED_BYTES,
    )

    assert pdf.MAX_PDF_STREAM_BYTES == MAX_DECOMPRESSED_BYTES
