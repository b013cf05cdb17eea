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
    length_token: bytes | None = None,
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
        b"4 0 obj\n<< /Length "
        + (length_token if length_token is not None
           else str(len(body)).encode())
        + filt + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
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


def test_hex_strings_show_like_literals():
    got = parse_pdf(_pdf(b"BT <48656C 6C6F> Tj (lit) Tj <414> Tj ET"))
    # whitespace skipped inside; odd digit count pads a trailing 0
    assert got["pdf_text"] == "Hello lit A@"
    with pytest.raises(ValueError, match="non-hex byte"):
        parse_pdf(_pdf(b"BT <48ZZ> Tj ET"))
    with pytest.raises(ValueError, match="unterminated PDF hex"):
        parse_pdf(_pdf(b"BT <4865"))  # runs off the stream end


def test_shown_text_containing_et_and_tj_tokens():
    # regression (r14, found by the throughput probe's random text):
    # 'ET' / 'Tj' BYTES inside a string literal must not terminate
    # the BT block or flush pending strings — the old scan used a
    # raw find(b"ET") and misclassified such PDFs as malformed
    got = parse_pdf(_pdf(b"BT (MARKET Tj ET trap) Tj (tail) Tj ET"))
    assert got["pdf_text"] == "MARKET Tj ET trap tail"


def test_marked_content_property_dict_inside_bt():
    # regression (r14 advice): tagged PDFs from Word/LibreOffice emit
    # '/P <</MCID 0>> BDC' INSIDE BT blocks — the '<<' is a property
    # dict operand, not a hex-string opener, and must be skipped, not
    # raise 'non-hex byte' / misclassify the document as malformed
    got = parse_pdf(
        _pdf(b"BT /P <</MCID 0>> BDC /F1 12 Tf (tagged text) Tj EMC ET")
    )
    assert got["pdf_text"] == "tagged text"
    # nested dicts + strings/hex-strings inside the dict stay inert
    got = parse_pdf(
        _pdf(
            b"BT /Span <</ActualText (alt (ET) text) /E <4554> "
            b"/Nest <</K 1>> >> BDC (shown) Tj EMC ET"
        )
    )
    assert got["pdf_text"] == "shown"
    with pytest.raises(ValueError, match="unterminated PDF dict"):
        parse_pdf(_pdf(b"BT /P <</MCID 0"))


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
    # a filter we do not own gates as unsupported (Crypt needs the
    # security handler); image-codec filters are opaque-skipped below
    with pytest.raises(NotImplementedError, match="Crypt"):
        parse_pdf(_pdf(b"stub", filter_name=b"Crypt"))
    # a DCTDecode (JPEG XObject) stream is counted, never text, and
    # never fails the document
    got_img = parse_pdf(_pdf(b"\xff\xd8 jpeg bytes", filter_name=b"DCTDecode"))
    assert got_img["n_streams"] == 1 and got_img["pdf_text"] == ""
    # an xref-STREAM object with no stream data is malformed (the
    # r13 gate is gone — xref streams parse for real now)
    xs = good.replace(b"xref\n0 6\n", b"7 0 obj\n<< /Type /XRef >>\n")
    sx = xs.rindex(b"startxref\n")
    off = xs.index(b"7 0 obj")
    xs = xs[:sx] + b"startxref\n" + str(off).encode() + b"\n%%EOF\n"
    with pytest.raises(ValueError, match="stream keyword"):
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


def test_xref_stream_objstm_full_parse():
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    got = parse_pdf(_build_pdf15(b"BT (modern pdf) Tj (text) Tj ET"))
    # 4 ObjStm members + content(4) + ObjStm(6) + XRef(7)
    assert got["n_objects"] == 7 and got["n_pages"] == 1
    assert got["n_streams"] == 3
    assert got["pdf_text"] == "modern pdf text"
    # predictor 1 (no predictor) variant
    got1 = parse_pdf(_build_pdf15(b"BT (raw rows) Tj ET", predictor=1))
    assert got1["n_objects"] == 7 and got1["pdf_text"] == "raw rows"


def test_xref_stream_prev_chain_incremental_update():
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    base = _build_pdf15(b"BT (original) Tj ET")
    old_startxref = base.rindex(b"startxref\n")
    old_off = int(base[old_startxref + 10 :].split()[0])
    body = b"BT (appended) Tj ET"
    o8 = (
        b"8 0 obj\n<< /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
    )
    off8 = old_startxref  # append over the old trailer tail
    doc = base[:old_startxref] + o8
    off9 = len(doc)
    rows = [(1, off8, 0), (1, off9, 0)]
    raw = b"".join(
        t.to_bytes(1, "big") + a.to_bytes(4, "big") + g.to_bytes(2, "big")
        for t, a, g in rows
    )
    o9 = (
        b"9 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] /Index [8 2] "
        b"/Root 1 0 R /Prev " + str(old_off).encode()
        + b" /Length " + str(len(raw)).encode()
        + b" >>\nstream\n" + raw + b"\nendstream\nendobj\n"
    )
    doc += o9 + b"startxref\n" + str(off9).encode() + b"\n%%EOF\n"
    got = parse_pdf(doc)
    # 7 from the base section + objects 8 and 9 from the update
    assert got["n_objects"] == 9
    assert got["n_streams"] == 5  # content+objstm+xref (base) + o8 + o9
    assert got["pdf_text"] == "original appended"


def test_xref_stream_verification_error_contract():
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    good = _build_pdf15(b"BT (verify me) Tj ET")
    # 1. lying type-1 offset: bump object 4's offset inside the
    #    PNG-filtered Flate data is hard to do surgically, so lie at
    #    the STARTXREF level instead: point it at object 4 (a non-XRef
    #    stream object)
    sx = good.rindex(b"startxref\n")
    off4 = good.index(b"4 0 obj")
    bad = good[:sx] + b"startxref\n" + str(off4).encode() + b"\n%%EOF\n"
    with pytest.raises(ValueError, match="not /Type /XRef"):
        parse_pdf(bad)
    # 2. ObjStm member disagreement: renumber the first member in the
    #    ObjStm header (1 -> 99) so the xref's type-2 claim fails
    import re as _re
    import zlib

    m = _re.search(rb"6 0 obj\n<< /Type /ObjStm /N 4 /First (\d+) /Length (\d+)", good)
    first, ln = int(m.group(1)), int(m.group(2))
    stm_start = good.index(b"stream\n", m.start()) + 7
    data = zlib.decompress(good[stm_start : stm_start + ln])
    assert data.startswith(b"1 0")
    tampered = b"9 9" + data[3:]
    tz = zlib.compress(tampered, 6)
    # only safe if recompression size matches (same length keeps all
    # downstream offsets valid); pad via a no-op if needed
    if len(tz) != ln:
        pytest.skip("recompressed ObjStm size differs; offsets would shift")
    bad2 = good[:stm_start] + tz + good[stm_start + ln :]
    with pytest.raises(ValueError, match="ObjStm header disagrees"):
        parse_pdf(bad2)


def test_xref_stream_w_and_index_validation():
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    good = _build_pdf15(b"BT (w check) Tj ET")
    bad = good.replace(b"/W [1 4 2]", b"/W [1 4 3]")
    with pytest.raises(ValueError, match="row width|Index disagrees"):
        parse_pdf(bad)


def test_xref_stream_zero_width_w_fields():
    # regression (r14 advice): /W [1 0 2] stored field 2 as None and
    # the type-1 verification then sliced payload[None:...] →
    # TypeError, escaping the (ValueError, NotImplementedError) DLQ
    # contract. Field 2 has no spec default — reject it as malformed.
    from flink_hiveorc_spark.functions.pdf import (
        _build_pdf15,
        _parse_xref_stream_chain,
    )

    good = _build_pdf15(b"BT (zero w) Tj ET")
    bad = good.replace(b"/W [1 4 2]", b"/W [1 0 2]")
    with pytest.raises(ValueError, match="field 2 has zero width"):
        parse_pdf(bad)
    # zero-width field 3 takes the §7.5.8.2 default 0, not None
    import zlib as _z

    raw = bytes([1]) + (9).to_bytes(4, "big")  # one type-1 row, no f3
    z = _z.compress(raw, 6)
    obj = (
        b"8 0 obj\n<< /Type /XRef /Size 5 /Index [4 1] /W [1 4 0] "
        b"/Root 1 0 R /Length " + str(len(z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + z
        + b"\nendstream\nendobj\n"
    )
    entries, trailer = _parse_xref_stream_chain(obj, 0)
    assert entries[4] == (1, 9, 0)


def test_indirect_length_resolves():
    from flink_hiveorc_spark.functions.pdf import _build_classic_filtered

    # `/Length 6 0 R` resolves through the integer object the real
    # writers emit AFTER the stream — and must not misparse as
    # Length=6
    content = b"BT (indirect length body) Tj ET"
    blob = _build_classic_filtered(
        zlib.compress(content, 6), b"/FlateDecode", indirect_length=True
    )
    assert b"/Length 6 0 R" in blob
    got = parse_pdf(blob)
    assert got["pdf_text"] == "indirect length body"
    assert got["n_objects"] == 6  # the length object is in the xref
    # a dangling reference is malformed, not a silent misparse
    bad = _pdf(b"BT (y) Tj ET", length_token=b"8 0 R")
    with pytest.raises(ValueError, match="does not resolve"):
        parse_pdf(bad)


def test_tiff_predictor_roundtrip():
    from flink_hiveorc_spark.functions.pdf import _apply_predictor

    raw = bytes(range(28))  # 4 rows x 7 cols
    diff = b""
    for r in range(4):
        row = raw[r * 7 : r * 7 + 7]
        diff += bytes([row[0]] + [(row[i] - row[i - 1]) % 256 for i in range(1, 7)])
    assert _apply_predictor(diff, 2, 7, 1, 8) == raw
    assert _apply_predictor(raw, 1, 7, 1, 8) == raw
    with pytest.raises(NotImplementedError, match="Predictor 3"):
        _apply_predictor(raw, 3, 7, 1, 8)


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


def test_fuzz_byte_flips_modern_shape_stay_classified():
    # the real-world shape: xref STREAM + ObjStm + PNG predictor —
    # bit flips land in binary xref rows, Flate data, and the ObjStm
    # header, and every one must classify (never crash, never hang)
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    rng = np.random.default_rng(46)
    good = _build_pdf15(b"BT (modern fuzz target) Tj ET")
    for _ in range(300):
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


# --------------------------------------- §7.4 transform filter codecs


def test_ascii_hex_and_85_and_rle_decoders():
    from flink_hiveorc_spark.functions.pdf import (
        _ascii_hex_decode,
        _ascii85_decode,
        _run_length_decode,
    )
    import base64

    assert _ascii_hex_decode(b"48 65 6C\n6c 6F>") == b"Hello"
    assert _ascii_hex_decode(b"487>") == b"Hp"   # odd digit pads 0
    with pytest.raises(ValueError, match="EOD"):
        _ascii_hex_decode(b"4848")
    with pytest.raises(ValueError, match="non-hex"):
        _ascii_hex_decode(b"4X>")

    data = b"Man is distinguished, not only by his reason \x00\xff"
    assert _ascii85_decode(base64.a85encode(data) + b"~>") == data
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(base64.a85encode(b"ab") + b"~>") == b"ab"
    with pytest.raises(ValueError, match="EOD"):
        _ascii85_decode(b"abcd")
    with pytest.raises(ValueError, match="z inside"):
        _ascii85_decode(b"!z~>")

    assert _run_length_decode(b"\x02abc\xfeX\x80") == b"abc" + b"X" * 3
    with pytest.raises(ValueError, match="EOD"):
        _run_length_decode(b"\x02abc")


def test_lzw_differential_roundtrip():
    """PDF-LZW decode vs an INDEPENDENT in-test encoder (greedy
    dictionary, MSB-first, EarlyChange=1) over random inputs — and
    the product encoder twin must agree with the in-test one."""
    import random

    from flink_hiveorc_spark.functions.pdf import _lzw_decode, _lzw_encode

    def ref_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        bits = []

        def emit(code):
            bits.append(format(code, f"0{width}b"))

        emit(256)
        w = b""
        for ch in data:
            c = bytes([ch])
            if w + c in table:
                w += c
                continue
            emit(table[w])
            if nxt < 4096:
                table[w + c] = nxt
                nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
            w = c
        if w:
            emit(table[w])
            # the decoder's phantom entry before EOD (r15 regression)
            if nxt < 4096:
                nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        emit(257)
        s = "".join(bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    rng = random.Random(1513)
    for trial in range(40):
        data = bytes(
            rng.choice(b"abcdab\x00\xff") for _ in range(rng.randint(0, 3000))
        )
        enc = ref_encode(data)
        assert _lzw_decode(enc) == data, trial
        assert _lzw_encode(data) == enc, trial
    with pytest.raises(ValueError, match="EOD"):
        _lzw_decode(b"")


def test_filtered_stream_chains_in_parse_pdf():
    import base64

    from flink_hiveorc_spark.functions.pdf import (
        _build_classic_filtered,
        _lzw_encode,
        _rle_encode,
    )

    content = b"BT /F1 12 Tf (chained filters) Tj ET"
    a85 = _build_classic_filtered(
        base64.a85encode(zlib.compress(content, 6)) + b"~>",
        b"[/ASCII85Decode /FlateDecode]",
    )
    got = parse_pdf(a85)
    assert got["pdf_text"] == "chained filters"
    assert got["n_objects"] == 5 and got["n_streams"] == 1

    hexed = _rle_encode(_lzw_encode(content)).hex().upper().encode() + b">"
    deep = _build_classic_filtered(
        hexed, b"[/ASCIIHexDecode /RunLengthDecode /LZWDecode]"
    )
    got2 = parse_pdf(deep)
    assert got2["pdf_text"] == "chained filters"
    # single LZW with abbreviated name
    lzw_only = _build_classic_filtered(_lzw_encode(content), b"/LZWDecode")
    assert parse_pdf(lzw_only)["pdf_text"] == "chained filters"


def test_lzw_early_change_zero():
    """/EarlyChange 0 delays each width growth by one code: encode
    with a late-schedule in-test encoder and check both settings
    disagree past the 9-bit boundary."""
    from flink_hiveorc_spark.functions.pdf import _lzw_decode

    def late_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt, width = 258, 9
        bits = []

        def emit(code):
            bits.append(format(code, f"0{width}b"))

        emit(256)
        w = b""
        for ch in data:
            c = bytes([ch])
            if w + c in table:
                w += c
                continue
            emit(table[w])
            if nxt < 4096:
                table[w + c] = nxt
                nxt += 1
            if nxt == (1 << width) + 1 and width < 12:  # LATE schedule
                width += 1
            w = c
        if w:
            emit(table[w])
            if nxt < 4096:
                nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        emit(257)
        s = "".join(bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))

    import random

    rng = random.Random(77)
    data = bytes(rng.choice(b"abcd") for _ in range(4000))
    enc = late_encode(data)
    assert _lzw_decode(enc, early_change=0) == data
    with pytest.raises(ValueError):
        _lzw_decode(enc, early_change=1)


def test_encrypted_pdf_classifies_as_unsupported():
    good = _pdf(b"BT (secret) Tj ET")
    enc = good.replace(
        b"trailer\n<< /Size 6 /Root 1 0 R >>",
        b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 9 0 R >>",
    )
    assert enc != good
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf(enc)
    # modern shape: /Encrypt in the xref-stream trailer dict
    from flink_hiveorc_spark.functions.pdf import _build_pdf15

    modern = _build_pdf15(b"BT (m) Tj ET")
    enc2 = modern.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_pdf(enc2)


def test_content_stream_predictor_gates():
    content = zlib.compress(b"BT (p) Tj ET", 6)
    pred = _pdf(
        content,
        filter_name=(
            b"FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>"
        ),
    )
    with pytest.raises(NotImplementedError, match="Predictor"):
        parse_pdf(pred)


def test_lzw_eod_width_boundary_regression():
    """r15 regression (found by the sf0.1 cross-scale oracle): when
    the FINAL data code lands the decoder's table size exactly on
    2^width - 1, the decoder widens before reading EOD — the encoder
    must account for that phantom entry or the EOD is one bit
    narrow. Sweep input lengths across the 511 boundary with
    distinct-byte content (every emit is a fresh code)."""
    from flink_hiveorc_spark.functions.pdf import _lzw_decode, _lzw_encode

    for length in range(240, 280):
        data = bytes((i * 7) % 251 for i in range(length))
        assert _lzw_decode(_lzw_encode(data)) == data, length
