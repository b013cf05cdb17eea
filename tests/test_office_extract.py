"""OOXML (docx/xlsx) text extraction: paragraph/run concatenation,
all four cell-type routings, multi-sheet ordering, namespace
independence, the error contract, fuzz, and quarantine."""

from __future__ import annotations

import numpy as np
import pytest

from flink_hiveorc_spark.functions.office import (
    _zip_parts,
    build_docx,
    build_xlsx,
    docx_text,
    office_stats,
    parse_office,
    xlsx_text,
)


def test_docx_paragraphs_and_runs():
    got = parse_office(build_docx([["One"], ["a ", "b ", "c"], []]))
    assert got["kind"] == "docx" and got["n_units"] == 3
    assert got["office_text"] == "One\na b c\n"


def test_builders_escape_xml_specials():
    # regression (r14 advice): '&', '<', '"' in corpus text used to
    # make the encoder-twin fixtures malformed XML, failing the whole
    # oracle query instead of being well-formed by construction
    hostile = 'a & b < c > d "q" \'s\''
    got = parse_office(build_docx([[hostile]]))
    assert got["office_text"] == hostile
    got = parse_office(
        build_xlsx([hostile], [[("s", "0"), ("inlineStr", hostile)]])
    )
    assert got["office_text"] == f"{hostile} {hostile}"
    from flink_hiveorc_spark.functions.office import (
        build_epub,
        build_odt,
        build_pptx,
        parse_epub,
    )

    got = parse_office(build_pptx([[hostile]]))
    assert got["office_text"] == hostile
    got = parse_office(build_odt([hostile]))
    assert got["office_text"] == hostile
    # the RawXml escape hatch keeps intentional markup working
    from flink_hiveorc_spark.functions.office import RawXml
    from xml.sax.saxutils import escape as xesc

    got = parse_office(
        build_odt([RawXml(f"<text:span>{xesc(hostile)}</text:span> tail")])
    )
    assert got["office_text"] == f"{hostile} tail"
    ep = parse_epub(
        build_epub(hostile, [("c1.xhtml", "<p>plain body</p>")])
    )
    assert ep["title"] == hostile and ep["epub_text"] == "plain body"


def test_docx_namespace_prefix_is_irrelevant():
    doc = (
        b'<?xml version="1.0"?><x:document xmlns:x="urn:whatever">'
        b"<x:body><x:p><x:r><x:t>any prefix</x:t></x:r></x:p>"
        b"</x:body></x:document>"
    )
    text, n = docx_text(doc)
    assert text == "any prefix" and n == 1


def test_xlsx_cell_type_routing():
    got = parse_office(
        build_xlsx(
            ["alpha", "beta"],
            [
                [("s", "0"), ("inlineStr", "inline")],
                [("n", "3.5"), ("s", "1")],
            ],
        )
    )
    assert got["kind"] == "xlsx" and got["n_units"] == 4
    # numeric cell text kept VERBATIM (no float reformatting)
    assert got["office_text"] == "alpha inline\n3.5 beta"


def test_xlsx_multi_sheet_sorted_and_no_shared_strings():
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="%s"><sheetData>'
        '<row r="1"><c><v>%d</v></c></row></sheetData></worksheet>'
    )
    parts = {
        "xl/workbook.xml": f'<workbook xmlns="{ns}"/>'.encode(),
        "xl/worksheets/sheet2.xml": (sheet % (ns, 22)).encode(),
        "xl/worksheets/sheet1.xml": (sheet % (ns, 11)).encode(),
    }
    text, n_sheets, n_cells = xlsx_text(parts)
    assert text == "11\n22" and n_sheets == 2 and n_cells == 2


def test_xlsx_bad_shared_index_is_malformed():
    with pytest.raises(ValueError, match="out of range"):
        parse_office(build_xlsx(["only"], [[("s", "5")]]))


def test_error_contract():
    with pytest.raises(ValueError, match="malformed zip"):
        parse_office(b"PK\x03\x04 truncated")
    with pytest.raises(ValueError, match="office package"):
        parse_office(_zip_parts({"readme.txt": b"hello"}))
    with pytest.raises(ValueError, match="malformed XML"):
        parse_office(_zip_parts({"word/document.xml": b"<w:document"}))


def test_fuzz_byte_flips_stay_classified():
    rng = np.random.default_rng(47)
    for good in (
        build_docx([["fuzz"], ["target ", "text"]]),
        build_xlsx(["s"], [[("s", "0"), ("n", "1")]]),
    ):
        for _ in range(150):
            b = bytearray(good)
            i = int(rng.integers(0, len(b)))
            b[i] ^= int(rng.integers(1, 256))
            try:
                parse_office(bytes(b))
            except (ValueError, NotImplementedError):
                pass


def test_epub_spine_order_beats_zip_order():
    from flink_hiveorc_spark.functions.office import build_epub, parse_epub

    # the builder stores chapters REVERSED in the zip; the parser
    # must follow the spine
    got = parse_epub(
        build_epub("T", [("a.xhtml", "<p>first</p>"), ("b.xhtml", "<p>second</p>")])
    )
    assert got["epub_text"] == "first\nsecond" and got["n_chapters"] == 2
    assert got["title"] == "T"


def test_epub_error_contract():
    from flink_hiveorc_spark.functions.office import build_epub, parse_epub

    with pytest.raises(ValueError, match="container.xml"):
        parse_epub(_zip_parts({"mimetype": b"application/epub+zip"}))
    good = build_epub("T", [("a.xhtml", "<p>x</p>")])
    # drop the spine target from the zip
    import io
    import zipfile

    src = zipfile.ZipFile(io.BytesIO(good))
    parts = {n: src.read(n) for n in src.namelist() if not n.endswith("a.xhtml")}
    with pytest.raises(ValueError, match="not in the zip"):
        parse_epub(_zip_parts(parts))


def test_epub_fuzz_byte_flips_stay_classified():
    from flink_hiveorc_spark.functions.office import build_epub, parse_epub

    rng = np.random.default_rng(48)
    good = build_epub("F", [("c.xhtml", "<p>fuzz body</p>")])
    for _ in range(150):
        b = bytearray(good)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            parse_epub(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_spark_operator_and_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(build_docx([["spark side"]]))),
            (2, bytearray(b"not a zip at all")),
        ],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in office_stats(df, quarantine=True).collect()}
    assert rows[1]["kind"] == "docx" and rows[1]["office_text"] == "spark side"
    assert rows[2]["kind"] is None and rows[2]["error"].startswith("malformed")
    with pytest.raises(Exception):
        office_stats(df, quarantine=False).collect()


def test_pptx_slides_and_runs():
    from flink_hiveorc_spark.functions.office import build_pptx

    got = parse_office(build_pptx([["Deck", "one"], ["slide two"]]))
    assert got["kind"] == "pptx" and got["n_units"] == 2
    assert got["office_text"] == "Deck one\nslide two"


def test_odt_paragraphs_and_nested_markup():
    # nested text:span markup is a PARSER concern (itertext must
    # flatten it), so the content.xml is hand-built here — the
    # builder escapes its inputs and can no longer inject markup
    content = (
        b'<?xml version="1.0"?><office:document-content '
        b'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        b'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        b"<office:body><office:text><text:p>First</text:p>"
        b"<text:p><text:span>nested</text:span> tail</text:p>"
        b"</office:text></office:body></office:document-content>"
    )
    got = parse_office(
        _zip_parts(
            {
                "mimetype": b"application/vnd.oasis.opendocument.text",
                "content.xml": content,
            }
        )
    )
    assert got["kind"] == "odt" and got["n_units"] == 2
    assert got["office_text"] == "First\nnested tail"


def test_odt_requires_odf_mimetype():
    # a zip with content.xml but no ODF mimetype is NOT an office doc
    with pytest.raises(ValueError, match="office package"):
        parse_office(_zip_parts({"content.xml": b"<x/>"}))
