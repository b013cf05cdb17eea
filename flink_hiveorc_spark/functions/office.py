"""Office-document (OOXML) text extraction — docx/xlsx are the
third-most-common document class in scraped corpora after HTML and
PDF, and they are pure composition over layers this engine already
owns: an OOXML file is a ZIP (expand_zip, functions/archive.py:223,
with its CRC verification and bomb budgets) holding XML parts
(stdlib ElementTree), per the public ECMA-376 packaging spec.

Scope:
- **docx** (WordprocessingML): `word/document.xml` paragraphs —
  every `w:t` run's text, runs concatenated within a paragraph,
  paragraphs joined with newlines. Namespace-agnostic matching (the
  prefix is arbitrary; tags match on their local name) so documents
  from any producer parse.
- **xlsx** (SpreadsheetML): `xl/sharedStrings.xml` string table +
  every `xl/worksheets/*.xml` sheet (sorted by part name). Cell
  types per §18.3.1.4: `t="s"` shared-string index, `t="inlineStr"`
  inline `is/t`, `t="str"` formula-string `v`, and the default
  numeric `v` kept verbatim (no float reformatting — the cell's
  stored text is the ground truth). Cells join with spaces within a
  row, rows with newlines, sheets with newlines.
- Anything else inside the zip (charts, media, macros) is ignored;
  a zip that is not an OOXML package (neither part present) is
  ValueError; XML parse failures are ValueError; ElementTree's
  stdlib parser refuses DTD/entity tricks by default (no external
  entity expansion).

Spark-side: the shared featurize-with-DLQ mapInPandas path — map
only, zero shuffle, parallelism = file count.

Reference repo has no document surface (SURVEY.md §0); need comes
from the crawl envelope (scraped corpora carry docx/xlsx blobs
constantly — the r13 verdict's What's-missing #3).
"""

from __future__ import annotations

from xml.etree import ElementTree
from xml.sax.saxutils import escape as _xml_escape

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query


def _local(tag: str) -> str:
    """'{namespace}p' → 'p' (namespace-agnostic tag matching)."""
    return tag.rsplit("}", 1)[-1]


def _parse_xml(name: str, data: bytes) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed XML in {name!r}: {e}") from e


def docx_text(document_xml: bytes) -> tuple[str, int]:
    """word/document.xml → (text, n_paragraphs): w:t runs
    concatenated per w:p paragraph, paragraphs joined with LF."""
    root = _parse_xml("word/document.xml", document_xml)
    paragraphs: list[str] = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        runs = [
            t.text or ""
            for t in p.iter()
            if _local(t.tag) == "t"
        ]
        paragraphs.append("".join(runs))
    return "\n".join(paragraphs), len(paragraphs)


def xlsx_text(parts: dict[str, bytes]) -> tuple[str, int, int]:
    """xl/* parts → (text, n_sheets, n_cells). Shared strings resolve
    through xl/sharedStrings.xml; numeric cell text is kept verbatim
    (the stored string IS the value — no reformatting)."""
    shared: list[str] = []
    ss = parts.get("xl/sharedStrings.xml")
    if ss is not None:
        root = _parse_xml("xl/sharedStrings.xml", ss)
        for si in root:
            if _local(si.tag) != "si":
                continue
            shared.append(
                "".join(
                    t.text or "" for t in si.iter() if _local(t.tag) == "t"
                )
            )
    sheet_names = sorted(
        n
        for n in parts
        if n.startswith("xl/worksheets/") and n.endswith(".xml")
    )
    if not sheet_names and ss is None:
        raise ValueError("xlsx package has no worksheets")
    sheets: list[str] = []
    n_cells = 0
    for name in sheet_names:
        root = _parse_xml(name, parts[name])
        rows: list[str] = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells: list[str] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = next(
                        (x for x in c if _local(x.tag) == "v"), None
                    )
                    if v is None or v.text is None:
                        raise ValueError("shared-string cell lacks <v>")
                    idx = int(v.text)
                    if idx >= len(shared):
                        raise ValueError(
                            f"shared-string index {idx} out of range "
                            f"({len(shared)} strings)"
                        )
                    cells.append(shared[idx])
                elif ctype == "inlineStr":
                    cells.append(
                        "".join(
                            t.text or ""
                            for t in c.iter()
                            if _local(t.tag) == "t"
                        )
                    )
                else:  # 'n' numeric, 'str' formula string, 'b' boolean
                    v = next(
                        (x for x in c if _local(x.tag) == "v"), None
                    )
                    cells.append(
                        v.text if v is not None and v.text else ""
                    )
                n_cells += 1
            rows.append(" ".join(cells))
        sheets.append("\n".join(rows))
    return "\n".join(sheets), len(sheet_names), n_cells


def pptx_text(parts: dict[str, bytes]) -> tuple[str, int]:
    """ppt/slides/*.xml (sorted by part name = deck order for the
    single-digit decks corpora carry; the full ordering lives in
    presentation.xml rels, out of scope and documented) → text: a:t
    runs joined with spaces within a slide, slides joined with LF."""
    names = sorted(
        n for n in parts
        if n.startswith("ppt/slides/") and n.endswith(".xml")
    )
    slides = []
    for name in names:
        root = _parse_xml(name, parts[name])
        slides.append(
            " ".join(
                t.text or "" for t in root.iter() if _local(t.tag) == "t"
            )
        )
    return "\n".join(slides), len(names)


def odt_text(content_xml: bytes) -> tuple[str, int]:
    """OpenDocument content.xml → text:p paragraphs (itertext per
    paragraph), LF-joined — the docx shape in ODF clothing."""
    root = _parse_xml("content.xml", content_xml)
    paragraphs = [
        "".join(p.itertext())
        for p in root.iter()
        if _local(p.tag) == "p"
    ]
    return "\n".join(paragraphs), len(paragraphs)


def parse_office(payload: bytes) -> dict:
    """Office-document blob → {kind docx|xlsx|pptx|odt, n_units
    (paragraphs | cells | slides), office_text}. Routes on which
    package part is present; a zip with none of them is not an
    office package (ValueError)."""
    from flink_hiveorc_spark.functions.archive import expand_zip

    parts = {m["name"]: m["content"] for m in expand_zip(payload)}
    if "word/document.xml" in parts:
        text, n_paragraphs = docx_text(parts["word/document.xml"])
        return {"kind": "docx", "n_units": n_paragraphs,
                "office_text": text}
    if "xl/workbook.xml" in parts:
        text, _n_sheets, n_cells = xlsx_text(parts)
        return {"kind": "xlsx", "n_units": n_cells, "office_text": text}
    if "ppt/presentation.xml" in parts:
        text, n_slides = pptx_text(parts)
        return {"kind": "pptx", "n_units": n_slides, "office_text": text}
    if "content.xml" in parts and parts.get("mimetype", b"").startswith(
        b"application/vnd.oasis.opendocument"
    ):
        text, n_paragraphs = odt_text(parts["content.xml"])
        return {"kind": "odt", "n_units": n_paragraphs,
                "office_text": text}
    raise ValueError(
        "zip is not an office package (no word/document.xml, "
        "xl/workbook.xml, ppt/presentation.xml, or ODF content.xml)"
    )


_OFFICE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("office_text", T.StringType()),
    ]
)


def office_stats(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) OOXML blobs → kind + extracted text through
    the shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    return _stats_df(payloads, _OFFICE_SCHEMA, parse_office, quarantine)


# --------------------------------------------------------- EPUB

_CONTAINER_XML = "META-INF/container.xml"


def _resolve_href(opf_path: str, href: str) -> str:
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    return base + href


def parse_epub(payload: bytes) -> dict:
    """EPUB blob → {title, n_chapters, epub_text}. An EPUB (the book
    corpus format) is a zip: META-INF/container.xml names the OPF
    package document; the OPF's <manifest> maps ids to hrefs and its
    <spine> gives READING ORDER (which may differ from zip member
    order); chapters are XHTML, parsed as XML with whitespace-
    collapsed itertext. All layers already owned: expand_zip +
    ElementTree. Missing container/OPF/spine items classify as
    malformed (ValueError)."""
    from flink_hiveorc_spark.functions.archive import expand_zip

    parts = {m["name"]: m["content"] for m in expand_zip(payload)}
    if _CONTAINER_XML not in parts:
        raise ValueError("epub lacks META-INF/container.xml")
    container = _parse_xml(_CONTAINER_XML, parts[_CONTAINER_XML])
    opf_path = None
    for el in container.iter():
        if _local(el.tag) == "rootfile":
            opf_path = el.get("full-path")
            break
    if not opf_path or opf_path not in parts:
        raise ValueError("epub container names no readable OPF rootfile")
    opf = _parse_xml(opf_path, parts[opf_path])
    manifest: dict[str, str] = {}
    spine: list[str] = []
    title = ""
    for el in opf.iter():
        tag = _local(el.tag)
        if tag == "item" and el.get("id") and el.get("href"):
            manifest[el.get("id")] = el.get("href")
        elif tag == "itemref" and el.get("idref"):
            spine.append(el.get("idref"))
        elif tag == "title" and not title:
            title = (el.text or "").strip()
    if not spine:
        raise ValueError("epub OPF has no spine")
    chapters: list[str] = []
    for idref in spine:
        href = manifest.get(idref)
        if href is None:
            raise ValueError(f"spine idref {idref!r} is not in the manifest")
        name = _resolve_href(opf_path, href)
        if name not in parts:
            raise ValueError(f"spine item {name!r} is not in the zip")
        root = _parse_xml(name, parts[name])
        text = " ".join("".join(root.itertext()).split())
        chapters.append(text)
    return {
        "title": title,
        "n_chapters": len(chapters),
        "epub_text": "\n".join(chapters),
    }


_EPUB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("n_chapters", T.LongType()),
        T.StructField("epub_text", T.StringType()),
    ]
)


def epub_stats(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) EPUB blobs → title + spine-ordered text
    through the shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    return _stats_df(payloads, _EPUB_SCHEMA, parse_epub, quarantine)


def build_epub(title: str, chapters: list[tuple[str, str]]) -> bytes:
    """Independent ENCODER twin: a minimal spec-shaped EPUB. The
    spine lists chapters in the GIVEN order while the zip stores
    them reversed, so a reader that ignores the spine fails the
    oracle. Chapter BODIES are XHTML markup passed through verbatim
    (callers escape any interpolated corpus text); the title and
    member names are escaped here."""
    container = (
        '<?xml version="1.0"?><container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    ).encode()
    items = "".join(
        f'<item id="c{i}" href="{_xml_escape(name, {chr(34): "&quot;"})}" '
        'media-type="application/xhtml+xml"/>'
        for i, (name, _) in enumerate(chapters)
    )
    refs = "".join(f'<itemref idref="c{i}"/>' for i in range(len(chapters)))
    opf = (
        '<?xml version="1.0"?><package '
        'xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>{_xml_escape(title)}</dc:title></metadata>"
        f"<manifest>{items}</manifest><spine>{refs}</spine></package>"
    ).encode()
    parts: dict[str, bytes] = {
        "mimetype": b"application/epub+zip",
        _CONTAINER_XML: container,
        "OEBPS/content.opf": opf,
    }
    for name, body in reversed(chapters):
        parts["OEBPS/" + name] = (
            '<?xml version="1.0"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><body>'
            f"{body}</body></html>"
        ).encode()
    return _zip_parts(parts)


@query(
    "text_epub_extract",
    oracle="""
    SELECT doc_id,
           'Book ' || doc_id AS title,
           CAST(2 AS BIGINT) AS n_chapters,
           'Chapter one ' || source || chr(10) || 'Chapter two ' || text
             AS epub_text
    FROM documents
    """,
)
def text_epub_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB (book-corpus) extraction under a GROUND-TRUTH oracle:
    each doc becomes a complete EPUB — container.xml → OPF (with a
    data-dependent dc:title) → two XHTML chapters whose SPINE order
    is the reverse of the zip member order, so a reader that walks
    the zip instead of the spine emits the chapters backwards and
    the value hash dies. Chapter text comes from the raw columns
    with markup (<p>, <em>) that the XML itertext must strip exactly;
    DuckDB recomputes the expected text by plain concat. Scale: ONE
    fused map-only Python pass (encode → parse composed per row,
    r16; see _encoded_stats_df), zero exchanges."""
    from flink_hiveorc_spark.functions.multimodal import _encoded_stats_df

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def payload_of(doc_id, source, text) -> bytes:
        return build_epub(
            f"Book {doc_id}",
            [
                (
                    "ch1.xhtml",
                    "<p>Chapter <em>one</em> "
                    f"{_xml_escape(source)}</p>",
                ),
                (
                    "ch2.xhtml",
                    f"<p>Chapter two {_xml_escape(text)}</p>",
                ),
            ],
        )

    return _encoded_stats_df(d, payload_of, _EPUB_SCHEMA, parse_epub)


# ------------------------------------------------------ the oracle

_CONTENT_TYPES = (
    b'<?xml version="1.0"?>'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    b'content-types"><Default Extension="xml" '
    b'ContentType="application/xml"/></Types>'
)
_W_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)
_S_NS = (
    "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
)


def build_docx(paragraphs: list[list[str]]) -> bytes:
    """Independent ENCODER twin: a minimal but spec-shaped docx —
    a deflated zip with [Content_Types].xml and word/document.xml,
    one w:p per paragraph, one w:r/w:t per run."""
    body = "".join(
        "<w:p>"
        + "".join(
            f"<w:r><w:t>{_xml_escape(run)}</w:t></w:r>" for run in runs
        )
        + "</w:p>"
        for runs in paragraphs
    )
    doc = (
        f'<?xml version="1.0"?><w:document xmlns:w="{_W_NS}">'
        f"<w:body>{body}</w:body></w:document>"
    ).encode()
    return _zip_parts(
        {"[Content_Types].xml": _CONTENT_TYPES, "word/document.xml": doc}
    )


def build_xlsx(
    shared: list[str], rows: list[list[tuple[str, str]]]
) -> bytes:
    """Independent ENCODER twin: a minimal xlsx — shared-string
    table + one sheet whose cells are (type, value) pairs with
    type ∈ s | inlineStr | n."""
    ss = (
        f'<?xml version="1.0"?><sst xmlns="{_S_NS}" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in shared)
        + "</sst>"
    ).encode()
    rows_xml = []
    for r, cells in enumerate(rows, 1):
        cx = []
        for ctype, val in cells:
            if ctype == "inlineStr":
                cx.append(
                    '<c t="inlineStr"><is><t>'
                    f"{_xml_escape(val)}</t></is></c>"
                )
            elif ctype == "s":
                cx.append(f'<c t="s"><v>{val}</v></c>')
            else:
                cx.append(f"<c><v>{val}</v></c>")
        rows_xml.append(f'<row r="{r}">' + "".join(cx) + "</row>")
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{_S_NS}">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData></worksheet>"
    ).encode()
    wb = (
        f'<?xml version="1.0"?><workbook xmlns="{_S_NS}">'
        '<sheets><sheet name="Sheet1" sheetId="1"/></sheets></workbook>'
    ).encode()
    return _zip_parts(
        {
            "[Content_Types].xml": _CONTENT_TYPES,
            "xl/workbook.xml": wb,
            "xl/sharedStrings.xml": ss,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )


_P_NS = (
    "http://schemas.openxmlformats.org/presentationml/2006/main"
)
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"
_ODF_TEXT_NS = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODF_OFFICE_NS = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def build_pptx(slides: list[list[str]]) -> bytes:
    """Independent ENCODER twin: a minimal pptx — one slide part per
    entry, one a:t run per string."""
    parts: dict[str, bytes] = {
        "[Content_Types].xml": _CONTENT_TYPES,
        "ppt/presentation.xml": (
            f'<?xml version="1.0"?><p:presentation xmlns:p="{_P_NS}"/>'
        ).encode(),
    }
    for i, runs in enumerate(slides, 1):
        body = "".join(
            f"<a:r><a:t>{_xml_escape(run)}</a:t></a:r>" for run in runs
        )
        parts[f"ppt/slides/slide{i}.xml"] = (
            f'<?xml version="1.0"?><p:sld xmlns:p="{_P_NS}" '
            f'xmlns:a="{_A_NS}"><p:cSld><p:spTree><p:sp><p:txBody>'
            f"<a:p>{body}</a:p></p:txBody></p:sp></p:spTree></p:cSld>"
            "</p:sld>"
        ).encode()
    return _zip_parts(parts)


class RawXml(str):
    """Marks a builder input as intentional XML markup — passed
    through verbatim instead of entity-escaped. Callers remain
    responsible for escaping any corpus text interpolated INSIDE the
    markup."""


def build_odt(paragraphs: list[str]) -> bytes:
    """Independent ENCODER twin: a minimal odt — mimetype +
    content.xml with one text:p per paragraph. Plain strings are
    entity-escaped (well-formed by construction); wrap a paragraph
    in ``RawXml`` to embed markup (e.g. nested text:span)."""
    body = "".join(
        "<text:p>"
        + (p if isinstance(p, RawXml) else _xml_escape(p))
        + "</text:p>"
        for p in paragraphs
    )
    content = (
        f'<?xml version="1.0"?><office:document-content '
        f'xmlns:office="{_ODF_OFFICE_NS}" xmlns:text="{_ODF_TEXT_NS}">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    ).encode()
    return _zip_parts(
        {
            "mimetype": b"application/vnd.oasis.opendocument.text",
            "content.xml": content,
        }
    )


def _zip_parts(parts: dict[str, bytes]) -> bytes:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zi = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)
    return buf.getvalue()


@query(
    "text_office_extract",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx'
                WHEN 2 THEN 'pptx' ELSE 'odt' END AS kind,
           CAST(CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4
                WHEN 2 THEN 2 ELSE 2 END AS BIGINT) AS n_units,
           CASE doc_id % 4
                WHEN 0 THEN 'Title ' || doc_id || chr(10) || source
                            || ' ' || text
                WHEN 1 THEN 'Name ' || source || chr(10) || doc_id
                            || ' ' || text
                WHEN 2 THEN 'Deck ' || doc_id || ' ' || source
                            || chr(10) || 'Slide two ' || text
                ELSE 'Doc ' || doc_id || chr(10) || source || ' ' || text
                END AS office_text
    FROM documents
    """,
)
def text_office_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Office text extraction under a GROUND-TRUTH oracle, doc_id % 4:
    docx (two paragraphs — a title, then TWO runs that must
    concatenate seamlessly: 'source ' + text), xlsx (a shared-string
    row 'Name'/source + a row with a numeric cell (doc_id, stored
    text kept verbatim) and an inlineStr cell (text) — all four cell
    types' routing pinned across the corpus), pptx (two slides whose
    part-name order must hold; the first slide's two a:t runs join
    with a space), and odt (two text:p paragraphs, the second with
    nested markup itertext must flatten). The encoder twins write
    real deflated zips (stdlib zipfile, CRCs verified on read by
    expand_zip) and DuckDB recomputes the expected text by plain
    concat of the raw columns — no zip, XML, or office logic
    oracle-side. Scale: ONE fused map-only Python pass (encode →
    parse composed per row, r16 — the former encoder + extractor
    chain shipped every payload JVM→Python twice; measured 0.71–0.91
    → 0.56–0.62 s at sf0.1, rows-identical; see _encoded_stats_df),
    zero exchanges."""
    from flink_hiveorc_spark.functions.multimodal import _encoded_stats_df

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def payload_of(doc_id, source, text) -> bytes:
        m = int(doc_id) % 4
        if m == 0:
            return build_docx(
                [[f"Title {doc_id}"], [f"{source} ", str(text)]]
            )
        if m == 1:
            return build_xlsx(
                ["Name", str(source)],
                [
                    [("s", "0"), ("s", "1")],
                    [("n", str(doc_id)), ("inlineStr", str(text))],
                ],
            )
        if m == 2:
            return build_pptx(
                [[f"Deck {doc_id}", str(source)], [f"Slide two {text}"]]
            )
        return build_odt(
            [
                f"Doc {doc_id}",
                # markup intentional (pins itertext flattening);
                # corpus text escaped
                RawXml(
                    "<text:span>"
                    f"{_xml_escape(str(source))}"
                    "</text:span> "
                    f"{_xml_escape(str(text))}"
                ),
            ]
        )

    return _encoded_stats_df(d, payload_of, _OFFICE_SCHEMA, parse_office)
