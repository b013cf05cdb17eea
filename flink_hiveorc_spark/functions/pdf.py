"""PDF structural probe + simple-text extraction — after HTML, the
highest-frequency document format an LLM curation pipeline ingests
(academic papers, reports). Scope is stated honestly:

- STRUCTURE (always): header version, classic xref table walk with
  per-entry offset VERIFICATION (every in-use entry must point at its
  `N 0 obj` header — a corrupted or lying xref classifies as
  malformed, never a silent partial parse), trailer /Size /Root,
  object/stream/page counts.
- TEXT (the simple-text subset): content streams that are plain or
  FlateDecode-compressed (stdlib zlib, output-capped), with literal
  `(...) Tj` / `[(..) ..] TJ` show operators inside BT/ET and PDF
  string escapes (\\( \\) \\\\ \\n \\r \\t \\ddd octal). Anything
  beyond — xref streams (PDF 1.5 object streams), hex strings, CID/
  Type0 composite fonts, per-glyph encodings — raises
  NotImplementedError: decoding those without the font machinery
  silently yields mojibake, the failure class the decode contract
  forbids (same policy as the MP3 analysis, SURVEY.md r12).

Reference repo has no document surface (SURVEY.md §0); need comes
from BASELINE.json's LLM-curation envelope.
"""

from __future__ import annotations

import re
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

MAX_PDF_STREAM_BYTES = 1 << 26  # shared budget (== MAX_DECOMPRESSED_BYTES)

_OBJ_RE = re.compile(rb"(\d+) 0 obj")
_XREF_ENTRY_RE = re.compile(rb"^(\d{10}) (\d{5}) ([nf])\s*$")
_STRING_ESCAPES = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _pdf_string(body: bytes, pos: int) -> tuple[bytes, int]:
    """Parse a literal PDF string starting at the '(' at `pos`;
    returns (decoded bytes, index past the closing ')'). Balanced
    unescaped parens nest per spec."""
    out = bytearray()
    depth = 1
    i = pos + 1
    while i < len(body):
        c = body[i]
        if c == 0x5C:  # backslash
            if i + 1 >= len(body):
                raise ValueError("PDF string ends inside an escape")
            nxt = body[i + 1]
            if nxt in _STRING_ESCAPES:
                out += _STRING_ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(body) and len(oct_digits) < 3 and 0x30 <= body[j] <= 0x37:
                    oct_digits += bytes([body[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            else:  # backslash before anything else: drop the backslash
                out.append(nxt)
                i += 2
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string")


def _extract_text(content: bytes) -> list[bytes]:
    """Literal strings shown via Tj / TJ inside BT..ET blocks, in
    stream order."""
    shown: list[bytes] = []
    pos = 0
    while True:
        bt = content.find(b"BT", pos)
        if bt < 0:
            break
        et = content.find(b"ET", bt + 2)
        if et < 0:
            raise ValueError("BT without matching ET in content stream")
        seg = content[bt:et]
        i = 0
        pending: list[bytes] = []
        while i < len(seg):
            if seg[i] == 0x28:
                s, i = _pdf_string(seg, i)
                pending.append(s)
                continue
            if seg[i : i + 2] in (b"Tj", b"TJ") and pending:
                shown.extend(pending)
                pending = []
                i += 2
                continue
            i += 1
        pos = et + 2
    return shown


def parse_pdf(payload: bytes) -> dict:
    """Structural parse + simple-text extraction (see module doc)."""
    import zlib

    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if b"%%EOF" not in payload[-64:]:
        raise ValueError("PDF lacks the %%EOF trailer")
    sx = payload.rfind(b"startxref")
    if sx < 0:
        raise ValueError("PDF lacks startxref")
    m = re.search(rb"startxref\s+(\d+)", payload[sx:])
    if not m:
        raise ValueError("malformed startxref")
    xref_off = int(m.group(1))
    if payload[xref_off : xref_off + 4] == b"xref":
        pass
    elif _OBJ_RE.match(payload[xref_off:]):
        raise NotImplementedError(
            "PDF 1.5 cross-reference STREAM (object streams need the "
            "xref-stream decoder this build scopes out)"
        )
    else:
        raise ValueError("startxref does not point at an xref table")
    # classic xref subsections
    lines = payload[xref_off:].split(b"\n")
    n_objects = 0
    li = 1
    while li < len(lines):
        header = lines[li].strip()
        if header.startswith(b"trailer") or not header:
            break
        hm = re.match(rb"^(\d+) (\d+)$", header)
        if not hm:
            raise ValueError(f"malformed xref subsection header {header!r}")
        start, count = int(hm.group(1)), int(hm.group(2))
        li += 1
        for k in range(count):
            em = _XREF_ENTRY_RE.match(lines[li].strip())
            if not em:
                raise ValueError(f"malformed xref entry {lines[li]!r}")
            off, _gen, kind = int(em.group(1)), em.group(2), em.group(3)
            if kind == b"n":
                want = f"{start + k} 0 obj".encode()
                if payload[off : off + len(want)] != want:
                    raise ValueError(
                        f"xref entry for object {start + k} points at "
                        f"offset {off}, which is not its header"
                    )
                n_objects += 1
            li += 1
    tm = re.search(rb"trailer\s*<<(.*?)>>", payload[xref_off:], re.S)
    if not tm or b"/Root" not in tm.group(1):
        raise ValueError("PDF trailer lacks /Root")
    # streams: << dict >> stream\n ... endstream, /Length mandatory.
    # Scanned by locating each `stream` keyword and looking BACK a
    # bounded window for its dict — a single lazy `<<(.*?)>>\s*stream`
    # regex over the whole payload backtracks quadratically on
    # adversarial `<<<<...` input (CPU-exhaustion class); this walk is
    # linear. 4 KB bounds any realistic stream dict.
    n_streams = 0
    texts: list[bytes] = []
    spos = 0
    while True:
        sk = payload.find(b"stream", spos)
        if sk < 0:
            break
        spos = sk + 6
        body_start = sk + 6
        if payload[body_start : body_start + 2] == b"\r\n":
            body_start += 2
        elif payload[body_start : body_start + 1] == b"\n":
            body_start += 1
        else:
            continue  # 'endstream', '/XRefStm', ... — not the keyword
        window = payload[max(0, sk - 4096) : sk]
        do = window.rfind(b"<<")
        dc = window.rfind(b">>")
        if do < 0 or dc < do or window[dc + 2 :].strip():
            continue  # no adjacent dict: not a stream object
        d = window[do + 2 : dc]
        lm = re.search(rb"/Length\s+(\d+)", d)
        if not lm:
            raise ValueError("content stream lacks a literal /Length")
        n = int(lm.group(1))
        if n > MAX_PDF_STREAM_BYTES:
            raise ValueError(
                f"PDF stream declares {n} bytes > {MAX_PDF_STREAM_BYTES} "
                "(bomb guard)"
            )
        body = payload[body_start : body_start + n]
        if len(body) != n:
            raise ValueError("PDF stream overruns the payload")
        # jump past the body AND its endstream keyword: Flate bytes
        # inside the body can contain '<<..>>' + 'stream\n' lookalikes
        # that would inflate n_streams or raise a spurious /Length
        # error if the scan re-entered them
        end_kw = payload.find(b"endstream", body_start + n)
        spos = end_kw + 9 if end_kw >= 0 else body_start + n
        n_streams += 1
        if b"/Filter" in d:
            if b"/FlateDecode" not in d:
                raise NotImplementedError(
                    "PDF stream filter beyond FlateDecode (needs codec)"
                )
            try:
                dec = zlib.decompressobj()
                body = dec.decompress(body, MAX_PDF_STREAM_BYTES)
                if dec.unconsumed_tail:
                    raise ValueError("PDF Flate stream exceeds the budget")
            except zlib.error as e:
                raise ValueError(f"malformed Flate stream: {e}") from e
        if b"BT" in body:
            texts.extend(_extract_text(body))
    n_pages = len(re.findall(rb"/Type\s*/Page[^s]", payload))
    return {
        "n_objects": n_objects,
        "n_pages": n_pages,
        "n_streams": n_streams,
        "pdf_text": b" ".join(texts).decode("latin-1"),
    }


_PDF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_objects", T.LongType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_streams", T.LongType()),
        T.StructField("pdf_text", T.StringType()),
    ]
)


def pdf_stats(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) PDF blobs → structure + extracted simple
    text through the shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    def featurize(payload: bytes) -> dict:
        return parse_pdf(payload)

    return _stats_df(payloads, _PDF_STATS_SCHEMA, featurize, quarantine)


_PDF_FLATE_TEXT = "flate constant leg: pdf_stats external oracle"


def _pdf_flate_stream() -> bytes:
    import zlib

    return zlib.compress(
        f"BT /F1 12 Tf 72 720 Td ({_PDF_FLATE_TEXT}) Tj ET".encode(), 6
    )


@query(
    "multimodal_pdf_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(5 AS BIGINT) AS n_objects,
           CAST(1 AS BIGINT) AS n_pages,
           CAST(1 AS BIGINT) AS n_streams,
           CASE WHEN doc_id % 2 = 0
                THEN 'Doc ' || doc_id || ' ' || source || ' ' || text
                ELSE '{_PDF_FLATE_TEXT}' END AS pdf_text
    FROM documents
    """,
)
def multimodal_pdf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF probing under a GROUND-TRUTH oracle with DATA-DEPENDENT
    byte offsets: each even doc becomes a complete classic-xref PDF
    whose content stream carries the doc's text in two Tj strings —
    the /Length value, object-5 offset, xref offset, and startxref
    are all octet_length arithmetic over the variable content, and
    the parser VERIFIES every xref entry against the object header
    it points at, so one byte of drift anywhere kills the row; odd
    docs carry a constant FlateDecode content stream (the bz2-leg
    precedent), pinning the zlib routing. DuckDB recomputes the
    expected text by plain concat (documents.text is verified free
    of parens/backslashes at all SFs). Scale: map-only, zero
    exchanges."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    head = "%PDF-1.4\n"
    o1 = "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    o2 = "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    o3 = (
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"
        "endobj\n"
    )
    o5 = (
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\n"
        "endobj\n"
    )
    off1 = len(head)
    off2 = off1 + len(o1)
    off3 = off2 + len(o2)
    off4 = off3 + len(o3)
    stream_plain = F.concat(
        F.lit("BT /F1 12 Tf 72 720 Td (Doc "),
        did,
        F.lit(") Tj 0 -14 Td ("),
        F.col("source"),
        F.lit(" "),
        F.col("text"),
        F.lit(") Tj ET"),
    )
    flate = _pdf_flate_stream()
    stream_body = F.when(
        F.col("doc_id") % 2 == 0, F.encode(stream_plain, "utf-8")
    ).otherwise(F.lit(flate))
    filter_part = F.when(
        F.col("doc_id") % 2 == 0, F.lit("")
    ).otherwise(F.lit(" /Filter /FlateDecode"))
    o4 = F.concat(
        F.encode(
            F.concat(
                F.lit("4 0 obj\n<< /Length "),
                F.octet_length(stream_body).cast("string"),
                filter_part,
                F.lit(" >>\nstream\n"),
            ),
            "utf-8",
        ),
        stream_body,
        F.lit(b"\nendstream\nendobj\n"),
    )
    off5 = F.lit(off4) + F.octet_length(o4)
    xref_off = off5 + len(o5)

    def entry(off_col):
        return F.concat(
            F.lpad(off_col.cast("string"), 10, "0"), F.lit(" 00000 n \n")
        )

    xref = F.concat(
        F.lit(
            "xref\n0 6\n0000000000 65535 f \n"
            + f"{off1:010d} 00000 n \n{off2:010d} 00000 n \n"
            + f"{off3:010d} 00000 n \n{off4:010d} 00000 n \n"
        ),
        entry(off5),
    )
    trailer = F.concat(
        F.lit("trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"),
        xref_off.cast("string"),
        F.lit("\n%%EOF\n"),
    )
    payload = F.concat(
        F.lit((head + o1 + o2 + o3).encode()),
        o4,
        F.lit(o5.encode()),
        F.encode(F.concat(xref, trailer), "utf-8"),
    )
    return pdf_stats(d.select("doc_id", payload.alias("payload")))
