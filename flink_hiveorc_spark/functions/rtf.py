"""RTF text extraction — the remaining high-frequency legacy
document format after the OOXML (office.py) and OLE2 (cfb.py)
generations: decades of institutional corpora, email attachments,
and Windows WordPad output ship as ``{\\rtf1 ...}``.

The format is a control-word text stream ("Rich Text Format
Specification" 1.9.1), all structure, no entropy coding:

- **groups** ``{...}`` nest and scope state;
- **control words** ``\\word[N]`` end at the first non-alphanumeric
  (one following space is part of the delimiter and consumed);
  ``\\par``/``\\line`` emit newlines, ``\\tab`` a tab; ``\\~`` a
  non-breaking space; ``\\-``/``\\*`` etc. are control SYMBOLS;
- **escapes**: ``\\\\ \\{ \\}`` literals, ``\\'xx`` a codepage byte
  (decoded cp1252 — the ansicpg default for western RTF; other
  ansicpg values gate honestly), ``\\uN`` a SIGNED 16-bit Unicode
  codepoint followed by ``\\ucK`` fallback characters to skip
  (default 1, scoped per group per the spec);
- **skipped destinations**: ``\\fonttbl \\colortbl \\stylesheet
  \\info \\pict \\object \\header \\footer \\footnote`` and every
  ignorable ``{\\*\\...}`` group — their content is metadata/binary,
  not document text (the class of bug where extracted "text" starts
  with font names);
- ``\\binN`` raw-binary runs are skipped by byte count.

The encoder twin (build_rtf) writes documents from the spec's
encode side — paragraphs, escapes, a font table the extractor must
NOT leak, \\uc fallback pairs — for the ground-truth oracle.

Spark-side: bytes→text in Arrow mapInPandas through the shared
featurize-with-DLQ path (map-only, zero shuffle). Reference repo
has no document surface (SURVEY.md §0); need comes from
BASELINE.json's LLM-curation envelope.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "footnote", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "annotation", "xe", "tc",
    "generator", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
}

_WORD_RE = re.compile(rb"([a-z]+)(-?\d+)? ?", re.I)


def rtf_text(payload: bytes) -> tuple[str, int]:
    """RTF bytes → (text, n_paragraphs) per the module contract."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("not an RTF payload (missing {\\rtf header)")
    out: list[str] = []
    n_par = 0
    # group stack entries: [skipping, uc_count]
    stack: list[list] = []
    skipping = False
    uc = 1
    pending_uc_skip = 0
    i, n = 0, len(payload)
    # the first control word after the header must be the version
    m = re.match(rb"\{\\rtf(\d+)", payload)
    if not m or m.group(1) != b"1":
        raise NotImplementedError(
            f"RTF version {m.group(1).decode() if m else '?'}"
        )
    first_group_token = True
    while i < n:
        c = payload[i]
        if c == 0x7B:  # {
            stack.append([skipping, uc])
            if len(stack) > 128:
                raise ValueError("RTF groups nest deeper than 128")
            i += 1
            # an ignorable destination {\*\word ...} is skipped whole
            if payload[i : i + 2] == b"\\*":
                skipping = True
            continue
        if c == 0x7D:  # }
            if not stack:
                raise ValueError("RTF group underflow (stray })")
            skipping, uc = stack.pop()
            i += 1
            continue
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                raise ValueError("RTF ends inside a control sequence")
            d = payload[i]
            if d in b"\\{}":
                if pending_uc_skip:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(chr(d))
                i += 1
                continue
            if d == 0x27:  # \'xx
                hx = payload[i + 1 : i + 3]
                if len(hx) != 2 or not re.match(rb"^[0-9A-Fa-f]{2}$", hx):
                    raise ValueError("RTF \\' escape lacks two hex digits")
                if pending_uc_skip:
                    pending_uc_skip -= 1
                elif not skipping:
                    out.append(bytes([int(hx, 16)]).decode("cp1252"))
                i += 3
                continue
            if d == 0x7E:  # \~ non-breaking space
                if not skipping and not pending_uc_skip:
                    out.append("\u00a0")
                i += 1
                continue
            if not (0x41 <= d <= 0x5A or 0x61 <= d <= 0x7A):
                # other control symbols (\- \_ \: ...) carry no text
                i += 1
                continue
            wm = _WORD_RE.match(payload, i)
            word = wm.group(1).lower().decode("ascii")
            param = wm.group(2)
            i = wm.end()
            if word == "u":
                if param is None:
                    raise ValueError("\\u without a codepoint")
                cp = int(param)
                if cp < 0:
                    cp += 65536
                if not skipping:
                    out.append(chr(cp))
                pending_uc_skip = uc
                continue
            if word == "uc":
                uc = int(param or 1)
                continue
            if word == "bin":
                blen = int(param or 0)
                if blen < 0 or i + blen > n:
                    raise ValueError("\\bin run overruns the payload")
                i += blen
                continue
            if word == "ansicpg" and param not in (None, b"1252"):
                raise NotImplementedError(
                    f"RTF codepage {int(param)} (only the cp1252 "
                    "default decodes)"
                )
            if first_group_token and word == "rtf":
                first_group_token = False
                continue
            if word in _SKIP_DESTINATIONS:
                skipping = True
                continue
            if not skipping:
                if word == "par" or word == "line":
                    out.append("\n")
                    if word == "par":
                        n_par += 1
                elif word == "tab":
                    out.append("\t")
            continue
        # plain text byte
        i += 1
        if c in (0x0D, 0x0A):  # raw CR/LF are ignored per spec
            continue
        if pending_uc_skip:
            pending_uc_skip -= 1
            continue
        if not skipping:
            out.append(bytes([c]).decode("cp1252"))
    if stack:
        raise ValueError(f"RTF ends with {len(stack)} unclosed groups")
    text = "".join(out).strip()
    return text, n_par


_RTF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_paragraphs", T.LongType()),
        T.StructField("rtf_text", T.StringType()),
    ]
)


def parse_rtf(payload: bytes) -> dict:
    text, n_par = rtf_text(payload)
    return {"n_paragraphs": n_par, "rtf_text": text}


def rtf_stats(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) RTF blobs → extracted text through the
    shared featurize-with-DLQ path."""
    from flink_hiveorc_spark.functions.multimodal import _stats_df

    return _stats_df(payloads, _RTF_SCHEMA, parse_rtf, quarantine)


def _rtf_escape(s: str) -> bytes:
    """ENCODE-side escaping for the twin: RTF specials escaped,
    non-cp1252-safe characters as \\uN with a '?' fallback."""
    out = bytearray()
    for ch in s:
        if ch in "\\{}":
            out += b"\\" + ch.encode("ascii")
        elif ord(ch) < 128:
            out += ch.encode("ascii")
        else:
            try:
                b = ch.encode("cp1252")
                out += b"\\'" + b.hex().encode("ascii")
            except UnicodeEncodeError:
                cp = ord(ch)
                if cp > 0xFFFF:
                    raise NotImplementedError(
                        "astral codepoints need surrogate pairs"
                    )
                if cp > 32767:
                    cp -= 65536
                out += b"\\u" + str(cp).encode("ascii") + b"?"
    return bytes(out)


def build_rtf(paragraphs: list[str]) -> bytes:
    """RTF ENCODER twin: header + a font table the extractor must
    NOT leak + \\uc1 + one \\par-terminated paragraph per entry,
    with cp1252 \\'xx escapes and \\uN?-fallback pairs where needed.
    Written from the spec's encode side; shares nothing with
    rtf_text."""
    body = b"".join(
        _rtf_escape(p) + b"\\par\n" for p in paragraphs
    )
    return (
        b"{\\rtf1\\ansi\\ansicpg1252\\uc1"
        b"{\\fonttbl{\\f0\\fswiss Helvetica;}}"
        b"{\\*\\generator spark-graft 15;}"
        b"\\f0\\fs24 " + body + b"}"
    )


@query(
    "text_rtf_extract",
    oracle="""
    SELECT doc_id,
           CAST(2 AS BIGINT) AS n_paragraphs,
           'Doc ' || doc_id || ' caf\u00e9 \u4e2d' || chr(10)
             || source || ' ' || text AS rtf_text
    FROM documents
    """,
)
def text_rtf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTF extraction under a GROUND-TRUTH oracle: every doc carries
    a two-paragraph RTF whose first line mixes a data-dependent
    ASCII token with a cp1252 \\'e9 escape (é) and a \\u20013?
    Unicode escape (中, with its \\uc1 fallback '?' that must be
    SKIPPED), and whose second paragraph is source + text; the font
    table and an ignorable {\\*\\generator} destination must leak
    nothing. DuckDB recomputes the expected text by plain concat
    with the decoded literals. Scale: ONE fused map-only Python
    pass (encode → parse composed per row, r16; see
    _encoded_stats_df), zero exchanges."""
    from flink_hiveorc_spark.functions.multimodal import _encoded_stats_df

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def payload_of(doc_id, source, text) -> bytes:
        return build_rtf(
            [f"Doc {doc_id} caf\u00e9 \u4e2d", f"{source} {text}"]
        )

    return _encoded_stats_df(d, payload_of, _RTF_SCHEMA, parse_rtf)
