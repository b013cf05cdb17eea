"""Charset detection + transcoding — the step between the crawl
envelope (functions/archive.py) and every text operator: real Common
Crawl is full of windows-1252, Shift_JIS, GBK, KOI8-R, EUC-KR pages,
and a blind ``utf-8, errors="replace"`` decode turns all of them into
mojibake that silently degrades every downstream text signal (quality
scores, dedup shingles, language ID).

Detection is the deterministic subset of the WHATWG Encoding
Standard's sniffing algorithm (https://encoding.spec.whatwg.org/) —
no statistical guessing, so the result is reproducible and
oracle-checkable:

1. **BOM** (overrides any label, per WHATWG): UTF-8 / UTF-16LE/BE /
   UTF-32LE/BE byte-order marks;
2. **Content-Type header** ``charset=`` parameter (the transport
   label — RFC 9110 §8.3);
3. **<meta> prescan** of the first 1024 bytes (the WHATWG prescan
   window): ``<meta charset=...>`` or the http-equiv form;
4. **XML declaration** ``<?xml ... encoding="..."?>``;
5. **UTF-8 probe**: a strict decode that succeeds IS utf-8 (UTF-8's
   structure makes false positives on legacy 8-bit text negligible);
6. **windows-1252 fallback** — the WHATWG default for unlabeled
   legacy web content.

Labels normalize through the WHATWG alias table: critically,
``iso-8859-1`` / ``latin1`` / ``us-ascii`` all mean **windows-1252**
on the web (0x80-0x9F are the cp1252 punctuation/€ block, not C1
controls), ``shift_jis`` means windows-31j (cp932), ``gb2312`` means
GBK, ``euc-kr`` means cp949. Unknown labels are skipped and detection
continues down the chain (WHATWG: unrecognized label → failure →
next source).

Decoding itself is stdlib ``codecs`` with ``errors="replace"``; the
U+FFFD count rides along as the confidence signal (0 = clean decode).

**Statistical fallback lane (flagged, non-oracle).** The
deterministic chain's cp1252 fallback is right for the legacy-web
default but mojibakes unlabeled Shift_JIS/GBK/EUC-KR pages (no BOM,
no header, no meta — the pre-2005 CJK crawl tail). With
``statistical=True``, ``sniff_charset_statistical`` consults
``charset_normalizer`` ONLY when the deterministic chain would have
fallen back, emitting ``charset_source='statistical'`` plus a
``confidence`` column. This lane is deliberately kept OUT of every
oracle path: a statistical detector's guesses change across library
versions (and are unreliable on short inputs — probed: a 13-char
cp1252 string misdetects as cp1125), so it would make oracle results
irreproducible. The deterministic chain's outputs are pinned
unchanged under the flag (regression-tested); oracle queries never
set it.

Also here: the **application/http** record shape — Common Crawl WARC
response blocks are raw captured HTTP responses (status line +
headers + body, possibly chunked transfer coding and gzip/deflate
content coding), so ``split_http_response`` / ``dechunk`` peel the
HTTP envelope (RFC 9112 framing) before charset detection sees the
body, and ``web_archive_text_records`` composes the whole chain:
WARC/ARC split → HTTP peel → charset sniff → transcode to UTF-8.

Spark-side this is bytes→text and must run in Python: Arrow-batched
``mapInPandas`` per the repo's decode contract (quarantine DLQ,
map-only, zero shuffle — parallelism = file count at any scale).
Reference repo has no text surface (SURVEY.md §0); need comes from
the r13 crawl envelope decoding everything as utf-8
(archive.py:116,166,891 before this module).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

# WHATWG canonical name -> Python codec. The canonical names are what
# the `charset` output column reports.
_KEY_TO_CODEC = {
    "utf-8": "utf-8",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "utf-32le": "utf-32-le",
    "utf-32be": "utf-32-be",
    "windows-1250": "cp1250",
    "windows-1251": "cp1251",
    "windows-1252": "cp1252",
    "windows-1253": "cp1253",
    "windows-1254": "cp1254",
    "windows-1255": "cp1255",
    "windows-1256": "cp1256",
    "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "shift_jis": "cp932",   # WHATWG Shift_JIS == windows-31j
    "euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "euc-kr": "cp949",      # WHATWG EUC-KR == the cp949 superset
    "gbk": "gbk",           # WHATWG GB2312/GBK unify to GBK
    "gb18030": "gb18030",
    "big5": "big5",
    "koi8-r": "koi8_r",
    "koi8-u": "koi8_u",
    "macintosh": "mac_roman",
    "iso-8859-2": "iso8859_2",
    "iso-8859-3": "iso8859_3",
    "iso-8859-4": "iso8859_4",
    "iso-8859-5": "iso8859_5",
    "iso-8859-6": "iso8859_6",
    "iso-8859-7": "iso8859_7",
    "iso-8859-8": "iso8859_8",
    "iso-8859-10": "iso8859_10",
    "iso-8859-13": "iso8859_13",
    "iso-8859-14": "iso8859_14",
    "iso-8859-15": "iso8859_15",
    "iso-8859-16": "iso8859_16",
    "ibm866": "cp866",
}

# WHATWG label -> canonical key (lowercased label, the alias subset a
# web corpus actually hits; full table at encoding.spec.whatwg.org §4).
_LABEL_TO_KEY = {
    # utf-8 family
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # the big one: ALL latin-1/ascii labels mean windows-1252 on the web
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252", "iso88591": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "cp819": "windows-1252",
    "ibm819": "windows-1252",
    # other windows codepages
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "windows-1253": "windows-1253", "cp1253": "windows-1253",
    "windows-1254": "windows-1254", "cp1254": "windows-1254",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "windows-1255": "windows-1255", "cp1255": "windows-1255",
    "windows-1256": "windows-1256", "cp1256": "windows-1256",
    "windows-1257": "windows-1257", "cp1257": "windows-1257",
    "windows-1258": "windows-1258", "cp1258": "windows-1258",
    # CJK
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis", "csshiftjis": "shift_jis",
    "windows-31j": "shift_jis", "cp932": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp", "cseucpkdfmtjapanese": "euc-jp",
    "iso-2022-jp": "iso-2022-jp", "csiso2022jp": "iso-2022-jp",
    "euc-kr": "euc-kr", "ks_c_5601-1987": "euc-kr", "korean": "euc-kr",
    "cseuckr": "euc-kr", "windows-949": "euc-kr", "cp949": "euc-kr",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "gb_2312-80": "gbk",
    "csgb2312": "gbk", "x-gbk": "gbk", "chinese": "gbk", "iso-ir-58": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5", "cn-big5": "big5",
    "csbig5": "big5", "x-x-big5": "big5",
    # cyrillic / other 8-bit
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi": "koi8-r",
    "cskoi8r": "koi8-r",
    "koi8-u": "koi8-u", "koi8-ru": "koi8-u",
    "ibm866": "ibm866", "866": "ibm866", "cp866": "ibm866",
    "csibm866": "ibm866",
    "macintosh": "macintosh", "mac": "macintosh", "x-mac-roman": "macintosh",
    "iso-8859-5": "iso-8859-5", "cyrillic": "iso-8859-5",
    "iso-8859-6": "iso-8859-6", "arabic": "iso-8859-6",
    "iso-8859-7": "iso-8859-7", "greek": "iso-8859-7", "greek8": "iso-8859-7",
    "iso-8859-8": "iso-8859-8", "hebrew": "iso-8859-8",
    # latin-N
    "iso-8859-2": "iso-8859-2", "latin2": "iso-8859-2", "l2": "iso-8859-2",
    "iso-8859-3": "iso-8859-3", "latin3": "iso-8859-3",
    "iso-8859-4": "iso-8859-4", "latin4": "iso-8859-4",
    "iso-8859-10": "iso-8859-10", "latin6": "iso-8859-10",
    "iso-8859-13": "iso-8859-13",
    "iso-8859-14": "iso-8859-14",
    "iso-8859-15": "iso-8859-15", "iso8859-15": "iso-8859-15",
    "iso_8859-15": "iso-8859-15", "latin9": "iso-8859-15",
    "l9": "iso-8859-15",
    "iso-8859-16": "iso-8859-16",
    # utf-16/32 (the "utf-16" label is LE per WHATWG)
    "utf-16": "utf-16le", "utf-16le": "utf-16le", "ucs-2": "utf-16le",
    "unicode": "utf-16le", "csunicode": "utf-16le",
    "utf-16be": "utf-16be",
    "utf-32": "utf-32le", "utf-32le": "utf-32le", "utf-32be": "utf-32be",
}


def normalize_charset_label(label: str | None) -> str | None:
    """WHATWG label → canonical key, or None for unknown labels
    (detection then continues to the next source)."""
    if not label:
        return None
    return _LABEL_TO_KEY.get(label.strip().strip("\"'").lower())


_CHARSET_PARAM_RE = re.compile(r"(?i)charset\s*=\s*\"?\s*([A-Za-z0-9._:-]+)")
# One pattern covers <meta charset=X> AND the http-equiv content=
# form — both end with charset=label (the WHATWG prescan accepts the
# superset; over-matching a stray 'charset=' inside the first 1 KiB of
# a <meta ...> tag is the documented prescan tradeoff).
_META_RE = re.compile(
    rb"(?i)<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9._:-]+)"
)
_XML_RE = re.compile(
    rb"(?i)^\s*<\?xml[^>]*\bencoding\s*=\s*[\"']([A-Za-z0-9._:-]+)[\"']"
)


def sniff_charset(
    payload: bytes, content_type: str | None = None
) -> tuple[str, str, str]:
    """→ (canonical key, python codec, source) per the module-doc
    chain. ``source`` ∈ bom | header | meta | xml | valid-utf8 |
    fallback."""
    # 1. BOM — overrides any label (WHATWG). UTF-32 before UTF-16:
    #    FF FE 00 00 is a UTF-32LE BOM, not UTF-16LE + NULs.
    if payload[:4] == b"\xff\xfe\x00\x00":
        return "utf-32le", "utf-32", "bom"   # 'utf-32' consumes the BOM
    if payload[:4] == b"\x00\x00\xfe\xff":
        return "utf-32be", "utf-32", "bom"
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8", "utf-8-sig", "bom"
    if payload[:2] == b"\xff\xfe":
        return "utf-16le", "utf-16", "bom"   # 'utf-16' consumes the BOM
    if payload[:2] == b"\xfe\xff":
        return "utf-16be", "utf-16", "bom"
    # 2. transport label
    if content_type:
        pm = _CHARSET_PARAM_RE.search(content_type)
        key = normalize_charset_label(pm.group(1)) if pm else None
        if key is not None:
            return key, _KEY_TO_CODEC[key], "header"
    head = payload[:1024]
    # 3. <meta> prescan
    mm = _META_RE.search(head)
    if mm:
        key = normalize_charset_label(mm.group(1).decode("ascii", "replace"))
        if key is not None:
            # WHATWG prescan quirk: a utf-16 META label is a lie if we
            # got here (no BOM, ASCII-readable meta) → treat as utf-8
            if key in ("utf-16le", "utf-16be"):
                key = "utf-8"
            return key, _KEY_TO_CODEC[key], "meta"
    # 4. XML declaration
    xm = _XML_RE.match(head)
    if xm:
        key = normalize_charset_label(xm.group(1).decode("ascii", "replace"))
        if key is not None:
            return key, _KEY_TO_CODEC[key], "xml"
    # 5. strict UTF-8 probe
    try:
        payload.decode("utf-8")
        return "utf-8", "utf-8", "valid-utf8"
    except UnicodeDecodeError:
        pass
    # 6. the legacy-web default
    return "windows-1252", "cp1252", "fallback"


def sniff_charset_statistical(
    payload: bytes, content_type: str | None = None
) -> tuple[str, str, str, float]:
    """→ (canonical key, python codec, source, confidence). The
    deterministic chain runs FIRST and is authoritative (confidence
    1.0 for any deterministic source); only when it lands on the
    cp1252 fallback is ``charset_normalizer`` consulted, so every
    labeled/BOM'd/valid-UTF-8 page decodes exactly as the oracle
    lane would. When the library is absent, returns None, or its
    guess can't be mapped to a codec, the deterministic fallback
    stands with confidence 0.0 — the flag can never make decoding
    FAIL, only re-guess the unlabeled-non-utf8 tail."""
    key, codec, source = sniff_charset(payload, content_type)
    if source != "fallback":
        return key, codec, source, 1.0
    try:
        import charset_normalizer
    except ImportError:  # pragma: no cover - probed present, but gate
        return key, codec, source, 0.0
    best = charset_normalizer.from_bytes(payload).best()
    if best is None:
        return key, codec, source, 0.0
    enc = best.encoding.replace("_", "-").lower()
    guess_key = normalize_charset_label(enc) or enc
    guess_codec = _KEY_TO_CODEC.get(guess_key, best.encoding)
    try:
        payload.decode(guess_codec, errors="strict")
        clean = True
    except (UnicodeDecodeError, LookupError):
        clean = False
    if not clean:
        return key, codec, source, 0.0
    # chaos is the library's 0..1 mess score (0 = clean); surface
    # 1-chaos so bigger = more trustworthy, like n_replacements==0
    return guess_key, guess_codec, "statistical", round(
        1.0 - float(best.chaos), 4
    )


def decode_text(
    payload: bytes,
    content_type: str | None = None,
    statistical: bool = False,
) -> dict:
    """bytes → {text (UTF-8 str), charset, charset_source,
    n_replacements[, confidence]}. Never raises on undecodable byte
    sequences — they become U+FFFD and are COUNTED (the confidence
    column: 0 = clean decode, large = the label lied or the bytes
    are binary). With ``statistical=True`` the flagged
    charset_normalizer lane may replace the cp1252 fallback (see
    module doc) and a ``confidence`` key rides along."""
    if statistical:
        key, codec, source, conf = sniff_charset_statistical(
            payload, content_type
        )
    else:
        key, codec, source = sniff_charset(payload, content_type)
    text = payload.decode(codec, errors="replace")
    out = {
        "text": text,
        "charset": key,
        "charset_source": source,
        "n_replacements": text.count("�"),
    }
    if statistical:
        out["confidence"] = conf
    return out


# ------------------------------------------------- HTTP record shape

_STATUS_RE = re.compile(rb"^HTTP/\d\.\d (\d{3})[^\r\n]*$")


def dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer coding (RFC 9112 §7.1):
    hex-size line CRLF, chunk bytes CRLF, ..., 0-size terminator.
    Trailer headers after the last chunk are discarded."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated chunk-size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            n = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"bad chunk size {size_tok!r}") from e
        pos = eol + 2
        if n == 0:
            return bytes(out)
        if pos + n > len(body):
            raise ValueError("chunk overruns the body")
        out += body[pos : pos + n]
        pos += n
        if body[pos : pos + 2] != b"\r\n":
            raise ValueError("chunk lacks its closing CRLF")
        pos += 2


def split_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """A WARC ``application/http; msgtype=response`` block is the raw
    captured HTTP response. → (status_code, lowercased headers dict,
    body bytes with transfer/content codings REMOVED — chunked
    de-chunked, gzip/deflate inflated under the shared decompression
    budget)."""
    from flink_hiveorc_spark.functions.multimodal import decompress_payload

    he = block.find(b"\r\n\r\n")
    if he < 0:
        raise ValueError("HTTP response lacks the header/body separator")
    head, body = block[:he], block[he + 4 :]
    lines = head.split(b"\r\n")
    sm = _STATUS_RE.match(lines[0])
    if not sm:
        raise ValueError(f"not an HTTP response status line: {lines[0]!r}")
    status = int(sm.group(1))
    headers: dict[str, str] = {}
    last_key: str | None = None
    for line in lines[1:]:
        if line[:1] in (b" ", b"\t"):   # obs-fold continuation
            if last_key is None:
                raise ValueError("HTTP header continuation before any header")
            headers[last_key] += " " + line.strip().decode("utf-8", "replace")
            continue
        ci = line.find(b":")
        if ci <= 0:
            raise ValueError("malformed HTTP header line (no colon)")
        last_key = line[:ci].strip().decode("ascii", "replace").lower()
        headers[last_key] = line[ci + 1 :].strip().decode("utf-8", "replace")
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = dechunk(body)
    ce = headers.get("content-encoding", "").lower().strip()
    if ce in ("gzip", "x-gzip", "deflate"):
        body = decompress_payload(body)
    elif ce and ce != "identity":
        raise NotImplementedError(
            f"HTTP content-encoding {ce!r} (needs a codec beyond "
            "gzip/deflate)"
        )
    return status, headers, body


# ------------------------------------------------- Spark operators

_DECODED_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("charset", T.StringType()),
        T.StructField("charset_source", T.StringType()),
        T.StructField("n_replacements", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def decoded_text_stats(
    payloads: DataFrame,
    quarantine: bool = False,
    statistical: bool = False,
) -> DataFrame:
    """(doc_id, payload[, content_type]) → charset-detected UTF-8
    text. Map-only mapInPandas per the decode contract (quarantine
    DLQ optional); the payload column never reaches any other plan
    (column pruning). ``statistical=True`` arms the flagged
    charset_normalizer fallback lane (module doc) and adds a
    ``confidence`` double column — NEVER set on oracle paths."""
    from flink_hiveorc_spark.functions.multimodal import (
        _ERROR_FIELD,
        _quarantine_error,
    )

    has_ct = "content_type" in payloads.columns
    base_fields = list(_DECODED_TEXT_SCHEMA.fields)
    if statistical:
        base_fields.insert(
            3, T.StructField("confidence", T.DoubleType())
        )
    cols = tuple(f.name for f in base_fields)
    out_schema = (
        T.StructType(base_fields + [_ERROR_FIELD])
        if quarantine
        else T.StructType(base_fields)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            if quarantine:
                out["error"] = []
            cts = pdf["content_type"] if has_ct else [None] * len(pdf)
            for doc_id, payload, ct in zip(pdf["doc_id"], pdf["payload"], cts):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    feats = decode_text(
                        bytes(payload), ct, statistical=statistical
                    )
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    for k in cols[1:]:
                        out[k].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                out["doc_id"].append(doc_id)
                for k in cols[1:]:
                    out[k].append(feats[k])
                if quarantine:
                    out["error"].append(None)
            yield pd.DataFrame(out)

    sel = ["doc_id", "payload"] + (["content_type"] if has_ct else [])
    return payloads.select(*sel).mapInPandas(gen, out_schema)


_TEXT_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("charset", T.StringType()),
        T.StructField("charset_source", T.StringType()),
        T.StructField("n_replacements", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def web_archive_text_records(
    payloads: DataFrame,
    quarantine: bool = False,
    statistical: bool = False,
) -> DataFrame:
    """The full crawl text chain in one map-only fan-out: WARC/ARC
    split → (for application/http response blocks, the real Common
    Crawl shape) HTTP envelope peel with chunked/gzip coding removal
    → charset sniff against the INNER Content-Type → transcode to
    UTF-8. One row per record: (doc_id, record_idx, fmt, rec_type,
    uri, content_type, http_status, charset, charset_source,
    n_replacements, text). ``content_type`` reports the innermost
    label (the HTTP header's when the block is an HTTP response,
    the record header's otherwise); ``http_status`` is NULL for
    non-HTTP blocks. ``statistical=True`` arms the flagged
    charset_normalizer fallback for unlabeled non-UTF-8 records
    (module doc — charset_source='statistical'; NEVER on oracle
    paths; the schema is unchanged, confidence rides only on
    decoded_text_stats). Zero shuffle; parallelism = file count."""
    from flink_hiveorc_spark.functions.archive import parse_web_archive

    def split(payload: bytes):
        fmt, recs = parse_web_archive(payload)
        items = []
        for r in recs:
            block, ctype, status = r["block"], r["content_type"], None
            if ctype.lower().split(";")[0].strip() == "application/http":
                # Real Common Crawl WARCs carry a request record next
                # to every response record, both typed application/
                # http — only the response shape has a status line to
                # peel. Discriminate on the msgtype parameter (RFC
                # 2616 media type), falling back to the WARC record
                # type when the label omits it; request/other blocks
                # flow through as raw text instead of failing the
                # whole payload.
                mm = re.search(r"msgtype\s*=\s*([\w-]+)", ctype.lower())
                msgtype = mm.group(1) if mm else None
                is_response = (
                    msgtype == "response"
                    if msgtype is not None
                    else r["rec_type"] == "response"
                )
                if is_response:
                    status, hdrs, block = split_http_response(block)
                    ctype = hdrs.get("content-type", "")
            d = decode_text(block, ctype, statistical=statistical)
            items.append(
                {
                    "rec_type": r["rec_type"],
                    "uri": r["uri"],
                    "content_type": ctype,
                    "http_status": status,
                    "charset": d["charset"],
                    "charset_source": d["charset_source"],
                    "n_replacements": d["n_replacements"],
                    "text": d["text"],
                }
            )
        return fmt, items

    from flink_hiveorc_spark.functions.archive import _fanout_df

    return _fanout_df(payloads, _TEXT_RECORD_SCHEMA, split, quarantine)


# --------------------------------------- WET / WAT sidecar ingest

# WAT metadata-record JSON envelope (the Common Crawl wat spec's
# subset a curation pipeline consumes) — parsed JVM-side by
# from_json, zero Python
_WAT_SCHEMA = T.StructType(
    [
        T.StructField(
            "Envelope",
            T.StructType(
                [
                    T.StructField(
                        "WARC-Header-Metadata",
                        T.StructType(
                            [T.StructField("WARC-Target-URI", T.StringType())]
                        ),
                    ),
                    T.StructField(
                        "Payload-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "Actual-Content-Length", T.LongType()
                                ),
                                T.StructField(
                                    "HTTP-Response-Metadata",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "HTML-Metadata",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Links",
                                                            T.ArrayType(
                                                                T.StructType(
                                                                    [
                                                                        T.StructField(
                                                                            "url",
                                                                            T.StringType(),
                                                                        )
                                                                    ]
                                                                )
                                                            ),
                                                        )
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def wet_wat_records(payloads: DataFrame) -> DataFrame:
    """Common Crawl ships three artifact types per crawl: the raw
    WARC, the WET text sidecar (conversion records, text/plain), and
    the WAT metadata sidecar (metadata records, one JSON document
    per page). This operator ingests BOTH sidecars through the same
    envelope chain: web_archive_text_records splits + transcodes the
    records (a WET conversion block is plain text; a WAT metadata
    block is UTF-8 JSON), warcinfo preamble records are filtered,
    and the WAT JSON parses JVM-side with from_json against the
    published envelope schema. → (doc_id, record_idx, kind wet|wat,
    uri, body_text, content_len, n_links, first_link); the WET leg
    carries the extracted text, the WAT leg the link graph. Scale:
    one map-only fan-out + JVM projections, zero exchanges."""
    recs = web_archive_text_records(payloads)
    wat = F.from_json(F.col("text"), _WAT_SCHEMA)
    pm = wat["Envelope"]["Payload-Metadata"]
    links = pm["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"]
    is_wet = F.col("rec_type") == "conversion"
    return recs.filter(
        F.col("rec_type").isin("conversion", "metadata")
    ).select(
        "doc_id",
        "record_idx",
        F.when(is_wet, F.lit("wet")).otherwise(F.lit("wat")).alias("kind"),
        F.when(is_wet, F.col("uri"))
        .otherwise(wat["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"])
        .alias("uri"),
        F.when(is_wet, F.col("text")).otherwise(F.lit("")).alias("body_text"),
        F.when(is_wet, F.octet_length("text").cast("long"))
        .otherwise(pm["Actual-Content-Length"])
        .alias("content_len"),
        # Non-HTML captures (robots.txt, images) carry a WAT envelope
        # with no HTML-Metadata.Links — that's 0 links, not NULL (and
        # not -1 under legacy sizeOfNull). NULL stays reserved for a
        # metadata block whose JSON didn't parse at all.
        F.when(is_wet, F.lit(0))
        .otherwise(
            F.when(
                wat["Envelope"].isNotNull(),
                F.coalesce(F.size(links), F.lit(0)),
            )
        )
        .cast("long")
        .alias("n_links"),
        F.when(is_wet, F.lit(""))
        .otherwise(F.element_at(links, 1)["url"])
        .alias("first_link"),
    )


@query(
    "pipeline_wet_wat_ingest",
    oracle="""
    SELECT doc_id,
           CAST(1 AS INTEGER) AS record_idx,
           CASE doc_id % 2 WHEN 0 THEN 'wet' ELSE 'wat' END AS kind,
           'https://example.com/' || doc_id AS uri,
           CASE doc_id % 2 WHEN 0
                THEN 'WET extract ' || source || ' ' || text
                ELSE '' END AS body_text,
           CAST(CASE doc_id % 2 WHEN 0
                THEN length('WET extract ' || source || ' ' || text)
                ELSE length(text) END AS BIGINT) AS content_len,
           CAST(CASE doc_id % 2 WHEN 0 THEN 0 ELSE 2 END AS BIGINT)
             AS n_links,
           CASE doc_id % 2 WHEN 0 THEN ''
                ELSE 'https://a.test/' || doc_id END AS first_link
    FROM documents
    """,
)
def pipeline_wet_wat_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET/WAT sidecar ingest under a GROUND-TRUTH oracle: each doc
    becomes a two-record WARC file — a constant warcinfo preamble
    (which the operator must FILTER) followed by either a WET
    conversion record whose text/plain block carries the doc's text
    (Content-Length = octet_length, data-dependent) or a WAT metadata
    record whose application/json block is the published Envelope
    shape with a data-dependent Actual-Content-Length and a two-entry
    Links array. The records run the REAL chain (record split →
    charset transcode → JVM from_json for WAT); DuckDB recomputes
    every expected output by plain string concat/length of the raw
    columns — no WARC or JSON logic oracle-side. Scale: map-only
    fan-out + projections, zero exchanges, Python only in the record
    splitter."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 2
    wet_body = F.concat(
        F.lit("WET extract "), F.col("source"), F.lit(" "), F.col("text")
    )
    # JSON-well-formed by construction: the only interpolated values
    # are doc_id and length(text), both numeric — no free text ever
    # enters the envelope, so no JSON escaping is needed (the office
    # twins, which DO interpolate corpus text, escape via saxutils)
    wat_body = F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":'
              '"https://example.com/'),
        did,
        F.lit('"},"Payload-Metadata":{"Actual-Content-Length":'),
        F.length("text").cast("string"),
        F.lit(',"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":'
              '[{"url":"https://a.test/'),
        did,
        F.lit('"},{"url":"/rel-'),
        did,
        F.lit('"}]}}}}}'),
    )
    body = F.when(m == 0, wet_body).otherwise(wat_body)
    info = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-00000000wi>\r\n"
        "Content-Type: application/warc-fields\r\n"
        "Content-Length: 16\r\n\r\nsoftware: graft\n\r\n\r\n"
    )
    rec = F.concat(
        F.lit(
            "WARC/1.0\r\nWARC-Type: "
        ),
        F.when(m == 0, F.lit("conversion")).otherwise(F.lit("metadata")),
        F.lit(
            "\r\nWARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-"
            "00000000cc>\r\nWARC-Target-URI: https://example.com/"
        ),
        did,
        F.lit("\r\nContent-Type: "),
        F.when(m == 0, F.lit("text/plain")).otherwise(
            F.lit("application/json")
        ),
        F.lit("\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
        F.lit("\r\n\r\n"),
    )
    payload = F.encode(F.concat(F.lit(info), rec), "utf-8")
    return wet_wat_records(d.select("doc_id", payload.alias("payload")))


# ------------------------------------------------------ the oracle

# scenario table for the ground-truth query: (canonical key expected,
# source expected, content_type sent, page prefix with non-ASCII
# bytes that PIN the codec table, python codec the ENCODER twin uses)
_SCENARIOS = [
    # 0: transport label, plain utf-8
    ("utf-8", "header", "text/plain; charset=utf-8", "café δοκιμή ", "utf-8"),
    # 1: the WHATWG alias rule — iso-8859-1 label, cp1252 bytes: the
    #    € (0x80) only decodes right if the alias maps to cp1252
    ("windows-1252", "header", "text/html; charset=iso-8859-1",
     "résumé €9 ", "cp1252"),
    # 2: <meta charset> form, Shift_JIS (encoded cp932 = windows-31j)
    ("shift_jis", "meta",
     "text/html", '<meta charset="shift_jis">こんにちは世界 ', "cp932"),
    # 3: http-equiv meta form, GBK
    ("gbk", "meta", "",
     '<meta http-equiv="Content-Type" '
     'content="text/html; charset=gb2312">你好世界 ', "gbk"),
    # 4: transport label, KOI8-R
    ("koi8-r", "header", "text/plain; charset=koi8-r", "Привет мир ",
     "koi8_r"),
    # 5: XML declaration, ISO-8859-15 (the € at 0xA4 pins -15 vs -1)
    ("iso-8859-15", "xml", "",
     '<?xml version="1.0" encoding="ISO-8859-15"?><x>€uro Geschäft</x> ',
     "iso8859_15"),
    # 6: UTF-16LE via BOM, no label anywhere
    ("utf-16le", "bom", "", "utf16 päth ", "utf-16"),
    # 7: no label, bytes happen to be valid UTF-8 → the strict probe
    ("utf-8", "valid-utf8", "", "ünïcode heuristic ", "utf-8"),
    # 8: no label, invalid-UTF-8 cp1252 bytes → the legacy fallback
    ("windows-1252", "fallback", "", "naïve fallback ", "cp1252"),
]


@query(
    "text_charset_decode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 9
             WHEN 0 THEN 'utf-8'        WHEN 1 THEN 'windows-1252'
             WHEN 2 THEN 'shift_jis'    WHEN 3 THEN 'gbk'
             WHEN 4 THEN 'koi8-r'       WHEN 5 THEN 'iso-8859-15'
             WHEN 6 THEN 'utf-16le'     WHEN 7 THEN 'utf-8'
             ELSE 'windows-1252' END AS charset,
           CASE doc_id % 9
             WHEN 0 THEN 'header'  WHEN 1 THEN 'header'
             WHEN 2 THEN 'meta'    WHEN 3 THEN 'meta'
             WHEN 4 THEN 'header'  WHEN 5 THEN 'xml'
             WHEN 6 THEN 'bom'     WHEN 7 THEN 'valid-utf8'
             ELSE 'fallback' END AS charset_source,
           CAST(0 AS BIGINT) AS n_replacements,
           CASE doc_id % 9
             WHEN 0 THEN 'café δοκιμή '
             WHEN 1 THEN 'résumé €9 '
             WHEN 2 THEN '<meta charset="shift_jis">こんにちは世界 '
             WHEN 3 THEN '<meta http-equiv="Content-Type" content="text/html; charset=gb2312">你好世界 '
             WHEN 4 THEN 'Привет мир '
             WHEN 5 THEN '<?xml version="1.0" encoding="ISO-8859-15"?><x>€uro Geschäft</x> '
             WHEN 6 THEN 'utf16 päth '
             WHEN 7 THEN 'ünïcode heuristic '
             ELSE 'naïve fallback ' END || source || ' ' || text AS text
    FROM documents
    """,
)
def text_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset detection + transcoding under a GROUND-TRUTH oracle:
    each doc's text is prefixed with codec-pinning non-ASCII literals
    and ENCODED into one of nine scenarios (doc_id % 9) by the stdlib
    codec tables — transport-labeled utf-8/koi8-r, the WHATWG
    iso-8859-1→windows-1252 alias (a € that only survives the cp1252
    table), <meta charset> Shift_JIS, http-equiv GBK, XML-declared
    ISO-8859-15 (€ at 0xA4 pins the -15 table against -1), a UTF-16LE
    BOM, an unlabeled valid-UTF-8 page, and unlabeled cp1252 bytes
    that must hit the legacy fallback. The operator must pick the
    right codec from the right source or the value hash dies: DuckDB
    recomputes every expected UTF-8 string by plain concat of the
    same literals with the raw columns — no charset logic
    oracle-side. Scale: two map-only Python passes (encoder twin +
    detector), zero exchanges."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    enc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "content_type": [],
                                     "payload": []}
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                _, _, ct, prefix, codec = _SCENARIOS[int(doc_id) % 9]
                rows["doc_id"].append(doc_id)
                rows["content_type"].append(ct)
                rows["payload"].append(
                    f"{prefix}{source} {text}".encode(codec)
                )
            yield pd.DataFrame(rows)

    payloads = d.mapInPandas(encode, enc_schema)
    return decoded_text_stats(payloads)
