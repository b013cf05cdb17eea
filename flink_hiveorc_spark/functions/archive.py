"""Web-archive (WARC/ARC) record splitting and multi-member archive
(zip/tar) expansion — the envelope formats ABOVE the r12 blob
decompression layer (multimodal.py: gzip/zlib/bz2/xz).

Why this exists: Common Crawl — the single most common raw input to an
LLM data pipeline — ships as WARC (ISO 28500) files, per-record
gzipped; its pre-2010 crawls ship as ARC v1. Scraped corpora and data
dumps arrive as .zip / .tar / .tar.gz blobs. The engine already decodes
the CONTENTS (HTML text, images, gzip members) but needed the envelope
openers. Reference repo has no archive surface at all (SURVEY.md §0 —
icandeal/flink-hiveorc is a Kafka→ORC sink, HiveOrcSink.java:39-43);
need comes from BASELINE.json's LLM-curation envelope.

Format knowledge is public spec only: WARC = ISO 28500 / the IIPC
warc-specifications (version line, named headers, Content-Length
framing, CRLF CRLF record terminator); ARC v1 = the Internet Archive's
ARC_IA file format doc (space-separated 5-field header line, LF-framed
blocks); zip = APPNOTE.TXT (read via stdlib zipfile); tar = POSIX ustar
(read via stdlib tarfile).

100 TB posture: every operator here is a map-only one→many fan-out
(mapInPandas, Arrow batches) with the decode-contract quarantine
channel; parallelism is file count, no shuffle. Bomb guards: member/
record counts capped, per-member and total expanded bytes capped, and
compressed envelopes route through decompress_payload's incremental
output cap, so a crafted archive can never materialize unbounded bytes
on an executor.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import (
    load_table,
    memo_constant_column,
    parallelize_small_scan,
)
from flink_hiveorc_spark.registry import query

# multimodal.py is imported LAZILY inside functions: registry._load_all
# reaches this module while multimodal may still be mid-import (the
# circular-import hazard registry.py's docstring documents), so a
# module-level `from ...multimodal import X` dies on Spark workers.

MAX_ARCHIVE_MEMBERS = 10_000
# Shared bomb-guard budget with the decompress layer: must equal
# multimodal.MAX_DECOMPRESSED_BYTES (pinned by a test; stated as a
# literal here because of the lazy-import rule above).
MAX_MEMBER_BYTES = 1 << 26
MAX_TOTAL_BYTES = 1 << 26

_WARC_VERSIONS = ("0.17", "0.18", "1.0", "1.1")


# ------------------------------------------------------------- WARC


def parse_warc_records(
    payload: bytes, max_records: int = MAX_ARCHIVE_MEMBERS
) -> list[dict]:
    """Split a (already-decompressed) WARC payload into records.

    Framing per ISO 28500: a `WARC/<version>` line, CRLF-terminated
    named headers (folded continuation lines start with space/tab),
    an empty line, exactly Content-Length block bytes, then CRLF CRLF.
    Records concatenate back-to-back to end-of-payload; anything else
    is malformed (ValueError). Versions beyond the published family
    gate with NotImplementedError (unsupported, not corrupt)."""
    if not payload.startswith(b"WARC/"):
        raise ValueError("not a WARC payload (missing WARC/ version line)")
    pos = 0
    records: list[dict] = []
    while pos < len(payload):
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        ver_line = payload[pos:eol]
        if not ver_line.startswith(b"WARC/"):
            raise ValueError(
                f"record {len(records)} does not start with a WARC/ "
                "version line"
            )
        version = ver_line[5:].decode("ascii", "replace")
        if version not in _WARC_VERSIONS:
            raise NotImplementedError(
                f"WARC version {version!r} not supported (have "
                f"{'/'.join(_WARC_VERSIONS)})"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key: str | None = None
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = payload[pos:eol]
            pos = eol + 2
            if line == b"":
                break
            if line[:1] in (b" ", b"\t"):
                if last_key is None:
                    raise ValueError(
                        "WARC header continuation before any header"
                    )
                headers[last_key] += " " + line.strip().decode(
                    "utf-8", "replace"
                )
                continue
            ci = line.find(b":")
            if ci <= 0:
                raise ValueError("malformed WARC header line (no colon)")
            key = line[:ci].strip().decode("ascii", "replace").lower()
            headers[key] = line[ci + 1 :].strip().decode("utf-8", "replace")
            last_key = key
        cl = headers.get("content-length")
        if cl is None or not cl.isdigit():
            raise ValueError("WARC record lacks a valid Content-Length")
        n = int(cl)
        if pos + n > len(payload):
            raise ValueError("WARC block overruns the payload")
        block = payload[pos : pos + n]
        pos += n
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("WARC record lacks the closing CRLF CRLF")
        pos += 4
        records.append(
            {
                "rec_type": headers.get("warc-type", ""),
                "record_id": headers.get("warc-record-id", ""),
                "uri": headers.get("warc-target-uri", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": n,
                "block": block,
            }
        )
        if len(records) > max_records:
            raise ValueError(
                f"WARC payload exceeds {max_records} records (bomb guard)"
            )
    return records


# -------------------------------------------------------------- ARC


def parse_arc_records(
    payload: bytes, max_records: int = MAX_ARCHIVE_MEMBERS
) -> list[dict]:
    """Split an ARC v1/v2 payload (Internet Archive legacy crawl
    format) into records. Framing: an LF-terminated space-separated
    header line — `URL IP-address Archive-date Content-type
    Archive-length` (v1, 5 fields) or the 10-field v2 variant — then
    exactly Archive-length block bytes, then one LF. The first record
    must be the filedesc:// version block."""
    if not payload.startswith(b"filedesc://"):
        raise ValueError("not an ARC payload (missing filedesc:// record)")
    pos = 0
    records: list[dict] = []
    while pos < len(payload):
        eol = payload.find(b"\n", pos)
        if eol < 0:
            raise ValueError("truncated ARC header line")
        fields = payload[pos:eol].decode("utf-8", "replace").split(" ")
        if len(fields) not in (5, 10):
            raise ValueError(
                f"ARC header has {len(fields)} fields (want 5 for v1 or "
                "10 for v2)"
            )
        length = fields[-1]
        if not length.isdigit():
            raise ValueError("ARC Archive-length is not a number")
        n = int(length)
        pos = eol + 1
        if pos + n > len(payload):
            raise ValueError("ARC block overruns the payload")
        block = payload[pos : pos + n]
        pos += n
        if payload[pos : pos + 1] != b"\n":
            raise ValueError("ARC record lacks the closing LF")
        pos += 1
        url = fields[0]
        records.append(
            {
                "rec_type": "filedesc" if url.startswith("filedesc://")
                else "response",
                "record_id": "",
                "uri": url,
                "content_type": fields[3],
                "content_length": n,
                "block": block,
            }
        )
        if len(records) > max_records:
            raise ValueError(
                f"ARC payload exceeds {max_records} records (bomb guard)"
            )
    return records


def parse_web_archive(payload: bytes) -> tuple[str, list[dict]]:
    """Sniff-and-split: gzip envelopes (the Common Crawl on-disk shape
    — per-record gzip members concatenate into one multi-member
    stream, which decompress_payload already handles per RFC 1952
    §2.2) are decompressed first, then the stream routes on its magic
    to the WARC or ARC splitter."""
    from flink_hiveorc_spark.functions.multimodal import decompress_payload

    if payload[:2] == b"\x1f\x8b":
        payload = decompress_payload(bytes(payload))
    if payload.startswith(b"WARC/"):
        return "warc", parse_warc_records(payload)
    if payload.startswith(b"filedesc://"):
        return "arc", parse_arc_records(payload)
    raise ValueError("not a WARC/ARC payload")


# ------------------------------------------------------ zip and tar


def expand_zip(
    payload: bytes,
    max_members: int = MAX_ARCHIVE_MEMBERS,
    max_member_bytes: int = MAX_MEMBER_BYTES,
    max_total_bytes: int = MAX_TOTAL_BYTES,
) -> list[dict]:
    """Expand a zip payload into (name, size, content) members via
    stdlib zipfile (which VERIFIES each member's CRC-32 on read, so
    corruption classifies as malformed, never silent garbage).
    Directory entries are skipped; encrypted members gate with
    NotImplementedError (they need a key, not a codec fix). Declared
    sizes are checked against the bomb budget BEFORE any byte is
    expanded."""
    import io
    import zipfile

    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        infos = zf.infolist()
    except zipfile.BadZipFile as e:
        raise ValueError(f"malformed zip payload: {e}") from e
    members: list[dict] = []
    total = 0
    for zi in infos:
        if zi.is_dir():
            continue
        if len(members) >= max_members:
            raise ValueError(
                f"zip exceeds {max_members} members (bomb guard)"
            )
        if zi.flag_bits & 0x1:
            raise NotImplementedError(
                f"zip member {zi.filename!r} is encrypted"
            )
        if zi.file_size > max_member_bytes:
            raise ValueError(
                f"zip member {zi.filename!r} declares {zi.file_size} "
                f"bytes > {max_member_bytes} (bomb guard)"
            )
        total += zi.file_size
        if total > max_total_bytes:
            raise ValueError(
                f"zip expands past {max_total_bytes} total bytes "
                "(bomb guard)"
            )
        try:
            content = zf.read(zi)
        except NotImplementedError:
            raise  # unsupported compression method (e.g. 14=lzma absent)
        except Exception as e:  # BadZipFile / zlib.error / CRC mismatch
            raise ValueError(
                f"malformed zip member {zi.filename!r}: {e}"
            ) from e
        members.append(
            {"name": zi.filename, "size": len(content), "content": content}
        )
    return members


def expand_tar(
    payload: bytes,
    max_members: int = MAX_ARCHIVE_MEMBERS,
    max_member_bytes: int = MAX_MEMBER_BYTES,
    max_total_bytes: int = MAX_TOTAL_BYTES,
) -> list[dict]:
    """Expand an (uncompressed) tar payload via stdlib tarfile.
    Regular files only (directories/links carry no member bytes);
    declared sizes are checked against the bomb budget before
    extraction."""
    import io
    import tarfile

    try:
        tf = tarfile.open(fileobj=io.BytesIO(payload), mode="r:")
        infos = tf.getmembers()
    except tarfile.TarError as e:
        raise ValueError(f"malformed tar payload: {e}") from e
    members: list[dict] = []
    total = 0
    for ti in infos:
        if not ti.isreg():
            continue
        if len(members) >= max_members:
            raise ValueError(
                f"tar exceeds {max_members} members (bomb guard)"
            )
        if ti.size > max_member_bytes:
            raise ValueError(
                f"tar member {ti.name!r} declares {ti.size} bytes > "
                f"{max_member_bytes} (bomb guard)"
            )
        total += ti.size
        if total > max_total_bytes:
            raise ValueError(
                f"tar expands past {max_total_bytes} total bytes "
                "(bomb guard)"
            )
        try:
            content = tf.extractfile(ti).read()
        except Exception as e:
            raise ValueError(
                f"malformed tar member {ti.name!r}: {e}"
            ) from e
        members.append(
            {"name": ti.name, "size": len(content), "content": content}
        )
    return members


def expand_archive(payload: bytes) -> tuple[str, list[dict]]:
    """Sniff-and-expand: zip by its PK signature; compressed tars
    (.tar.gz/.tar.bz2/.tar.xz) route through decompress_payload (the
    r12 layer: integrity-verified, output-capped) and then the tar
    expander; bare ustar directly. Anything else is not an archive."""
    if payload[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip", expand_zip(payload)
    codec = None
    if payload[:2] == b"\x1f\x8b":
        codec = "gzip"
    elif payload[:3] == b"BZh":
        codec = "bzip2"
    elif payload[:6] == b"\xfd7zXZ\x00":
        codec = "xz"
    if codec is not None:
        from flink_hiveorc_spark.functions.multimodal import (
            decompress_payload,
        )

        inner = decompress_payload(bytes(payload))
        return f"tar+{codec}", expand_tar(inner)
    if len(payload) >= 263 and payload[257:262] == b"ustar":
        return "tar", expand_tar(payload)
    raise ValueError("not an archive payload (zip/tar/tar+codec)")


# ------------------------------------------------- Spark operators

_WEB_ARCHIVE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("block", T.BinaryType()),
    ]
)

_ARCHIVE_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("member_idx", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _fanout_df(
    payloads: DataFrame,
    schema: T.StructType,
    split,  # payload bytes -> (fmt, list[dict with the schema's fields])
    quarantine: bool,
) -> DataFrame:
    """Shared one→many fan-out (the gif_frame_sample contract): each
    payload becomes one row per record/member; decode-contract
    failures either propagate (fail-fast) or become ONE null row with
    the classified error (quarantine DLQ). Map-only, Arrow batches,
    no shuffle; parallelism = file count."""
    from flink_hiveorc_spark.functions.multimodal import (
        _ERROR_FIELD,
        _quarantine_error,
    )

    cols = tuple(f.name for f in schema.fields)
    out_schema = (
        T.StructType(schema.fields + [_ERROR_FIELD]) if quarantine else schema
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            if quarantine:
                out["error"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    fmt, items = split(bytes(payload))
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    for k in cols[1:]:
                        out[k].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                for idx, item in enumerate(items):
                    out["doc_id"].append(doc_id)
                    out[cols[1]].append(idx)
                    out["fmt"].append(fmt)
                    for k in cols[3:]:
                        out[k].append(item[k])
                    if quarantine:
                        out["error"].append(None)
            yield pd.DataFrame(out)

    return parallelize_small_scan(
        payloads.select("doc_id", "payload")
    ).mapInPandas(gen, out_schema)


def web_archive_records(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """(doc_id, payload) WARC/ARC blobs → one row per archive record
    (doc_id, record_idx, fmt warc|arc, rec_type, uri, content_type,
    content_length, block). The block column composes directly with
    the downstream featurizers (text_stats on HTML, image_stats on
    payload images, decompress_stats on nested members)."""

    def split(payload: bytes):
        fmt, recs = parse_web_archive(payload)
        return fmt, [
            {
                "rec_type": r["rec_type"],
                "uri": r["uri"],
                "content_type": r["content_type"],
                "content_length": r["content_length"],
                "block": r["block"],
            }
            for r in recs
        ]

    return _fanout_df(payloads, _WEB_ARCHIVE_SCHEMA, split, quarantine)


def archive_members(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """(doc_id, payload) zip/tar blobs → one row per member file
    (doc_id, member_idx, fmt zip|tar|tar+codec, name, size, content).
    Directories and non-regular entries are skipped; empty archives
    fan out to zero rows (not an error)."""

    def split(payload: bytes):
        fmt, members = expand_archive(payload)
        return fmt, members

    return _fanout_df(payloads, _ARCHIVE_MEMBER_SCHEMA, split, quarantine)


# ----------------------------------- oracle-checked stats rotations

_WARC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("rec_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("sum_byte", T.LongType()),
    ]
)

_ARCHIVE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("member_idx", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("sum_byte", T.LongType()),
    ]
)


def web_archive_stats(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """Per-record statistics through the REAL WARC/ARC split path:
    (doc_id, record_idx, fmt, rec_type, uri, content_length,
    sum_byte of the block) — the oracle-checkable projection of
    web_archive_records."""

    def split(payload: bytes):
        fmt, recs = parse_web_archive(payload)
        return fmt, [
            {
                "rec_type": r["rec_type"],
                "uri": r["uri"],
                "content_length": r["content_length"],
                "sum_byte": sum(r["block"]),
            }
            for r in recs
        ]

    return _fanout_df(payloads, _WARC_STATS_SCHEMA, split, quarantine)


def archive_member_stats(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """Per-member statistics through the REAL zip/tar expansion path:
    (doc_id, member_idx, fmt, name, size, sum_byte of the content)."""

    def split(payload: bytes):
        fmt, members = expand_archive(payload)
        return fmt, [
            {
                "name": m["name"],
                "size": m["size"],
                "sum_byte": sum(m["content"]),
            }
            for m in members
        ]

    return _fanout_df(payloads, _ARCHIVE_STATS_SCHEMA, split, quarantine)


# ---------------------------------------------- synthetic fixtures
#
# The oracle rotations reuse the r12 decode-stats construction
# discipline: payloads are built Spark-side from md5(text) digest
# bytes with constant framing, so DuckDB can recompute every expected
# feature from digest arithmetic while Spark runs the REAL parsers.

_WARC_META_CONTENT = (
    b"warc metadata constant leg: web_archive_stats external oracle\n"
)
_WARC_META_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: metadata\r\n"
    b"WARC-Record-ID: <urn:uuid:0d9c2a7e-6d4f-4b5e-9a1c-000000000002>\r\n"
    b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
    b"WARC-Target-URI: https://example.com/meta\r\n"
    b"Content-Type: text/plain\r\n"
    + f"Content-Length: {len(_WARC_META_CONTENT)}\r\n\r\n".encode()
    + _WARC_META_CONTENT
    + b"\r\n\r\n"
)


def _warc_gz_leg() -> bytes:
    """The per-record-gzip Common Crawl shape as a constant leg
    (compressed at build time — DEFLATE output needs no cross-engine
    determinism because the oracle recomputes only the CONTENT
    features, the bz2/xz decompress-leg precedent)."""
    import gzip as _gzip

    return _gzip.compress(_WARC_META_RECORD, mtime=0)


_ARC_FILEDESC_CONTENT = (
    b"1 0 FlinkHiveOrcSpark\n"
    b"URL IP-address Archive-date Content-type Archive-length\n"
)
_ARC_FILEDESC = (
    b"filedesc://archive.example.org 0.0.0.0 20240101000000 text/plain "
    + str(len(_ARC_FILEDESC_CONTENT)).encode()
    + b"\n"
    + _ARC_FILEDESC_CONTENT
    + b"\n"
)


def _tar_header(name: str, size: int) -> bytes:
    """POSIX ustar member header, built from the published 512-byte
    layout (octal text fields, space-initialized checksum over the
    whole header)."""
    hdr = bytearray(512)
    nb = name.encode("ascii")
    hdr[0 : len(nb)] = nb
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = (b"%011o" % size) + b"\x00"
    hdr[136:148] = b"00000000000\x00"
    hdr[148:156] = b"        "
    hdr[156] = ord("0")
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[148:156] = (b"%06o" % sum(hdr)) + b"\x00 "
    return bytes(hdr)


_TARGZ_CONTENT = b"tar+gzip constant leg: archive_member_stats oracle\n"


def _targz_leg() -> bytes:
    import gzip as _gzip

    tar = (
        _tar_header("c.txt", len(_TARGZ_CONTENT))
        + _TARGZ_CONTENT
        + bytes(512 - len(_TARGZ_CONTENT))
        + bytes(1024)
    )
    return _gzip.compress(tar, mtime=0)


_DOC_URI_PREFIX = "https://example.com/doc/"


@query(
    "multimodal_warc_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, md5(text) AS hx, doc_id % 4 AS m FROM documents
    ),
    b AS (
      SELECT doc_id, m,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1)
             AS byte, i
      FROM base, UNNEST(range(0, 16)) AS t(i)
    ),
    s AS (
      SELECT doc_id, m,
             sum(byte) AS s_all,
             sum(CASE WHEN i < 8 THEN byte ELSE 0 END) AS s_lo,
             sum(CASE WHEN i >= 8 THEN byte ELSE 0 END) AS s_hi
      FROM b GROUP BY doc_id, m
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS record_idx, 'warc' AS fmt,
           'response' AS rec_type,
           '{_DOC_URI_PREFIX}' || doc_id AS uri,
           CAST(16 AS BIGINT) AS content_length,
           CAST(s_all AS BIGINT) AS sum_byte
    FROM s WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), 'warc', 'request',
           '{_DOC_URI_PREFIX}' || doc_id, CAST(8 AS BIGINT),
           CAST(s_lo AS BIGINT)
    FROM s WHERE m = 1
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER), 'warc', 'response',
           '{_DOC_URI_PREFIX}' || doc_id, CAST(8 AS BIGINT),
           CAST(s_hi AS BIGINT)
    FROM s WHERE m = 1
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), 'warc', 'metadata',
           'https://example.com/meta',
           CAST({len(_WARC_META_CONTENT)} AS BIGINT),
           CAST({sum(_WARC_META_CONTENT)} AS BIGINT)
    FROM s WHERE m = 2
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), 'arc', 'filedesc',
           'filedesc://archive.example.org',
           CAST({len(_ARC_FILEDESC_CONTENT)} AS BIGINT),
           CAST({sum(_ARC_FILEDESC_CONTENT)} AS BIGINT)
    FROM s WHERE m = 3
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER), 'arc', 'response',
           '{_DOC_URI_PREFIX}' || doc_id, CAST(16 AS BIGINT),
           CAST(s_all AS BIGINT)
    FROM s WHERE m = 3
    """,
)
def multimodal_warc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/ARC record splitting under the external oracle, doc_id % 4:
    0 WARC, one response record whose 16-byte block is the doc's md5
      digest and whose Target-URI embeds the doc_id;
    1 WARC, TWO records (request carrying digest[0:8], response
      carrying digest[8:16]) — pins multi-record framing and the
      record_idx ordering;
    2 gzip-wrapped constant metadata record — the Common Crawl
      per-record-gzip shape, pinning the decompress→WARC composition;
    3 ARC v1: the filedesc version block plus one response record
      carrying the 16 digest bytes — pins the legacy-crawl splitter.
    All legs run through web_archive_stats' REAL mapInPandas fan-out.
    Reference has no archive surface (SURVEY.md §0); need: Common
    Crawl WARC is the highest-frequency raw input an LLM pipeline
    reads (r12 verdict next-round #2)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hx")
    )
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    did = F.encode(F.col("doc_id").cast("string"), "utf-8")

    def warc_hdr(rec_type: str, uuid_tail: str, n: int):
        pre = (
            f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            f"WARC-Record-ID: <urn:uuid:0d9c2a7e-6d4f-4b5e-9a1c-"
            f"{uuid_tail}>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: {_DOC_URI_PREFIX}"
        ).encode()
        post = (
            "\r\nContent-Type: application/octet-stream\r\n"
            f"Content-Length: {n}\r\n\r\n"
        ).encode()
        return F.concat(F.lit(pre), did, F.lit(post))

    end = F.lit(b"\r\n\r\n")
    warc0 = F.concat(
        warc_hdr("response", "000000000000", 16), F.concat(*db), end
    )
    warc1 = F.concat(
        warc_hdr("request", "000000000001", 8), F.concat(*db[:8]), end,
        warc_hdr("response", "000000000011", 8), F.concat(*db[8:]), end,
    )
    arc3 = F.concat(
        F.lit(_ARC_FILEDESC),
        F.lit(_DOC_URI_PREFIX.encode()),
        did,
        F.lit(b" 10.0.0.1 20240101000000 application/octet-stream 16\n"),
        F.concat(*db),
        F.lit(b"\n"),
    )
    m = F.col("doc_id") % 4
    payload = (
        F.when(m == 0, warc0)
        .when(m == 1, warc1)
        .when(m == 2, F.lit(_warc_gz_leg()))
        .otherwise(arc3)
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return web_archive_stats(payloads)


@query(
    "multimodal_archive_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, md5(text) AS hx, doc_id % 3 AS m FROM documents
    ),
    b AS (
      SELECT doc_id, m,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1)
             AS byte
      FROM base, UNNEST(range(0, 16)) AS t(i)
    ),
    s AS (SELECT doc_id, m, sum(byte) AS s_all FROM b GROUP BY doc_id, m)
    SELECT doc_id, CAST(0 AS INTEGER) AS member_idx, 'tar' AS fmt,
           'm0.bin' AS name, CAST(16 AS BIGINT) AS size,
           CAST(s_all AS BIGINT) AS sum_byte
    FROM s WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), 'zip', 'a.bin', CAST(16 AS BIGINT),
           CAST(s_all AS BIGINT)
    FROM s WHERE m = 1
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), 'tar+gzip', 'c.txt',
           CAST({len(_TARGZ_CONTENT)} AS BIGINT),
           CAST({sum(_TARGZ_CONTENT)} AS BIGINT)
    FROM s WHERE m = 2
    """,
)
def multimodal_archive_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip/tar member expansion under the external oracle, doc_id % 3:
    0 POSIX ustar tar holding one member `m0.bin` with the doc's 16
      md5 digest bytes (constant 512-byte header built from the
      published layout — octal fields + space-seeded checksum);
    1 STORED zip holding one member `a.bin` with the digest bytes —
      the member CRC-32 ships as the GF(2)-linear digest form (the
      decompress-leg construction) and stdlib zipfile VERIFIES it, so
      a wrong CRC table or header offset kills the row;
    2 constant tar.gz — pins the decompress→tar composition.
    All legs run through archive_member_stats' REAL mapInPandas
    fan-out. Reference has no archive surface (SURVEY.md §0); need:
    scraped corpora and data dumps arrive as zip/tar blobs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hx")
    )
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    dv = [
        F.conv(F.substring(hx, 2 * i + 1, 2), 16, 10).cast("long")
        for i in range(16)
    ]
    from flink_hiveorc_spark.functions.multimodal import _crc32_tables

    content16 = F.concat(*db)
    base16, t16 = _crc32_tables(16)
    crc = F.lit(base16).cast("long")
    for i, d in enumerate(dv):
        lut = F.lit(t16[i]).substr(d * 4 + 1, F.lit(4))
        crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
    crc_le = F.concat(
        *(
            F.unhex(
                F.lpad(
                    F.hex(F.shiftright(crc, 8 * k).bitwiseAND(F.lit(255))),
                    2,
                    "0",
                )
            )
            for k in range(4)
        )
    )
    tar0 = F.concat(
        F.lit(_tar_header("m0.bin", 16)),
        content16,
        F.lit(bytes(512 - 16) + bytes(1024)),
    )
    name = b"a.bin"
    lfh_pre = b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0x21)
    lfh_post = struct.pack("<IIHH", 16, 16, len(name), 0) + name
    cd_pre = b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0x21)
    cd_post = (
        struct.pack(
            "<IIHHHHHII", 16, 16, len(name), 0, 0, 0, 0, 0, 0
        )
        + name
    )
    lfh_len = len(lfh_pre) + 4 + len(lfh_post) + 16
    cd_len = len(cd_pre) + 4 + len(cd_post)
    eocd = b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, 1, 1, cd_len, lfh_len, 0
    )
    zip1 = F.concat(
        F.lit(lfh_pre),
        crc_le,
        F.lit(lfh_post),
        content16,
        F.lit(cd_pre),
        crc_le,
        F.lit(cd_post),
        F.lit(eocd),
    )
    m = F.col("doc_id") % 3
    payload = (
        F.when(m == 0, tar0)
        .when(m == 1, zip1)
        .otherwise(F.lit(_targz_leg()))
    )
    payloads = docs.select("doc_id", payload.alias("payload"))
    return archive_member_stats(payloads)


# ------------------------------------------------- JSONL text shards

_SHARD_LINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("line_idx", T.IntegerType()),
        T.StructField("line", T.StringType()),
    ]
)


def text_shard_lines(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """(doc_id, payload) text-shard blobs — jsonl / jsonl.gz(.bz2/.xz),
    THE standard LLM pretraining shard format — to one row per line.
    Python touches only the envelope (magic-routed decompression via
    the r12 layer + a newline split); the JSON parsing belongs
    downstream in the JVM (from_json), where Catalyst keeps it in
    codegen. Trailing newline does not fabricate an empty last line;
    interior empty lines are preserved (they are real records to a
    JSONL validator)."""

    def split(payload: bytes):
        if payload[:2] == b"\x1f\x8b" or payload[:3] == b"BZh" or (
            payload[:6] == b"\xfd7zXZ\x00"
        ):
            from flink_hiveorc_spark.functions.multimodal import (
                decompress_payload,
            )

            payload = decompress_payload(bytes(payload))
        text = payload.decode("utf-8", "replace")
        lines = text.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        return "jsonl", [{"line": ln} for ln in lines]

    # reuse the archive fan-out shape: cols = (doc_id, idx, fmt-less)
    cols = tuple(f.name for f in _SHARD_LINE_SCHEMA.fields)
    out_schema = (
        T.StructType(_SHARD_LINE_SCHEMA.fields + [_error_field()])
        if quarantine
        else _SHARD_LINE_SCHEMA
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from flink_hiveorc_spark.functions.multimodal import (
            _quarantine_error,
        )

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            if quarantine:
                out["error"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    _, items = split(bytes(payload))
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    out["line_idx"].append(None)
                    out["line"].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                for idx, item in enumerate(items):
                    out["doc_id"].append(doc_id)
                    out["line_idx"].append(idx)
                    out["line"].append(item["line"])
                    if quarantine:
                        out["error"].append(None)
            yield pd.DataFrame(out)

    return parallelize_small_scan(
        payloads.select("doc_id", "payload")
    ).mapInPandas(gen, out_schema)


def _error_field():
    from flink_hiveorc_spark.functions.multimodal import _ERROR_FIELD

    return _ERROR_FIELD


@memo_constant_column
def _jsonl_gz_payload():
    """The jsonl/jsonl.gz shard payload expression of
    pipeline_jsonl_gz_ingest — a constant tree over doc_id / lang /
    n_chars / hx (the 42-position CRC LUT XOR chain dominates its
    ~250-py4j-call build cost), built once per process (see
    memo_constant_column)."""
    import zlib as _zlib

    from flink_hiveorc_spark.functions.multimodal import (
        _GZIP_HDR,
        _crc32_tables,
        _stored_deflate,
    )

    did = F.col("doc_id").cast("string")
    # m=0: plain, data-dependent JSONL
    plain = F.concat(
        F.lit('{"id":"'), did, F.lit('","v":"'), F.col("lang"),
        F.lit('","n":'), F.col("n_chars").cast("string"), F.lit("}\n"),
        F.lit('{"id":"'), (F.col("doc_id") + 1000000).cast("string"),
        F.lit('","v":"line-two","n":'),
        (F.col("doc_id") % 97).cast("string"), F.lit("}\n"),
    )
    # m=1: gzip of the fixed-width template line
    pre = b'{"id":"'
    mid = b'","v":"'
    post = b'","n":32}\n'
    L = len(pre) + 10 + len(mid) + 32 + len(post)
    id_at = len(pre)
    hx_at = len(pre) + 10 + len(mid)
    template = pre + bytes(10) + mid + bytes(32) + post
    base = _zlib.crc32(template)
    _, tables = _crc32_tables(L)
    lp = F.lpad(did, 10, "0")
    # r16: the 42-step XOR chain is a data-driven aggregate fold over
    # (position table, position char) instead of 42 unrolled
    # expression copies — the unrolled tree pushed the fused
    # whole-stage past janino's 64 KB method limit ("Code grows
    # beyond 64 KB"), silently degrading the ENTIRE stage to
    # interpreted execution (found by the r16 sweep; the ERROR lands
    # in executor logs only). Higher-order functions evaluate as a
    # compact CodegenFallback island, so the stage compiles again;
    # the fold alone also measures faster than the unrolled form
    # (0.29 vs 0.47 s warm, 0.57 vs 1.97 s first-run at sf0.1) and
    # is bit-identical (A/B exceptAll = 0 + the oracle's independent
    # CRC verification).
    ordered = [tables[id_at + k] for k in range(10)] + [
        tables[hx_at + k] for k in range(32)
    ]
    tab_arr = F.array(*[F.lit(t) for t in ordered])
    pos_str = F.concat(lp, F.col("hx"))
    crc = F.aggregate(
        F.sequence(F.lit(0), F.lit(41)),
        F.lit(base).cast("long"),
        lambda acc, k: acc.bitwiseXOR(
            F.conv(
                F.hex(
                    F.element_at(tab_arr, k + 1).substr(
                        F.ascii(
                            F.substring(pos_str, k + 1, F.lit(1)).cast(
                                "string"
                            )
                        ).cast("long")
                        * 4
                        + 1,
                        F.lit(4),
                    )
                ),
                16,
                10,
            ).cast("long")
        ),
    )
    crc_le = F.concat(
        *(
            F.unhex(
                F.lpad(
                    F.hex(F.shiftright(crc, 8 * k).bitwiseAND(F.lit(255))),
                    2,
                    "0",
                )
            )
            for k in range(4)
        )
    )
    content = F.encode(
        F.concat(
            F.lit(pre.decode()), lp, F.lit(mid.decode()), F.col("hx"),
            F.lit(post.decode()),
        ),
        "utf-8",
    )
    gz = F.concat(
        F.lit(_GZIP_HDR + _stored_deflate(L)),
        content,
        crc_le,
        F.lit(struct.pack("<I", L)),
    )
    return F.when(
        F.col("doc_id") % 2 == 0, F.encode(plain, "utf-8")
    ).otherwise(gz)


@query(
    "pipeline_jsonl_gz_ingest",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, n_chars, md5(text) AS hx, doc_id % 2 AS m
      FROM documents
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS line_idx,
           CAST(doc_id AS VARCHAR) AS rec_id,
           lang AS val, CAST(n_chars AS BIGINT) AS n
    FROM base WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER),
           CAST(doc_id + 1000000 AS VARCHAR),
           'line-two', CAST(doc_id % 97 AS BIGINT)
    FROM base WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER),
           lpad(CAST(doc_id AS VARCHAR), 10, '0'),
           hx, CAST(32 AS BIGINT)
    FROM base WHERE m = 1
    """,
)
def pipeline_jsonl_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonl / jsonl.gz shard ingest end-to-end under the external
    oracle, doc_id % 2:
    0 PLAIN two-line JSONL built from raw columns (data-dependent
      lengths everywhere);
    1 GZIP whose DEFLATE body is one stored block carrying a
      FIXED-WIDTH JSON line (10-digit zero-padded id + the 32-char
      md5) — fixed width makes the member's CRC-32 expressible as the
      GF(2)-linear form over the 42 varying byte positions (the
      decompress-oracle construction generalized to a constant
      TEMPLATE: crc = crc(template-with-zeros) XOR the per-position
      tables), and the stdlib VERIFIES it, so a wrong template, pad
      width, or table offset kills the row.
    The envelope split (text_shard_lines) is the only Python; the
    JSON itself parses JVM-side via from_json, staying in codegen.
    Scale: map-only fan-out + projection, zero exchanges.

    Perf shape (r15 optimization round): the scan fans out HERE,
    before the payload-construction projection — text_shard_lines'
    own fan-out sits above the projection, so the 42-position CRC
    concat tree used to evaluate on the single-row-group scan's one
    task; and the payload expression (a pure constant tree, ~250
    py4j calls to build) is memoized per process
    (_jsonl_gz_payload / memo_constant_column)."""
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("hx")
    )
    lines = text_shard_lines(
        d.select("doc_id", _jsonl_gz_payload().alias("payload"))
    )
    parsed = lines.select(
        "doc_id",
        "line_idx",
        F.from_json(
            F.col("line"), "id string, v string, n long"
        ).alias("j"),
    )
    return parsed.select(
        "doc_id",
        "line_idx",
        F.col("j.id").alias("rec_id"),
        F.col("j.v").alias("val"),
        F.col("j.n").alias("n"),
    )


@query(
    "pipeline_csv_gz_ingest",
    oracle="""
    WITH base AS (
      SELECT doc_id, lang, source, n_chars, doc_id % 2 AS m FROM documents
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS line_idx,
           CAST(doc_id AS BIGINT) AS rec_id, lang AS val,
           CAST(n_chars AS BIGINT) AS n
    FROM base WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER), CAST(doc_id + 1000000 AS BIGINT),
           source, CAST(doc_id % 89 AS BIGINT)
    FROM base WHERE m = 0
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER), CAST(doc_id AS BIGINT),
           'quoted, comma', CAST(doc_id % 7 AS BIGINT)
    FROM base WHERE m = 1
    """,
)
def pipeline_csv_gz_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV shard ingest through the same envelope: text_shard_lines
    splits (gzip leg routed through the decompress layer — built with
    gzip-module bytes over DATA-DEPENDENT content this time, since
    from_csv needs no fixed-width trick), from_csv parses JVM-side.
    The gzip leg's single record carries a QUOTED field with an
    embedded comma — the dialect detail a naive split would break on.
    doc_id % 2: 0 = plain two-line CSV from raw columns; 1 = a gzip
    member built Spark-side as a stored-deflate block (the JSONL-leg
    construction) with the quoted field constant and the numeric
    fields varying — 11 CRC table positions. The bigint parse of the
    zero-padded record id must drop the padding, or the oracle
    mismatches. Scale: map-only, zero exchanges."""
    import zlib as _zlib

    from flink_hiveorc_spark.functions.multimodal import (
        _GZIP_HDR,
        _crc32_tables,
        _stored_deflate,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    did = F.col("doc_id").cast("string")
    plain = F.concat(
        did, F.lit(","), F.col("lang"), F.lit(","),
        F.col("n_chars").cast("string"), F.lit("\n"),
        (F.col("doc_id") + 1000000).cast("string"), F.lit(","),
        F.col("source"), F.lit(","),
        (F.col("doc_id") % 89).cast("string"), F.lit("\n"),
    )
    # gzip leg: fixed-width record id (10 digits) + constant quoted
    # field + 1-digit n (doc_id % 7) -> fixed total length
    pre = b""
    mid = b',"quoted, comma",'
    post = b"\n"
    L = 10 + len(mid) + 1 + len(post)
    template = bytes(10) + mid + bytes(1) + post
    base = _zlib.crc32(template)
    _, tables = _crc32_tables(L)
    lp = F.lpad(did, 10, "0")
    n1 = (F.col("doc_id") % 7).cast("string")
    crc = F.lit(base).cast("long")
    for k in range(10):
        v = F.ascii(F.substring(lp, k + 1, 1)).cast("long")
        lut = F.lit(tables[k]).substr(v * 4 + 1, F.lit(4))
        crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
    v = F.ascii(n1).cast("long")
    lut = F.lit(tables[10 + len(mid)]).substr(v * 4 + 1, F.lit(4))
    crc = crc.bitwiseXOR(F.conv(F.hex(lut), 16, 10).cast("long"))
    crc_le = F.concat(
        *(
            F.unhex(
                F.lpad(
                    F.hex(F.shiftright(crc, 8 * k).bitwiseAND(F.lit(255))),
                    2,
                    "0",
                )
            )
            for k in range(4)
        )
    )
    content = F.encode(
        F.concat(lp, F.lit(mid.decode()), n1, F.lit(post.decode())), "utf-8"
    )
    gz = F.concat(
        F.lit(_GZIP_HDR + _stored_deflate(L)),
        content,
        crc_le,
        F.lit(struct.pack("<I", L)),
    )
    payload = F.when(
        F.col("doc_id") % 2 == 0, F.encode(plain, "utf-8")
    ).otherwise(gz)
    lines = text_shard_lines(d.select("doc_id", payload.alias("payload")))
    parsed = lines.select(
        "doc_id",
        "line_idx",
        F.from_csv(
            F.col("line"), "rec_id bigint, val string, n bigint"
        ).alias("c"),
    )
    return parsed.select(
        "doc_id", "line_idx", F.col("c.rec_id").alias("rec_id"),
        F.col("c.val").alias("val"), F.col("c.n").alias("n"),
    )
