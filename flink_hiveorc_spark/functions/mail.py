"""mbox / MIME email envelope — the mailing-list-corpus opener, the
third envelope family after WARC/ARC crawls and zip/tar drops
(functions/archive.py): public mailing-list archives (the classic
Enron set, Apache/LKML dumps) ship as mbox files whose messages are
MIME trees with base64/quoted-printable-encoded parts.

Pure stdlib: mbox framing is the RFC 4155 `From ` separator line;
message parsing is `email.parser.BytesParser` (headers, multipart
walk, Content-Transfer-Encoding decode). Operators follow the archive
module's contract — map-only one→many mapInPandas fan-out, quarantine
DLQ, bomb budgets shared with the decompress layer. A gzip-compressed
mbox (the common on-disk shape) routes through decompress_payload
first.

Reference repo has no mail surface (SURVEY.md §0); need comes from
BASELINE.json's LLM-curation envelope (mailing lists are a standard
pretraining corpus component).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

MAX_MAIL_MESSAGES = 10_000
MAX_PART_BYTES = 1 << 26  # shared budget (== MAX_DECOMPRESSED_BYTES, pinned)


def split_mbox(payload: bytes, max_messages: int = MAX_MAIL_MESSAGES) -> list[bytes]:
    """RFC 4155 mbox → raw message byte blocks. Framing: each message
    starts at a line beginning `From ` (the mboxo separator); body
    lines that themselves start with `From ` arrive `>`-quoted in
    real archives, so an unquoted mid-message `From ` line is BY
    DEFINITION a new message. The separator line itself is not part
    of the message."""
    if not payload.startswith(b"From "):
        raise ValueError("not an mbox payload (missing 'From ' separator)")
    msgs: list[bytes] = []
    pos = payload.find(b"\n")
    if pos < 0:
        raise ValueError("truncated mbox separator line")
    start = pos + 1
    while True:
        nxt = payload.find(b"\nFrom ", start)
        if nxt < 0:
            msgs.append(payload[start:])
            break
        msgs.append(payload[start : nxt + 1])
        start = payload.find(b"\n", nxt + 1)
        if start < 0:
            raise ValueError("truncated mbox separator line")
        start += 1
        if len(msgs) >= max_messages:
            raise ValueError(
                f"mbox exceeds {max_messages} messages (bomb guard)"
            )
    return msgs


def _decode_rfc2047(value: str) -> str:
    """RFC 2047 encoded-word header decode, paid only when the header
    actually carries one (the compat32 parser below leaves headers
    raw; policy.default would decode them but parses 13× slower —
    measured 879 vs 68 µs/message, the r13 outlier-sweep fix)."""
    if "=?" not in value:
        return value
    from email.header import decode_header

    out = []
    for piece, charset in decode_header(value):
        if isinstance(piece, bytes):
            out.append(piece.decode(charset or "ascii", "replace"))
        else:
            out.append(piece)
    return "".join(out)


def parse_mime_parts(
    message: bytes, max_part_bytes: int = MAX_PART_BYTES
) -> list[dict]:
    """One RFC 5322/2045 message → its leaf MIME parts, transfer
    encoding decoded (base64 / quoted-printable / 7bit/8bit), with
    the top-level Subject/From propagated onto every part row.
    Defective encodings classify as malformed (stdlib's permissive
    fallback would silently yield garbage bytes — re-raised here).
    Parses under the compat32 policy for throughput (see
    _decode_rfc2047)."""
    import email

    try:
        msg = email.message_from_bytes(message)
    except RecursionError:
        # pathological multipart nesting depth — classify, don't crash
        # (an uncaught RecursionError would escape the quarantine)
        raise ValueError("MIME nesting exceeds the parser depth")
    except Exception as e:
        raise ValueError(f"malformed MIME message: {e}") from e
    subject = _decode_rfc2047(str(msg.get("Subject", "")))
    sender = _decode_rfc2047(str(msg.get("From", "")))
    parts: list[dict] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        if part.defects:
            raise ValueError(
                f"malformed MIME part: {part.defects[0].__class__.__name__}"
            )
        try:
            content = part.get_payload(decode=True)
        except Exception as e:
            raise ValueError(f"malformed MIME part payload: {e}") from e
        if content is None:
            content = b""
        if len(content) > max_part_bytes:
            raise ValueError(
                f"MIME part exceeds {max_part_bytes} bytes (bomb guard)"
            )
        try:
            # compat32 hands back Header objects (not str) for headers
            # carrying raw 8-bit data — str() them; any other stdlib
            # surprise on garbage input is malformed, not a crash
            row = {
                "subject": subject,
                "sender": sender,
                "content_type": str(part.get_content_type()),
                "encoding": str(
                    part.get("Content-Transfer-Encoding", "7bit") or "7bit"
                ).lower(),
                "filename": str(part.get_filename() or ""),
                "content": bytes(content),
            }
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(f"malformed MIME part headers: {e}") from e
        parts.append(row)
    if not parts:
        raise ValueError("MIME message has no leaf parts")
    return parts


def parse_mailbox(payload: bytes) -> list[dict]:
    """mbox (optionally gzipped) → flat part rows with per-message
    indices: msg_idx over the mbox, part_idx within the message."""
    if payload[:2] == b"\x1f\x8b":
        from flink_hiveorc_spark.functions.multimodal import (
            decompress_payload,
        )

        payload = decompress_payload(bytes(payload))
    rows: list[dict] = []
    for mi, raw in enumerate(split_mbox(payload)):
        for pi, part in enumerate(parse_mime_parts(raw)):
            rows.append({"msg_idx": mi, "part_idx": pi, **part})
    return rows


_MAIL_PART_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("msg_idx", T.IntegerType()),
        T.StructField("part_idx", T.IntegerType()),
        T.StructField("subject", T.StringType()),
        T.StructField("sender", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

_MAIL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("msg_idx", T.IntegerType()),
        T.StructField("part_idx", T.IntegerType()),
        T.StructField("subject", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("part_bytes", T.LongType()),
        T.StructField("sum_byte", T.LongType()),
    ]
)


def _mail_fanout(
    payloads: DataFrame, schema: T.StructType, project, quarantine: bool
) -> DataFrame:
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
                    rows = [project(r) for r in parse_mailbox(bytes(payload))]
                except (NotImplementedError, ValueError) as e:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    for k in cols[1:]:
                        out[k].append(None)
                    out["error"].append(_quarantine_error(e))
                    continue
                for r in rows:
                    out["doc_id"].append(doc_id)
                    for k in cols[1:]:
                        out[k].append(r[k])
                    if quarantine:
                        out["error"].append(None)
            yield pd.DataFrame(out)

    return parallelize_small_scan(
        payloads.select("doc_id", "payload")
    ).mapInPandas(gen, out_schema)


def mail_parts(payloads: DataFrame, quarantine: bool = False) -> DataFrame:
    """(doc_id, payload) mbox blobs → one row per decoded MIME leaf
    part. The content column composes with the text/html/image
    featurizers downstream (an HTML mail part flows straight into
    html_stats)."""
    return _mail_fanout(payloads, _MAIL_PART_SCHEMA, lambda r: r, quarantine)


def mail_part_stats(
    payloads: DataFrame, quarantine: bool = False
) -> DataFrame:
    """Oracle-checkable projection: per-part byte length and sum over
    the DECODED content (proving the transfer-encoding decode, not
    just the framing)."""

    def project(r: dict) -> dict:
        return {
            "msg_idx": r["msg_idx"],
            "part_idx": r["part_idx"],
            "subject": r["subject"],
            "content_type": r["content_type"],
            "encoding": r["encoding"],
            "part_bytes": len(r["content"]),
            "sum_byte": sum(r["content"]),
        }

    return _mail_fanout(payloads, _MAIL_STATS_SCHEMA, project, quarantine)


@query(
    "multimodal_mime_stats",
    oracle="""
    WITH base AS (
      SELECT doc_id, md5(text) AS hx FROM documents
    ),
    b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(hx, 2 * i + 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(hx, 2 * i + 2, 1)) - 1)
             AS byte
      FROM base, UNNEST(range(0, 16)) AS t(i)
    ),
    s AS (SELECT doc_id, sum(byte) AS s_all FROM b GROUP BY doc_id),
    hs AS (
      SELECT doc_id, sum(ascii(substr(hx, j, 1))) AS hex_sum
      FROM base, UNNEST(range(1, 33)) AS u(j)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(0 AS INTEGER) AS msg_idx,
           CAST(0 AS INTEGER) AS part_idx,
           'digest report ' || doc_id AS subject,
           'text/plain' AS content_type, '7bit' AS encoding,
           -- body = 32 hex chars + the newline that precedes the next
           -- mbox separator (RFC 4155: the message owns it)
           CAST(33 AS BIGINT) AS part_bytes,
           CAST(hex_sum + 10 AS BIGINT) AS sum_byte
    FROM hs
    UNION ALL
    SELECT doc_id, CAST(1 AS INTEGER), CAST(0 AS INTEGER),
           'digest attachment ' || doc_id,
           'application/octet-stream', 'base64',
           CAST(16 AS BIGINT), CAST(s_all AS BIGINT)
    FROM s
    """,
)
def multimodal_mime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mbox/MIME splitting under the external oracle: each doc ships
    a TWO-MESSAGE mbox —
    message 0: a plain 7bit message whose body is the doc's md5 hex
      digest (32 ASCII chars; the oracle recomputes the byte sum of
      the hex CHARACTERS from digest-nibble arithmetic: nibble + 48
      for digits, nibble + 87 for a-f);
    message 1: a multipart/mixed message whose single leaf is a
      BASE64 attachment of the 16 raw digest bytes — Spark's own
      base64() encodes it in the construction, stdlib email decodes
      it back, and the oracle pins the DECODED sum, so a broken
      transfer-encoding path cannot hash-match.
    Both run through mail_part_stats' REAL mapInPandas fan-out
    (mbox From-line split + email.parser + walk). Scale: map-only,
    zero exchanges."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hx")
    )
    did = F.col("doc_id").cast("string")
    hx = F.col("hx")
    db = [F.unhex(F.substring(hx, 2 * i + 1, 2)) for i in range(16)]
    msg0 = F.concat(
        F.lit(
            "From alice@example.com Mon Jan  1 00:00:00 2024\n"
            "From: Alice <alice@example.com>\n"
        ),
        F.lit("Subject: digest report "),
        did,
        F.lit(
            "\nContent-Type: text/plain\n"
            "Content-Transfer-Encoding: 7bit\n\n"
        ),
        hx,
    )
    msg1 = F.concat(
        F.lit(
            "\nFrom bob@example.com Mon Jan  1 00:00:01 2024\n"
            "From: Bob <bob@example.com>\n"
        ),
        F.lit("Subject: digest attachment "),
        did,
        F.lit(
            "\nMIME-Version: 1.0\n"
            'Content-Type: multipart/mixed; boundary="XB"\n\n'
            "--XB\n"
            "Content-Type: application/octet-stream\n"
            "Content-Transfer-Encoding: base64\n"
            'Content-Disposition: attachment; filename="d.bin"\n\n'
        ),
        F.base64(F.concat(*db)),
        F.lit("\n--XB--\n"),
    )
    payload = F.encode(F.concat(msg0, msg1), "utf-8")
    return mail_part_stats(docs.select("doc_id", payload.alias("payload")))
