"""mbox/MIME envelope: framing, transfer-encoding decode (base64 +
quoted-printable), nested multiparts, the error contract, and the
Spark fan-out with quarantine."""

from __future__ import annotations

import base64
import gzip

import numpy as np
import pytest

from flink_hiveorc_spark.functions.mail import (
    mail_part_stats,
    mail_parts,
    parse_mailbox,
    parse_mime_parts,
    split_mbox,
)


def _msg(headers: str, body: str) -> bytes:
    return f"From x@y Mon Jan  1 00:00:00 2024\n{headers}\n\n{body}".encode()


def test_split_mbox_framing():
    p = _msg("Subject: one", "body one\n") + _msg("Subject: two", "body two")
    msgs = split_mbox(p)
    assert len(msgs) == 2
    assert b"Subject: one" in msgs[0] and msgs[0].endswith(b"body one\n")
    assert msgs[1].endswith(b"body two")
    with pytest.raises(ValueError, match="not an mbox"):
        split_mbox(b"To: nobody\n\nhello")


def test_quoted_printable_and_base64_decode():
    qp = _msg(
        "Subject: qp\nContent-Type: text/plain\n"
        "Content-Transfer-Encoding: quoted-printable",
        "caf=C3=A9 line=\ncontinued",
    )
    (part,) = parse_mime_parts(qp)
    assert part["content"] == "café linecontinued".encode()
    assert part["encoding"] == "quoted-printable"
    raw = bytes(range(40))
    b64 = _msg(
        "Subject: b\nContent-Type: application/octet-stream\n"
        "Content-Transfer-Encoding: base64",
        base64.b64encode(raw).decode(),
    )
    (p2,) = parse_mime_parts(b64)
    assert p2["content"] == raw


def test_nested_multipart_walk():
    body = (
        "--A\nContent-Type: text/plain\n\nouter text\n"
        "--A\nContent-Type: multipart/alternative; boundary=\"B\"\n\n"
        "--B\nContent-Type: text/plain\n\nplain alt\n"
        "--B\nContent-Type: text/html\n\n<p>html alt</p>\n"
        "--B--\n--A--\n"
    )
    m = _msg(
        "Subject: nested\nMIME-Version: 1.0\n"
        'Content-Type: multipart/mixed; boundary="A"',
        body,
    )
    parts = parse_mime_parts(m)
    assert [p["content_type"] for p in parts] == [
        "text/plain",
        "text/plain",
        "text/html",
    ]
    assert all(p["subject"] == "nested" for p in parts)


def test_gzip_mbox_routes_through_decompress():
    p = _msg("Subject: z", "zipped body")
    rows = parse_mailbox(gzip.compress(p, mtime=0))
    assert len(rows) == 1 and rows[0]["content"] == b"zipped body"


def test_mid_body_from_line_starts_new_message():
    # unquoted 'From ' at line start is BY DEFINITION a separator
    # (real archives >-quote body From lines)
    p = _msg("Subject: a", "line\n") + _msg("Subject: b", "tail")
    rows = parse_mailbox(p)
    assert [(r["msg_idx"], r["subject"]) for r in rows] == [
        (0, "a"),
        (1, "b"),
    ]


def test_bomb_guard_and_fuzz():
    many = b"".join(
        _msg(f"Subject: {i}", "x\n") for i in range(12)
    )
    with pytest.raises(ValueError, match="bomb guard"):
        split_mbox(many, max_messages=10)
    rng = np.random.default_rng(44)
    good = _msg(
        "Subject: f\nContent-Type: application/octet-stream\n"
        "Content-Transfer-Encoding: base64",
        base64.b64encode(b"fuzz target bytes").decode(),
    )
    for _ in range(150):
        b = bytearray(good)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            parse_mailbox(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_spark_fanout_and_quarantine(spark):
    p = _msg("Subject: s1", "hello\n") + _msg(
        "Subject: s2\nContent-Type: text/html", "<p>hi</p>"
    )
    rows = mail_parts(
        spark.createDataFrame(
            [(1, bytearray(p)), (2, b"not a mailbox")],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.msg_idx, r.subject) for r in by_doc[1]] == [
        (0, "s1"),
        (1, "s2"),
    ]
    assert bytes(by_doc[1][1].content) == b"<p>hi</p>"
    assert by_doc[2][0].error.startswith("malformed:")
    stats = mail_part_stats(
        spark.createDataFrame(
            [(1, bytearray(p))], "doc_id long, payload binary"
        )
    ).collect()
    assert [(r.part_bytes, r.sum_byte) for r in stats] == [
        (6, sum(b"hello\n")),
        (9, sum(b"<p>hi</p>")),
    ]


def test_mail_part_budget_matches_decompress_budget():
    from flink_hiveorc_spark.functions import mail
    from flink_hiveorc_spark.functions.multimodal import (
        MAX_DECOMPRESSED_BYTES,
    )

    assert mail.MAX_PART_BYTES == MAX_DECOMPRESSED_BYTES


def test_rfc2047_subject_decodes_under_fast_parser():
    # the compat32 fast path must still decode encoded-word headers
    m = _msg(
        "Subject: =?utf-8?B?Y2Fmw6k=?= =?iso-8859-1?Q?_men=FC?=\n"
        "Content-Type: text/plain",
        "body",
    )
    (part,) = parse_mime_parts(m)
    assert part["subject"] == "café menü"
