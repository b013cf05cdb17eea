"""WARC/ARC record splitting + zip/tar member expansion: parser
semantics pinned against stdlib-built fixtures, the error contract
(malformed=ValueError / unsupported=NotImplementedError), bomb guards,
quarantine fan-out, and fuzz classification stability."""

from __future__ import annotations

import gzip
import io
import struct
import tarfile
import zipfile

import numpy as np
import pytest

from flink_hiveorc_spark.functions.archive import (
    archive_members,
    expand_archive,
    expand_tar,
    expand_zip,
    parse_arc_records,
    parse_warc_records,
    parse_web_archive,
    web_archive_records,
)


def _warc_record(
    rec_type: str, uri: str, block: bytes, extra: str = ""
) -> bytes:
    return (
        (
            f"WARC/1.0\r\nWARC-Type: {rec_type}\r\n"
            f"WARC-Record-ID: <urn:uuid:00000000-0000-4000-8000-0000000000aa>\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"WARC-Target-URI: {uri}\r\n{extra}"
            "Content-Type: application/http\r\n"
            f"Content-Length: {len(block)}\r\n\r\n"
        ).encode()
        + block
        + b"\r\n\r\n"
    )


def _arc_payload(blocks: list[tuple[str, bytes]]) -> bytes:
    fd = b"1 0 Test\nURL IP-address Archive-date Content-type Archive-length\n"
    out = (
        b"filedesc://test.arc 0.0.0.0 20240101000000 text/plain "
        + str(len(fd)).encode()
        + b"\n"
        + fd
        + b"\n"
    )
    for url, block in blocks:
        out += (
            f"{url} 1.2.3.4 20240101000000 text/html {len(block)}\n".encode()
            + block
            + b"\n"
        )
    return out


# ------------------------------------------------------------ WARC


def test_warc_multi_record_split():
    p = _warc_record("request", "https://x.test/a", b"GET / HTTP/1.1\r\n")
    p += _warc_record("response", "https://x.test/a", b"HTTP/1.1 200 OK" * 3)
    recs = parse_warc_records(p)
    assert [r["rec_type"] for r in recs] == ["request", "response"]
    assert recs[0]["uri"] == "https://x.test/a"
    assert recs[0]["block"] == b"GET / HTTP/1.1\r\n"
    assert recs[1]["content_length"] == len(b"HTTP/1.1 200 OK" * 3)


def test_warc_folded_header_and_binary_block():
    blk = bytes(range(256))
    p = _warc_record(
        "resource",
        "https://x.test/bin",
        blk,
        extra="WARC-Concurrent-To: <urn:uuid:1>\r\n <urn:uuid:2>\r\n",
    )
    (rec,) = parse_warc_records(p)
    assert rec["block"] == blk and rec["content_length"] == 256


def test_warc_gzip_per_record_members():
    # the Common Crawl shape: each record its own gzip member
    r1 = _warc_record("request", "https://c.test", b"req")
    r2 = _warc_record("response", "https://c.test", b"resp-body")
    gz = gzip.compress(r1, mtime=0) + gzip.compress(r2, mtime=0)
    fmt, recs = parse_web_archive(gz)
    assert fmt == "warc"
    assert [r["block"] for r in recs] == [b"req", b"resp-body"]


def test_warc_error_contract():
    good = _warc_record("response", "https://x.test", b"abc")
    # unsupported version gates, not malformed
    with pytest.raises(NotImplementedError, match="WARC version"):
        parse_warc_records(good.replace(b"WARC/1.0", b"WARC/9.9", 1))
    # missing Content-Length
    bad = _warc_record("response", "https://x.test", b"abc").replace(
        b"Content-Length", b"X-Length", 1
    )
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_records(bad)
    # truncated block
    with pytest.raises(ValueError, match="overruns"):
        parse_warc_records(good[:-6])
    # missing terminator
    with pytest.raises(ValueError, match="closing CRLF"):
        parse_warc_records(good[:-4] + b"XXXX")
    # trailing garbage = a non-record
    with pytest.raises(ValueError, match="version line"):
        parse_warc_records(good + b"junk after the last record\r\n")
    with pytest.raises(ValueError, match="not a WARC"):
        parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n")


def test_warc_fuzz_byte_flips_stay_classified():
    rng = np.random.default_rng(42)
    good = _warc_record("response", "https://f.test", b"fuzz body 123")
    good += _warc_record("metadata", "https://f.test", b"meta")
    for _ in range(200):
        b = bytearray(good)
        i = int(rng.integers(0, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            parse_web_archive(bytes(b))
        except (ValueError, NotImplementedError):
            pass


# ------------------------------------------------------------- ARC


def test_arc_split_and_filedesc():
    p = _arc_payload(
        [("https://a.test/1", b"<html>one</html>"), ("https://a.test/2", b"two")]
    )
    fmt, recs = parse_web_archive(p)
    assert fmt == "arc"
    assert [r["rec_type"] for r in recs] == [
        "filedesc",
        "response",
        "response",
    ]
    assert recs[1]["uri"] == "https://a.test/1"
    assert recs[2]["block"] == b"two"
    # gzipped ARC routes the same way
    fmt2, recs2 = parse_web_archive(gzip.compress(p, mtime=0))
    assert fmt2 == "arc" and len(recs2) == 3


def test_arc_v2_ten_field_content_type_is_field_3():
    # ARC v2 header: URL IP-address Archive-date Content-type
    # Result-code Checksum Location Offset Filename Archive-length —
    # Content-type is fields[3] (fields[-2] is Filename; regression
    # for the r13 advice item that read the Filename column)
    block = b"<html>v2</html>"
    p = (
        b"filedesc://test.arc 0.0.0.0 20240101000000 text/plain 200 "
        b"- - 0 test.arc 9\n2 0 Test\n\n"
        + f"https://a.test/v2 1.2.3.4 20240101000000 text/html 200 "
        f"checksum - 100 test.arc {len(block)}\n".encode()
        + block
        + b"\n"
    )
    recs = parse_arc_records(p)
    assert [r["content_type"] for r in recs] == ["text/plain", "text/html"]
    assert recs[1]["block"] == block


def test_arc_error_contract():
    p = _arc_payload([("https://a.test/1", b"x")])
    with pytest.raises(ValueError, match="not an ARC"):
        parse_arc_records(b"https://no.filedesc 1.2.3.4 20240101 text 1\nx\n")
    with pytest.raises(ValueError, match="fields"):
        parse_arc_records(b"filedesc://t 0.0.0.0 20240101000000 3\nabc\n")
    with pytest.raises(ValueError, match="overruns"):
        parse_arc_records(p[:-2])
    with pytest.raises(ValueError, match="closing LF"):
        parse_arc_records(p[:-1] + b"Z")


# --------------------------------------------------------- zip/tar


def test_zip_roundtrip_stored_and_deflated():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("dir/keep.txt", b"hello zip", zipfile.ZIP_DEFLATED)
        zf.writestr("raw.bin", bytes(range(64)), zipfile.ZIP_STORED)
        zf.writestr("empty/", b"")  # directory entry: skipped
    fmt, members = expand_archive(buf.getvalue())
    assert fmt == "zip"
    assert [(m["name"], m["size"]) for m in members] == [
        ("dir/keep.txt", 9),
        ("raw.bin", 64),
    ]
    assert members[0]["content"] == b"hello zip"
    assert members[1]["content"] == bytes(range(64))


def test_zip_crc_corruption_is_malformed():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"payload under test", zipfile.ZIP_STORED)
    raw = bytearray(buf.getvalue())
    # flip a content byte after the local header (name ends at 30+5)
    raw[40] ^= 0xFF
    with pytest.raises(ValueError, match="malformed zip"):
        expand_zip(bytes(raw))


def test_zip_encrypted_member_gates():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("sec.txt", b"secret")
    raw = bytearray(buf.getvalue())
    # set the encryption flag bit in the local + central headers
    raw[6] |= 0x1
    off = raw.rfind(b"PK\x01\x02")
    raw[off + 8] |= 0x1
    with pytest.raises(NotImplementedError, match="encrypted"):
        expand_zip(bytes(raw))


def test_zip_bomb_guards():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("big.bin", b"z" * 4096, zipfile.ZIP_DEFLATED)
    with pytest.raises(ValueError, match="bomb guard"):
        expand_zip(buf.getvalue(), max_member_bytes=1024)
    with pytest.raises(ValueError, match="bomb guard"):
        expand_zip(buf.getvalue(), max_total_bytes=1024)
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        for i in range(4):
            zf.writestr(f"m{i}", b"x")
    with pytest.raises(ValueError, match="bomb guard"):
        expand_zip(buf2.getvalue(), max_members=2)


@pytest.mark.parametrize("codec", [None, "gz", "bz2", "xz"])
def test_tar_roundtrip_all_codecs(codec):
    buf = io.BytesIO()
    mode = "w" if codec is None else f"w:{codec}"
    with tarfile.open(fileobj=buf, mode=mode) as tf:
        data = b"tar member content"
        ti = tarfile.TarInfo("d/one.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
        ti2 = tarfile.TarInfo("two.bin")
        blob = bytes(range(200))
        ti2.size = len(blob)
        tf.addfile(ti2, io.BytesIO(blob))
        tdir = tarfile.TarInfo("d")
        tdir.type = tarfile.DIRTYPE
        tf.addfile(tdir)
    fmt, members = expand_archive(buf.getvalue())
    want_fmt = {
        None: "tar", "gz": "tar+gzip", "bz2": "tar+bzip2", "xz": "tar+xz"
    }[codec]
    assert fmt == want_fmt
    assert [(m["name"], m["size"]) for m in members] == [
        ("d/one.txt", 18),
        ("two.bin", 200),
    ]
    assert members[1]["content"] == bytes(range(200))


def test_tar_error_contract_and_guards():
    # all-zero blocks are tar's end-of-archive marker: an EMPTY tar
    assert expand_tar(b"\x00" * 1024) == []
    # a ustar-magic header with a corrupt checksum is malformed
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        ti = tarfile.TarInfo("x")
        ti.size = 1
        tf.addfile(ti, io.BytesIO(b"y"))
    bad = bytearray(buf.getvalue())
    bad[148:156] = b"0000000\x00"  # checksum field
    with pytest.raises(ValueError, match="malformed tar"):
        expand_tar(bytes(bad))
    with pytest.raises(ValueError, match="not an archive"):
        expand_archive(b"plain text, no magic anywhere")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        ti = tarfile.TarInfo("big")
        ti.size = 4096
        tf.addfile(ti, io.BytesIO(b"q" * 4096))
    with pytest.raises(ValueError, match="bomb guard"):
        expand_tar(buf.getvalue(), max_member_bytes=100)


def test_archive_fuzz_byte_flips_stay_classified():
    rng = np.random.default_rng(43)
    fixtures = []
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("f.txt", b"fuzz target", zipfile.ZIP_DEFLATED)
    fixtures.append(buf.getvalue())
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w:gz") as tf:
        ti = tarfile.TarInfo("f")
        ti.size = 4
        tf.addfile(ti, io.BytesIO(b"abcd"))
    fixtures.append(buf2.getvalue())
    for good in fixtures:
        for _ in range(150):
            b = bytearray(good)
            i = int(rng.integers(0, len(b)))
            b[i] ^= int(rng.integers(1, 256))
            try:
                expand_archive(bytes(b))
            except (ValueError, NotImplementedError):
                pass


# -------------------------------------------------- Spark operators


def test_web_archive_records_operator(spark):
    warc = _warc_record("response", "https://s.test/1", b"<html>hi</html>")
    warc += _warc_record("metadata", "https://s.test/1", b"m")
    arc = _arc_payload([("https://s.test/2", b"arc body")])
    rows = web_archive_records(
        spark.createDataFrame(
            [(1, bytearray(warc)), (2, bytearray(arc)), (3, b"nope")],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.record_idx, r.fmt, r.rec_type) for r in by_doc[1]] == [
        (0, "warc", "response"),
        (1, "warc", "metadata"),
    ]
    assert bytes(by_doc[1][0].block) == b"<html>hi</html>"
    assert [r.rec_type for r in by_doc[2]] == ["filedesc", "response"]
    assert by_doc[3][0].error.startswith("malformed:")
    # fail-fast default raises through the task
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        web_archive_records(
            spark.createDataFrame(
                [(1, b"nope")], "doc_id long, payload binary"
            )
        ).collect()


def test_archive_members_operator_composes_downstream(spark):
    # a zip whose members are themselves text blobs: the expansion's
    # content column feeds the text/dedup operators directly
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", b"first member text")
        zf.writestr("b.txt", b"second member text")
    empty = io.BytesIO()
    with zipfile.ZipFile(empty, "w"):
        pass
    rows = archive_members(
        spark.createDataFrame(
            [
                (1, bytearray(buf.getvalue())),
                (2, bytearray(empty.getvalue())),
                (3, b"garbage"),
            ],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [(r.member_idx, r.name) for r in by_doc[1]] == [
        (0, "a.txt"),
        (1, "b.txt"),
    ]
    assert bytes(by_doc[1][1].content) == b"second member text"
    assert 2 not in by_doc  # empty archive: zero rows, not an error
    assert by_doc[3][0].error.startswith("malformed:")


def test_warc_block_composes_with_image_stats(spark):
    """End-to-end envelope composition: WARC response blocks carrying
    PGM images flow from web_archive_records into image_stats."""
    from flink_hiveorc_spark.functions.multimodal import image_stats

    img = b"P5\n4 4\n255\n" + bytes(range(16))
    warc = _warc_record("response", "https://img.test/p", img)
    recs = web_archive_records(
        spark.createDataFrame(
            [(9, bytearray(warc))], "doc_id long, payload binary"
        )
    )
    out = image_stats(
        recs.selectExpr("doc_id", "block AS payload")
    ).collect()
    assert len(out) == 1
    assert (out[0].height, out[0].width) == (4, 4)
    assert out[0].mean_byte == sum(range(16)) / 16.0


def test_archive_budget_equals_decompress_budget():
    """archive.py states the shared bomb budget as a literal (lazy-
    import rule); it must track multimodal.MAX_DECOMPRESSED_BYTES."""
    from flink_hiveorc_spark.functions import archive
    from flink_hiveorc_spark.functions.multimodal import (
        MAX_DECOMPRESSED_BYTES,
    )

    assert archive.MAX_MEMBER_BYTES == MAX_DECOMPRESSED_BYTES
    assert archive.MAX_TOTAL_BYTES == MAX_DECOMPRESSED_BYTES


# ------------------------------------------------ JSONL text shards


def test_text_shard_lines_plain_and_compressed(spark):
    import bz2
    import lzma

    from flink_hiveorc_spark.functions.archive import text_shard_lines

    body = b'{"a":1}\n\n{"a":2}\n'  # interior empty line is a record
    rows = text_shard_lines(
        spark.createDataFrame(
            [
                (1, body),
                (2, gzip.compress(body, mtime=0)),
                (3, bz2.compress(body)),
                (4, lzma.compress(body)),
            ],
            "doc_id long, payload binary",
        )
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.line_idx, r.line))
    want = [(0, '{"a":1}'), (1, ""), (2, '{"a":2}')]
    for doc in (1, 2, 3, 4):
        assert sorted(by_doc[doc]) == want, doc


def test_text_shard_lines_quarantine(spark):
    from flink_hiveorc_spark.functions.archive import text_shard_lines

    bad_gz = bytearray(gzip.compress(b"x\n"))
    bad_gz[-2] ^= 0xFF
    rows = text_shard_lines(
        spark.createDataFrame(
            [(1, b"ok line\n"), (2, bytes(bad_gz))],
            "doc_id long, payload binary",
        ),
        quarantine=True,
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc[1][0].line == "ok line"
    assert by_doc[2][0].error.startswith("malformed:")
