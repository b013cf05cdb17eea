"""Charset detection + transcoding: the WHATWG sniff chain (BOM >
header > meta > xml > utf-8 probe > cp1252 fallback), the alias table
pins (iso-8859-1 → windows-1252, gb2312 → gbk, shift_jis → cp932),
the HTTP response peel (status/headers/chunked/content-coding), and
the mojibake regression through the REAL crawl chain."""

from __future__ import annotations

import gzip

import pytest

from flink_hiveorc_spark.functions.charset import (
    dechunk,
    decode_text,
    decoded_text_stats,
    normalize_charset_label,
    sniff_charset,
    split_http_response,
    web_archive_text_records,
)


def test_bom_beats_any_label():
    p = "päth".encode("utf-16")  # LE BOM on this platform
    key, codec, src = sniff_charset(p, "text/plain; charset=koi8-r")
    assert src == "bom" and key in ("utf-16le", "utf-16be")
    assert decode_text(p, "text/plain; charset=koi8-r")["text"] == "päth"


def test_utf32_bom_not_mistaken_for_utf16():
    p = "abc".encode("utf-32")  # FF FE 00 00 on LE platforms
    d = decode_text(p)
    assert d["charset"] == "utf-32le" and d["text"] == "abc"


def test_utf8_bom_stripped():
    d = decode_text(b"\xef\xbb\xbfhello")
    assert d["charset"] == "utf-8" and d["charset_source"] == "bom"
    assert d["text"] == "hello" and d["n_replacements"] == 0


def test_whatwg_latin1_alias_is_cp1252():
    # € is 0x80 in cp1252 and a C1 control in true latin-1 — the
    # WHATWG rule says the iso-8859-1 LABEL means windows-1252
    d = decode_text("price €9".encode("cp1252"), "text/html; charset=iso-8859-1")
    assert d["charset"] == "windows-1252" and d["text"] == "price €9"
    assert d["n_replacements"] == 0
    for label in ("latin1", "us-ascii", "ascii", "ANSI_X3.4-1968", "cp819"):
        assert normalize_charset_label(label) == "windows-1252"


def test_cjk_aliases():
    assert normalize_charset_label("gb2312") == "gbk"
    assert normalize_charset_label("Shift-JIS") == "shift_jis"
    assert normalize_charset_label("x-sjis") == "shift_jis"
    assert normalize_charset_label("ks_c_5601-1987") == "euc-kr"
    # windows-31j repertoire beyond base shift_jis decodes (cp932)
    d = decode_text("①".encode("cp932"), "text/plain; charset=shift_jis")
    assert d["text"] == "①" and d["n_replacements"] == 0


def test_meta_prescan_both_forms():
    p = '<meta charset="shift_jis"><p>こんにちは</p>'.encode("cp932")
    d = decode_text(p, "text/html")
    assert d["charset"] == "shift_jis" and d["charset_source"] == "meta"
    assert "こんにちは" in d["text"]
    p2 = (
        '<meta http-equiv="Content-Type" content="text/html; '
        'charset=gb2312">你好'.encode("gbk")
    )
    d2 = decode_text(p2)
    assert d2["charset"] == "gbk" and "你好" in d2["text"]


def test_meta_utf16_lie_becomes_utf8():
    # WHATWG prescan quirk: an ASCII-readable <meta charset=utf-16>
    # cannot be utf-16 — treat as utf-8
    d = decode_text(b'<meta charset="utf-16le">ascii body')
    assert d["charset"] == "utf-8" and d["charset_source"] == "meta"


def test_xml_declaration_pins_8859_15():
    # € is 0xA4 in -15; a -1/cp1252 decode gives curren/euro confusion
    p = '<?xml version="1.0" encoding="ISO-8859-15"?><x>€uro</x>'.encode(
        "iso8859_15"
    )
    d = decode_text(p)
    assert d["charset"] == "iso-8859-15" and d["charset_source"] == "xml"
    assert "€uro" in d["text"]


def test_unknown_label_falls_through():
    d = decode_text(b"plain", "text/plain; charset=x-klingon")
    assert d["charset_source"] == "valid-utf8"
    d2 = decode_text("naïve".encode("cp1252"), "text/plain; charset=x-klingon")
    assert d2["charset_source"] == "fallback" and d2["text"] == "naïve"


def test_replacement_counting_flags_lying_labels():
    d = decode_text("Привет".encode("koi8_r"), "text/plain; charset=utf-8")
    assert d["charset"] == "utf-8" and d["n_replacements"] > 0


def test_http_peel_chunked_and_gzip():
    body = gzip.compress("café page".encode("cp1252"), mtime=0)
    a, b = body[:5], body[5:]
    chunks = (
        b"%x\r\n" % len(a) + a + b"\r\n"
        + b"%x;ext=1\r\n" % len(b) + b + b"\r\n0\r\n\r\n"
    )
    resp = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=iso-8859-1\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + chunks
    )
    st, hdrs, out = split_http_response(resp)
    assert st == 200
    d = decode_text(out, hdrs["content-type"])
    assert d["text"] == "café page" and d["charset"] == "windows-1252"


def test_http_peel_error_contract():
    with pytest.raises(ValueError, match="separator"):
        split_http_response(b"HTTP/1.1 200 OK\r\nno-end")
    with pytest.raises(ValueError, match="status line"):
        split_http_response(b"GET / HTTP/1.1\r\n\r\n")
    with pytest.raises(NotImplementedError, match="content-encoding"):
        split_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nx"
        )
    with pytest.raises(ValueError, match="chunk"):
        dechunk(b"zz\r\nhello\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="overruns"):
        dechunk(b"ff\r\nshort\r\n0\r\n\r\n")


def _warc(records: list[tuple[str, bytes]]) -> bytes:
    out = b""
    for ctype, block in records:
        out += (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:t>\r\n"
            b"WARC-Target-URI: https://x.test/\r\n"
            b"Content-Type: " + ctype.encode() + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
            + block + b"\r\n\r\n"
        )
    return out


def test_mojibake_regression_through_crawl_chain(spark):
    """The r13 chain decoded everything as utf-8 — a Shift_JIS page
    came out as mojibake. The charset-aware chain must round-trip it."""
    jp = "<html><body><p>日本語のページです</p></body></html>"
    payload = _warc(
        [
            ("text/html; charset=shift_jis", jp.encode("cp932")),
            # full HTTP envelope with gzip content-coding
            (
                "application/http; msgtype=response",
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=koi8-r\r\n"
                b"Content-Encoding: gzip\r\n\r\n"
                + gzip.compress("<p>Русский текст</p>".encode("koi8_r"), mtime=0),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {
        r["record_idx"]: r
        for r in web_archive_text_records(df).collect()
    }
    assert rows[0]["charset"] == "shift_jis"
    assert "日本語のページです" in rows[0]["text"]
    assert rows[0]["n_replacements"] == 0 and rows[0]["http_status"] is None
    assert rows[1]["charset"] == "koi8-r" and rows[1]["http_status"] == 200
    assert "Русский текст" in rows[1]["text"]
    assert rows[1]["content_type"] == "text/html; charset=koi8-r"


def test_wet_wat_records(spark):
    from flink_hiveorc_spark.functions.charset import wet_wat_records

    wat_json = (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":'
        '"https://w.test/1"},"Payload-Metadata":{"Actual-Content-Length"'
        ':77,"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":'
        '[{"url":"https://l.test/a"},{"url":"/b"},{"url":"/c"}]}}}}}'
    )

    def rec(rtype, ctype, body: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: " + rtype.encode()
            + b"\r\nWARC-Record-ID: <urn:uuid:t>\r\n"
            b"WARC-Target-URI: https://w.test/1\r\n"
            b"Content-Type: " + ctype.encode() + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    payload = (
        rec("warcinfo", "application/warc-fields", b"software: x\n")
        + rec("conversion", "text/plain", "wet text päge".encode())
        + rec("metadata", "application/json", wat_json.encode())
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {r["kind"]: r for r in wet_wat_records(df).collect()}
    assert set(rows) == {"wet", "wat"}  # warcinfo filtered
    assert rows["wet"]["body_text"] == "wet text päge"
    assert rows["wet"]["content_len"] == len("wet text päge".encode())
    assert rows["wet"]["n_links"] == 0
    assert rows["wat"]["uri"] == "https://w.test/1"
    assert rows["wat"]["content_len"] == 77
    assert rows["wat"]["n_links"] == 3
    assert rows["wat"]["first_link"] == "https://l.test/a"
    # malformed WAT JSON → from_json yields NULLs, not a crash
    bad = rec("metadata", "application/json", b"{not json")
    df2 = spark.createDataFrame(
        [(2, bytearray(bad))], "doc_id long, payload binary"
    )
    r2 = wet_wat_records(df2).collect()[0]
    assert r2["kind"] == "wat" and r2["uri"] is None and r2["n_links"] is None
    # non-HTML capture: valid WAT envelope, no HTML-Metadata.Links
    # (robots.txt / image captures) → 0 links, never NULL/-1
    nolinks = (
        '{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":'
        '"https://w.test/robots.txt"},"Payload-Metadata":'
        '{"Actual-Content-Length":9}}}'
    )
    df3 = spark.createDataFrame(
        [(3, bytearray(rec("metadata", "application/json", nolinks.encode())))],
        "doc_id long, payload binary",
    )
    r3 = wet_wat_records(df3).collect()[0]
    assert r3["uri"] == "https://w.test/robots.txt"
    assert r3["n_links"] == 0 and r3["first_link"] is None


def test_warc_request_records_pass_through(spark):
    """Real Common Crawl WARCs interleave a request record with every
    response record, both labeled application/http. The request block
    has no status line — it must flow through as raw text (it IS
    text: the captured HTTP request), not fail the whole payload."""
    req_block = (
        b"GET /page HTTP/1.1\r\nHost: x.test\r\n"
        b"User-Agent: CCBot/2.0\r\n\r\n"
    )
    resp_block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8"
        b"\r\n\r\nthe page body"
    )

    def rec(rtype: str, ctype: str, body: bytes) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: " + rtype.encode()
            + b"\r\nWARC-Record-ID: <urn:uuid:t>\r\n"
            b"WARC-Target-URI: https://x.test/page\r\n"
            b"Content-Type: " + ctype.encode() + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body + b"\r\n\r\n"
        )

    payload = (
        rec("request", "application/http; msgtype=request", req_block)
        + rec("response", "application/http; msgtype=response", resp_block)
        # msgtype omitted → fall back to the WARC record type
        + rec("request", "application/http", req_block)
        + rec("response", "application/http", resp_block)
    )
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {
        r["record_idx"]: r for r in web_archive_text_records(df).collect()
    }
    assert len(rows) == 4
    for i in (0, 2):  # request legs: raw pass-through, no status
        assert rows[i]["http_status"] is None
        assert rows[i]["text"].startswith("GET /page HTTP/1.1")
        assert rows[i]["content_type"].startswith("application/http")
    for i in (1, 3):  # response legs: peeled
        assert rows[i]["http_status"] == 200
        assert rows[i]["text"] == "the page body"
        assert rows[i]["charset"] == "utf-8"


def test_decoded_text_stats_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray("ok".encode()), "text/plain; charset=utf-8"),
            (2, None, ""),
        ],
        "doc_id long, payload binary, content_type string",
    )
    rows = {r["doc_id"]: r for r in decoded_text_stats(df, quarantine=True).collect()}
    assert rows[1]["text"] == "ok" and rows[1]["error"] is None
    assert rows[2]["text"] is None and rows[2]["error"].startswith("malformed")
    with pytest.raises(Exception):
        decoded_text_stats(df, quarantine=False).collect()


# ------------------------------------------------ property tests

def test_charset_roundtrip_property():
    """Hypothesis: any text encodable in a charset, carried under any
    of that charset's labels, round-trips through detection + decode
    byte-exactly with zero replacements. Pure-Python property (no
    Spark per example)."""
    from hypothesis import assume, given, settings, strategies as st

    cases = [
        ("utf-8", "utf-8"),
        ("iso-8859-1", "cp1252"),
        ("windows-1252", "cp1252"),
        ("shift_jis", "cp932"),
        ("gb2312", "gbk"),
        ("euc-kr", "cp949"),
        ("koi8-r", "koi8_r"),
        ("iso-8859-15", "iso8859_15"),
        ("windows-1251", "cp1251"),
        ("big5", "big5"),
    ]
    # printable-heavy alphabet spanning latin/cyrillic/cjk so every
    # charset gets both hits and misses (unencodables are assumed out)
    alphabet = st.sampled_from(
        "abcXYZ019 .,!?café€ÄßñПривет日本語中文한국ζω"
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet=alphabet, min_size=0, max_size=60),
        st.sampled_from(cases),
    )
    def prop(text, case):
        label, codec = case
        try:
            payload = text.encode(codec)
        except (UnicodeEncodeError, LookupError):
            assume(False)
        # guard: meta/xml prescan must not fire on arbitrary text
        assume("<meta" not in text.lower() and "<?xml" not in text.lower())
        d = decode_text(payload, f"text/html; charset={label}")
        # BOM-shaped prefixes win over the label by design
        assume(d["charset_source"] == "header")
        assert d["text"] == text.encode(codec).decode(codec)
        assert d["n_replacements"] == 0

    prop()


# ------------------------------------------ statistical fallback lane

_JP = (
    "日本語の長い文章を書き"
    "ます。東京は日本の首都"
    "であり、人口が最も多い"
    "都市です。天気予報によ"
    "ると明日は晴れでしょう"
    "。電車で通勤する人々が"
    "駅に集まります。"
) * 3
_ZH = (
    "这是一段比较长的中文文"
    "本。北京是首都，也是全"
    "国的政治文化中心。天气"
    "预报说明天多云转晴。许"
    "多人乘坐地铁上班，地铁"
    "站里人很多。"
) * 3


def test_statistical_fallback_unlabeled_cjk():
    """Unlabeled Shift_JIS/GBK (no BOM, no header, no meta): the
    deterministic chain mojibakes them to cp1252 by design; the
    flagged statistical lane recovers the real encoding with a
    confidence column. Pinned in pytest only — never an oracle."""
    pytest.importorskip("charset_normalizer")
    from flink_hiveorc_spark.functions.charset import (
        sniff_charset_statistical,
    )

    jp = _JP.encode("cp932")
    det = decode_text(jp)
    assert det["charset"] == "windows-1252"
    assert det["charset_source"] == "fallback"
    key, codec, source, conf = sniff_charset_statistical(jp)
    assert source == "statistical" and key == "shift_jis"
    assert conf > 0.5
    got = decode_text(jp, statistical=True)
    assert got["text"] == _JP and got["n_replacements"] == 0
    assert got["charset_source"] == "statistical"
    assert got["confidence"] == conf

    zh = _ZH.encode("gbk")
    got_zh = decode_text(zh, statistical=True)
    # gb18030 is a GBK superset: the bytes decode identically
    assert got_zh["charset"] in ("gbk", "gb18030")
    assert got_zh["text"] == _ZH and got_zh["n_replacements"] == 0
    assert got_zh["charset_source"] == "statistical"


def test_statistical_flag_never_changes_deterministic_sources():
    """Regression: for every input the DETERMINISTIC chain resolves
    (BOM/header/meta/xml/valid-utf8), statistical=True must return
    byte-identical results with confidence 1.0 — the lane only ever
    re-guesses the fallback tail."""
    cases = [
        (b"\xef\xbb\xbfplain", None),                      # bom
        ("café".encode("cp1252"), "text/html; charset=iso-8859-1"),
        (b"<meta charset=koi8-r>\xc1\xc2", None),          # meta
        ("ascii only".encode(), None),                     # valid-utf8
        (_JP.encode("utf-8"), None),                       # valid-utf8 CJK
    ]
    for payload, ct in cases:
        det = decode_text(payload, ct)
        got = decode_text(payload, ct, statistical=True)
        assert got["confidence"] == 1.0
        for k in ("text", "charset", "charset_source", "n_replacements"):
            assert got[k] == det[k], (payload[:20], k)
        assert det.get("confidence") is None  # flag-off dict unchanged


def test_statistical_lane_in_spark_decoded_text_stats(spark):
    """The flagged lane through the mapInPandas operator: schema gains
    the confidence column, unlabeled Shift_JIS comes back as
    shift_jis text, and labeled rows keep deterministic sources."""
    pytest.importorskip("charset_normalizer")
    df = spark.createDataFrame(
        [
            (1, bytearray(_JP.encode("cp932")), ""),
            (2, bytearray("plain ascii".encode()), ""),
            (3, bytearray("café".encode("cp1252")),
             "text/plain; charset=windows-1252"),
        ],
        "doc_id long, payload binary, content_type string",
    )
    out = decoded_text_stats(df, statistical=True)
    assert "confidence" in out.columns
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["charset"] == "shift_jis"
    assert rows[1]["charset_source"] == "statistical"
    assert rows[1]["text"] == _JP and 0.5 < rows[1]["confidence"] <= 1.0
    assert rows[2]["charset_source"] == "valid-utf8"
    assert rows[2]["confidence"] == 1.0
    assert rows[3]["charset_source"] == "header"
    assert rows[3]["text"] == "café"
    # flag off: schema unchanged (no confidence column)
    assert "confidence" not in decoded_text_stats(df).columns


def test_statistical_lane_through_crawl_chain(spark):
    """An UNLABELED Shift_JIS WARC response (no header charset, no
    meta): the deterministic chain mojibakes to cp1252; the flagged
    statistical lane recovers shift_jis through the full WARC→HTTP→
    decode chain."""
    pytest.importorskip("charset_normalizer")
    from flink_hiveorc_spark.functions.charset import (
        web_archive_text_records,
    )

    body = _JP.encode("cp932")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://jp.example/x\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    df = spark.createDataFrame([(1, bytearray(rec))],
                               "doc_id long, payload binary")
    det = web_archive_text_records(df).collect()[0]
    assert det["charset"] == "windows-1252"
    stat = web_archive_text_records(df, statistical=True).collect()[0]
    assert stat["charset"] == "shift_jis"
    assert stat["charset_source"] == "statistical"
    assert stat["text"] == _JP and stat["n_replacements"] == 0
