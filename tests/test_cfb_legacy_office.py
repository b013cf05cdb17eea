"""MS-CFB container walk + legacy .doc/.xls extraction: mini/regular
stream routing, piece-table text (both fc encodings), BIFF8 SST with
Continue splits, the honest gates (encrypted, BIFF5, binary .ppt),
chain-loop/bounds guards, fuzz, and the Spark DLQ path."""

from __future__ import annotations

import struct

import pytest

from flink_hiveorc_spark.functions.cfb import (
    build_cfb,
    build_doc,
    build_xls,
    cfb_streams,
    doc_text,
    legacy_office_stats,
    parse_legacy_office,
    xls_sst,
)


def test_cfb_roundtrip_mini_and_regular():
    streams = {
        "Tiny": b"x",
        "Mini": b"hello" * 100,          # < 4096: mini stream
        "Big": bytes(range(256)) * 64,   # 16384: regular chain
        "Empty": b"",
    }
    assert cfb_streams(build_cfb(streams)) == streams


def test_cfb_multi_fat_sector():
    # >64 KiB of payload forces a second FAT sector
    streams = {"Huge": b"A" * 200_000}
    blob = build_cfb(streams)
    assert cfb_streams(blob) == streams


def test_cfb_rejects_garbage_and_loops():
    with pytest.raises(ValueError, match="signature"):
        cfb_streams(b"not a compound file at all" + b"\x00" * 600)
    blob = bytearray(build_cfb({"S": b"data" * 50}))
    # sabotage: point the directory chain at itself (FAT entry of the
    # dir sector). FAT is sector 0, dir sector id = 1 -> entry 1.
    struct.pack_into("<I", blob, 512 + 4 * 1, 1)
    with pytest.raises(ValueError, match="loops"):
        cfb_streams(bytes(blob))
    # truncated payload: header promises sectors that are not there
    with pytest.raises(ValueError, match="out of range"):
        cfb_streams(bytes(build_cfb({"S": b"q" * 5000})[:1024]))


def test_doc_two_pieces_and_cr_normalization():
    blob = build_doc(
        [("line one\r", True), ("line two é中", False)]
    )
    text, n = doc_text(cfb_streams(blob))
    assert n == 2
    assert text == "line one\nline two é中"


def test_doc_gates():
    blob = bytearray(build_doc([("x", True)]))
    # find the WordDocument stream inside the mini stream and set
    # fEncrypted: locate the FIB by its wIdent magic
    i = blob.index(b"\xec\xa5")
    flags = struct.unpack_from("<H", blob, i + 0x0A)[0]
    struct.pack_into("<H", blob, i + 0x0A, flags | 0x0100)
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_legacy_office(bytes(blob))
    # not a Word stream at all
    bad = build_cfb({"WordDocument": b"\x00" * 0x600, "1Table": b""})
    with pytest.raises(ValueError, match="wIdent"):
        parse_legacy_office(bad)
    # a CFB with none of the three streams is not a legacy office doc
    with pytest.raises(ValueError, match="no WordDocument/Workbook"):
        parse_legacy_office(build_cfb({"Other": b"zz"}))


def test_ppt_text_atoms_and_gates():
    from flink_hiveorc_spark.functions.cfb import build_ppt, ppt_text

    blob = build_ppt([["Title deck", "latiné"], ["中文 atom"]])
    got = parse_legacy_office(blob)
    assert got["kind"] == "ppt" and got["n_units"] == 2
    assert got["office_text"] == "Title deck\nlatiné\n中文 atom"
    # a truncated record forest is malformed
    with pytest.raises(ValueError, match="trailing partial"):
        parse_legacy_office(
            build_cfb({"PowerPoint Document": b"\x0f\x00"})
        )
    # an incrementally-saved deck (2 UserEditAtoms) gates honestly
    import struct as _s

    doc = cfb_streams(blob)["PowerPoint Document"]
    doc2 = doc + _s.pack("<HHI", 0, 0x0FF5, 28) + b"\x00" * 28
    with pytest.raises(NotImplementedError, match="incrementally"):
        parse_legacy_office(build_cfb({"PowerPoint Document": doc2}))
    # a record overrunning its container is malformed
    bad = _s.pack("<HHI", 0x000F, 0x03E8, 100) + b"\x00" * 8
    with pytest.raises(ValueError, match="overruns"):
        ppt_text({"PowerPoint Document": bad})


def test_xls_sst_variants():
    strings = ["plain ascii", "latiné", "中文 high"]
    for split in (None, 0, 1, 2):
        blob = build_xls(strings, split_in=split)
        got, n = xls_sst(cfb_streams(blob))
        assert got == strings and n == 3, f"split={split}"


def test_xls_gates():
    # BIFF5: 'Book' stream name
    wb = cfb_streams(build_xls(["a"]))["Workbook"]
    with pytest.raises(NotImplementedError, match="BIFF5"):
        parse_legacy_office(build_cfb({"Book": wb}))
    # FilePass => encrypted
    bof = wb[: 4 + 16]
    filepass = struct.pack("<HH", 0x002F, 2) + b"\x01\x00"
    eof = struct.pack("<HH", 0x000A, 0)
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_legacy_office(
            build_cfb({"Workbook": bof + filepass + eof})
        )
    # BIFF8 BOF with a lying version
    blob = bytearray(wb)
    struct.pack_into("<H", blob, 4, 0x0500)
    with pytest.raises(NotImplementedError, match="BIFF"):
        parse_legacy_office(build_cfb({"Workbook": bytes(blob)}))
    # record overrun
    trunc = wb[: len(wb) - 3]
    with pytest.raises(ValueError):
        parse_legacy_office(build_cfb({"Workbook": trunc}))


def test_fuzz_never_hangs_or_escapes_error_contract():
    """Random mutations of valid files must raise ValueError /
    NotImplementedError or parse — nothing else, bounded time."""
    import random

    rng = random.Random(1515)
    base_doc = build_doc([("fuzz target text ", True), ("tail", False)])
    base_xls = build_xls(["alpha", "beta gamma delta"], split_in=1)
    for base in (base_doc, base_xls):
        for _ in range(120):
            blob = bytearray(base)
            for _ in range(rng.randint(1, 8)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            try:
                parse_legacy_office(bytes(blob))
            except (ValueError, NotImplementedError, UnicodeDecodeError):
                pass


def test_spark_dlq_path(spark):
    rows = [
        (1, bytearray(build_doc([("good doc", True)]))),
        (2, bytearray(b"garbage that is not ole2")),
        (3, bytearray(build_xls(["s1", "s2"]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in legacy_office_stats(df, quarantine=True).collect()
    }
    assert got[1]["kind"] == "doc" and got[1]["office_text"] == "good doc"
    assert got[2]["kind"] is None and got[2]["error"].startswith("malformed")
    assert got[3]["office_text"] == "s1\ns2"
    with pytest.raises(Exception):
        legacy_office_stats(df, quarantine=False).collect()


def test_xls_cell_order_mapping():
    from flink_hiveorc_spark.functions.cfb import xls_text

    # cells reference SST entries out of order and repeatedly: text
    # must come back in CELL order, not table order
    blob = build_xls(["zero", "one", "two"], cells=[2, 0, 2, 1])
    got = parse_legacy_office(blob)
    assert got["office_text"] == "two\nzero\ntwo\none"
    assert got["n_units"] == 4
    # no cells -> SST-order fallback
    blob2 = build_xls(["a", "b"])
    assert parse_legacy_office(blob2)["office_text"] == "a\nb"
    # out-of-range reference is malformed
    import struct as _s

    wb = cfb_streams(build_xls(["only"]))["Workbook"]
    eof = wb[-4:]
    bad = wb[:-4] + _s.pack("<HHHHI", 0x00FD, 10, 0, 0, 9) + eof
    with pytest.raises(ValueError, match="references SST"):
        xls_text({"Workbook": bad})


def test_cfb_v4_container():
    """Version-4 CFB (4096-byte sectors, 512-byte header zero-padded
    to its sector): same streams round-trip, and a .doc inside a v4
    container extracts identically."""
    streams = {"Mini": b"v4 mini data" * 10, "Big": b"B" * 9000}
    blob = build_cfb(streams, version=4)
    assert len(blob) % 4096 == 0
    assert cfb_streams(blob) == streams
    # full-format ride-through
    from flink_hiveorc_spark.functions.cfb import build_ppt

    doc = cfb_streams(build_doc([("v4 doc text", True)]))
    blob2 = build_cfb(doc, version=4)
    assert parse_legacy_office(blob2)["office_text"] == "v4 doc text"


def test_cfb_difat_sectors():
    """Files past ~7 MB exhaust the header's 109 inline DIFAT slots
    and need DIFAT sector chains (real embedded-media .doc/.ppt
    cross this constantly): round-trip a ~10 MB container and a .doc
    carrying an 8 MB ObjectPool stream."""
    import os

    big = os.urandom(1 << 16) * (10 * 1024 * 1024 // (1 << 16))
    blob = build_cfb({"Huge": big, "Side": b"side data"})
    got = cfb_streams(blob)
    assert got["Huge"] == big and got["Side"] == b"side data"
    doc = cfb_streams(build_doc([("difat doc", True)]))
    doc["ObjectPool"] = os.urandom(8 * 1024 * 1024)
    assert (
        parse_legacy_office(build_cfb(doc))["office_text"]
        == "difat doc"
    )
