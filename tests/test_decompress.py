"""Blob decompression (decompress_payload / decompress_stats):
roundtrips through independently-produced streams (stdlib
compressors, real entropy coding — not the oracle's stored blocks),
the error contract (integrity verification, truncation, trailing
garbage, codec gating, bomb guard), and the oracle-leg constructions
pinned against the featurizer."""

from __future__ import annotations

import bz2
import gzip
import hashlib
import lzma
import struct
import zlib

import pytest

from flink_hiveorc_spark.functions.multimodal import (
    _BZ2_CONTENT,
    _GZIP_HDR,
    _XZ_CONTENT,
    _crc32_tables,
    _decompress_features,
    _stored_deflate,
    decompress_payload,
    decompress_stats,
)

_TEXT = (b"the quick brown fox jumps over the lazy dog " * 40)[:1500]


def test_gzip_roundtrip_real_compression():
    assert decompress_payload(gzip.compress(_TEXT)) == _TEXT
    # level extremes and mtime variance
    assert decompress_payload(gzip.compress(_TEXT, 0, mtime=12345)) == _TEXT
    assert decompress_payload(gzip.compress(b"", 9)) == b""


def test_gzip_multi_member_concatenation():
    payload = gzip.compress(_TEXT[:700]) + gzip.compress(_TEXT[700:])
    assert decompress_payload(payload) == _TEXT


def test_zlib_bz2_xz_roundtrips():
    assert decompress_payload(zlib.compress(_TEXT, 6)) == _TEXT
    assert decompress_payload(zlib.compress(_TEXT, 0)) == _TEXT  # stored
    assert decompress_payload(bz2.compress(_TEXT)) == _TEXT
    assert decompress_payload(lzma.compress(_TEXT)) == _TEXT


def test_integrity_verification_classifies():
    g = bytearray(gzip.compress(_TEXT))
    g[-5] ^= 0xFF  # CRC-32 trailer
    with pytest.raises(ValueError, match="malformed|trailing"):
        decompress_payload(bytes(g))
    z = bytearray(zlib.compress(_TEXT))
    z[-1] ^= 0xFF  # Adler-32 trailer
    with pytest.raises(ValueError, match="malformed"):
        decompress_payload(bytes(z))


def test_truncation_and_trailing_garbage():
    g = gzip.compress(_TEXT)
    with pytest.raises(ValueError, match="truncated|malformed"):
        decompress_payload(g[: len(g) // 2])
    with pytest.raises(ValueError, match="trailing garbage"):
        decompress_payload(g + b"notgzip")
    z = zlib.compress(_TEXT)
    with pytest.raises(ValueError, match="trailing garbage"):
        decompress_payload(z + b"x")
    b = bz2.compress(_TEXT)
    with pytest.raises(ValueError, match="truncated|malformed"):
        decompress_payload(b[:-8])
    x = lzma.compress(_TEXT)
    with pytest.raises(ValueError, match="trailing garbage"):
        decompress_payload(x + b"y")


def test_codec_gate_and_unknown_magic():
    with pytest.raises(NotImplementedError, match="zstd/lz4"):
        decompress_payload(b"\x28\xb5\x2f\xfd" + b"\x00" * 20)
    with pytest.raises(NotImplementedError, match="zstd/lz4"):
        decompress_payload(b"\x04\x22\x4d\x18" + b"\x00" * 20)
    with pytest.raises(ValueError, match="unrecognized"):
        decompress_payload(b"\x00\x01\x02\x03")


def test_bomb_guard_caps_all_codecs():
    big = b"\x00" * 100_000
    for payload in (
        gzip.compress(big),
        zlib.compress(big),
        bz2.compress(big),
        lzma.compress(big),
    ):
        with pytest.raises(ValueError, match="bomb"):
            decompress_payload(payload, max_out=50_000)
        assert decompress_payload(payload, max_out=100_000) == big


def test_fuzz_byte_flips_keep_error_contract():
    import numpy as np

    rng = np.random.default_rng(31)
    corpus = [
        gzip.compress(_TEXT[:300]),
        zlib.compress(_TEXT[:300]),
        bz2.compress(_TEXT[:300], 1),
        lzma.compress(_TEXT[:300]),
    ]
    for payload in corpus:
        for _ in range(120):
            bad = bytearray(payload)
            i = int(rng.integers(0, len(bad)))
            bad[i] ^= int(rng.integers(1, 256))
            try:
                decompress_payload(bytes(bad))
            except (ValueError, NotImplementedError):
                pass  # classified — never a raw codec exception


def test_oracle_leg_constructions_pin_featurizer():
    """The five multimodal_decompress_stats legs, built exactly as the
    query builds them, must decompress through the stdlib (which
    VERIFIES the JVM-computed CRC-32 / Adler-32 trailers) to the
    digest bytes."""
    for text in (b"hello world", b"", b"\xff" * 64):
        d = hashlib.md5(text).digest()
        base16, t16 = _crc32_tables(16)
        base8, t8 = _crc32_tables(8)

        def crc(base, tables, msg):
            c = base
            for i, v in enumerate(msg):
                c ^= struct.unpack_from(">I", tables[i], v * 4)[0]
            return c

        assert crc(base16, t16, d) == zlib.crc32(d)
        gz0 = (
            _GZIP_HDR + _stored_deflate(16) + d
            + struct.pack("<I", crc(base16, t16, d)) + struct.pack("<I", 16)
        )
        f = _decompress_features(gz0)
        assert f == {
            "codec": "gzip", "out_len": 16, "in_len": 39,
            "sum_byte": sum(d),
        }
        s1 = 1 + sum(d)
        s2 = 16 + sum((16 - i) * v for i, v in enumerate(d))
        assert (s2 << 16) | s1 == zlib.adler32(d)
        zl1 = (
            b"\x78\x01" + _stored_deflate(16) + d
            + struct.pack(">I", (s2 << 16) | s1)
        )
        f = _decompress_features(zl1)
        assert f["codec"] == "zlib" and f["sum_byte"] == sum(d)
        mem = lambda part: (  # noqa: E731
            _GZIP_HDR + _stored_deflate(8) + part
            + struct.pack("<I", crc(base8, t8, part)) + struct.pack("<I", 8)
        )
        f = _decompress_features(mem(d[:8]) + mem(d[8:]))
        assert f == {
            "codec": "gzip", "out_len": 16, "in_len": 62,
            "sum_byte": sum(d),
        }
    f = _decompress_features(bz2.compress(_BZ2_CONTENT, 1))
    assert f["codec"] == "bz2" and f["sum_byte"] == sum(_BZ2_CONTENT)
    f = _decompress_features(lzma.compress(_XZ_CONTENT))
    assert f["codec"] == "xz" and f["out_len"] == len(_XZ_CONTENT)


def test_decompress_stats_dataframe_and_quarantine(spark):
    rows = [
        (1, gzip.compress(b"alpha")),
        (2, bz2.compress(b"beta")),
        (3, b"\x28\xb5\x2f\xfd zstd-gated"),
        (4, b"garbage........"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decompress_stats(df, quarantine=True).collect()}
    assert out[1]["codec"] == "gzip" and out[1]["out_len"] == 5
    assert out[2]["codec"] == "bz2" and out[2]["sum_byte"] == sum(b"beta")
    assert out[3]["codec"] is None
    assert out[3]["error"].startswith("unsupported:")
    assert out[4]["error"].startswith("malformed:")
