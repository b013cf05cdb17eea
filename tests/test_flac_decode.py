"""Native FLAC decoding, pinned by an independent encoder twin: this
file writes real Rice/LPC bitstreams with its own MSB-first packer and
its own bitwise (table-free) CRC-8/CRC-16, and the decoder must
reproduce the original samples exactly for every subframe type,
channel assignment, partition scheme, and bit depth."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.flac import (
    crc8_flac,
    crc16_flac,
    decode_flac,
)
from flink_hiveorc_spark.functions.multimodal import decode_audio


# ---------------------------------------------------------------- twin bits


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, n):
        assert n >= 0 and 0 <= v < (1 << n) or n == 0
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc, self.n = 0, 0

    def sw(self, v, n):
        self.w(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.w(1, q + 1)  # q zeros then a one == value 1 in q+1 bits

    def align(self):
        while self.n:
            self.w(0, 1)


def _crc8_bitwise(data: bytes) -> int:
    """Independent bit-at-a-time CRC-8 (poly x^8+x^2+x+1)."""
    r = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            r = ((r << 1) & 0xFF) ^ (0x07 if (r >> 7) ^ bit else 0)
    return r


def _crc16_bitwise(data: bytes) -> int:
    """Independent bit-at-a-time CRC-16 (poly x^16+x^15+x^2+1)."""
    r = 0
    for byte in data:
        for i in range(7, -1, -1):
            bit = (byte >> i) & 1
            r = ((r << 1) & 0xFFFF) ^ (0x8005 if (r >> 15) ^ bit else 0)
    return r


def test_crc_tables_match_bitwise():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 64):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert crc8_flac(data) == _crc8_bitwise(data)
        assert crc16_flac(data) == _crc16_bitwise(data)


# ---------------------------------------------------------------- twin encoder


def _streaminfo(rate, nch, bps, total, md5=b"\x00" * 16, min_bs=16, max_bs=65535):
    b = _BW()
    b.w(min_bs, 16)
    b.w(max_bs, 16)
    b.w(0, 24)
    b.w(0, 24)
    b.w(rate, 20)
    b.w(nch - 1, 3)
    b.w(bps - 1, 5)
    b.w(total, 36)
    body = bytes(b.out) + md5
    return b"fLaC" + struct.pack(">I", (1 << 31) | len(body)) + body


def _utf8(num):
    if num < 0x80:
        return bytes([num])
    out = []
    n = 1
    while num >= (1 << (6 * n + (6 - n))):
        n += 1
    lead = (0xFF << (7 - n)) & 0xFF
    out.append(lead | (num >> (6 * n)) & (0x3F >> n))
    for i in range(n - 1, -1, -1):
        out.append(0x80 | ((num >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_encode(bw, residuals, order, blocksize, param_plan):
    """param_plan: (method, partition_order, [param-or-('esc', nbits)])."""
    method, po, params = param_plan
    bw.w(method, 2)
    bw.w(po, 4)
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    idx = 0
    for p in range(1 << po):
        n = (blocksize >> po) - (order if p == 0 else 0)
        spec = params[p]
        if isinstance(spec, tuple):
            bw.w(escape, plen)
            bw.w(spec[1], 5)
            for i in range(n):
                bw.sw(int(residuals[idx + i]), spec[1])
        else:
            bw.w(spec, plen)
            for i in range(n):
                v = int(residuals[idx + i])
                u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
                u = (2 * v + 1) * -1 - 1 if False else (abs(v) * 2 - (1 if v < 0 else 0))
                bw.unary(u >> spec)
                if spec:
                    bw.w(u & ((1 << spec) - 1), spec)
        idx += n


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _sub_constant(bw, samples, bps):
    bw.w(0, 1)
    bw.w(0, 6)
    bw.w(0, 1)
    bw.sw(int(samples[0]), bps)


def _sub_verbatim(bw, samples, bps, wasted=0):
    bw.w(0, 1)
    bw.w(1, 6)
    if wasted:
        bw.w(1, 1)
        bw.unary(wasted - 1)
    else:
        bw.w(0, 1)
    for v in samples:
        bw.sw(int(v) >> wasted, bps - wasted)


def _sub_fixed(bw, samples, bps, order, plan):
    bw.w(0, 1)
    bw.w(8 + order, 6)
    bw.w(0, 1)
    for v in samples[:order]:
        bw.sw(int(v), bps)
    coefs = _FIXED[order]
    res = [
        int(samples[i]) - sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]
    _rice_encode(bw, res, order, len(samples), plan)


def _sub_lpc(bw, samples, bps, coefs, shift, prec, plan):
    order = len(coefs)
    bw.w(0, 1)
    bw.w(32 + order - 1, 6)
    bw.w(0, 1)
    for v in samples[:order]:
        bw.sw(int(v), bps)
    bw.w(prec - 1, 4)
    bw.sw(shift, 5)
    for c in coefs:
        bw.sw(c, prec)
    res = [
        int(samples[i])
        - (sum(coefs[j] * int(samples[i - 1 - j]) for j in range(order)) >> shift)
        for i in range(order, len(samples))
    ]
    _rice_encode(bw, res, order, len(samples), plan)


def _frame(channels, rate_code, bps, bps_code, ch_code, num, sub_encoders,
           bs_tail=None, variable=0):
    """channels: list of per-subframe sample arrays (already
    decorrelated for side assignments)."""
    blocksize = len(channels[0])
    hdr = _BW()
    hdr.w(0x3FFE, 14)
    hdr.w(0, 1)
    hdr.w(variable, 1)
    if bs_tail is None:
        bs_code = {192: 1, 576: 2, 256: 8, 512: 9, 1024: 10}[blocksize]
    else:
        bs_code = 6 if blocksize <= 256 else 7
    hdr.w(bs_code, 4)
    hdr.w(rate_code, 4)
    hdr.w(ch_code, 4)
    hdr.w(bps_code, 3)
    hdr.w(0, 1)
    for byte in _utf8(num):
        hdr.w(byte, 8)
    if bs_tail is not None:
        hdr.w(blocksize - 1, 8 if bs_code == 6 else 16)
    head = bytes(hdr.out)
    head += bytes([_crc8_bitwise(head)])
    body = _BW()
    for ch, enc in zip(channels, sub_encoders):
        enc(body, ch)
    body.align()
    frame = head + bytes(body.out)
    return frame + struct.pack(">H", _crc16_bitwise(frame))


def _md5_of(samples, bps):
    nbytes = (bps + 7) // 8
    raw = bytearray()
    for v in np.asarray(samples, dtype=np.int64).reshape(-1).tolist():
        raw += int(v & ((1 << (8 * nbytes)) - 1)).to_bytes(nbytes, "little")
    return hashlib.md5(bytes(raw)).digest()


# ---------------------------------------------------------------- round trips


def _check(payload, expect, rate):
    got, got_rate = decode_flac(payload)
    assert got_rate == rate
    np.testing.assert_array_equal(got, np.asarray(expect, dtype=np.int64))


def test_constant_and_verbatim_mono():
    rng = np.random.default_rng(1)
    wave = rng.integers(-(1 << 15), 1 << 15, 192, dtype=np.int64)
    p = _streaminfo(44100, 1, 16, 192)
    p += _frame([wave], 0, 16, 4, 0, 0, [lambda b, s: _sub_verbatim(b, s, 16)])
    _check(p, wave[:, None], 44100)
    flat = np.full(192, -1234, dtype=np.int64)
    p = _streaminfo(44100, 1, 16, 192)
    p += _frame([flat], 0, 16, 4, 0, 0, [lambda b, s: _sub_constant(b, s, 16)])
    _check(p, flat[:, None], 44100)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    rng = np.random.default_rng(2 + order)
    # smooth-ish wave keeps residuals small but nonzero
    t = np.arange(192)
    wave = (3000 * np.sin(t / 9) + rng.integers(-50, 51, 192)).astype(np.int64)
    plan = (0, 2, [7, 9, ("esc", 14), 11])
    p = _streaminfo(8000, 1, 16, 192)
    p += _frame(
        [wave], 4, 16, 4, 0, 0,
        [lambda b, s: _sub_fixed(b, s, 16, order, plan)],
    )
    _check(p, wave[:, None], 8000)


def test_lpc_roundtrip_and_rice5():
    rng = np.random.default_rng(9)
    t = np.arange(576)
    wave = (8000 * np.sin(t / 23) + rng.integers(-200, 201, 576)).astype(np.int64)
    coefs = [3, -3, 1, 1]  # arbitrary quantized predictor
    plan = (1, 3, [12, 13, 11, 12, ("esc", 16), 13, 12, 11])
    p = _streaminfo(48000, 1, 16, 576)
    p += _frame(
        [wave], 10, 16, 4, 0, 0,
        [lambda b, s: _sub_lpc(b, s, 16, coefs, 2, 6, plan)],
    )
    _check(p, wave[:, None], 48000)


def test_stereo_assignments_exact():
    rng = np.random.default_rng(4)
    left = rng.integers(-30000, 30000, 256, dtype=np.int64)
    right = rng.integers(-30000, 30000, 256, dtype=np.int64)
    side = left - right
    mid = (left + right) >> 1
    expect = np.stack([left, right], axis=1)
    vb = lambda bps: (lambda b, s: _sub_verbatim(b, s, bps))
    for ch_code, chans, bpss in [
        (1, [left, right], [16, 16]),            # independent
        (8, [left, side], [16, 17]),             # left/side
        (9, [side, right], [17, 16]),            # right/side
        (10, [mid, side], [16, 17]),             # mid/side
    ]:
        p = _streaminfo(8000, 2, 16, 256)
        p += _frame(chans, 4, 16, 4, ch_code, 0, [vb(b) for b in bpss])
        _check(p, expect, 8000)


def test_wasted_bits_and_8bit_and_24bit():
    rng = np.random.default_rng(5)
    wave = (rng.integers(-100, 100, 192, dtype=np.int64)) << 3  # 3 wasted bits
    p = _streaminfo(8000, 1, 16, 192)
    p += _frame([wave], 4, 16, 4, 0, 0,
                [lambda b, s: _sub_verbatim(b, s, 16, wasted=3)])
    _check(p, wave[:, None], 8000)
    w8 = rng.integers(-128, 128, 192, dtype=np.int64)
    p = _streaminfo(8000, 1, 8, 192)
    p += _frame([w8], 4, 8, 1, 0, 0, [lambda b, s: _sub_verbatim(b, s, 8)])
    _check(p, w8[:, None], 8000)
    w24 = rng.integers(-(1 << 23), 1 << 23, 192, dtype=np.int64)
    p = _streaminfo(96000, 1, 24, 192)
    p += _frame([w24], 11, 24, 6, 0, 0, [lambda b, s: _sub_verbatim(b, s, 24)])
    _check(p, w24[:, None], 96000)


def test_multiframe_variable_blocking_utf8_and_md5():
    rng = np.random.default_rng(6)
    w1 = rng.integers(-1000, 1000, 192, dtype=np.int64)
    w2 = rng.integers(-1000, 1000, 192, dtype=np.int64)
    allw = np.concatenate([w1, w2])
    p = _streaminfo(8000, 1, 16, 384, md5=_md5_of(allw, 16))
    # variable blocking: the coded number is the SAMPLE index; the
    # second frame starts at 192 -> a 2-byte UTF-8 coding
    p += _frame([w1], 4, 16, 4, 0, 0, [lambda b, s: _sub_verbatim(b, s, 16)],
                variable=1)
    p += _frame([w2], 4, 16, 4, 0, 192, [lambda b, s: _sub_verbatim(b, s, 16)],
                variable=1)
    _check(p, allw[:, None], 8000)


def test_odd_blocksize_via_8bit_tail_and_total_trim():
    rng = np.random.default_rng(7)
    wave = rng.integers(-500, 500, 100, dtype=np.int64)
    p = _streaminfo(8000, 1, 16, 100)
    p += _frame([wave], 4, 16, 4, 0, 0,
                [lambda b, s: _sub_verbatim(b, s, 16)], bs_tail=True)
    _check(p, wave[:, None], 8000)


def test_decode_audio_dispatch_and_stats():
    rng = np.random.default_rng(8)
    wave = rng.integers(-2000, 2000, 192, dtype=np.int64)
    p = _streaminfo(8000, 1, 16, 192)
    p += _frame([wave], 4, 16, 4, 0, 0, [lambda b, s: _sub_verbatim(b, s, 16)])
    samples, rate = decode_audio(p)
    assert rate == 8000 and samples.shape == (192, 1)
    np.testing.assert_array_equal(samples[:, 0], wave)


# --------------------------------------------------------------- error cases


def _valid():
    wave = np.arange(-96, 96, dtype=np.int64) * 11
    p = _streaminfo(8000, 1, 16, 192)
    return p + _frame([wave], 4, 16, 4, 0, 0,
                      [lambda b, s: _sub_verbatim(b, s, 16)])


def test_error_contract():
    good = _valid()
    with pytest.raises(ValueError, match="fLaC magic"):
        decode_flac(b"RIFF" + good[4:])
    bad = bytearray(good)
    bad[-1] ^= 0x01  # frame CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        decode_flac(bytes(bad))
    # header CRC-8: flip the blocksize code bits
    hdr_off = len(_streaminfo(8000, 1, 16, 192))
    bad = bytearray(good)
    bad[hdr_off + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC-8|sync|reserved"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="truncated|no audio"):
        decode_flac(good[: hdr_off + 3])
    # md5 mismatch
    wave = np.arange(-96, 96, dtype=np.int64)
    p = _streaminfo(8000, 1, 16, 192, md5=b"\x01" * 16)
    p += _frame([wave], 4, 16, 4, 0, 0, [lambda b, s: _sub_verbatim(b, s, 16)])
    with pytest.raises(ValueError, match="MD5 mismatch"):
        decode_flac(p)
    # short stream vs declared total
    p = _streaminfo(8000, 1, 16, 384)
    p += _frame([wave], 4, 16, 4, 0, 0, [lambda b, s: _sub_verbatim(b, s, 16)])
    with pytest.raises(ValueError, match="ended early"):
        decode_flac(p)


def test_fuzz_byte_flips_keep_error_contract():
    good = _valid()
    rng = np.random.default_rng(10)
    for _ in range(120):
        bad = bytearray(good)
        i = int(rng.integers(0, len(bad)))
        bad[i] ^= int(rng.integers(1, 256))
        try:
            decode_flac(bytes(bad))
        except (ValueError, NotImplementedError):
            pass  # classified — never a raw struct/index/overflow error


def test_surplus_samples_vs_declared_total_raise():
    # Strict contract (r12): frames carrying MORE samples than STREAMINFO
    # declares raise, mirroring the ended-early case — never silent trim.
    wave = np.arange(-96, 96, dtype=np.int64)
    p = _streaminfo(8000, 1, 16, 100)  # declares 100, frame carries 192
    p += _frame([wave], 4, 16, 4, 0, 0,
                [lambda b, s: _sub_verbatim(b, s, 16)])
    with pytest.raises(ValueError, match="declares 100"):
        decode_flac(p)


def test_sample_cap_counts_channels():
    # The cap bounds total allocated samples across channels: a stereo
    # stream with total*nch just over the cap must be rejected up front.
    p = _streaminfo(8000, 2, 16, 300)
    with pytest.raises(ValueError, match="cap"):
        decode_flac(p, max_samples=599)
    # and a mono stream with the same declared total passes the gate
    # (failing later for having no frames — proves the gate scales by nch).
    p1 = _streaminfo(8000, 1, 16, 300)
    with pytest.raises(ValueError, match="no audio frames"):
        decode_flac(p1, max_samples=599)
