"""Native FLAC decoder — pure stdlib + numpy.

FLAC is Rice-coded linear prediction: integer arithmetic end-to-end,
no transform codec, so a native decoder can own the WHOLE format
honestly (unlike MP3/AAC, which need MDCT+entropy machinery).

Scope (the complete frame-level format, RFC 9639 / the xiph spec):
- fLaC container: STREAMINFO (mandatory first block) + skipped
  metadata (padding, application, seektable, vorbis comment, cuesheet,
  picture), last-block flag handling;
- frames: fixed and variable blocking strategies, UTF-8-style coded
  frame/sample numbers, all block-size codes (incl. 8/16-bit at end),
  all sample-rate codes (incl. end-of-header 8/16-bit forms), CRC-8
  header check and CRC-16 frame check;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, signed shift), wasted-bits unary prefix;
- residuals: Rice method 0 (4-bit params) and method 1 (5-bit
  params), partition orders 0-15, escape partitions (raw n-bit
  residuals), zigzag decode;
- channel assignments: independent 1-8 channels, left/side,
  right/side, mid/side (side channel carries +1 bit depth);
- sample sizes 8/12/16/20/24/32 bits (code or STREAMINFO).

Errors: ValueError for structural damage (bad magic, CRC mismatch,
reserved/invalid codes, truncation, order > blocksize) — the same
decode contract the other audio decoders feed the quarantine DLQ.

Why: FLAC is the dominant lossless audio container in real corpora;
the reference (546-LoC Flink ORC sink) has no media surface at all —
the need is BASELINE.json's "multimodal columns" north star. The
decoder is pinned by an independent encoder twin
(tests/test_flac_decode.py writes Rice streams with its own bit
packer) and two externally-oracled rotation legs in
multimodal_audio_decode_stats (a VERBATIM frame and a Rice-coded
fixed-order-0 frame whose CRC-16 ships as a GF(2)-linear form of the
digest bytes).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "crc8_flac", "crc16_flac"]


def _crc_table(poly: int, width: int) -> list[int]:
    mask = (1 << width) - 1
    top = 1 << (width - 1)
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        tbl.append(r)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def crc8_flac(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def crc16_flac(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TBL[(r >> 8) ^ b]
    return r


class _Bits:
    """MSB-first bit reader over the whole stream with byte-position
    access (frame boundaries are byte-aligned)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bytepos: int = 0):
        self.data = data
        self.bitpos = bytepos * 8

    @property
    def bytepos(self) -> int:
        return self.bitpos >> 3

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC stream truncated mid-field")
        v = 0
        pos = self.bitpos
        while n:
            byte = self.data[pos >> 3]
            off = pos & 7
            take = min(8 - off, n)
            v = (v << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 30:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_coded(bits: _Bits) -> int:
    """The extended-UTF-8 number coding of frame/sample indices."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError("invalid UTF-8-coded frame number")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid UTF-8-coded continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _residuals(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    nparts = 1 << po
    if blocksize % nparts != 0 or (blocksize >> po) < order:
        raise ValueError("invalid residual partition order")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds partition size")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for i in range(n):
                out[idx + i] = bits.sread(raw) if raw else 0
        else:
            for i in range(n):
                q = bits.unary()
                u = (q << param) | (bits.read(param) if param else 0)
                out[idx + i] = (u >> 1) ^ -(u & 1)  # zigzag
        idx += n
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(blocksize, bits.sread(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.empty(blocksize, dtype=np.int64)
        for i in range(blocksize):
            out[i] = bits.sread(eff)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("fixed order exceeds block size")
        warm = [bits.sread(eff) for _ in range(order)]
        res = _residuals(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, blocksize):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = pred + res[i - order]
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        if order > blocksize:
            raise ValueError("LPC order exceeds block size")
        warm = [bits.sread(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code")
        prec += 1
        shift = bits.sread(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.sread(prec) for _ in range(order)]
        res = _residuals(bits, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = 0
            for j in range(order):
                pred += coefs[j] * out[i - 1 - j]
            out[i] = (pred >> shift) + res[i - order]
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out <<= wasted
    return out


_BLOCKSIZE_BASE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048,
    12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes, max_samples: int | None = None):
    """Decode a FLAC payload → (samples int32 array of shape
    (n_frames, n_channels), sample_rate_hz). See module docstring."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    if max_samples is None:
        max_samples = 1 << 26
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata header")
        hdr = struct.unpack_from(">I", payload, pos)[0]
        last = hdr >> 31
        btype = (hdr >> 24) & 0x7F
        blen = hdr & 0xFFFFFF
        pos += 4
        if pos + blen > len(payload):
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if streaminfo is not None:
                raise ValueError("duplicate STREAMINFO")
            if blen != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {blen}")
            b = _Bits(payload[pos : pos + 34])
            min_bs = b.read(16)
            max_bs = b.read(16)
            b.read(24), b.read(24)  # min/max frame size (hints)
            rate = b.read(20)
            nch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = payload[pos + 18 : pos + 34]
            if rate == 0:
                raise ValueError("STREAMINFO sample rate is zero")
            streaminfo = {
                "rate": rate, "nch": nch, "bps": bps, "total": total,
                "md5": md5, "min_bs": min_bs, "max_bs": max_bs,
            }
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    if (
        streaminfo["total"]
        and streaminfo["total"] * streaminfo["nch"] > max_samples
    ):
        raise ValueError(
            f"FLAC declares {streaminfo['total']} samples x "
            f"{streaminfo['nch']} channels > cap {max_samples}"
        )
    chunks = []
    got = 0
    while pos < len(payload):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad frame sync code {sync:#x}")
        if bits.read(1):
            raise ValueError("reserved bit set in frame header")
        variable = bits.read(1)
        bs_code = bits.read(4)
        rate_code = bits.read(4)
        ch_code = bits.read(4)
        size_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved bit set in frame header tail")
        _num = _utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code 0")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_BASE[bs_code]
        if rate_code == 0:
            rate = streaminfo["rate"]
        elif rate_code in _RATE_CODES:
            rate = _RATE_CODES[rate_code]
        elif rate_code == 12:
            rate = bits.read(8) * 1000
        elif rate_code == 13:
            rate = bits.read(16)
        elif rate_code == 14:
            rate = bits.read(16) * 10
        else:
            raise ValueError("invalid sample rate code 15")
        if size_code == 0:
            bps = streaminfo["bps"]
        elif size_code in _SIZE_CODES:
            bps = _SIZE_CODES[size_code]
        else:
            raise ValueError(f"reserved sample size code {size_code}")
        hdr_end = bits.bytepos
        crc8 = bits.read(8)
        if crc8 != crc8_flac(payload[frame_start:hdr_end]):
            raise ValueError("frame header CRC-8 mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            sides = [0] * nch
        elif ch_code in (8, 9, 10):
            nch = 2
            # left/side, right/side, mid/side: side channel gets +1 bit
            sides = [0, 1] if ch_code in (8, 10) else [1, 0]
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != streaminfo["nch"]:
            raise ValueError("frame channel count differs from STREAMINFO")
        got += blocksize
        # Cap counts per-channel samples, not inter-channel frames —
        # otherwise an 8-channel stream allocates 8x the intended bound.
        if got * max(nch, 1) > max_samples:
            raise ValueError("FLAC frames exceed the sample cap")
        subs = [
            _subframe(bits, blocksize, bps + sides[c]) for c in range(nch)
        ]
        bits.align()
        body_end = bits.bytepos
        crc16 = bits.read(16)
        if crc16 != crc16_flac(payload[frame_start:body_end]):
            raise ValueError("frame CRC-16 mismatch")
        pos = bits.bytepos
        if ch_code == 8:  # left/side: R = L - side
            left, side = subs
            subs = [left, left - side]
        elif ch_code == 9:  # right/side: L = R + side
            side, right = subs
            subs = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        chunks.append(np.stack(subs, axis=1))
    if not chunks:
        raise ValueError("FLAC stream has no audio frames")
    out = np.concatenate(chunks, axis=0)
    total = streaminfo["total"]
    if total:
        if len(out) < total:
            raise ValueError(
                f"FLAC stream ended early: {len(out)}/{total} samples"
            )
        if len(out) > total:
            # Strict contract: surplus frames are corrupt metadata or a
            # truncated-rewrite artifact, same class as a short stream —
            # never silently drop decoded audio.
            raise ValueError(
                f"FLAC stream carries {len(out)} samples but STREAMINFO "
                f"declares {total}"
            )
    if streaminfo["md5"] != b"\x00" * 16:
        import hashlib

        bps = streaminfo["bps"]
        nbytes = (bps + 7) // 8
        flat = out.astype("<i8").reshape(-1)
        raw = bytearray()
        for v in flat.tolist():
            raw += int(v & ((1 << (8 * nbytes)) - 1)).to_bytes(
                nbytes, "little"
            )
        if hashlib.md5(bytes(raw)).digest() != streaminfo["md5"]:
            raise ValueError("decoded audio MD5 mismatch vs STREAMINFO")
    return out.astype(np.int32), streaminfo["rate"]
