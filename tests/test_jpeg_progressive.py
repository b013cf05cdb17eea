"""Progressive (SOF2) JPEG decoding, pinned differentially: an
independent progressive ENCODER twin (T.81 Annex G / the libjpeg
jcphuff flow, reimplemented here) encodes the SAME quantized
coefficient blocks as the sequential twin in test_jpeg_decode, and
the decoder must produce bit-identical images from both. This covers
spectral selection, successive approximation (DC floor-shift + one-bit
refinement, AC magnitude-truncation + correction bits), EOB-run
coding, ZRL-with-buffered-corrections ordering (a real encoder-side
trap: ZRLs flush at EVERY nonzero coefficient, corrections included),
interleaved color DC scans, 4:2:0 MCU order, restart intervals with
EOB-run reset, and the scan-ordering error contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions.jpeg import decode_jpeg

from test_jpeg_decode import (
    _BitWriter,
    _canon_codes,
    _dht_segment,
    _dqt_segment,
    _safe_random_blocks,
    encode_jpeg,
)

# progressive AC table: every (run, size) with size 0..10 at length 9
# — includes the EOBn symbols (size 0, run < 15) the sequential flat
# table omits. 176 codes at 9 bits satisfies Kraft.
AC_SYMBOLS_PROG = [(r << 4) | s for r in range(16) for s in range(11)]
AC_BITS_PROG = [0] * 8 + [len(AC_SYMBOLS_PROG)] + [0] * 7
AC_VALS_PROG = bytes(AC_SYMBOLS_PROG)
DC_VALS_FLAT = bytes(range(12))
DC_BITS_FLAT = [0] * 8 + [12] + [0] * 7
DC_CODES = _canon_codes(DC_BITS_FLAT, DC_VALS_FLAT)
AC_CODES = _canon_codes(AC_BITS_PROG, AC_VALS_PROG)


def _put(bw, codes, sym):
    c, ln = codes[sym]
    bw.write(c, ln)


def _valbits(v, s):
    return v if v > 0 else v + (1 << s) - 1


class _EobRun:
    """EOB-run accumulator: the EOBn symbol plus any buffered
    correction bits from the blocks the run covers."""

    def __init__(self, bw):
        self.bw = bw
        self.run = 0
        self.pending = []

    def flush(self):
        if self.run > 0:
            r = self.run.bit_length() - 1
            _put(self.bw, AC_CODES, r << 4)
            if r:
                self.bw.write(self.run - (1 << r), r)
            self.run = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []


def _enc_dc_first(bw, blocks_seq, preds, al):
    """blocks_seq: [(comp_id, coef_zz)] in scan order. G.1.2.1: the
    first DC scan codes diffs of the FLOOR-shifted values."""
    for cid, blk in blocks_seq:
        t = int(blk[0]) >> al
        diff = t - preds[cid]
        preds[cid] = t
        s = abs(diff).bit_length()
        _put(bw, DC_CODES, s)
        if s:
            bw.write(_valbits(diff, s) & ((1 << s) - 1), s)


def _enc_dc_refine(bw, blocks_seq, al):
    for _cid, blk in blocks_seq:
        bw.write((int(blk[0]) >> al) & 1, 1)


def _enc_ac_first(bw, eob, blocks, ss, se, al):
    for blk in blocks:
        tv = [
            (1 if blk[k] >= 0 else -1) * (abs(int(blk[k])) >> al)
            for k in range(ss, se + 1)
        ]
        if not any(tv):
            eob.run += 1
            continue
        eob.flush()
        r = 0
        last = max(i for i, v in enumerate(tv) if v)
        for i, v in enumerate(tv):
            if v == 0:
                r += 1
                continue
            while r > 15:
                _put(bw, AC_CODES, 0xF0)
                r -= 16
            s = abs(v).bit_length()
            _put(bw, AC_CODES, (r << 4) | s)
            bw.write(_valbits(v, s) & ((1 << s) - 1), s)
            r = 0
        if last != se - ss:
            eob.run += 1


def _enc_ac_refine(bw, eob, blocks, ss, se, al):
    """G.1.2.3: newly-significant insertions among correction bits.
    ZRLs must flush at every nonzero coefficient — corrections
    included — or the buffered bits desynchronize from the runs."""
    for blk in blocks:
        absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if blk[k] >= 0 else -1 for k in range(ss, se + 1)]
        eobpos = -1
        for i, a in enumerate(absv):
            if a == 1:
                eobpos = i
        r = 0
        br = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                eob.flush()
                _put(bw, AC_CODES, 0xF0)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if a > 1:
                br.append(a & 1)
                continue
            eob.flush()
            _put(bw, AC_CODES, (r << 4) | 1)
            bw.write(1 if signs[i] > 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob.run += 1
            eob.pending.extend(br)


def _sos(scan_comps, ss, se, ah, al):
    body = bytes([len(scan_comps)])
    for cid in scan_comps:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _headers(h, w, comps, qts):
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(sorted(qts.items()))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["id"], c["hv"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(
        [(0, 0, DC_BITS_FLAT, DC_VALS_FLAT), (1, 0, AC_BITS_PROG, AC_VALS_PROG)]
    )
    return out


def _mcu_block_seq(h, w, comps):
    """[(comp, padded-grid index)] in interleaved MCU order."""
    hmax = max(c["hv"] >> 4 for c in comps)
    vmax = max(c["hv"] & 15 for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    seq = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for c in comps:
            ch, cv = c["hv"] >> 4, c["hv"] & 15
            gx = mcux * ch
            for by in range(cv):
                for bx in range(ch):
                    seq.append((c, (my * cv + by) * gx + (mx * ch + bx)))
    return seq, mcux * mcuy


def _comp_block_order(h, w, comps, c):
    """Non-interleaved AC-scan block order: the component's OWN
    bx-by grid, indices into the padded interleaved grid."""
    hmax = max(x["hv"] >> 4 for x in comps)
    vmax = max(x["hv"] & 15 for x in comps)
    mcux = -(-w // (8 * hmax))
    ch, cv = c["hv"] >> 4, c["hv"] & 15
    gx = mcux * ch
    cw = -(-w * ch // hmax)
    chgt = -(-h * cv // vmax)
    bx, by = -(-cw // 8), -(-chgt // 8)
    return [c["blocks"][row * gx + col] for row in range(by) for col in range(bx)]


def encode_progressive(h, w, comps, qts, script):
    """Progressive twin. script entries:
    ('dc_first', al) / ('dc_refine', al) — interleaved over all comps;
    ('ac_first', cid, ss, se, al) / ('ac_refine', cid, ss, se, al)."""
    out = _headers(h, w, comps, qts)
    seq, _ = _mcu_block_seq(h, w, comps)
    blocks_seq = [(c["id"], c["blocks"][i]) for c, i in seq]
    preds = {c["id"]: 0 for c in comps}
    by_id = {c["id"]: c for c in comps}
    for step in script:
        bw = _BitWriter()
        if step[0] == "dc_first":
            out += _sos([c["id"] for c in comps], 0, 0, 0, step[1])
            _enc_dc_first(bw, blocks_seq, preds, step[1])
        elif step[0] == "dc_refine":
            out += _sos([c["id"] for c in comps], 0, 0, step[1] + 1, step[1])
            _enc_dc_refine(bw, blocks_seq, step[1])
        else:
            kind, cid, ss, se, al = step
            ah = 0 if kind == "ac_first" else al + 1
            out += _sos([cid], ss, se, ah, al)
            blocks = _comp_block_order(h, w, comps, by_id[cid])
            eob = _EobRun(bw)
            if kind == "ac_first":
                _enc_ac_first(bw, eob, blocks, ss, se, al)
            else:
                _enc_ac_refine(bw, eob, blocks, ss, se, al)
            eob.flush()
        bw.pad()
        out += bw.out
    return bytes(out + b"\xff\xd9")


def _full_script(comps, dc_levels=(2, 1, 0), bands=((1, 5), (6, 63)), al_seq=(1, 0)):
    script = [("dc_first", dc_levels[0])]
    for al in dc_levels[1:]:
        script.append(("dc_refine", al))
    for ss, se in bands:
        for c in comps:
            first_al = al_seq[0]
            script.append(("ac_first", c["id"], ss, se, first_al))
        for al in al_seq[1:]:
            for c in comps:
                script.append(("ac_refine", c["id"], ss, se, al))
    return script


# ------------------------------------------------------------- differentials


@pytest.mark.parametrize("seed", [0, 2, 5, 7, 9])
def test_progressive_equals_sequential_gray(seed):
    rng = np.random.default_rng(seed)
    blocks = _safe_random_blocks(rng, 16, spread=300, density=18)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: [1] * 64}
    seq = encode_jpeg(32, 32, comps, qts)
    prog = encode_progressive(32, 32, comps, qts, _full_script(comps))
    a, b = decode_jpeg(seq), decode_jpeg(prog)
    assert a.shape == b.shape == (32, 32, 1)
    np.testing.assert_array_equal(a, b)


def test_progressive_zrl_correction_interleave_regression():
    """The exact shape that desyncs a naive encoder/decoder pair:
    corrections spread across a >16 zero-history run before a
    newly-significant coefficient — the ZRL must flush the buffered
    correction bits seen SO FAR, later corrections ride the next
    emission."""
    blk = np.zeros(64, dtype=np.int64)
    blk[0] = 404
    for k, v in {13: -97, 22: -266, 24: 14, 28: -171, 29: -240,
                 33: 1, 34: -145, 35: 162, 46: 13, 53: -277, 63: 80}.items():
        blk[k] = v
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blk[np.newaxis, :]}]
    qts = {0: [1] * 64}
    seq = encode_jpeg(8, 8, comps, qts)
    script = [
        ("dc_first", 0),
        ("ac_first", 1, 1, 63, 2),
        ("ac_refine", 1, 1, 63, 1),
        ("ac_refine", 1, 1, 63, 0),
    ]
    prog = encode_progressive(8, 8, comps, qts, script)
    np.testing.assert_array_equal(decode_jpeg(seq), decode_jpeg(prog))


@pytest.mark.parametrize("hv,h,w", [(0x11, 32, 32), (0x22, 32, 32)])
def test_progressive_equals_sequential_color(hv, h, w):
    """4:4:4 and 4:2:0 color: interleaved DC scans (three per-MCU
    predictors), per-component AC scans on each component's own block
    grid, chroma upsampling after accumulation."""
    rng = np.random.default_rng(11)
    hmax, vmax = hv >> 4, hv & 15
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    ny = mcux * hmax * mcuy * vmax
    nc = mcux * mcuy
    comps = [
        {"id": 1, "hv": hv, "tq": 0,
         "blocks": _safe_random_blocks(rng, ny, spread=120, density=12)},
        {"id": 2, "hv": 0x11, "tq": 1,
         "blocks": _safe_random_blocks(rng, nc, spread=40, density=6)},
        {"id": 3, "hv": 0x11, "tq": 1,
         "blocks": _safe_random_blocks(rng, nc, spread=40, density=6)},
    ]
    qts = {0: [2] * 64, 1: [3] * 64}
    seq = encode_jpeg(h, w, comps, qts)
    prog = encode_progressive(h, w, comps, qts, _full_script(comps))
    a, b = decode_jpeg(seq), decode_jpeg(prog)
    assert a.shape == b.shape == (h, w, 3)
    np.testing.assert_array_equal(a, b)


def test_progressive_restart_intervals():
    """DRI inside progressive scans: predictors and the EOB run reset
    at every RST; a second DRI segment retargets later scans."""
    rng = np.random.default_rng(3)
    blocks = _safe_random_blocks(rng, 8, spread=200, density=10)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: [1] * 64}
    seq = encode_jpeg(8, 64, comps, qts)
    out = _headers(8, 64, comps, qts)
    # DC scan with DRI=2: per-segment predictor reset
    out += b"\xff\xdd" + struct.pack(">HH", 4, 2)
    out += _sos([1], 0, 0, 0, 0)
    segs = []
    for s0 in range(0, 8, 2):
        bw = _BitWriter()
        _enc_dc_first(bw, [(1, b) for b in blocks[s0:s0 + 2]], {1: 0}, 0)
        bw.pad()
        segs.append(bytes(bw.out))
    out += segs[0]
    for i, s in enumerate(segs[1:]):
        out += bytes([0xFF, 0xD0 + (i % 8)]) + s
    # AC scan with DRI=3: EOB run must reset per segment
    out += b"\xff\xdd" + struct.pack(">HH", 4, 3)
    out += _sos([1], 1, 63, 0, 0)
    segs = []
    for s0 in range(0, 8, 3):
        bw = _BitWriter()
        eob = _EobRun(bw)
        _enc_ac_first(bw, eob, blocks[s0:s0 + 3], 1, 63, 0)
        eob.flush()
        bw.pad()
        segs.append(bytes(bw.out))
    out += segs[0]
    for i, s in enumerate(segs[1:]):
        out += bytes([0xFF, 0xD0 + (i % 8)]) + s
    prog = bytes(out + b"\xff\xd9")
    np.testing.assert_array_equal(decode_jpeg(seq), decode_jpeg(prog))


# ------------------------------------------------------------ error contract


def _gray_prog_base(blocks=None):
    if blocks is None:
        blocks = np.zeros((1, 64), dtype=np.int64)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    return comps, {0: [1] * 64}


def test_ac_scan_before_dc_is_error():
    comps, qts = _gray_prog_base()
    out = _headers(8, 8, comps, qts) + _sos([1], 1, 63, 0, 0) + b"\x00"
    with pytest.raises(ValueError, match="AC scan before DC"):
        decode_jpeg(bytes(out + b"\xff\xd9"))


def test_dc_refinement_before_dc_is_error():
    comps, qts = _gray_prog_base()
    out = _headers(8, 8, comps, qts) + _sos([1], 0, 0, 1, 0) + b"\x00"
    with pytest.raises(ValueError, match="DC refinement before"):
        decode_jpeg(bytes(out + b"\xff\xd9"))


def test_bad_successive_approximation_is_error():
    comps, qts = _gray_prog_base()
    out = _headers(8, 8, comps, qts) + _sos([1], 0, 0, 3, 1) + b"\x00"
    with pytest.raises(ValueError, match="successive approximation"):
        decode_jpeg(bytes(out + b"\xff\xd9"))


def test_interleaved_ac_scan_is_error():
    comps = [
        {"id": i, "hv": 0x11, "tq": 0, "blocks": np.zeros((1, 64), np.int64)}
        for i in (1, 2, 3)
    ]
    qts = {0: [1] * 64}
    out = _headers(8, 8, comps, qts) + _sos([1, 2, 3], 1, 63, 0, 0) + b"\x00"
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg(bytes(out + b"\xff\xd9"))


def test_progressive_truncation_is_error():
    rng = np.random.default_rng(1)
    blocks = _safe_random_blocks(rng, 4, spread=100, density=10)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: [1] * 64}
    prog = encode_progressive(16, 16, comps, qts, _full_script(comps))
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(prog[: len(prog) // 2])


def test_progressive_dc_only_matches_flat_tiles():
    """A DC-first-only progressive stream (no AC scans at all) is the
    truncated-render case: missing coefficients stay zero, flat
    tiles."""
    vals = np.array([-300, -1, 0, 7], dtype=np.int64)
    blocks = np.zeros((4, 64), dtype=np.int64)
    blocks[:, 0] = vals
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: [8] + [1] * 63}
    prog = encode_progressive(8, 32, comps, qts, [("dc_first", 0)])
    img = decode_jpeg(prog)
    exp = np.clip(np.rint(vals * 8 / 8) + 128, 0, 255).astype(np.uint8)
    for i, v in enumerate(exp):
        assert (img[:, 8 * i : 8 * i + 8, 0] == v).all()


# ------------------------------------------------------------- armed PIL leg


def _no_pil():
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


@pytest.mark.skipif(_no_pil(), reason="PIL not installed (armed leg)")
def test_pil_equivalence_progressive_within_one():
    """Armed: when a codec library appears, our progressive decode of
    a full successive-approximation script must match libjpeg within
    its integer-IDCT tolerance."""
    import io

    from PIL import Image

    rng = np.random.default_rng(17)
    blocks = _safe_random_blocks(rng, 16, spread=120, density=10)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: list(rng.integers(1, 10, 64))}
    prog = encode_progressive(32, 32, comps, qts, _full_script(comps))
    ours = decode_jpeg(prog)[:, :, 0].astype(int)
    theirs = np.asarray(Image.open(io.BytesIO(prog)).convert("L")).astype(int)
    assert np.abs(ours - theirs).max() <= 1


# ----------------------------------------------------------- property tests


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _scan_scripts(draw):
    """A random VALID progressive scan script: a DC ladder from a
    random starting Al, then a random partition of 1..63 into bands,
    each with its own approximation ladder."""
    dc_top = draw(st.integers(0, 3))
    script = [("dc_first", dc_top)]
    for al in range(dc_top - 1, -1, -1):
        script.append(("dc_refine", al))
    # band split points
    cuts = sorted(draw(st.sets(st.integers(2, 63), max_size=3)))
    bands = []
    lo = 1
    for c in cuts:
        bands.append((lo, c - 1))
        lo = c
    bands.append((lo, 63))
    for ss, se in bands:
        ac_top = draw(st.integers(0, 2))
        script.append(("ac_first", 1, ss, se, ac_top))
        for al in range(ac_top - 1, -1, -1):
            script.append(("ac_refine", 1, ss, se, al))
    return script


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2 ** 32 - 1),
    _scan_scripts(),
)
def test_progressive_random_scripts_equal_sequential(seed, script):
    """ANY valid scan script — random DC/AC approximation ladders over
    a random spectral partition — must decode identically to the
    sequential encoding of the same coefficients."""
    rng = np.random.default_rng(seed)
    blocks = _safe_random_blocks(rng, 4, spread=200, density=14)
    comps = [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}]
    qts = {0: [1] * 64}
    seq = encode_jpeg(16, 16, comps, qts)
    prog = encode_progressive(16, 16, comps, qts, script)
    np.testing.assert_array_equal(decode_jpeg(seq), decode_jpeg(prog))
