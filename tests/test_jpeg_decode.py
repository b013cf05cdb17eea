"""Native baseline-JPEG decoder tests (r11).

Every payload here is built by an INDEPENDENT pure-Python encoder
twin: its own hardcoded spec zigzag table (the decoder derives its
walk programmatically — the hardcoded table pins the derivation),
its own canonical-Huffman code assignment, its own MSB-first bit
packer with FF00 stuffing and RSTn emission, and its own direct
double-loop IDCT for expected pixels. A divergence in any of
zigzag order, canonical code assignment, EXTEND sign logic, DC
prediction, restart handling, dequantization, IDCT scaling,
level-shift/clamp, MCU block order, chroma upsampling, or YCbCr
conversion fails these tests.

The PIL legs are ARMED (same contract as test_pil_equivalence):
they auto-skip in this codec-less container and certify the
decoder against libjpeg conventions the moment PIL appears —
exact on DC-only payloads (flat blocks are exact in any
conformant decoder), within ±1 elsewhere (libjpeg's integer IDCT
approximation tolerance).
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from flink_hiveorc_spark.functions import jpeg as J
from flink_hiveorc_spark.functions.jpeg import decode_jpeg
from flink_hiveorc_spark.functions.multimodal import decode_image

# ITU-T T.81 figure A.6 zigzag scan order (zigzag index -> raster
# index), hardcoded from the spec — independent of the module's
# diagonal-walk derivation.
SPEC_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


# ---------------------------------------------------------------- encoder twin


def _canon_codes(bits, vals):
    """Canonical Huffman assignment per T.81 Annex C — reimplemented
    for the twin: value -> (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out

# twin tables:
# DC "balanced" table — category s gets code length 9-s so every
# (code + value bits) pair is exactly 9 bits; this is also the table
# the decode-stats queries ship, so the twin pins that construction.
DC_BITS_BAL = [1] * 9 + [0] * 7
DC_VALS_BAL = bytes([8, 7, 6, 5, 4, 3, 2, 1, 0])
# AC table for DC-only streams: the single symbol EOB as code "0".
AC_BITS_EOB = [1] + [0] * 15
AC_VALS_EOB = bytes([0x00])
# general flat-9 tables: every possible symbol at code length 9
# (162 AC symbols and 12 DC categories both satisfy Kraft at 9 bits)
DC_VALS_FLAT = bytes(range(12))
DC_BITS_FLAT = [0] * 8 + [12] + [0] * 7
AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
AC_BITS_FLAT = [0] * 8 + [len(AC_SYMBOLS)] + [0] * 7
AC_VALS_FLAT = bytes(AC_SYMBOLS)


class _BitWriter:
    """MSB-first packer with FF00 stuffing; independent of the
    decoder's reader."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.write(1, 1)

    def rst(self, idx):
        self.pad()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    diff = int(coef_zz[0]) - pred
    s = abs(diff).bit_length()
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    k, run = 1, 0
    while k < 64:
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.write(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | s]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run, k = 0, k + 1
    if run:
        c, ln = ac_codes[0x00]
        bw.write(c, ln)
    return int(coef_zz[0])


def _dht_segment(tables):
    body = b""
    for tc, th, bits, vals in tables:
        body += bytes([(tc << 4) | th]) + bytes(bits) + vals
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt_segment(tables, pq=0):
    body = b""
    for tq, q in tables:
        q = np.asarray(q)
        raw = (
            q.astype(">u2").tobytes() if pq else q.astype(np.uint8).tobytes()
        )
        body += bytes([(pq << 4) | tq]) + raw
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    h,
    w,
    comps,
    qts,
    dri=0,
    pq=0,
    interleave=True,
    balanced_tables=False,
    sof_marker=0xC0,
):
    """Encoder twin. comps: list of dicts with id, hv (e.g. 0x22), tq,
    and blocks — (n_blocks, 64) int array of QUANTIZED coefficients in
    zigzag order, component-raster block order on the scan grid
    (padded to whole MCUs when interleaved). qts: {tq: 64 ints zigzag}.
    """
    if balanced_tables:
        dc_codes = _canon_codes(DC_BITS_BAL, DC_VALS_BAL)
        ac_codes = _canon_codes(AC_BITS_EOB, AC_VALS_EOB)
        dht = _dht_segment(
            [(0, 0, DC_BITS_BAL, DC_VALS_BAL), (1, 0, AC_BITS_EOB, AC_VALS_EOB)]
        )
    else:
        dc_codes = _canon_codes(DC_BITS_FLAT, DC_VALS_FLAT)
        ac_codes = _canon_codes(AC_BITS_FLAT, AC_VALS_FLAT)
        dht = _dht_segment(
            [(0, 0, DC_BITS_FLAT, DC_VALS_FLAT), (1, 0, AC_BITS_FLAT, AC_VALS_FLAT)]
        )
    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(sorted(qts.items()), pq=pq)
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof_body += bytes([c["id"], c["hv"], c["tq"]])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof_body))
    out += sof_body
    out += dht
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    def sos(scan_comps):
        body = bytes([len(scan_comps)])
        for c in scan_comps:
            body += bytes([c["id"], 0x00])
        body += bytes([0, 63, 0])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    hmax = max(c["hv"] >> 4 for c in comps)
    vmax = max(c["hv"] & 15 for c in comps)
    if interleave:
        out += sos(comps)
        bw = _BitWriter()
        if len(comps) == 1:
            seq = [(comps[0], i) for i in range(len(comps[0]["blocks"]))]
            mcus = len(comps[0]["blocks"])
            per_mcu = 1
        else:
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            mcus = mcux * mcuy
            seq = []
            for m in range(mcus):
                my, mx = divmod(m, mcux)
                for c in comps:
                    ch, cv = c["hv"] >> 4, c["hv"] & 15
                    gx = mcux * ch
                    for by in range(cv):
                        for bx in range(ch):
                            seq.append((c, (my * cv + by) * gx + (mx * ch + bx)))
            per_mcu = len(seq) // mcus
        preds = {c["id"]: 0 for c in comps}
        for i, (c, bi) in enumerate(seq):
            if dri and i and i % (dri * per_mcu) == 0:
                bw.rst(i // (dri * per_mcu) - 1)
                preds = {c2["id"]: 0 for c2 in comps}
            preds[c["id"]] = _encode_block(
                bw, c["blocks"][bi], preds[c["id"]], dc_codes, ac_codes
            )
        bw.pad()
        out += bw.out
    else:
        for c in comps:
            out += sos([c])
            bw = _BitWriter()
            pred = 0
            for bi in range(len(c["blocks"])):
                pred = _encode_block(bw, c["blocks"][bi], pred, dc_codes, ac_codes)
            bw.pad()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _ref_idct_block(coef_zz, q):
    """Direct four-loop IDCT on one dequantized block — the slowest,
    most literal rendering of T.81 A.3.3, independent of the
    decoder's matrix factorization."""
    F_ = np.zeros(64, dtype=np.float64)
    for i, flat in enumerate(SPEC_ZIGZAG):
        F_[flat] = float(coef_zz[i]) * float(q[i])
    F_ = F_.reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * F_[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = acc / 4
    return np.clip(np.round(out + 128), 0, 255).astype(np.uint8)


def _ref_plane(blocks_zz, q, by, bx):
    rows = []
    for r in range(by):
        row = [
            _ref_idct_block(blocks_zz[r * bx + c], q) for c in range(bx)
        ]
        rows.append(np.hstack(row))
    return np.vstack(rows)


def _safe_random_blocks(rng, n, spread=40, density=8):
    """Random sparse coefficient blocks whose direct-IDCT pixel values
    stay > 1e-3 away from halfway rounding points, so the matrix IDCT
    and the loop IDCT round identically (both are float64 with
    ~1e-13 error on these magnitudes)."""
    blocks = []
    while len(blocks) < n:
        b = np.zeros(64, dtype=np.int32)
        idx = rng.choice(64, size=density, replace=False)
        b[idx] = rng.integers(-spread, spread + 1, size=density)
        raw = _ref_idct_raw(b)
        frac = np.abs((raw + 128) % 1.0 - 0.5)
        if (frac > 1e-3).all():
            blocks.append(b)
    return np.stack(blocks)


def _ref_idct_raw(coef_zz):
    F_ = np.zeros(64)
    for i, flat in enumerate(SPEC_ZIGZAG):
        F_[flat] = float(coef_zz[i])
    F_ = F_.reshape(8, 8)
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                for v in range(8):
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        cu * cv * F_[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = acc / 4
    return out


def _dc_blocks(values):
    blocks = np.zeros((len(values), 64), dtype=np.int32)
    blocks[:, 0] = values
    return blocks


# ---------------------------------------------------------------------- tests


def test_zigzag_matches_spec_table():
    assert list(J._ZIGZAG) == SPEC_ZIGZAG


def test_dc_only_gray_exact_both_table_families():
    rng = np.random.default_rng(11)
    d = rng.integers(0, 256, 16)
    expect = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1).astype(np.uint8)
    for balanced in (False, True):
        payload = encode_jpeg(
            32, 32,
            [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)}],
            {0: [8] * 64},
            balanced_tables=balanced,
        )
        arr = decode_jpeg(payload)
        assert arr.shape == (32, 32, 1)
        assert (arr[:, :, 0] == expect).all()


def test_dc_only_triggers_ff_stuffing():
    # balanced tables: a leading diff of 0 emits 1111 1111 0 0 — the
    # first entropy byte is 0xFF and MUST be stuffed
    d = np.array([128] + [7] * 15)
    payload = encode_jpeg(
        32, 32,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)}],
        {0: [8] * 64},
        balanced_tables=True,
    )
    assert b"\xff\x00" in payload
    arr = decode_jpeg(payload)
    expect = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1)
    assert (arr[:, :, 0] == expect).all()


def test_ac_coefficients_against_direct_idct():
    rng = np.random.default_rng(23)
    q = rng.integers(1, 12, 64)
    blocks = _safe_random_blocks(rng, 6)
    payload = encode_jpeg(
        16, 24,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}],
        {0: q},
    )
    arr = decode_jpeg(payload)
    expect = _ref_plane(blocks, q, 2, 3)
    assert arr.shape == (16, 24, 1)
    assert (arr[:, :, 0] == expect).all()


def test_zrl_sixteen_zero_run():
    # coefficient at zigzag index 40 with 39 zeros before it forces
    # two ZRL symbols; also a long trailing EOB
    b = np.zeros((1, 64), dtype=np.int32)
    b[0, 0] = 10
    b[0, 40] = -5
    q = np.ones(64, dtype=np.int32)
    payload = encode_jpeg(
        8, 8, [{"id": 1, "hv": 0x11, "tq": 0, "blocks": b}], {0: q}
    )
    arr = decode_jpeg(payload)
    assert (arr[:, :, 0] == _ref_plane(b, q, 1, 1)).all()


def test_color_444_neutral_chroma_is_gray():
    rng = np.random.default_rng(31)
    d = rng.integers(0, 256, 16)
    zeros = _dc_blocks(np.zeros(16, dtype=np.int64))
    payload = encode_jpeg(
        32, 32,
        [
            {"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)},
            {"id": 2, "hv": 0x11, "tq": 0, "blocks": zeros},
            {"id": 3, "hv": 0x11, "tq": 0, "blocks": zeros},
        ],
        {0: [8] * 64},
        balanced_tables=True,
    )
    arr = decode_jpeg(payload)
    assert arr.shape == (32, 32, 3)
    expect = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1)
    for ch in range(3):
        assert (arr[:, :, ch] == expect).all()


def test_color_444_bt601_conversion():
    # flat color blocks: independent BT.601 full-range conversion;
    # sample values chosen away from .5 rounding points
    cases = [(90, 100, 200), (200, 60, 100), (128, 128, 128), (16, 240, 16)]
    for yv, cbv, crv in cases:
        payload = encode_jpeg(
            8, 8,
            [
                {"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([yv - 128])},
                {"id": 2, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([cbv - 128])},
                {"id": 3, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([crv - 128])},
            ],
            {0: [8] * 64},
        )
        arr = decode_jpeg(payload)
        r = np.clip(round(yv + 1.402 * (crv - 128)), 0, 255)
        g = np.clip(
            round(yv - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128)), 0, 255
        )
        b = np.clip(round(yv + 1.772 * (cbv - 128)), 0, 255)
        assert (arr == np.array([r, g, b], dtype=np.uint8)).all(), (yv, cbv, crv)


def test_color_420_mcu_order_and_upsampling():
    # 32x32 4:2:0 — 4 MCUs of 4 Y blocks each; Y digest bytes land in
    # MCU-major order; chroma flat at (cb, cr) = (160, 96) checks the
    # 2x2 nearest-neighbour replication path end-to-end
    rng = np.random.default_rng(47)
    d = rng.integers(0, 256, 16)
    # Y grid is 4x4 blocks; raster grid index for MCU-major fill
    y_blocks = _dc_blocks(d - 128)  # already in grid-raster order
    cb, cr = 160, 96
    payload = encode_jpeg(
        32, 32,
        [
            {"id": 1, "hv": 0x22, "tq": 0, "blocks": y_blocks},
            {"id": 2, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([cb - 128] * 4)},
            {"id": 3, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([cr - 128] * 4)},
        ],
        {0: [8] * 64},
    )
    arr = decode_jpeg(payload)
    assert arr.shape == (32, 32, 3)
    y = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1).astype(np.float64)
    r = np.clip(np.round(y + 1.402 * (cr - 128)), 0, 255)
    g = np.clip(
        np.round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)), 0, 255
    )
    b = np.clip(np.round(y + 1.772 * (cb - 128)), 0, 255)
    assert (arr[:, :, 0] == r).all()
    assert (arr[:, :, 1] == g).all()
    assert (arr[:, :, 2] == b).all()


def test_420_odd_dimensions_crop():
    # 12x20 at 4:2:0 pads to one row of 2 MCUs (16x32 samples); the
    # decode must crop back to the declared 12x20
    rng = np.random.default_rng(53)
    vals = rng.integers(-100, 100, 8)  # 2 MCUs x 4 Y blocks
    payload = encode_jpeg(
        12, 20,
        [
            {"id": 1, "hv": 0x22, "tq": 0, "blocks": _dc_blocks(vals)},
            {"id": 2, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([0, 0])},
            {"id": 3, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([0, 0])},
        ],
        {0: [8] * 64},
    )
    arr = decode_jpeg(payload)
    assert arr.shape == (12, 20, 3)
    # the encoder twin takes blocks in grid-raster order (2 rows of 4)
    grid = np.asarray(vals).reshape(2, 4)
    y_full = np.repeat(np.repeat(grid, 8, 0), 8, 1)
    expect = np.clip(y_full + 128, 0, 255)[:12, :20]
    assert (arr[:, :, 0] == expect).all()


def test_dri_restart_predictor_reset():
    rng = np.random.default_rng(61)
    d = rng.integers(0, 256, 16)
    for dri in (1, 3, 5):
        payload = encode_jpeg(
            32, 32,
            [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)}],
            {0: [8] * 64},
            dri=dri,
        )
        assert any(
            bytes([0xFF, 0xD0 + i]) in payload for i in range(8)
        )
        arr = decode_jpeg(payload)
        expect = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1)
        assert (arr[:, :, 0] == expect).all(), dri


def test_16bit_dqt():
    # quant steps above 255 need Pq=1; DC step 300 with coefficient 4
    # gives a dequantized 1200 -> 150 + 128 = 278 clamps to 255;
    # the negative twin clamps to 0
    b = _dc_blocks([4, -4])
    payload = encode_jpeg(
        8, 16,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": b}],
        {0: [300] * 64},
        pq=1,
    )
    arr = decode_jpeg(payload)
    assert (arr[:, :8, 0] == 255).all()
    assert (arr[:, 8:, 0] == 0).all()


def test_sof1_extended_sequential():
    d = np.arange(16) * 16
    payload = encode_jpeg(
        32, 32,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)}],
        {0: [8] * 64},
        sof_marker=0xC1,
    )
    arr = decode_jpeg(payload)
    expect = np.repeat(np.repeat(d.reshape(4, 4), 8, 0), 8, 1)
    assert (arr[:, :, 0] == expect).all()


def test_multiscan_noninterleaved_color():
    # three single-component scans instead of one interleaved scan
    rng = np.random.default_rng(71)
    d = rng.integers(0, 256, 4)
    payload = encode_jpeg(
        16, 16,
        [
            {"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)},
            {"id": 2, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([0] * 4)},
            {"id": 3, "hv": 0x11, "tq": 0, "blocks": _dc_blocks([0] * 4)},
        ],
        {0: [8] * 64},
        interleave=False,
    )
    arr = decode_jpeg(payload)
    expect = np.repeat(np.repeat(d.reshape(2, 2), 8, 0), 8, 1)
    for ch in range(3):
        assert (arr[:, :, ch] == expect).all()


def _valid_gray(d=None):
    if d is None:
        d = np.arange(16) * 15
    return encode_jpeg(
        32, 32,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(np.asarray(d) - 128)}],
        {0: [8] * 64},
    )


def test_unsupported_features_are_notimplemented():
    base = _valid_gray()
    # lossless: flip SOF0 -> SOF3 (progressive SOF2 decodes natively
    # since r11 — see test_jpeg_progressive.py)
    lossless = base.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(lossless)
    # arithmetic-coded sequential
    arith = base.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    # 12-bit precision
    i = base.index(b"\xff\xc0")
    twelve = bytearray(base)
    twelve[i + 4] = 12
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(twelve))
    # 4-component (CMYK-style) frame: declared Nf=4 with a padded
    # component list
    four = bytearray(base)
    assert four[i + 9] == 1  # Nf byte
    four[i + 3] = 20 & 0xFF  # new SOF length 2+6+12
    four[i + 2] = 0
    sof_tail = bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    four = bytes(four[: i + 9]) + bytes([4]) + sof_tail + bytes(base[i + 13:])
    with pytest.raises(NotImplementedError, match="4-component"):
        decode_jpeg(four)


def test_malformed_payloads_are_valueerror():
    base = _valid_gray()
    with pytest.raises(ValueError, match="EOI"):
        decode_jpeg(base[:-2])  # EOI stripped
    with pytest.raises(ValueError, match="truncated|exhausted"):
        decode_jpeg(base[:-12])  # entropy stream cut
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01rubbish")
    # SOS before SOF
    i = base.index(b"\xff\xda")
    j = base.index(b"\xff\xc0")
    no_sof = base[:j] + base[j + 13 : ]
    with pytest.raises(ValueError, match="SOS before SOF|no frame"):
        decode_jpeg(no_sof)
    # zero quant step
    zq = bytearray(base)
    k = base.index(b"\xff\xdb")
    zq[k + 5] = 0
    with pytest.raises(ValueError, match="zero quantization"):
        decode_jpeg(bytes(zq))
    # restart marker out of sequence
    d = np.arange(16) * 15
    rpayload = encode_jpeg(
        32, 32,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": _dc_blocks(d - 128)}],
        {0: [8] * 64},
        dri=4,
    )
    bad = rpayload.replace(b"\xff\xd0", b"\xff\xd5", 1)
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bad)


def test_bomb_guard_dimensions():
    blocks = _dc_blocks([0])
    payload = encode_jpeg(
        60000, 60000,
        [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}],
        {0: [8] * 64},
    )
    with pytest.raises(ValueError, match="bomb"):
        decode_jpeg(payload)


def test_decode_image_routing_and_quarantine_contract():
    d = np.arange(16) * 13
    payload = _valid_gray(d)
    arr = decode_image(payload)
    expect = np.repeat(np.repeat(np.asarray(d).reshape(4, 4), 8, 0), 8, 1)
    assert (arr[:, :, 0] == expect).all()
    # malformed JPEG -> ValueError with the classified message
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_image(payload[:-8])
    # a frame class outside the native envelope without PIL -> the
    # NotImplementedError gap (progressive decodes natively since r11;
    # a sequential stream re-marked SOF2 is now structurally invalid)
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="arithmetic"):
            decode_image(payload.replace(b"\xff\xc0", b"\xff\xc9", 1))
    with pytest.raises(ValueError, match="malformed JPEG"):
        decode_image(payload.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_fuzz_byte_flips_keep_error_contract():
    base = _valid_gray()
    rng = np.random.default_rng(97)
    for _ in range(300):
        mut = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            mut[rng.integers(0, len(mut))] = rng.integers(0, 256)
        try:
            out = decode_jpeg(bytes(mut))
            assert out.dtype == np.uint8 and out.ndim == 3
        except (ValueError, NotImplementedError):
            pass  # the only two contract classes


def test_fuzz_truncations_keep_error_contract():
    base = _valid_gray()
    for cut in range(2, len(base), 3):
        try:
            decode_jpeg(base[:cut])
        except (ValueError, NotImplementedError):
            pass


# ------------------------------------------------------------- armed PIL legs


def _no_pil():
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


HAS_PIL = not _no_pil()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed (armed leg)")
def test_pil_equivalence_dc_only_exact():
    from PIL import Image

    rng = np.random.default_rng(3)
    d = rng.integers(0, 256, 16)
    payload = _valid_gray(d)
    ours = decode_jpeg(payload)[:, :, 0]
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    assert (ours == theirs).all()


@pytest.mark.skipif(not HAS_PIL, reason="PIL not installed (armed leg)")
def test_pil_equivalence_ac_within_one():
    from PIL import Image

    rng = np.random.default_rng(5)
    q = rng.integers(1, 10, 64)
    blocks = _safe_random_blocks(rng, 4)
    payload = encode_jpeg(
        16, 16, [{"id": 1, "hv": 0x11, "tq": 0, "blocks": blocks}], {0: q}
    )
    ours = decode_jpeg(payload)[:, :, 0].astype(int)
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("L")).astype(int)
    assert np.abs(ours - theirs).max() <= 1  # libjpeg integer-IDCT tolerance
