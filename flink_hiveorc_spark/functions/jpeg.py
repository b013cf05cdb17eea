"""Native baseline JPEG (ITU-T T.81) decoder — pure stdlib + numpy.

Scope (the honest envelope a Huffman+IDCT implementation can own
without an entropy-codec library, because baseline JPEG *is* just
Huffman + IDCT):

- baseline sequential DCT (SOF0) and extended sequential (SOF1),
  8-bit precision, Huffman entropy coding;
- progressive DCT (SOF2, r11 — T.81 Annex G): spectral selection
  and successive approximation, interleaved/non-interleaved DC
  scans (first + one-bit refinement), single-component AC scans
  with EOB-run coding (first) and correction-bit refinement,
  coefficients accumulated across scans into frame-level grids
  before the shared dequant + IDCT;
- 1-component grayscale and 3-component YCbCr (BT.601 full-range
  JFIF conversion), any integer-ratio sampling (4:4:4, 4:2:0,
  4:2:2, 4:4:0, ...);
- 8-bit and 16-bit quantization tables (DQT Pq 0/1), multiple
  tables per segment;
- restart intervals (DRI + RST0-7 with cyclic-index verification,
  predictor reset, byte realignment; per-scan DRI changes);
- FF00 byte stuffing, fill bytes before markers, multi-scan
  baseline files (separate single-component scans), trailing
  garbage after EOI.

Out of scope → NotImplementedError (the decode contract's
"needs a codec/feature this build lacks" class, same as
multimodal.decode_image): lossless / hierarchical / differential
(SOF3, SOF5-7, SOF13-15), arithmetic coding (SOF9-11, DAC),
12-bit precision, DNL-deferred height, 2/4-component (Adobe CMYK)
color, non-integer sampling ratios. Structural damage (truncated
segments, invalid Huffman codes, runs past block end, bad RST
ordering, AC-before-DC progressive scans, missing EOI) raises
ValueError via the caller's contract wrapper.

Why this exists: JPEG is the #1 image format in any real
multimodal corpus (BASELINE.json "multimodal columns" north star;
the 546-LoC reference has no media surface at all, so the need is
user frequency, not reference parity). The arithmetic is exact
enough for the external oracle: a DC-only block decodes to a flat
8x8 tile whose value is integer-exact after np.rint (the float
IDCT error on a DC-only block is < 1e-13 of a unit), which is what
`multimodal_jpeg_decode_stats` pins cross-engine.

Tested against an independent pure-Python encoder twin
(tests/test_jpeg_decode.py builds real entropy streams with its
own canonical-Huffman bit packer) plus an armed PIL-equivalence
leg that self-certifies any codec swap-in.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg"]

# pixel-count bomb guard shared with the other image decoders; import
# deferred to avoid a cycle (multimodal imports this module)
_MAX_PIXELS_DEFAULT = 1 << 26


def _zigzag_flat() -> np.ndarray:
    """Zigzag index -> row-major flat position, derived from the walk
    (T.81 figure 5): diagonals s = row+col; odd diagonals run
    top-to-bottom, even ones bottom-to-top."""
    pos = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rows if s % 2 == 1 else reversed(list(rows))):
            pos.append(r * 8 + (s - r))
    return np.array(pos, dtype=np.intp)


_ZIGZAG = _zigzag_flat()


def _idct_matrix() -> np.ndarray:
    """M[x, u] = C(u)/2 * cos((2x+1)*u*pi/16); f = M @ F @ M.T is the
    2-D type-III DCT of T.81 A.3.3."""
    x, u = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[:, 0] *= 1.0 / np.sqrt(2.0)
    return m


_IDCT_M = _idct_matrix()


class _HuffTable:
    """Canonical Huffman table per T.81 Annex C: BITS (16 counts by
    code length) + HUFFVAL (values in code order)."""

    def __init__(self, bits: list[int], values: bytes):
        if len(values) != sum(bits):
            raise ValueError(
                f"DHT declares {sum(bits)} codes but carries {len(values)} values"
            )
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            if code >= (1 << length):
                raise ValueError("DHT code lengths overflow the prefix space")
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over one (already destuffed) entropy
    segment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted mid-block")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            val = table.lookup.get((length, code))
            if val is not None:
                return val
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _be16(data: bytes, pos: int) -> int:
    if pos + 2 > len(data):
        raise ValueError("truncated JPEG segment")
    return struct.unpack_from(">H", data, pos)[0]


_SOF_UNSUPPORTED = {
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic-coded sequential (SOF9)",
    0xCA: "arithmetic-coded progressive (SOF10)",
    0xCB: "arithmetic-coded lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _decode_block(
    reader: _BitReader, dc_tbl: _HuffTable, ac_tbl: _HuffTable, pred: int
) -> tuple[np.ndarray, int]:
    """One 8x8 block -> (64 zigzag-order coefficients, new DC value)."""
    s = reader.decode_huff(dc_tbl)
    if s > 15:
        raise ValueError(f"DC magnitude category {s} out of range")
    diff = _extend(reader.read(s), s) if s else 0
    dc = pred + diff
    coef = np.zeros(64, dtype=np.int32)
    coef[0] = dc
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_tbl)
        r, size = rs >> 4, rs & 15
        if size == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient run past block end")
        coef[k] = _extend(reader.read(size), size)
        k += 1
    return coef, dc


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], list[int], int]:
    """Destuff the scan's entropy data from `pos`: returns the
    RST-delimited segments, the RST indices between them, and the
    offset of the marker that ended the scan."""
    segs: list[bytes] = []
    rsts: list[int] = []
    cur = bytearray()
    n = len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ValueError("entropy stream ends in a dangling 0xFF")
        nxt = payload[pos + 1]
        if nxt == 0x00:  # stuffed data byte
            cur.append(0xFF)
            pos += 2
            continue
        if 0xD0 <= nxt <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            rsts.append(nxt & 7)
            cur = bytearray()
            pos += 2
            continue
        break  # a real marker terminates the scan
    segs.append(bytes(cur))
    return segs, rsts, pos


def decode_jpeg(payload: bytes, max_pixels: int | None = None):
    """Decode a baseline JPEG payload -> HxWxC uint8 array (C = 1
    grayscale / 3 RGB). See the module docstring for the supported
    envelope and the error contract."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    if max_pixels is None:
        max_pixels = _MAX_PIXELS_DEFAULT
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None  # (h, w, comps) where comps: id -> dict
    comp_order: list[int] = []
    coef_grids: dict[int, np.ndarray] = {}
    decoded_comps: set[int] = set()
    dri = 0
    saw_eoi = False
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected a marker at offset {pos}")
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes collapse into the marker
        if pos >= n:
            raise ValueError("truncated JPEG: dangling fill bytes")
        marker = payload[pos]
        pos += 1
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers (stray RST/TEM tolerated between segments)
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"JPEG {_SOF_UNSUPPORTED[marker]} decoding is outside the "
                "native baseline-Huffman envelope (needs a codec library)"
            )
        length = _be16(payload, pos)
        if length < 2 or pos + length > n:
            raise ValueError(f"truncated JPEG segment 0x{marker:02x}")
        body = payload[pos + 2 : pos + length]
        pos += length
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            if frame is not None:
                raise ValueError("multiple SOF segments")
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            precision, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG precision unsupported (8-bit only)"
                )
            if h == 0:
                raise NotImplementedError(
                    "DNL-deferred frame height unsupported"
                )
            if w == 0:
                raise ValueError("zero-width JPEG frame")
            if nf not in (1, 3):
                raise NotImplementedError(
                    f"{nf}-component JPEG unsupported (grayscale or YCbCr only)"
                )
            if h * w > max_pixels:
                raise ValueError(
                    f"JPEG {w}x{h} exceeds max pixels {max_pixels} "
                    "(decompression-bomb guard)"
                )
            if len(body) != 6 + 3 * nf:
                raise ValueError("SOF component list size mismatch")
            comps = {}
            for ci in range(nf):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                if cid in comps:
                    raise ValueError(f"duplicate component id {cid}")
                comps[cid] = {"h": hs, "v": vs, "tq": tq}
                comp_order.append(cid)
            hmax = max(c["h"] for c in comps.values())
            vmax = max(c["v"] for c in comps.values())
            for c in comps.values():
                if hmax % c["h"] or vmax % c["v"]:
                    raise NotImplementedError(
                        "non-integer chroma sampling ratio unsupported"
                    )
                # component dims (A.1.1) and block-grid dims
                c["w"] = -(-w * c["h"] // hmax)
                c["hgt"] = -(-h * c["v"] // vmax)
                c["bx"] = -(-c["w"] // 8)
                c["by"] = -(-c["hgt"] // 8)
            frame = (h, w, comps, hmax, vmax, marker == 0xC2)
        elif marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq_id = body[p] >> 4, body[p] & 15
                p += 1
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision {pq}")
                step = 128 if pq else 64
                if p + step > len(body):
                    raise ValueError("truncated DQT table")
                raw = body[p : p + step]
                table = np.frombuffer(raw, dtype=">u2" if pq else np.uint8)
                table = table.astype(np.int32)
                if (table == 0).any():
                    raise ValueError("zero quantization step")
                qt[tq_id] = table  # zigzag order, dequant applies directly
                p += step
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                if p + 17 > len(body):
                    raise ValueError("truncated DHT header")
                tc, th = body[p] >> 4, body[p] & 15
                if tc not in (0, 1):
                    raise ValueError(f"bad DHT class {tc}")
                bits = list(body[p + 1 : p + 17])
                count = sum(bits)
                if count == 0 or count > 256:
                    raise ValueError(f"DHT declares {count} codes")
                p += 17
                if p + count > len(body):
                    raise ValueError("truncated DHT values")
                huff[(tc, th)] = _HuffTable(bits, body[p : p + count])
                p += count
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise ValueError("bad DRI segment size")
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            raise NotImplementedError(
                "arithmetic-coded JPEG unsupported (needs a codec library)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if frame[5]:  # progressive: coefficients accumulate per scan
                pos = _decode_scan_progressive(
                    payload, pos, body, frame, huff, dri, coef_grids,
                    decoded_comps,
                )
            else:
                pos = _decode_scan(
                    payload, pos, body, frame, qt, huff, dri, coef_grids,
                    decoded_comps,
                )
        else:
            # APPn / COM / DNL / unknown-with-length: skipped via length
            continue
    if frame is None:
        raise ValueError("JPEG has no frame header (SOF)")
    if not saw_eoi:
        # a stream cut after a complete scan would otherwise decode
        # silently short — same silent-data-loss rule as the GIF
        # trailer and the chunk walkers
        raise ValueError("JPEG stream ended without EOI")
    h, w, comps, hmax, vmax, _prog = frame
    missing = [cid for cid in comp_order if cid not in decoded_comps]
    if missing:
        raise ValueError(f"components {missing} have no scan data")
    planes = []
    for cid in comp_order:
        c = comps[cid]
        if c["tq"] not in qt:
            raise ValueError(f"component {cid} references missing DQT {c['tq']}")
        grid, gy, gx = coef_grids[cid]
        coefs = grid.astype(np.int32) * qt[c["tq"]][np.newaxis, :]
        blocks = np.zeros((coefs.shape[0], 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = coefs  # de-zigzag
        blocks = blocks.reshape(-1, 8, 8)
        pix = _IDCT_M @ blocks @ _IDCT_M.T + 128.0
        pix = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
        # gy/gx is the SCAN's block grid — padded up to whole MCUs for
        # interleaved scans (B.2.3), so assemble on it and crop
        plane = (
            pix.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
        plane = plane[: c["hgt"], : c["w"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbour chroma upsampling
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return planes[0][:, :, np.newaxis].copy()
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    # BT.601 full-range (JFIF) inverse transform
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    payload: bytes,
    pos: int,
    body: bytes,
    frame,
    qt: dict,
    huff: dict,
    dri: int,
    coef_grids: dict,
    decoded_comps: set,
) -> int:
    """Decode one SOS scan; returns the offset of the terminating
    marker. Fills coef_grids[cid] (zigzag-order int32 per block,
    component-raster block order)."""
    h, w, comps, hmax, vmax, _prog = frame
    if len(body) < 1:
        raise ValueError("truncated SOS header")
    ns = body[0]
    if len(body) != 1 + 2 * ns + 3:
        raise ValueError("SOS header size mismatch")
    if ns < 1 or ns > len(comps):
        raise ValueError(f"SOS declares {ns} components")
    scan = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        if cs not in comps:
            raise ValueError(f"SOS references unknown component {cs}")
        scan.append((cs, tdta >> 4, tdta & 15))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    if (ss, se, ahal) != (0, 63, 0):
        raise ValueError(
            f"non-baseline scan parameters Ss={ss} Se={se} AhAl={ahal:#x} "
            "in a sequential frame"
        )
    for cs, td, ta in scan:
        if (0, td) not in huff:
            raise ValueError(f"scan references missing DC table {td}")
        if (1, ta) not in huff:
            raise ValueError(f"scan references missing AC table {ta}")
    # block geometry for this scan
    if ns == 1:
        cid = scan[0][0]
        c = comps[cid]
        mcus = c["bx"] * c["by"]
        per_mcu = [(cid, 1, 1)]
        grid_shapes = {cid: (c["by"], c["bx"])}
    else:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        mcus = mcux * mcuy
        per_mcu = [(cs, comps[cs]["h"], comps[cs]["v"]) for cs, _, _ in scan]
        # interleaved grids are padded up to full MCUs (B.2.3)
        grid_shapes = {
            cs: (mcuy * comps[cs]["v"], mcux * comps[cs]["h"])
            for cs, _, _ in scan
        }
    for cs, _, _ in scan:
        gy, gx = grid_shapes[cs]
        coef_grids[cs] = (np.zeros((gy * gx, 64), dtype=np.int32), gy, gx)
        decoded_comps.add(cs)
    tables = {cs: (huff[(0, td)], huff[(1, ta)]) for cs, td, ta in scan}
    segs, rsts, end_pos = _entropy_segments(payload, pos)
    interval = dri if dri else mcus
    expected_segments = -(-mcus // interval)
    if len(segs) < expected_segments:
        raise ValueError(
            f"scan carries {len(segs)} restart segments, needs {expected_segments}"
        )
    for i, rst in enumerate(rsts[: expected_segments - 1]):
        if rst != i % 8:
            raise ValueError(
                f"restart marker RST{rst} out of sequence (expected RST{i % 8})"
            )
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = {cs: 0 for cs, _, _ in scan}
    for mcu in range(mcus):
        if dri and mcu and mcu % dri == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            preds = {cs: 0 for cs, _, _ in scan}
        if ns == 1:
            cid = scan[0][0]
            dc_t, ac_t = tables[cid]
            coef, preds[cid] = _decode_block(reader, dc_t, ac_t, preds[cid])
            coef_grids[cid][0][mcu] = coef
        else:
            my, mx = divmod(mcu, mcux)
            for cs, ch, cv in per_mcu:
                dc_t, ac_t = tables[cs]
                _gy, gx = grid_shapes[cs]
                for by in range(cv):
                    for bx in range(ch):
                        coef, preds[cs] = _decode_block(
                            reader, dc_t, ac_t, preds[cs]
                        )
                        row = my * cv + by
                        col = mx * ch + bx
                        coef_grids[cs][0][row * gx + col] = coef
    return end_pos


def _refine_nonzero(reader: _BitReader, coef: np.ndarray, k: int, p1: int) -> None:
    """One AC correction bit for a nonzero-history coefficient
    (T.81 G.1.2.3): a 1-bit moves the magnitude toward the next
    approximation level; bits already present are never re-added."""
    if reader.read(1) and (coef[k] & p1) == 0:
        coef[k] += p1 if coef[k] >= 0 else -p1


def _decode_scan_progressive(
    payload: bytes,
    pos: int,
    body: bytes,
    frame,
    huff: dict,
    dri: int,
    coef_grids: dict,
    decoded_comps: set,
) -> int:
    """Decode one progressive (SOF2) scan per T.81 Annex G: spectral
    selection (Ss..Se) and successive approximation (Ah/Al) over
    frame-level coefficient grids that accumulate across scans — the
    final dequant + IDCT in `decode_jpeg` is shared with the
    sequential path. DC scans (Ss=Se=0) may be interleaved and code
    Al-truncated diffs (first) or one raw bit per block (refinement);
    AC scans are single-component with EOB-run coding (first) and
    correction-bit insertion (refinement). Restart intervals reset
    predictors AND the EOB run. `decoded_comps` records components
    whose DC-first scan arrived (AC-before-DC and missing-DC both
    fail, T.81 G.1.1.1.1)."""
    h, w, comps, hmax, vmax, _prog = frame
    if len(body) < 1:
        raise ValueError("truncated SOS header")
    ns = body[0]
    if len(body) != 1 + 2 * ns + 3:
        raise ValueError("SOS header size mismatch")
    if ns < 1 or ns > len(comps):
        raise ValueError(f"SOS declares {ns} components")
    scan = []
    for i in range(ns):
        cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
        if cs not in comps:
            raise ValueError(f"SOS references unknown component {cs}")
        scan.append((cs, tdta >> 4, tdta & 15))
    ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    dc_scan = ss == 0
    if dc_scan:
        if se != 0:
            raise ValueError(f"progressive DC scan with Se={se}")
    else:
        if ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        if not (ss <= se <= 63):
            raise ValueError(f"bad spectral band Ss={ss} Se={se}")
    if al > 13 or (ah != 0 and ah != al + 1):
        raise ValueError(f"bad successive approximation Ah={ah} Al={al}")
    refining = ah != 0
    for cs, td, ta in scan:
        if dc_scan:
            if not refining and (0, td) not in huff:
                raise ValueError(f"scan references missing DC table {td}")
            if cs not in decoded_comps and refining:
                raise ValueError(f"DC refinement before DC scan for {cs}")
        else:
            if (1, ta) not in huff:
                raise ValueError(f"scan references missing AC table {ta}")
            if cs not in decoded_comps:
                raise ValueError(f"AC scan before DC scan for component {cs}")
    # frame-level MCU-padded grids, shared by every scan (B.2.3: the
    # interleaved DC scan covers the padded grid; non-interleaved AC
    # scans cover the component's own bx-by blocks inside it)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for cs, _, _ in scan:
        c = comps[cs]
        if cs not in coef_grids:
            gy, gx = mcuy * c["v"], mcux * c["h"]
            coef_grids[cs] = (np.zeros((gy * gx, 64), dtype=np.int32), gy, gx)
    if dc_scan and ns > 1:
        mcus = mcux * mcuy
        per_mcu = [(cs, comps[cs]["h"], comps[cs]["v"]) for cs, _, _ in scan]
    else:
        cid0 = scan[0][0]
        mcus = comps[cid0]["bx"] * comps[cid0]["by"]
        per_mcu = [(cid0, 1, 1)]
    segs, rsts, end_pos = _entropy_segments(payload, pos)
    interval = dri if dri else mcus
    expected_segments = -(-mcus // interval)
    if len(segs) < expected_segments:
        raise ValueError(
            f"scan carries {len(segs)} restart segments, needs {expected_segments}"
        )
    for i, rst in enumerate(rsts[: expected_segments - 1]):
        if rst != i % 8:
            raise ValueError(
                f"restart marker RST{rst} out of sequence (expected RST{i % 8})"
            )
    tables = {cs: (huff.get((0, td)), huff.get((1, ta))) for cs, td, ta in scan}
    reader = _BitReader(segs[0])
    seg_idx = 0
    preds = {cs: 0 for cs, _, _ in scan}
    eobrun = 0
    p1 = 1 << al
    for mcu in range(mcus):
        if dri and mcu and mcu % dri == 0:
            seg_idx += 1
            reader = _BitReader(segs[seg_idx])
            preds = {cs: 0 for cs, _, _ in scan}
            eobrun = 0
        if dc_scan and ns > 1:
            my, mx = divmod(mcu, mcux)
            blocks = [
                (cs, (my * cv + by) * coef_grids[cs][2] + (mx * ch + bx))
                for cs, ch, cv in per_mcu
                for by in range(cv)
                for bx in range(ch)
            ]
        else:
            cs = per_mcu[0][0]
            bxc = comps[cs]["bx"]
            row, col = divmod(mcu, bxc)
            blocks = [(cs, row * coef_grids[cs][2] + col)]
        for cs, idx in blocks:
            coef = coef_grids[cs][0][idx]
            dc_t, ac_t = tables[cs]
            if dc_scan:
                if refining:  # one raw bit per block into position Al
                    if reader.read(1):
                        coef[0] |= p1
                    continue
                s = reader.decode_huff(dc_t)
                if s > 15:
                    raise ValueError(f"DC magnitude category {s} out of range")
                diff = _extend(reader.read(s), s) if s else 0
                preds[cs] += diff  # predictor lives in the truncated domain
                coef[0] = preds[cs] << al
            elif not refining:  # AC first: EOB-run coding, values << Al
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_huff(ac_t)
                    r, size = rs >> 4, rs & 15
                    if size == 0:
                        if r < 15:  # EOBn: run of (1<<r)+bits blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient run past band end")
                    coef[k] = _extend(reader.read(size), size) << al
                    k += 1
            else:  # AC refinement: corrections + newly nonzero at ±(1<<Al)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_huff(ac_t)
                        r, size = rs >> 4, rs & 15
                        newval = 0
                        if size == 0:
                            if r < 15:  # EOBn
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.read(r)
                                break
                            # ZRL: skip 16 zero-history coefficients
                        else:
                            if size != 1:
                                raise ValueError(
                                    "AC refinement magnitude category != 1"
                                )
                            newval = p1 if reader.read(1) else -p1
                        while k <= se:  # advance past r zero-history coeffs
                            if coef[k] != 0:
                                _refine_nonzero(reader, coef, k, p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError(
                                    "AC refinement run past band end"
                                )
                            coef[k] = newval
                        k += 1
                if eobrun > 0:  # EOB phase: corrections through band end
                    while k <= se:
                        if coef[k] != 0:
                            _refine_nonzero(reader, coef, k, p1)
                        k += 1
                    eobrun -= 1
    if dc_scan and not refining:
        for cs, _, _ in scan:
            decoded_comps.add(cs)
    return end_pos
