"""Native WebP-lossless (VP8L) decoder — pure stdlib + numpy.

Spec-driven against the public "WebP Lossless Bitstream Specification"
(Google, also RFC 9649 §3): LSB-first bit packing, canonical prefix
codes (DEFLATE-style, MSB-of-code first), the 2-stage code-length
code with 16/17/18 repeat symbols, optional color cache, optional
meta-prefix (entropy-image) code groups, LZ77 backward references
with the 120-entry short-distance neighbor map, and the four
reversible transforms (predictor, color, subtract-green,
color-indexing with pixel bundling).

Lossy VP8 stays honestly codec-gated (NotImplementedError → PIL gate
in decode_image): VP8 is a transform codec outside this build's
native envelope, exactly like arithmetic JPEG.

Reference parity note: the reference repo (a 546-LoC Flink ORC sink,
SURVEY.md §0) has no media surface; this decoder serves the driver's
multimodal-column envelope (same class as functions/jpeg.py,
functions/flac.py). Verified by an independent encoder twin in
tests/test_webp_decode.py and the armed PIL-equivalence suite.

Error contract (matches decode_image): ValueError = malformed
payload claiming this format; NotImplementedError = a legitimate
WebP feature outside the native envelope (lossy VP8 payloads).
"""

from __future__ import annotations

import struct

import numpy as np

# Alphabet layout of the "green" code: 256 literals + 24 length
# prefix symbols (+ color-cache symbols when a cache is present).
_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_CODE_LENGTH_CODES = 19
# Order in which code-length-code lengths are stored (spec §5.2.2).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _short_distance_map() -> list[tuple[int, int]]:
    """The 120 short distance codes as (dx, dy) pixel offsets.

    The spec lists the table explicitly; it equals all causal offsets
    with dy in [0,7], dx in [-7,8] (dy=0 -> dx>=1; 8*1 + 7*16 = 120
    entries) ordered by squared Euclidean distance, then larger dy
    first, then positive dx before negative — the generation below
    reproduces the spec's list exactly (pinned in tests against the
    literal prefix of the published table).
    """
    cand = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], abs(p[0]), -p[0]))
    return cand


_DIST_MAP = _short_distance_map()


class _Bits:
    """LSB-first bit reader (DEFLATE packing): bit i of the stream is
    bit (i & 7) of byte (i >> 3); multi-bit fields place the first
    bit read in the LSB of the value."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        data, pos = self.data, self.pos
        for k in range(n):
            p = pos + k
            v |= ((data[p >> 3] >> (p & 7)) & 1) << k
        self.pos = pos + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class _Prefix:
    """Canonical prefix code decoder built from code lengths.

    Canonical assignment is DEFLATE's: codes ordered by (length,
    symbol); code bits are consumed MSB-first off the LSB-first
    stream. A code with a single used symbol is the legal 0-bit code
    (spec: "consumes no bits"); any other length assignment must be
    complete and not over-subscribed (Kraft sum exactly 1)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("prefix code with no symbols")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        kraft = sum(1.0 / (1 << ln) for ln, _ in used)
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError(
                "invalid prefix code: Kraft sum "
                f"{kraft:.6f} != 1 over {len(used)} symbols"
            )
        used.sort()
        table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = used[0][0]
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            table[(ln, code)] = sym
            code += 1
        self.table = table

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        table = self.table
        for _ in range(15):
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("prefix code longer than 15 bits")


def _read_code_lengths(
    br: _Bits, cl_code: _Prefix, num_symbols: int
) -> list[int]:
    """Symbol code lengths via the code-length code (spec §5.2.2):
    literals 0..15, 16 = repeat previous length 3-6 (2 extra bits,
    default previous = 8), 17 = 3-10 zeros (3 bits), 18 = 11-138
    zeros (7 bits); optional max_symbol counter bounds the reads."""
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > num_symbols:
            raise ValueError("max_symbol exceeds the alphabet")
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev_len = 8
    symbol = 0
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = cl_code.decode(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code != 0:
                prev_len = code
        else:
            if code == 16:
                repeat = br.read(2) + 3
                fill = prev_len
            elif code == 17:
                repeat = br.read(3) + 3
                fill = 0
            else:
                repeat = br.read(7) + 11
                fill = 0
            if symbol + repeat > num_symbols:
                raise ValueError("code-length repeat overflows the alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    """One prefix code: simple (1-2 explicit symbols) or normal
    (code-length coded)."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("simple-code symbol outside the alphabet")
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size:
                raise ValueError("simple-code symbol outside the alphabet")
            if s1 == s0:
                raise ValueError("simple code repeats a symbol")
            lengths[s1] = 1
        return _Prefix(lengths)
    num_cl = br.read(4) + 4
    cl_lengths = [0] * _CODE_LENGTH_CODES
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    return _Prefix(_read_code_lengths(br, cl_code, alphabet_size))


def _prefix_value(code: int, br: _Bits) -> int:
    """LZ77 length/distance prefix decode (spec §4.2.2): codes 0-3
    map to 1-4; above that, (2 + (code&1)) << extra_bits spans with
    extra_bits = (code-2) >> 1."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _plane_to_distance(plane_code: int, width: int) -> int:
    """Distance symbol → linear pixel distance: codes above 120 are
    distance-120 directly; codes 1..120 map through the neighbor
    table as dy*width + dx (dx positive = to the left), min 1."""
    if plane_code > len(_DIST_MAP):
        return plane_code - len(_DIST_MAP)
    dx, dy = _DIST_MAP[plane_code - 1]
    return max(dy * width + dx, 1)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _Bits, cache_size: int):
        self.green = _read_prefix_code(
            br, _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size
        )
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.dist = _read_prefix_code(br, _NUM_DISTANCE_CODES)


def _decode_pixels(
    br: _Bits,
    width: int,
    height: int,
    groups: list[_CodeGroup],
    group_row: np.ndarray | None,
    meta_bits: int,
    cache_bits: int,
) -> np.ndarray:
    """Spatially-coded image body → flat uint32 ARGB array.

    The color cache (when present) is shared across the whole image
    and updated for every emitted pixel, including backref copies
    (a cache-hit rewrite is a no-op: same hash slot, same value)."""
    n = width * height
    out = np.zeros(n, dtype=np.uint64)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    group = groups[0]
    single_group = group_row is None
    meta_w = _subsample_size(width, meta_bits) if not single_group else 0
    pos = 0
    x = 0
    while pos < n:
        if not single_group:
            y = pos // width
            group = groups[group_row[(y >> meta_bits) * meta_w + (x >> meta_bits)]]
        sym = group.green.decode(br)
        if sym < _NUM_LITERALS:
            g = sym
            r = group.red.decode(br)
            b = group.blue.decode(br)
            a = group.alpha.decode(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == width:
                x = 0
        elif sym < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _prefix_value(sym - _NUM_LITERALS, br)
            dist_sym = group.dist.decode(br)
            dist = _plane_to_distance(_prefix_value(dist_sym, br), width)
            if dist > pos:
                raise ValueError("VP8L backward reference before image start")
            if pos + length > n:
                raise ValueError("VP8L backward reference overruns the image")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
            x = pos % width
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a color cache")
            idx = sym - (_NUM_LITERALS + _NUM_LENGTH_CODES)
            out[pos] = cache[idx]
            pos += 1
            x += 1
            if x == width:
                x = 0
    return out.astype(np.uint32)


def _decode_image_stream(
    br: _Bits, width: int, height: int, max_pixels: int | None
) -> np.ndarray:
    """Entropy-coded sub-image (transform data, entropy image,
    palette): same pixel decoder, no transforms, no meta-prefix bit
    (spec: the meta bit is only present at level 0)."""
    if max_pixels is not None and width * height > max_pixels:
        raise ValueError("VP8L sub-image exceeds the pixel budget")
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    groups = [_CodeGroup(br, (1 << cache_bits) if cache_bits else 0)]
    return _decode_pixels(br, width, height, groups, None, 0, cache_bits)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) >> 1


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """The 14 per-channel spatial predictors (spec §4.2.1); inputs
    and output are length-4 uint8 vectors in A,R,G,B order."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.uint8)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T).astype(np.uint8)
    if mode == 6:
        return _avg2(L, TL).astype(np.uint8)
    if mode == 7:
        return _avg2(L, T).astype(np.uint8)
    if mode == 8:
        return _avg2(TL, T).astype(np.uint8)
    if mode == 9:
        return _avg2(T, TR).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR)).astype(np.uint8)
    if mode == 11:
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        p_l = int(np.abs(p - L.astype(np.int32)).sum())
        p_t = int(np.abs(p - T.astype(np.int32)).sum())
        return L if p_l < p_t else T
    if mode == 12:
        full = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(full, 0, 255).astype(np.uint8)
    if mode == 13:
        avg = _avg2(L, T).astype(np.int32)
        d = avg - TL.astype(np.int32)
        # C-style truncation toward zero, matching the spec's (a-b)/2
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))
        return np.clip(avg + half, 0, 255).astype(np.uint8)
    raise ValueError(f"invalid predictor mode {mode}")


def _argb_planes(flat: np.ndarray, width: int, height: int) -> np.ndarray:
    """uint32 ARGB array → (H, W, 4) uint8 planes in A,R,G,B order."""
    out = np.empty((height, width, 4), dtype=np.uint8)
    grid = flat.reshape(height, width)
    out[:, :, 0] = (grid >> 24) & 0xFF
    out[:, :, 1] = (grid >> 16) & 0xFF
    out[:, :, 2] = (grid >> 8) & 0xFF
    out[:, :, 3] = grid & 0xFF
    return out


# Predictor modes whose prediction reads L (the just-reconstructed left
# pixel): the recurrence is sequential within a row and falls back to the
# pure-int scalar loop. Every other mode reads only the previous row (or a
# constant) and vectorizes over a whole constant-mode tile run; mode 1
# (pred = L) is the one L-reader with a closed form (cumulative sum mod
# 256), so it vectorizes too.
_SEQ_PRED_MODES = frozenset({5, 6, 7, 10, 11, 12, 13})


def _seq_predictor_run(
    mode: int,
    row: np.ndarray,
    prev: np.ndarray,
    res: np.ndarray,
    x0: int,
    x1: int,
    width: int,
) -> None:
    """Scalar inverse-predictor over columns [x0, x1) of one row for the
    L-dependent modes. Pure Python-int inner loop (no per-pixel numpy
    allocations — the r12 advice's CPU-exhaustion fix): ~10× the
    throughput of the numpy-scalar formulation it replaces, keeping the
    transform at or below the bitstream decoder's per-pixel cost."""
    L = [int(v) for v in row[x0 - 1]]
    prev_l = prev[x0 - 1 : min(x1 + 1, width)].tolist()  # index offset x0-1
    res_l = res[x0:x1].tolist()
    wrap = [int(v) for v in row[0]] if x1 == width else None
    out_run = []
    for i in range(x1 - x0):
        x = x0 + i
        T = prev_l[i + 1]
        r = res_l[i]
        if mode == 7:
            pred = [(L[c] + T[c]) >> 1 for c in range(4)]
        elif mode == 6:
            TL = prev_l[i]
            pred = [(L[c] + TL[c]) >> 1 for c in range(4)]
        elif mode == 5:
            TR = prev_l[i + 2] if x + 1 < width else wrap
            pred = [((((L[c] + TR[c]) >> 1) + T[c]) >> 1) for c in range(4)]
        elif mode == 10:
            TL = prev_l[i]
            TR = prev_l[i + 2] if x + 1 < width else wrap
            pred = [
                ((((L[c] + TL[c]) >> 1) + ((T[c] + TR[c]) >> 1)) >> 1)
                for c in range(4)
            ]
        elif mode == 11:
            TL = prev_l[i]
            p_l = p_t = 0
            for c in range(4):
                p = L[c] + T[c] - TL[c]
                p_l += abs(p - L[c])
                p_t += abs(p - T[c])
            pred = L if p_l < p_t else T
        elif mode == 12:
            TL = prev_l[i]
            pred = [
                min(255, max(0, L[c] + T[c] - TL[c])) for c in range(4)
            ]
        else:  # mode 13
            TL = prev_l[i]
            pred = []
            for c in range(4):
                avg = (L[c] + T[c]) >> 1
                d = avg - TL[c]
                # C-style truncation toward zero, matching the spec's
                # (a-b)/2
                half = d >> 1 if d >= 0 else -((-d) >> 1)
                pred.append(min(255, max(0, avg + half)))
        L = [(r[c] + pred[c]) & 0xFF for c in range(4)]
        out_run.append(L)
    row[x0:x1] = out_run


def _inv_predictor(
    img: np.ndarray, width: int, height: int, bits: int, tiles: np.ndarray
) -> np.ndarray:
    """Inverse predictor transform on flat ARGB: per-channel add of
    the block's predictor mod 256. Edge rules (spec §4.2.1): (0,0)
    adds opaque black; the rest of row 0 adds L; column 0 adds T;
    TR of the rightmost column wraps to the first pixel of the
    current row (contiguous addressing).

    Vectorized per constant-mode tile run: modes 0/2/3/4/8/9 read only
    the previous row and compute as whole-run numpy ops; mode 1
    (pred = L) is a per-channel cumulative sum mod 256; only the
    remaining L-dependent modes (5/6/7/10/11/12/13) run the scalar
    recurrence, and that loop is pure-int (no per-pixel numpy)."""
    px = _argb_planes(img, width, height)
    tile_w = _subsample_size(width, bits)
    out = np.zeros_like(px)

    # Row 0: pixel (0,0) adds opaque black; the rest predict L, which
    # telescopes to a per-channel running sum mod 256.
    row0 = px[0].astype(np.uint32)
    row0[0, 0] += 255  # channel A of the [255, 0, 0, 0] ARGB constant
    out[0] = (np.cumsum(row0, axis=0) & 0xFF).astype(np.uint8)

    black = np.array([255, 0, 0, 0], dtype=np.uint8)
    for y in range(1, height):
        prev = out[y - 1]
        row = out[y]
        res = px[y]
        row[0] = res[0] + prev[0]  # column 0 predicts T (uint8 wraps)
        trow = tiles[(y >> bits) * tile_w :]
        x = 1
        while x < width:
            mode = (int(trow[x >> bits]) >> 8) & 0xFF
            x_end = min(((x >> bits) + 1) << bits, width)
            while (
                x_end < width
                and ((int(trow[x_end >> bits]) >> 8) & 0xFF) == mode
            ):
                x_end = min(((x_end >> bits) + 1) << bits, width)
            if mode in _SEQ_PRED_MODES:
                _seq_predictor_run(mode, row, prev, res, x, x_end, width)
            elif mode == 0:
                row[x:x_end] = res[x:x_end] + black
            elif mode == 1:
                acc = np.cumsum(
                    res[x:x_end].astype(np.uint32), axis=0
                ) + row[x - 1].astype(np.uint32)
                row[x:x_end] = (acc & 0xFF).astype(np.uint8)
            elif mode == 2:
                row[x:x_end] = res[x:x_end] + prev[x:x_end]
            elif mode == 3 or mode == 9:
                hi = min(x_end, width - 1)
                tr = np.empty((x_end - x, 4), dtype=np.uint8)
                tr[: hi - x] = prev[x + 1 : hi + 1]
                if x_end == width:
                    tr[-1] = row[0]  # rightmost TR wraps to (y, 0)
                pred = tr if mode == 3 else (
                    _avg2(prev[x:x_end], tr).astype(np.uint8)
                )
                row[x:x_end] = res[x:x_end] + pred
            elif mode == 4:
                row[x:x_end] = res[x:x_end] + prev[x - 1 : x_end - 1]
            elif mode == 8:
                row[x:x_end] = res[x:x_end] + _avg2(
                    prev[x - 1 : x_end - 1], prev[x:x_end]
                ).astype(np.uint8)
            else:
                raise ValueError(f"invalid predictor mode {mode}")
            x = x_end
    o = out.astype(np.uint32)
    return (
        (o[:, :, 0] << 24) | (o[:, :, 1] << 16) | (o[:, :, 2] << 8) | o[:, :, 3]
    ).reshape(-1)


def _ct_delta(pred: np.ndarray, channel: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8 pred * int8 channel) >> 5 with an
    arithmetic shift (Python's >> on negatives floors, matching C)."""
    return (pred.astype(np.int32) * channel.astype(np.int8).astype(np.int32)) >> 5


def _inv_color_transform(
    img: np.ndarray, width: int, height: int, bits: int, tiles: np.ndarray
) -> np.ndarray:
    """Inverse color transform (spec §4.2.2): per-tile multipliers
    green_to_red (tile blue channel), green_to_blue (tile green),
    red_to_blue (tile red); the red_to_blue delta uses the NEW red."""
    tile_w = _subsample_size(width, bits)
    grid = img.reshape(height, width)
    ys, xs = np.mgrid[0:height, 0:width]
    t = tiles.reshape(-1)[
        ((ys >> bits) * tile_w + (xs >> bits)).reshape(-1)
    ].reshape(height, width)
    g2r = (t & 0xFF).astype(np.int8).astype(np.int32)
    g2b = ((t >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    r2b = ((t >> 16) & 0xFF).astype(np.int8).astype(np.int32)
    green = ((grid >> 8) & 0xFF).astype(np.int8).astype(np.int32)
    red = ((grid >> 16) & 0xFF).astype(np.int32)
    blue = (grid & 0xFF).astype(np.int32)
    new_red = (red + ((g2r * green) >> 5)) & 0xFF
    new_blue = blue + ((g2b * green) >> 5)
    new_blue = (
        new_blue + ((r2b * new_red.astype(np.int8).astype(np.int32)) >> 5)
    ) & 0xFF
    out = (
        (grid & np.uint32(0xFF00FF00))
        | (new_red.astype(np.uint32) << 16)
        | new_blue.astype(np.uint32)
    )
    return out.reshape(-1)


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inv_color_index(
    img: np.ndarray,
    width: int,
    height: int,
    palette: np.ndarray,
    width_bits: int,
) -> np.ndarray:
    """Inverse color-indexing: unbundle packed indices from the green
    channel (first pixel in the least-significant bits) and look up
    the palette. Out-of-range indices are a bitstream error (strict
    contract — never silent black pixels)."""
    packed_w = _subsample_size(width, width_bits)
    greens = ((img.reshape(height, packed_w) >> 8) & 0xFF).astype(np.uint32)
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    xs = np.arange(width)
    shifts = (xs % (1 << width_bits)) * bpp
    idx = (greens[:, xs >> width_bits] >> shifts[None, :]) & mask
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError(
            f"palette index {int(idx.max())} out of range "
            f"({len(palette)} colors)"
        )
    return palette[idx.reshape(-1)]


def decode_vp8l(data: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Decode a VP8L chunk payload (starting at the 0x2F signature)
    → (H, W, 3) uint8 RGB, or (H, W, 4) RGBA when the header's
    alpha_is_used hint is set."""
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _Bits(data[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    alpha_used = br.read_bit()
    version = br.read(3)
    if version != 0:
        raise ValueError(f"reserved VP8L version {version}")
    if max_pixels is not None and width * height > max_pixels:
        raise ValueError(
            f"VP8L {width}x{height} exceeds {max_pixels} pixels "
            "(decompression-bomb guard)"
        )
    # ---- transforms (level 0 only); each type may appear once ----
    transforms: list[tuple[int, object, int, int]] = []
    seen: set[int] = set()
    cur_w = width
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError(f"duplicate VP8L transform type {ttype}")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            tw = _subsample_size(cur_w, bits)
            th = _subsample_size(height, bits)
            tiles = _decode_image_stream(br, tw, th, max_pixels)
            transforms.append((ttype, (bits, tiles), cur_w, height))
        elif ttype == 2:  # subtract green
            transforms.append((ttype, None, cur_w, height))
        else:  # 3 = color indexing
            n_colors = br.read(8) + 1
            pal_deltas = _decode_image_stream(br, n_colors, 1, max_pixels)
            # palette entries are per-channel delta-coded cumulative sums
            planes = np.empty((n_colors, 4), dtype=np.uint32)
            planes[:, 0] = (pal_deltas >> 24) & 0xFF
            planes[:, 1] = (pal_deltas >> 16) & 0xFF
            planes[:, 2] = (pal_deltas >> 8) & 0xFF
            planes[:, 3] = pal_deltas & 0xFF
            planes = np.cumsum(planes, axis=0) & 0xFF
            palette = (
                (planes[:, 0] << 24)
                | (planes[:, 1] << 16)
                | (planes[:, 2] << 8)
                | planes[:, 3]
            ).astype(np.uint32)
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, (palette, width_bits), cur_w, height))
            cur_w = _subsample_size(cur_w, width_bits)
    # ---- spatially-coded image ----
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    group_row = None
    meta_bits = 0
    n_groups = 1
    if br.read_bit():  # meta-prefix codes
        meta_bits = br.read(3) + 2
        ew = _subsample_size(cur_w, meta_bits)
        eh = _subsample_size(height, meta_bits)
        entropy_img = _decode_image_stream(br, ew, eh, max_pixels)
        # group index = (red << 8) | green of the entropy-image pixel
        group_row = ((entropy_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(group_row.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = [_CodeGroup(br, cache_size) for _ in range(n_groups)]
    img = _decode_pixels(
        br, cur_w, height, groups, group_row, meta_bits, cache_bits
    )
    # ---- inverse transforms, reverse order of appearance ----
    for ttype, tdata, t_w, t_h in reversed(transforms):
        if ttype == 0:
            bits, tiles = tdata
            img = _inv_predictor(img, t_w, t_h, bits, tiles)
        elif ttype == 1:
            bits, tiles = tdata
            img = _inv_color_transform(img, t_w, t_h, bits, tiles)
        elif ttype == 2:
            img = _inv_subtract_green(img)
        else:
            palette, width_bits = tdata
            img = _inv_color_index(img, t_w, t_h, palette, width_bits)
    planes = _argb_planes(img, width, height)
    if alpha_used:
        return planes[:, :, [1, 2, 3, 0]]  # ARGB -> RGBA
    return planes[:, :, [1, 2, 3]]  # RGB


def decode_webp(payload: bytes, max_pixels: int | None = None) -> np.ndarray:
    """RIFF/WEBP container walk → VP8L decode.

    Simple lossless files carry one VP8L chunk; extended (VP8X) files
    are walked for a still VP8L chunk. Lossy VP8 (and lossy+ALPH)
    payloads raise NotImplementedError — a transform codec outside
    the native envelope, resolved by the PIL gate when available."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("RIFF size overflows the WebP payload")
    pos = 12
    end = 8 + riff_size
    saw_lossy = False
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated WebP chunk {fourcc!r}")
        if fourcc == b"VP8L":
            return decode_vp8l(body, max_pixels=max_pixels)
        if fourcc == b"ANMF":
            # animated lossless: the still view is the first
            # composited frame (the GIF/APNG decode_image convention).
            # limit_frames=1 bounds the still path at one canvas —
            # a crafted VP8X with thousands of tiny ANMF frames must
            # not allocate N*W*H*4 bytes just to return frame 0 (the
            # MAX_GIF_TOTAL_PIXELS bomb class, r12 advice)
            frames, _ = decode_webp_frames(
                payload, max_pixels=max_pixels, limit_frames=1
            )
            return frames[0]
        if fourcc == b"VP8 ":
            saw_lossy = True
        pos += 8 + size + (size & 1)  # RIFF pads odd chunks
    if saw_lossy:
        raise NotImplementedError(
            "lossy VP8 WebP needs a transform codec this build lacks "
            "natively (PIL gate)"
        )
    raise ValueError("WebP container has no image chunk")


def decode_webp_frames(
    payload: bytes,
    max_pixels: int | None = None,
    max_total_pixels: int | None = None,
    limit_frames: int | None = None,
):
    """Animated WebP (VP8X + ANIM/ANMF) with LOSSLESS frames →
    (composited frames (N, H, W, 4) uint8 RGBA, per-frame durations
    in ms) — the same contract as decode_gif_frames /
    decode_apng_frames so one sampler covers all three animation
    containers.

    Compositing per the WebP Container Specification: the canvas
    starts fully transparent (the spec leaves initialization to the
    application — MAY use the background color — and browsers render
    transparent; documented choice); each ANMF places its frame at
    (2·frame_x, 2·frame_y); blending method B=0 alpha-composites
    with straight alpha (the same 'over' math as the APNG/GIF
    compositors), B=1 overwrites; disposal D=1 fills the frame
    rectangle with the ANIM background color (BGRA byte order, as
    the spec REQUIRES for disposal) after the frame is shown, D=0
    keeps it. A still lossless WebP yields one frame of duration 0,
    so the sampler is safe over mixed still/animated columns. Lossy
    (VP8) or ALPH-carrying frames gate with NotImplementedError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("RIFF size overflows the WebP payload")
    end = 8 + riff_size
    pos = 12

    def chunks(p, e):
        while p + 8 <= e:
            fourcc = payload[p : p + 4]
            (size,) = struct.unpack_from("<I", payload, p + 4)
            body = p + 8
            if body + size > e:
                raise ValueError(f"truncated WebP chunk {fourcc!r}")
            yield fourcc, body, size
            p = body + size + (size & 1)

    canvas_wh = None
    animated = False
    bg = (0, 0, 0, 0)
    frames_meta = []
    still = None
    for fourcc, body, size in chunks(pos, end):
        if fourcc == b"VP8X":
            if size < 10:
                raise ValueError("truncated VP8X header")
            flags = payload[body]
            animated = bool(flags & 0x02)
            cw = int.from_bytes(payload[body + 4 : body + 7], "little") + 1
            ch = int.from_bytes(payload[body + 7 : body + 10], "little") + 1
            canvas_wh = (cw, ch)
        elif fourcc == b"ANIM":
            if size < 6:
                raise ValueError("truncated ANIM chunk")
            b_, g_, r_, a_ = payload[body : body + 4]  # BGRA order
            bg = (r_, g_, b_, a_)
        elif fourcc == b"ANMF":
            if size < 16:
                raise ValueError("truncated ANMF header")
            fx = int.from_bytes(payload[body : body + 3], "little") * 2
            fy = int.from_bytes(payload[body + 3 : body + 6], "little") * 2
            fw = int.from_bytes(payload[body + 6 : body + 9], "little") + 1
            fh = int.from_bytes(payload[body + 9 : body + 12], "little") + 1
            dur = int.from_bytes(payload[body + 12 : body + 15], "little")
            fflags = payload[body + 15]
            sub = None
            for fc2, b2, s2 in chunks(body + 16, body + size):
                if fc2 == b"VP8L":
                    sub = payload[b2 : b2 + s2]
                elif fc2 in (b"VP8 ", b"ALPH"):
                    raise NotImplementedError(
                        "animated WebP with lossy VP8/ALPH frames needs a "
                        "transform codec this build lacks natively"
                    )
            if sub is None:
                raise ValueError("ANMF frame carries no image chunk")
            frames_meta.append(
                (fx, fy, fw, fh, dur, (fflags >> 1) & 1, fflags & 1, sub)
            )
        elif fourcc == b"VP8L":
            still = payload[body : body + size]
        elif fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 WebP needs a transform codec this build lacks "
                "natively (PIL gate)"
            )
    if not frames_meta:
        if still is None:
            raise ValueError("WebP container has no image chunk")
        rgba = decode_vp8l(still, max_pixels=max_pixels)
        if rgba.shape[2] == 3:
            rgba = np.concatenate(
                [rgba, np.full(rgba.shape[:2] + (1,), 255, np.uint8)], axis=2
            )
        return rgba[None, :, :, :], [0.0]
    if not animated:
        raise ValueError("ANMF frames without the VP8X animation flag")
    if canvas_wh is None:
        raise ValueError("animated WebP lacks a VP8X canvas")
    W, H = canvas_wh
    if max_pixels is not None and W * H > max_pixels:
        raise ValueError(f"WebP canvas {W}x{H} exceeds {max_pixels} pixels")
    n_eff = len(frames_meta)
    if limit_frames is not None:
        n_eff = min(n_eff, limit_frames)
    if max_total_pixels is not None and n_eff * W * H > max_total_pixels:
        raise ValueError(
            f"WebP animation {n_eff}x{W}x{H} exceeds "
            f"{max_total_pixels} pixels (decompression-bomb guard)"
        )
    canvas = np.zeros((H, W, 4), dtype=np.uint8)
    out = []
    durations = []
    for fx, fy, fw, fh, dur, no_blend, dispose_bg, sub in frames_meta[:n_eff]:
        if fx + fw > W or fy + fh > H:
            raise ValueError("ANMF frame rectangle outside the canvas")
        rgba = decode_vp8l(sub, max_pixels=max_pixels)
        if (rgba.shape[1], rgba.shape[0]) != (fw, fh):
            raise ValueError(
                "ANMF declared geometry differs from the frame bitstream"
            )
        if rgba.shape[2] == 3:
            rgba = np.concatenate(
                [rgba, np.full((fh, fw, 1), 255, np.uint8)], axis=2
            )
        region = (slice(fy, fy + fh), slice(fx, fx + fw))
        if no_blend:
            canvas[region] = rgba
        else:
            dst = canvas[region].astype(np.float64)
            src = rgba.astype(np.float64)
            sa = src[:, :, 3:4] / 255.0
            da = dst[:, :, 3:4] / 255.0
            oa = sa + da * (1.0 - sa)
            rgb = np.where(
                oa > 0,
                (src[:, :, :3] * sa + dst[:, :, :3] * da * (1.0 - sa))
                / np.maximum(oa, 1e-12),
                0.0,
            )
            canvas[region] = np.clip(
                np.rint(np.concatenate([rgb, oa * 255.0], axis=2)), 0, 255
            ).astype(np.uint8)
        out.append(canvas.copy())
        durations.append(float(dur))
        if dispose_bg:
            canvas[region] = np.array(bg, dtype=np.uint8)
    return np.stack(out), durations
