"""VP8L (WebP-lossless) decoder tests against an independent encoder twin.

The encoder below is written from the public spec (WebP Lossless
Bitstream Specification / RFC 9649 §3) as a separate implementation:
frequency-based Huffman construction, its own bit writer, its own
LZ77 parse and transform forward passes. Round-trip equality through
functions/webp.py pins both directions of every format feature:
simple and code-length-coded prefix codes, color cache, meta-prefix
groups, LZ77 with short-distance codes, and all four transforms.
"""

from __future__ import annotations

import heapq
import struct
import zlib  # noqa: F401  (parity with sibling decoder tests' imports)

import numpy as np
import pytest

from flink_hiveorc_spark.functions.webp import (
    _DIST_MAP,
    decode_vp8l,
    decode_webp,
)

# ----------------------------------------------------------------- writer


class _BitWriter:
    """LSB-first bit packer (independent of the decoder's reader)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for k in range(n):
            self.bits.append((value >> k) & 1)

    def write_code(self, code: int, length: int):
        # prefix codes are written MSB-of-code first
        for k in range(length - 1, -1, -1):
            self.bits.append((code >> k) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Package-style Huffman code lengths from symbol frequencies
    (heap merge; ties broken deterministically by symbol set)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, (s,)) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, g1 = heapq.heappop(heap)
        f2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tuple(sorted(g1 + g2))))
    return depth


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical by (length, symbol)."""
    syms = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev = syms[0][0] if syms else 0
    for ln, s in syms:
        code <<= ln - prev
        prev = ln
        out[s] = (code, ln)
        code += 1
    return out


class _Code:
    """One emitted prefix code: owns its table and writes symbols."""

    def __init__(self, freqs: dict[int, int], alphabet: int):
        self.alphabet = alphabet
        self.lengths = _huff_lengths(freqs) if freqs else {0: 1}
        self.codes = _canonical(self.lengths)
        self.zero_cost = len(self.lengths) == 1

    def emit_symbol(self, bw: _BitWriter, sym: int):
        if self.zero_cost:
            assert sym in self.lengths
            return
        code, ln = self.codes[sym]
        bw.write_code(code, ln)

    def emit_definition(self, bw: _BitWriter, force_normal=False):
        syms = sorted(self.lengths)
        if not force_normal and len(syms) <= 2 and max(syms) < 256:
            bw.write(1, 1)  # simple
            bw.write(len(syms) - 1, 1)
            s0 = syms[0]
            if s0 < 2:
                bw.write(0, 1)  # 1-bit first symbol
                bw.write(s0, 1)
            else:
                bw.write(1, 1)
                bw.write(s0, 8)
            if len(syms) == 2:
                bw.write(syms[1], 8)
            return
        bw.write(0, 1)  # normal: code-length coded, no repeat codes
        lens = [self.lengths.get(s, 0) for s in range(self.alphabet)]
        while lens and lens[-1] == 0:
            lens.pop()
        if len(lens) < 2:
            lens += [0] * (2 - len(lens))  # max_symbol counter floor is 2
        cl_freq: dict[int, int] = {}
        for v in lens:
            cl_freq[v] = cl_freq.get(v, 0) + 1
        cl = _Code(cl_freq, 19)
        order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                 11, 12, 13, 14, 15)
        # emit enough 3-bit slots to cover every used code-length symbol
        need = max(order.index(s) for s in cl.lengths) + 1
        need = max(need, 4)
        bw.write(need - 4, 4)
        for i in range(need):
            bw.write(cl.lengths.get(order[i], 0), 3)
        if len(lens) < self.alphabet:
            # use the max_symbol counter to stop early
            bw.write(1, 1)
            nbits = 2
            while (1 << nbits) < max(len(lens) - 2, 1) + 1:
                nbits += 2
            bw.write((nbits - 2) // 2, 3)
            bw.write(len(lens) - 2, nbits)
        else:
            bw.write(0, 1)
        for v in lens:
            cl.emit_symbol(bw, v)


# ------------------------------------------------------------- tokenizer


def _cache_index(px: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)


def _length_prefix(v: int) -> tuple[int, int, int]:
    """value -> (prefix code, extra bits, extra value)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 24 + 40):
        eb = (code - 2) >> 1
        lo = ((2 + (code & 1)) << eb) + 1
        hi = lo + (1 << eb) - 1
        if lo <= v <= hi:
            return code, eb, v - lo
    raise AssertionError(v)


def _dist_to_plane(dist: int, width: int) -> int:
    for i, (dx, dy) in enumerate(_DIST_MAP):
        if dy * width + dx == dist and dist >= 1:
            return i + 1
    return dist + 120


def _tokenize(
    flat: list[int], width: int, cache_bits: int, use_lz77: bool
) -> list[tuple]:
    """Greedy LZ77 + color-cache tokens:
    ('lit', px) | ('cache', idx) | ('copy', length, dist)."""
    tokens = []
    cache = [None] * (1 << cache_bits) if cache_bits else None
    n = len(flat)
    pos = 0
    while pos < n:
        if use_lz77 and pos > 0:
            best_len = 0
            best_dist = 0
            lo = max(0, pos - 1024)
            for start in range(lo, pos):
                ln = 0
                while pos + ln < n and flat[start + ln] == flat[pos + ln]:
                    ln += 1
                    if ln >= 4096:
                        break
                if ln > best_len:
                    best_len, best_dist = ln, pos - start
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for k in range(best_len):
                        px = flat[pos + k]
                        cache[_cache_index(px, cache_bits)] = px
                pos += best_len
                continue
        px = flat[pos]
        if cache is not None and cache[_cache_index(px, cache_bits)] == px:
            tokens.append(("cache", _cache_index(px, cache_bits)))
        else:
            tokens.append(("lit", px))
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
        pos += 1
    return tokens


def _emit_body(
    bw: _BitWriter,
    flat: list[int],
    width: int,
    height: int,
    cache_bits: int = 0,
    use_lz77: bool = False,
    meta_groups: int = 0,
    meta_bits: int = 2,
    force_normal: bool = False,
    level0: bool = False,
):
    """Entropy-coded image body: cache bit, optional meta-prefix
    entropy image (vertical stripes), code definitions, tokens."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    group_of = None
    assert not (meta_groups and not level0)
    if meta_groups:
        bw.write(1, 1)
        bw.write(meta_bits - 2, 3)
        ew = (width + (1 << meta_bits) - 1) >> meta_bits
        eh = (height + (1 << meta_bits) - 1) >> meta_bits
        # vertical stripes: group = block_x % n, in the (red<<8)|green
        # channel. The decoder derives its group count from the MAX
        # index in the entropy image, so clamp to the blocks that
        # actually exist — asking for more groups than blocks would
        # emit definitions the decoder never reads.
        meta_groups = min(meta_groups, ew)
        epix = [
            (0xFF << 24) | (((bx % meta_groups) & 0xFFFF) << 8)
            for _ in range(eh)
            for bx in range(ew)
        ]
        _emit_body(bw, epix, ew, eh)

        def group_of(pos):
            x, y = pos % width, pos // width
            return (x >> meta_bits) % meta_groups
    elif level0:
        # the meta-prefix bit exists only in the level-0 image;
        # sub-images (transform data, entropy image, palette) omit it
        bw.write(0, 1)

    n_groups = meta_groups or 1
    tokens = _tokenize(flat, width, cache_bits, use_lz77)
    # assign tokens to groups by the position at which each starts
    token_groups = []
    pos = 0
    for t in tokens:
        g = group_of(pos) if group_of else 0
        token_groups.append(g)
        pos += t[1] if t[0] == "copy" else 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    per_group = []
    for g in range(n_groups):
        fr = {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}

        def bump(d, k):
            d[k] = d.get(k, 0) + 1

        for t, tg in zip(tokens, token_groups):
            if tg != g:
                continue
            if t[0] == "lit":
                px = t[1]
                bump(fr["g"], (px >> 8) & 0xFF)
                bump(fr["r"], (px >> 16) & 0xFF)
                bump(fr["b"], px & 0xFF)
                bump(fr["a"], (px >> 24) & 0xFF)
            elif t[0] == "cache":
                bump(fr["g"], 280 + t[1])
            else:
                code, _, _ = _length_prefix(t[1])
                bump(fr["g"], 256 + code)
                dcode, _, _ = _length_prefix(_dist_to_plane(t[2], width))
                bump(fr["d"], dcode)
        per_group.append(
            {
                "g": _Code(fr["g"] or {0: 1}, green_alpha),
                "r": _Code(fr["r"] or {0: 1}, 256),
                "b": _Code(fr["b"] or {0: 1}, 256),
                "a": _Code(fr["a"] or {0: 1}, 256),
                "d": _Code(fr["d"] or {0: 1}, 40),
            }
        )
    for g in per_group:
        for key in ("g", "r", "b", "a", "d"):
            g[key].emit_definition(bw, force_normal=force_normal)
    for t, tg in zip(tokens, token_groups):
        cg = per_group[tg]
        if t[0] == "lit":
            px = t[1]
            cg["g"].emit_symbol(bw, (px >> 8) & 0xFF)
            cg["r"].emit_symbol(bw, (px >> 16) & 0xFF)
            cg["b"].emit_symbol(bw, px & 0xFF)
            cg["a"].emit_symbol(bw, (px >> 24) & 0xFF)
        elif t[0] == "cache":
            cg["g"].emit_symbol(bw, 280 + t[1])
        else:
            code, eb, ev = _length_prefix(t[1])
            cg["g"].emit_symbol(bw, 256 + code)
            bw.write(ev, eb)
            plane = _dist_to_plane(t[2], width)
            dcode, deb, dev = _length_prefix(plane)
            cg["d"].emit_symbol(bw, dcode)
            bw.write(dev, deb)


def _container(vp8l_payload: bytes, vp8x: bool = False) -> bytes:
    chunks = b""
    if vp8x:
        chunks += b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = vp8l_payload
    chunks += b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def encode_vp8l(
    arr: np.ndarray,
    alpha: bool = False,
    transforms: list | None = None,
    cache_bits: int = 0,
    use_lz77: bool = False,
    meta_groups: int = 0,
    force_normal: bool = False,
    vp8x: bool = False,
) -> bytes:
    """arr: (H, W, 3|4) uint8 -> a complete WebP file.

    transforms: list of forward-transform specs applied in order
    (their bits appear in the stream in the same order):
      ('subtract_green',) | ('predictor', bits, mode_grid)
      | ('color', bits, (g2r, g2b, r2b)) | ('palette', colors)
    """
    h, w = arr.shape[:2]
    a_plane = (
        arr[:, :, 3].astype(np.uint32)
        if arr.shape[2] == 4
        else np.full((h, w), 255, dtype=np.uint32)
    )
    flat = (
        (a_plane << 24)
        | (arr[:, :, 0].astype(np.uint32) << 16)
        | (arr[:, :, 1].astype(np.uint32) << 8)
        | arr[:, :, 2].astype(np.uint32)
    ).reshape(-1)
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha else 0, 1)
    bw.write(0, 3)  # version
    cur_w = w
    for t in transforms or []:
        bw.write(1, 1)
        if t[0] == "subtract_green":
            bw.write(2, 2)
            g = (flat >> 8) & 0xFF
            r = (((flat >> 16) & 0xFF) - g) & 0xFF
            b = ((flat & 0xFF) - g) & 0xFF
            flat = (flat & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b
        elif t[0] == "predictor":
            _, bits, grid = t
            bw.write(0, 2)
            bw.write(bits - 2, 3)
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = [
                (0xFF << 24) | ((grid[ty][tx] & 0xFF) << 8)
                for ty in range(th)
                for tx in range(tw)
            ]
            _emit_body(bw, tiles, tw, th)
            flat = _forward_predictor(flat, cur_w, h, bits, grid)
        elif t[0] == "color":
            _, bits, (g2r, g2b, r2b) = t
            bw.write(1, 2)
            bw.write(bits - 2, 3)
            tw = (cur_w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tile_px = (
                (0xFF << 24)
                | ((r2b & 0xFF) << 16)
                | ((g2b & 0xFF) << 8)
                | (g2r & 0xFF)
            )
            _emit_body(bw, [tile_px] * (tw * th), tw, th)
            flat = _forward_color(flat, g2r, g2b, r2b)
        elif t[0] == "palette":
            _, colors = t
            bw.write(3, 2)
            bw.write(len(colors) - 1, 8)
            deltas = []
            prev = 0
            for c in colors:
                deltas.append(_argb_sub(c, prev))
                prev = c
            _emit_body(bw, deltas, len(colors), 1)
            lut = {c: i for i, c in enumerate(colors)}
            idx = [lut[int(p)] for p in flat]
            if len(colors) <= 2:
                wb = 3
            elif len(colors) <= 4:
                wb = 2
            elif len(colors) <= 16:
                wb = 1
            else:
                wb = 0
            packed_w = (cur_w + (1 << wb) - 1) >> wb
            bpp = 8 >> wb
            packed = []
            for y in range(h):
                for px_ in range(packed_w):
                    gval = 0
                    for k in range(1 << wb):
                        x = (px_ << wb) + k
                        if x < cur_w:
                            gval |= idx[y * cur_w + x] << (k * bpp)
                    packed.append((0xFF << 24) | (gval << 8))
            flat = np.array(packed, dtype=np.uint64)
            cur_w = packed_w
        else:
            raise AssertionError(t)
    bw.write(0, 1)  # end of transforms
    _emit_body(
        bw,
        [int(p) for p in flat],
        cur_w,
        h,
        cache_bits=cache_bits,
        use_lz77=use_lz77,
        meta_groups=meta_groups,
        force_normal=force_normal,
        level0=True,
    )
    return _container(b"\x2f" + bw.bytes(), vp8x=vp8x)


def _argb_sub(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= (((a >> shift) - (b >> shift)) & 0xFF) << shift
    return out


def _forward_predictor(flat, width, height, bits, grid):
    """Forward predictor: residual = pixel - predict, per channel
    mod 256 — an independent re-derivation of the spec's edge rules."""
    px = np.zeros((height, width, 4), dtype=np.uint8)
    f = np.asarray(flat, dtype=np.uint64).reshape(height, width)
    px[:, :, 0] = (f >> 24) & 0xFF
    px[:, :, 1] = (f >> 16) & 0xFF
    px[:, :, 2] = (f >> 8) & 0xFF
    px[:, :, 3] = f & 0xFF
    res = np.zeros_like(px)
    for y in range(height):
        for x in range(width):
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.uint8)
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                mode = grid[y >> bits][x >> bits]
                pred = _twin_predict(
                    mode,
                    px[y, x - 1],
                    px[y - 1, x],
                    px[y - 1, x - 1],
                    px[y - 1, x + 1] if x + 1 < width else px[y, 0],
                )
            res[y, x] = px[y, x] - pred
    r = res.astype(np.uint64)
    return (
        (r[:, :, 0] << 24) | (r[:, :, 1] << 16) | (r[:, :, 2] << 8) | r[:, :, 3]
    ).reshape(-1)


def _twin_predict(mode, L, T, TL, TR):
    a2 = lambda p, q: ((p.astype(np.int32) + q.astype(np.int32)) >> 1)  # noqa
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
        return a2(a2(L, TR).astype(np.uint8), T).astype(np.uint8)
    if mode == 6:
        return a2(L, TL).astype(np.uint8)
    if mode == 7:
        return a2(L, T).astype(np.uint8)
    if mode == 8:
        return a2(TL, T).astype(np.uint8)
    if mode == 9:
        return a2(T, TR).astype(np.uint8)
    if mode == 10:
        return a2(a2(L, TL).astype(np.uint8), a2(T, TR).astype(np.uint8)).astype(
            np.uint8
        )
    if mode == 11:
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return L if np.abs(p - L).sum() < np.abs(p - T).sum() else T
    if mode == 12:
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32), 0, 255
        ).astype(np.uint8)
    if mode == 13:
        avg = a2(L, T)
        d = avg - TL.astype(np.int32)
        half = np.where(d >= 0, d >> 1, -((-d) >> 1))
        return np.clip(avg + half, 0, 255).astype(np.uint8)
    raise AssertionError(mode)


def _forward_color(flat, g2r, g2b, r2b):
    def s8(v):
        v &= 0xFF
        return v - 256 if v >= 128 else v

    out = []
    for p in np.asarray(flat, dtype=np.uint64):
        p = int(p)
        g = s8(p >> 8)
        r = (p >> 16) & 0xFF
        b = p & 0xFF
        # forward pass (spec encoder direction): red_to_blue uses the
        # ORIGINAL red; the inverse then recovers it from the
        # reconstructed red, which equals the original
        new_r = (r - ((s8(g2r) * g) >> 5)) & 0xFF
        new_b = (b - ((s8(g2b) * g) >> 5) - ((s8(r2b) * s8(r)) >> 5)) & 0xFF
        out.append((p & 0xFF00FF00) | (new_r << 16) | new_b)
    return np.array(out, dtype=np.uint64)


# -------------------------------------------------------------- fixtures


def _rand_rgb(rng, h, w, levels=256):
    return (rng.integers(0, levels, (h, w, 3)) * (256 // levels)).astype(
        np.uint8
    )


# ------------------------------------------------------------------ tests


def test_literals_roundtrip_simple_and_normal():
    rng = np.random.default_rng(1)
    img = _rand_rgb(rng, 8, 11)
    for force_normal in (False, True):
        out = decode_webp(encode_vp8l(img, force_normal=force_normal))
        np.testing.assert_array_equal(out, img)


def test_two_color_image_simple_codes():
    img = np.zeros((5, 7, 3), dtype=np.uint8)
    img[::2, 1::2] = (200, 30, 99)
    out = decode_webp(encode_vp8l(img))
    np.testing.assert_array_equal(out, img)


def test_alpha_channel_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (6, 6, 4)).astype(np.uint8)
    out = decode_webp(encode_vp8l(img, alpha=True))
    assert out.shape == (6, 6, 4)
    np.testing.assert_array_equal(out, img)
    # alpha hint off -> RGB only
    out3 = decode_webp(encode_vp8l(img[:, :, :3]))
    assert out3.shape == (6, 6, 3)


def test_subtract_green_roundtrip():
    rng = np.random.default_rng(3)
    img = _rand_rgb(rng, 9, 5)
    out = decode_webp(encode_vp8l(img, transforms=[("subtract_green",)]))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_roundtrip(mode):
    rng = np.random.default_rng(100 + mode)
    img = _rand_rgb(rng, 9, 10)
    grid = [[mode] * 3 for _ in range(3)]
    out = decode_webp(
        encode_vp8l(img, transforms=[("predictor", 2, grid)])
    )
    np.testing.assert_array_equal(out, img)


def test_predictor_mixed_grid_and_bits():
    rng = np.random.default_rng(4)
    img = _rand_rgb(rng, 17, 23)
    grid = [[(tx * 5 + ty * 3) % 14 for tx in range(3)] for ty in range(3)]
    out = decode_webp(encode_vp8l(img, transforms=[("predictor", 3, grid)]))
    np.testing.assert_array_equal(out, img)


def test_color_transform_roundtrip():
    rng = np.random.default_rng(5)
    img = _rand_rgb(rng, 8, 8)
    for mults in ((1, 2, 3), (0xFF, 0x80, 0x7F), (0, 0, 0)):
        out = decode_webp(
            encode_vp8l(img, transforms=[("color", 3, mults)])
        )
        np.testing.assert_array_equal(out, img)


def test_transform_chain_subtract_green_then_predictor():
    rng = np.random.default_rng(6)
    img = _rand_rgb(rng, 12, 12)
    grid = [[7] * 4 for _ in range(4)]
    out = decode_webp(
        encode_vp8l(
            img, transforms=[("subtract_green",), ("predictor", 2, grid)]
        )
    )
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 64])
def test_palette_roundtrip_all_bundle_widths(n_colors):
    rng = np.random.default_rng(200 + n_colors)
    colors = [
        (0xFF << 24) | (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
        for c in rng.integers(0, 256, (n_colors, 3))
    ]
    colors = list(dict.fromkeys(colors))  # unique, keep order
    idx = rng.integers(0, len(colors), (7, 13))
    img = np.zeros((7, 13, 3), dtype=np.uint8)
    for i, c in enumerate(colors):
        img[idx == i] = [(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF]
    out = decode_webp(
        encode_vp8l(img, transforms=[("palette", colors)])
    )
    np.testing.assert_array_equal(out, img)


def test_color_cache_roundtrip():
    rng = np.random.default_rng(7)
    # few distinct colors -> real cache hits
    img = _rand_rgb(rng, 10, 10, levels=4)
    for bits in (1, 4, 8):
        out = decode_webp(encode_vp8l(img, cache_bits=bits))
        np.testing.assert_array_equal(out, img)


def test_lz77_long_and_short_distances():
    rng = np.random.default_rng(8)
    row = rng.integers(0, 256, (1, 20, 3)).astype(np.uint8)
    img = np.repeat(row, 12, axis=0)  # vertical copies: distance = width
    out = decode_webp(encode_vp8l(img, use_lz77=True))
    np.testing.assert_array_equal(out, img)
    # horizontal run: distance 1 (short code 2)
    img2 = np.tile(
        np.array([[[9, 8, 7]]], dtype=np.uint8), (3, 40, 1)
    )
    out2 = decode_webp(encode_vp8l(img2, use_lz77=True))
    np.testing.assert_array_equal(out2, img2)


def test_lz77_with_cache_roundtrip():
    rng = np.random.default_rng(9)
    img = _rand_rgb(rng, 8, 9, levels=3)
    out = decode_webp(encode_vp8l(img, use_lz77=True, cache_bits=3))
    np.testing.assert_array_equal(out, img)


def test_meta_prefix_groups():
    rng = np.random.default_rng(10)
    img = _rand_rgb(rng, 16, 16)
    for groups in (2, 3):
        out = decode_webp(encode_vp8l(img, meta_groups=groups))
        np.testing.assert_array_equal(out, img)


def test_vp8x_wrapped_lossless():
    rng = np.random.default_rng(11)
    img = _rand_rgb(rng, 4, 4)
    out = decode_webp(encode_vp8l(img, vp8x=True))
    np.testing.assert_array_equal(out, img)


def test_error_contract():
    rng = np.random.default_rng(12)
    good = encode_vp8l(_rand_rgb(rng, 4, 4))
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="RIFF size"):
        decode_webp(good[:-4])
    # lossy VP8 -> codec gate
    lossy = (
        b"RIFF" + struct.pack("<I", 12) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_webp(lossy)
    with pytest.raises(ValueError, match="no image chunk"):
        decode_webp(b"RIFF" + struct.pack("<I", 4) + b"WEBP")
    # bad VP8L signature byte
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x30\x00\x00\x00")
    # reserved version bits
    bad = bytearray(good)
    off = good.index(b"VP8L") + 8
    bad[off + 4] |= 0xE0  # version field = top 3 bits of byte 4 after sig
    with pytest.raises(ValueError, match="version|prefix|truncated|Kraft"):
        decode_webp(bytes(bad))
    # decompression-bomb guard
    bw = _BitWriter()
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    with pytest.raises(ValueError, match="pixel"):
        decode_vp8l(b"\x2f" + bw.bytes(), max_pixels=1 << 20)


def test_fuzz_byte_flips_keep_error_contract():
    rng = np.random.default_rng(13)
    img = _rand_rgb(rng, 6, 6, levels=5)
    good = encode_vp8l(img, cache_bits=2, use_lz77=True)
    for _ in range(200):
        bad = bytearray(good)
        i = int(rng.integers(12, len(bad)))
        bad[i] ^= int(rng.integers(1, 256))
        try:
            decode_webp(bytes(bad))
        except (ValueError, NotImplementedError):
            pass  # classified rejection is the contract
        # a successful decode of mutated-but-still-valid bits is fine


def test_router_dispatches_webp():
    from flink_hiveorc_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(14)
    img = _rand_rgb(rng, 5, 5)
    out = decode_image(encode_vp8l(img, transforms=[("subtract_green",)]))
    np.testing.assert_array_equal(out, img)


def test_oracle_leg_constructions_pin_decoder():
    """The eight _vp8l_segments rotation legs (the JVM-side payload
    construction behind multimodal_webp_decode_stats), decoded
    through the real router, must reproduce the oracle's digest
    arithmetic exactly — the same identity the external DuckDB
    oracle pins, kept here as a fast in-repo regression."""
    import hashlib

    from flink_hiveorc_spark.functions.multimodal import (
        _image_features,
        _vp8l_segments,
    )

    seg = _vp8l_segments()
    rev = seg["rev"]
    for text in (b"hello world", b"", b"spark", b"\xff" * 40):
        d = hashlib.md5(text).hexdigest()
        db = [int(d[2 * i : 2 * i + 2], 16) for i in range(16)]
        u = [bytes([rev[b]]) for b in db]
        z = b"\x00"
        payloads = {
            0: seg["full"][0] + b"".join(u[:16]),
            1: seg["full"][1] + b"".join(u[:16]),
            2: seg["full"][2] + u[0] + z * 4 + u[1] + u[2] + u[3] + z
            + u[4] + u[5] + u[6] + z + u[7] + u[8] + u[9],
            3: seg["full"][3]
            + b"".join(seg["t3"][db[i] * 2 : db[i] * 2 + 2] for i in range(8)),
            4: seg["full"][4]
            + b"".join(bytes([seg["t4"][db[i]]]) for i in range(8)),
            5: seg["full"][5] + b"".join(u[:4]) + seg["tails"][5],
            6: seg["full"][6] + b"".join(u[:16]),
            7: seg["full"][7] + b"".join(u[:16]),
        }
        S = sum(db)
        expect = {
            0: (4, 4, 3, S / 48),
            1: (4, 4, 3, 3 * S / 48),
            2: (4, 4, 3, (7 * db[0] + sum(db[1:10])) / 48),
            3: (4, 4, 3, 2 * sum(db[:8]) / 48),
            4: (4, 4, 3, 51 * sum((b // 16) + (b % 16) for b in db[:8]) / 48),
            5: (2, 8, 3, 4 * sum(db[:4]) / 48),
            6: (4, 4, 3, sum(2 * b + (2 * b) % 256 for b in db) / 48),
            7: (2, 4, 4, S / 32),
        }
        for leg in range(8):
            f = _image_features(payloads[leg])
            assert (
                f["height"], f["width"], f["channels"]
            ) == expect[leg][:3], (leg, text)
            assert f["mean_byte"] == pytest.approx(expect[leg][3]), (leg, text)


# ------------------------------------------------------- animated WebP


def _vp8l_chunk_of(webp_file: bytes) -> bytes:
    off = webp_file.index(b"VP8L")
    (size,) = struct.unpack_from("<I", webp_file, off + 4)
    return webp_file[off + 8 : off + 8 + size]


def _anmf(x, y, frame_vp8l: bytes, dur=40, blend_none=False,
          dispose_bg=False) -> bytes:
    import numpy as _np  # noqa: F401

    body = (
        (x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little")
    )
    # width/height from the frame's own VP8L header (14-bit fields)
    w = ((frame_vp8l[1] | (frame_vp8l[2] << 8)) & 0x3FFF) + 1
    bits = int.from_bytes(frame_vp8l[1:5], "little")
    h = ((bits >> 14) & 0x3FFF) + 1
    body += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    body += dur.to_bytes(3, "little")
    body += bytes([(2 if blend_none else 0) | (1 if dispose_bg else 0)])
    sub = b"VP8L" + struct.pack("<I", len(frame_vp8l)) + frame_vp8l
    if len(frame_vp8l) & 1:
        sub += b"\x00"
    body += sub
    out = b"ANMF" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _awebp(W, H, frames, bg=(0, 0, 0, 0), loops=0) -> bytes:
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + b"\x00" * 3
    vp8x += (W - 1).to_bytes(3, "little") + (H - 1).to_bytes(3, "little")
    anim_body = bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", loops)
    anim = b"ANIM" + struct.pack("<I", len(anim_body)) + anim_body
    chunks = vp8x + anim + b"".join(frames)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def test_animated_webp_regions_blend_dispose():
    from flink_hiveorc_spark.functions.webp import decode_webp_frames

    rng = np.random.default_rng(50)
    base = rng.integers(0, 256, (4, 6, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    patch = rng.integers(0, 256, (2, 2, 4)).astype(np.uint8)
    patch[:, :, 3] = 255
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    f1 = _vp8l_chunk_of(encode_vp8l(patch, alpha=True))
    payload = _awebp(6, 4, [
        _anmf(0, 0, f0, dur=30, blend_none=True),
        _anmf(2, 2, f1, dur=70, blend_none=True, dispose_bg=True),
        _anmf(0, 0, f0, dur=10, blend_none=True),
    ], bg=(9, 8, 7, 255))
    frames, durs = decode_webp_frames(payload)
    assert durs == [30.0, 70.0, 10.0]
    np.testing.assert_array_equal(frames[0], base)
    exp1 = base.copy()
    exp1[2:4, 2:4] = patch
    np.testing.assert_array_equal(frames[1], exp1)
    # dispose-to-background filled the patch rect BEFORE frame 2's
    # full-canvas overwrite; frame 2 covers everything again
    np.testing.assert_array_equal(frames[2], base)
    # dispose visible when the next frame does NOT cover the rect:
    payload2 = _awebp(6, 4, [
        _anmf(0, 0, f0, blend_none=True),
        _anmf(2, 2, f1, blend_none=True, dispose_bg=True),
        _anmf(0, 0, f1, blend_none=True),  # top-left patch only
    ], bg=(9, 8, 7, 255))
    frames2, _ = decode_webp_frames(payload2)
    exp2 = exp1.copy()
    exp2[2:4, 2:4] = [9, 8, 7, 255]  # disposed to ANIM background
    exp2[0:2, 0:2] = patch
    np.testing.assert_array_equal(frames2[2], exp2)


def test_animated_webp_alpha_blending_matches_apng_math():
    from flink_hiveorc_spark.functions.webp import decode_webp_frames

    base = np.zeros((2, 2, 4), dtype=np.uint8)
    base[:, :] = [100, 150, 200, 255]
    over = np.zeros((2, 2, 4), dtype=np.uint8)
    over[:, :] = [20, 40, 60, 128]
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    f1 = _vp8l_chunk_of(encode_vp8l(over, alpha=True))
    payload = _awebp(2, 2, [
        _anmf(0, 0, f0, blend_none=True),
        _anmf(0, 0, f1, blend_none=False),  # alpha 'over'
    ])
    frames, _ = decode_webp_frames(payload)
    sa = 128 / 255.0
    exp_rgb = np.rint(
        np.array([20, 40, 60]) * sa + np.array([100, 150, 200]) * (1 - sa)
    )
    np.testing.assert_array_equal(frames[1][0, 0, :3], exp_rgb)
    assert frames[1][0, 0, 3] == 255


def test_animated_webp_still_and_dispatch():
    from flink_hiveorc_spark.functions.multimodal import decode_image
    from flink_hiveorc_spark.functions.webp import decode_webp_frames

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, (3, 5, 3)).astype(np.uint8)
    still = encode_vp8l(img)
    frames, durs = decode_webp_frames(still)
    assert frames.shape == (1, 3, 5, 4) and durs == [0.0]
    np.testing.assert_array_equal(frames[0][:, :, :3], img)
    # decode_image of an animation = first composited frame
    base = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    anim = _awebp(4, 4, [_anmf(0, 0, f0, blend_none=True)])
    np.testing.assert_array_equal(decode_image(anim), base)


def test_animated_webp_error_contract():
    from flink_hiveorc_spark.functions.webp import decode_webp_frames

    rng = np.random.default_rng(52)
    base = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    # frame outside the canvas
    with pytest.raises(ValueError, match="outside the canvas"):
        decode_webp_frames(_awebp(4, 4, [_anmf(2, 2, f0)]))
    # ANMF without the animation flag
    good = _awebp(4, 4, [_anmf(0, 0, f0)])
    bad = bytearray(good)
    off = good.index(b"VP8X") + 8
    bad[off] = 0x00
    with pytest.raises(ValueError, match="animation flag"):
        decode_webp_frames(bytes(bad))
    # geometry mismatch between ANMF header and the frame bitstream
    bad2 = bytearray(good)
    a_off = good.index(b"ANMF") + 8
    bad2[a_off + 6] = 0x01  # declared width-1 = 1 (frame is 4 wide)
    with pytest.raises(ValueError, match="differs from the frame"):
        decode_webp_frames(bytes(bad2))
    # lossy frame gates
    lossy_sub = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    body = b"\x00" * 15 + b"\x02" + lossy_sub
    anmf = b"ANMF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="lossy"):
        decode_webp_frames(_awebp(4, 4, [anmf]))
    # fuzz: byte flips stay classified
    for _ in range(150):
        b = bytearray(good)
        i = int(rng.integers(12, len(b)))
        b[i] ^= int(rng.integers(1, 256))
        try:
            decode_webp_frames(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_frame_sampler_routes_animated_webp(spark):
    from flink_hiveorc_spark.functions.multimodal import gif_frame_sample

    rng = np.random.default_rng(53)
    base = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    base[:, :, 3] = 255
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    anim = _awebp(4, 4, [_anmf(0, 0, f0, blend_none=True)] * 3)
    df = spark.createDataFrame(
        [(1, bytearray(anim)), (2, b"not media")],
        "doc_id long, payload binary",
    )
    rows = gif_frame_sample(df, every_n=2, quarantine=True).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.frame_idx for r in by_doc[1]] == [0, 2]
    assert by_doc[2][0].error.startswith("unsupported:")


# ------------------------------------------- r12 advice regressions


def _inv_predictor_reference(img, width, height, bits, tiles):
    """The pre-r13 per-pixel inverse predictor, kept as the equality
    oracle for the vectorized rewrite (r12 advice: the production
    version now vectorizes constant-mode tile runs)."""
    from flink_hiveorc_spark.functions.webp import _argb_planes, _predict

    px = _argb_planes(img, width, height).astype(np.uint8)
    from flink_hiveorc_spark.functions.webp import _subsample_size

    tile_w = _subsample_size(width, bits)
    out = np.zeros_like(px)
    for y in range(height):
        for x in range(width):
            res = px[y, x]
            if y == 0 and x == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.uint8)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = (
                    int(tiles[(y >> bits) * tile_w + (x >> bits)]) >> 8
                ) & 0xFF
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                TR = out[y - 1, x + 1] if x + 1 < width else out[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = res + pred
    o = out.astype(np.uint32)
    return (
        (o[:, :, 0] << 24) | (o[:, :, 1] << 16) | (o[:, :, 2] << 8)
        | o[:, :, 3]
    ).reshape(-1)


@pytest.mark.parametrize("bits,w,h", [(2, 17, 9), (3, 23, 11), (4, 16, 16)])
def test_inv_predictor_vectorized_matches_per_pixel_reference(bits, w, h):
    """Randomized residuals + a tile grid cycling ALL 14 modes (incl.
    TR-wrap at the right edge and runs that are not tile-aligned):
    the vectorized inverse predictor must be bit-identical to the
    per-pixel reference it replaced."""
    from flink_hiveorc_spark.functions.webp import (
        _inv_predictor,
        _subsample_size,
    )

    rng = np.random.default_rng(1000 + bits)
    img = rng.integers(0, 1 << 32, w * h, dtype=np.uint64).astype(np.uint32)
    tw, th = _subsample_size(w, bits), _subsample_size(h, bits)
    modes = (np.arange(tw * th, dtype=np.uint32) % 14).astype(np.uint32)
    tiles = (0xFF << 24) | (modes << 8)
    got = _inv_predictor(img.copy(), w, h, bits, tiles)
    want = _inv_predictor_reference(img.copy(), w, h, bits, tiles)
    np.testing.assert_array_equal(got, want)


def test_still_decode_of_animation_composites_one_frame_only():
    """decode_webp on an animated WebP returns frame 0 WITHOUT
    materializing the rest (r12 advice: the N*W*H*4 bomb class).
    limit_frames=1 both caps the output and scopes the
    max_total_pixels guard to the frames actually composited."""
    from flink_hiveorc_spark.functions.webp import (
        decode_webp,
        decode_webp_frames,
    )

    rng = np.random.default_rng(54)
    base = rng.integers(0, 256, (4, 4, 4)).astype(np.uint8)
    f0 = _vp8l_chunk_of(encode_vp8l(base, alpha=True))
    anim = _awebp(4, 4, [_anmf(0, 0, f0, blend_none=True)] * 6)
    # full compositing trips a 2-frame budget ...
    with pytest.raises(ValueError, match="decompression-bomb"):
        decode_webp_frames(anim, max_total_pixels=2 * 16)
    # ... the frame-limited still path does not, and returns frame 0
    frames, durs = decode_webp_frames(
        anim, max_total_pixels=2 * 16, limit_frames=1
    )
    assert frames.shape == (1, 4, 4, 4) and len(durs) == 1
    np.testing.assert_array_equal(frames[0], base)
    np.testing.assert_array_equal(decode_webp(anim), base)


def test_xbm_sniff_requires_dimension_defines():
    """A C-source-like blob with '#define' must NOT classify as
    malformed XBM (r12 advice): it falls through to the codec gate.
    A real XBM still decodes natively."""
    from flink_hiveorc_spark.functions.multimodal import decode_image

    c_source = (
        b"#define MAX_RETRIES 3\n"
        b"static int table[] = {1, 2, 3};\n" + b"x" * 200
    )
    with pytest.raises(NotImplementedError):
        decode_image(c_source)
    xbm = (
        b"#define img_width 8\n#define img_height 2\n"
        b"static unsigned char img_bits[] = { 0x0F, 0xF0 };\n"
    )
    out = decode_image(xbm)
    assert out.shape == (2, 8, 1)
    # set bit = ink (0), LSB-first within each byte
    np.testing.assert_array_equal(
        out[0, :, 0], [0, 0, 0, 0, 255, 255, 255, 255]
    )
