"""Hypothesis property tests for the VP8L decoder: ARBITRARY small
images with ARBITRARY feature combinations (transform chains, cache
sizes, LZ77, meta groups, code-definition styles) must round-trip
bit-exactly through the independent encoder twin — the same property
strategy that pinned the progressive-JPEG envelope in r11."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as hst

from flink_hiveorc_spark.functions.webp import decode_webp
from test_webp_decode import encode_vp8l


img_strategy = hst.tuples(
    hst.integers(2, 12),  # height
    hst.integers(2, 12),  # width
    hst.integers(2, 256),  # color levels (low levels -> cache/LZ hits)
    hst.integers(0, 2**32 - 1),  # seed
)


@settings(max_examples=60, deadline=None)
@given(
    img_strategy,
    hst.booleans(),  # subtract_green
    hst.sampled_from([None, 0, 5, 7, 11, 12, 13]),  # predictor mode
    hst.sampled_from([0, 1, 3, 6]),  # cache bits
    hst.booleans(),  # lz77
    hst.booleans(),  # force_normal code definitions
)
def test_roundtrip_arbitrary_feature_combos(
    spec, sub_green, pred_mode, cache_bits, lz77, force_normal
):
    h, w, levels, seed = spec
    rng = np.random.default_rng(seed)
    img = (rng.integers(0, levels, (h, w, 3)) * (256 // levels)).astype(
        np.uint8
    )
    transforms = []
    if sub_green:
        transforms.append(("subtract_green",))
    if pred_mode is not None:
        tiles_y = (h + 3) // 4
        tiles_x = (w + 3) // 4
        grid = [[pred_mode] * tiles_x for _ in range(tiles_y)]
        transforms.append(("predictor", 2, grid))
    payload = encode_vp8l(
        img,
        transforms=transforms,
        cache_bits=cache_bits,
        use_lz77=lz77,
        force_normal=force_normal,
    )
    np.testing.assert_array_equal(decode_webp(payload), img)


@settings(max_examples=30, deadline=None)
@given(
    hst.integers(2, 10),
    hst.integers(2, 10),
    hst.integers(2, 16),
    hst.integers(0, 2**32 - 1),
)
def test_roundtrip_palette_arbitrary(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    colors = [
        (0xFF << 24) | (int(c[0]) << 16) | (int(c[1]) << 8) | int(c[2])
        for c in rng.integers(0, 256, (n_colors, 3))
    ]
    colors = list(dict.fromkeys(colors))
    idx = rng.integers(0, len(colors), (h, w))
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for i, c in enumerate(colors):
        img[idx == i] = [(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF]
    payload = encode_vp8l(img, transforms=[("palette", colors)])
    np.testing.assert_array_equal(decode_webp(payload), img)


@settings(max_examples=25, deadline=None)
@given(
    hst.integers(8, 20),
    hst.integers(8, 20),
    hst.integers(2, 3),
    hst.integers(0, 2**32 - 1),
)
def test_roundtrip_meta_groups_arbitrary(h, w, groups, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    payload = encode_vp8l(img, meta_groups=groups)
    np.testing.assert_array_equal(decode_webp(payload), img)
