"""Image perceptual fingerprint (blockhash-class) + banded near-dup
pairs: the hash pinned against an independent recomputation, its
robustness/sensitivity properties, and the pair pipeline semantics."""

from __future__ import annotations

import numpy as np
import pytest

from flink_hiveorc_spark.functions.multimodal import (
    blockhash_bits,
    image_blockhash,
    image_blockhash_pairs,
)


def _pgm(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return f"P5\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _ref_blockhash(gray: np.ndarray, grid: int = 8) -> tuple[str, int]:
    """Independent recomputation (own block/median/bit logic)."""
    h, w = gray.shape
    ys = [h * i // grid for i in range(grid + 1)]
    xs = [w * i // grid for i in range(grid + 1)]
    sums = []
    for by in range(grid):
        for bx in range(grid):
            blk = gray[ys[by] : ys[by + 1], xs[bx] : xs[bx + 1]]
            sums.append(
                int(blk.astype(np.int64).sum()) * 1000 * (h * w)
                // (blk.shape[0] * blk.shape[1])
            )
    srt = sorted(sums)
    thresh = srt[(grid * grid - 1) // 2] + srt[grid * grid // 2]
    bits = [1 if 2 * s > thresh else 0 for s in sums]
    val = 0
    for b in bits:
        val = (val << 1) | b
    return format(val, f"0{grid * grid // 4}x"), grid * grid - sum(bits)


def test_matches_independent_recomputation():
    rng = np.random.default_rng(1)
    for shape in ((8, 8), (16, 16), (17, 23), (64, 48)):
        gray = rng.integers(0, 256, shape, dtype=np.uint8)
        got = blockhash_bits(_pgm(gray))
        assert got == _ref_blockhash(gray)


def test_identical_images_same_hash_and_robustness():
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    h1, _ = blockhash_bits(_pgm(gray))
    h2, _ = blockhash_bits(_pgm(gray.copy()))
    assert h1 == h2
    # +1 brightness everywhere: block ORDER unchanged -> small drift
    brighter = np.clip(gray.astype(np.int16) + 1, 0, 255).astype(np.uint8)
    h3, _ = blockhash_bits(_pgm(brighter))
    ham = bin(int(h1, 16) ^ int(h3, 16)).count("1")
    assert ham <= 8
    # structural change (invert half the image) -> large distance
    flipped = gray.copy()
    flipped[:, 16:] = 255 - flipped[:, 16:]
    h4, _ = blockhash_bits(_pgm(flipped))
    assert bin(int(h1, 16) ^ int(h4, 16)).count("1") > 8


def test_rgb_uses_bt601_luma():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    ppm = b"P6\n8 8\n255\n" + rgb.tobytes()
    luma = (
        299 * rgb[:, :, 0].astype(np.int64)
        + 587 * rgb[:, :, 1].astype(np.int64)
        + 114 * rgb[:, :, 2].astype(np.int64)
    )
    # independent: every block is one pixel at grid 8
    srt = sorted(luma.reshape(-1).tolist())
    thresh = srt[31] + srt[32]
    bits = [1 if 2 * v > thresh else 0 for v in luma.reshape(-1).tolist()]
    val = 0
    for b in bits:
        val = (val << 1) | b
    assert blockhash_bits(ppm)[0] == format(val, "016x")


def test_too_small_image_rejected():
    with pytest.raises(ValueError, match="smaller than"):
        blockhash_bits(_pgm(np.zeros((4, 4), dtype=np.uint8)))


def test_pairs_bucketing_and_hamming(spark):
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    # doc 1 == doc 2; doc 3 mildly perturbed; doc 4 unrelated
    perturbed = np.clip(base.astype(np.int16) + 1, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    rows = [
        (1, _pgm(base)),
        (2, _pgm(base)),
        (3, _pgm(perturbed)),
        (4, _pgm(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_blockhash(df).select("doc_id", "blockhash")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_blockhash_pairs(hashes).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 8
    assert not any(4 in p for p in pairs)


def test_quarantine_channel(spark):
    rows = [(1, _pgm(np.full((8, 8), 9, dtype=np.uint8))), (2, b"garbage")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in image_blockhash(df, quarantine=True).collect()}
    assert out[1]["blockhash"] is not None
    assert out[2]["blockhash"] is None and out[2]["error"].startswith(
        "malformed"
    ) or out[2]["error"].startswith("unsupported")


def test_band_cap_drops_hot_bands_keeps_cool_pairs(spark):
    """Hot-band guard (r12 verdict): a flood of identical images fills
    one band bucket; band_cap drops those bands before the self-join
    (bounding the k² candidate grid) while pairs whose shared bands
    stay under the cap are still found."""
    rng = np.random.default_rng(7)
    flood = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cool = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    k = 20
    rows = [(i, _pgm(flood)) for i in range(1, k + 1)]
    rows += [(100, _pgm(cool)), (101, _pgm(cool))]  # one cool dup pair
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_blockhash(df).select("doc_id", "blockhash")
    uncapped = image_blockhash_pairs(hashes).collect()
    capped = image_blockhash_pairs(hashes, band_cap=5).collect()
    # uncapped: the flood contributes k*(k-1)/2 pairs + the cool pair
    assert len(uncapped) == k * (k - 1) // 2 + 1
    # capped: every flood band holds k=20 > 5 docs -> dropped; the
    # cool pair's bands hold 2 docs each -> kept
    assert {(r.doc_a, r.doc_b) for r in capped} == {(100, 101)}
    assert capped[0].hamming == 0


def test_band_cap_none_is_identity(spark):
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)]
    rows = [(i, _pgm(im)) for i, im in enumerate(imgs)]
    rows.append((99, _pgm(imgs[0])))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = image_blockhash(df).select("doc_id", "blockhash")
    base = {(r.doc_a, r.doc_b, r.hamming)
            for r in image_blockhash_pairs(hashes).collect()}
    wide = {(r.doc_a, r.doc_b, r.hamming)
            for r in image_blockhash_pairs(hashes, band_cap=1000).collect()}
    assert base == wide and (0, 99, 0) in base
