"""Hot-band guard demonstration for image_blockhash_pairs (r12 verdict
what's-wrong #3): measure what ``band_cap`` buys when a corpus floods
one band bucket with identical images.

The failure class is the blockhash twin of the viral-shingle problem
(tools/viral_shingle_probe.py): a corpus with thousands of identical
or near-black images puts every doc into the same (band_idx, band_val)
bucket, and the banded self-join — whose whole point is to avoid
all-pairs — degenerates to all-pairs WITHIN that bucket (k docs → k²/2
candidate rows per hot band, times 4 bands). band_cap drops bands
shared by more than c docs before the join; the dropped pairs are
exactly the duplicate×duplicate grid that exact dedup (L1) already
removes at linear cost, so the near-dup miner loses nothing it is for.

Corpus construction: n_docs docs all carrying the SAME 8×8 PGM (the
flood), plus 50 docs paired two-by-two with distinct images (the
signal). The capped run must keep the 25 signal pairs and drop the
flood grid.

Usage: python tools/blockhash_band_probe.py [n_docs]
Prints one JSON line with uncapped vs capped timings and pair counts.

Measured (local[32], band_cap=50 — band_probe_r13.json):
  2000 docs: uncapped 46.5 s / 1,999,033 pairs → capped 2.76 s / 33 (16.9×)
  5000 docs: uncapped 319.1 s / 12,497,533 pairs → capped 2.77 s / 33 (115×)
2.5× the docs made the uncapped join 6.9× slower while the capped run
did not move at all — the within-bucket N² blowup is real and the cap
keeps every signal pair (the 33 = 25 constructed duplicates + 8 cool
band collisions present in both runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pgm_bytes(seed: int) -> bytes:
    import hashlib

    digest = hashlib.md5(str(seed).encode()).digest()
    body = bytes(digest[(r // 2) * 4 + (c // 2)] for r in range(8)
                 for c in range(8))
    return b"P5\n8 8\n255\n" + body


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from flink_hiveorc_spark.functions.multimodal import (
        image_blockhash,
        image_blockhash_pairs,
    )
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("band-probe")
    flood = _pgm_bytes(0)
    rows = [(i, bytearray(flood)) for i in range(1, n_docs + 1)]
    for p in range(25):  # 25 distinct duplicate pairs = the signal
        img = bytearray(_pgm_bytes(1000 + p))
        rows.append((100000 + 2 * p, img))
        rows.append((100000 + 2 * p + 1, img))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = (
        image_blockhash(df)
        .select("doc_id", "blockhash")
        .localCheckpoint(eager=True)  # equally-warm input for both runs
    )

    def run(band_cap):
        t0 = time.monotonic()
        n_pairs = image_blockhash_pairs(hashes, band_cap=band_cap).count()
        return round(time.monotonic() - t0, 3), n_pairs

    capped_sec, capped_pairs = run(50)
    uncapped_sec, uncapped_pairs = run(None)

    print(
        json.dumps(
            {
                "probe": "blockhash_band_cap",
                "n_docs": n_docs,
                "signal_pairs": 25,
                "uncapped_sec": uncapped_sec,
                "capped_sec": capped_sec,
                "speedup": round(uncapped_sec / max(capped_sec, 1e-9), 1),
                "uncapped_pairs": uncapped_pairs,
                "capped_pairs": capped_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
