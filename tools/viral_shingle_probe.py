"""Viral-shingle guard demonstration (r3 VERDICT optional-depth #7):
measure what ``df_cap`` buys when a boilerplate phrase infects every
document.

The replication-based stress probe (stress_scale.py) cannot exercise
this — it excludes pair-finders because key replication makes their
OUTPUT quadratic by corpus construction. Here the corpus is built the
way the failure actually happens in the wild: every document gets the
same boilerplate sentence appended (a license header, a cookie
banner). Each of the boilerplate's shingles then occurs in all N docs,
so the uncapped inverted-index self-join materializes ~N²/2 candidate
rows PER viral shingle, while df_cap drops those shingles before the
join (they carry no discriminative signal — a shingle present in
every document identifies nothing).

Usage: python tools/viral_shingle_probe.py [n_docs] [sf_dir]
Prints one JSON line with uncapped vs capped timings and pair counts.

Measured (sf0.1 docs + 19-word boilerplate, local[32]):
  2000 docs: uncapped 15.1 s / 309,758 pairs → capped 8.5 s / 43 pairs (1.8×)
  5000 docs: uncapped 102.0 s / 1,949,263 pairs → capped 9.3 s / 247 pairs (10.9×)
2.5× the docs made the uncapped join 6.8× slower while the capped run
barely moved — the N² blowup is real and the cap removes exactly the
boilerplate-only pairs (a pair sharing ONLY boilerplate is a false
near-duplicate by construction).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = (
    "this document is provided as is without warranty of any kind "
    "express or implied including fitness for a purpose"
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from flink_hiveorc_spark.catalog import load_table
    from flink_hiveorc_spark.functions.dedup import ngram_jaccard_pairs
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("viral-probe")
    d = (
        load_table(spark, sf_dir, "documents")
        .limit(n_docs)
        .select("doc_id", F.concat_ws(" ", "text", F.lit(BOILER)).alias("text"))
    )
    # Materialize once so both runs read identical, equally-warm input.
    d = d.localCheckpoint(eager=True)

    def run(df_cap):
        t0 = time.monotonic()
        n_pairs = ngram_jaccard_pairs(d, df_cap=df_cap).count()
        return round(time.monotonic() - t0, 3), n_pairs

    capped_sec, capped_pairs = run(50)
    uncapped_sec, uncapped_pairs = run(None)

    print(
        json.dumps(
            {
                "probe": "viral_shingle_df_cap",
                "n_docs": n_docs,
                "boilerplate_words": len(BOILER.split()),
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
