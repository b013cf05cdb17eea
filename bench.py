"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized through the noop sink (all rows
computed, nothing collected to the driver) — the honest end-to-end
cost of the plan, not of driver-side serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_pricing_summary",
    "join_inner_revenue",
    "join_broadcast_region_revenue",
    "join_asof_purchase_prior_signup",
    "window_topk_orders_per_priority",
    "window_running_spend",
    "cdc_city_pipeline",
    "orc_roundtrip_counts",
    "dedup_minhash_lsh_pairs",
    "sim_topk_cosine_bruteforce",
    "text_quality_score",
    "sort_limit_top_lineitems",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_hiveorc_spark.registry import QUERIES
    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM/codegen AND parquet-scan paths once so the first
    # timed query doesn't pay session startup or reader class-loading.
    # Warm-up reads sf0.001 — different files than the benched sf, so
    # no data caching, only code paths.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = "/root/testdata/sf0.001"
    spark.read.parquet(f"{warm}/lineitem.parquet").count()
    spark.read.parquet(f"{warm}/documents.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
