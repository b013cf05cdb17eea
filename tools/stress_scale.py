"""Scale-stress probe: do the plans survive an 8× corpus?

Materializes a multiplied copy of the sf0.1 corpus in /tmp (facts
replicated N×, dimensions kept 1× — preserving the star-schema shape)
and times a subset of headline queries at 1× and N×. A query whose
runtime grows much faster than N has a plan that will not survive
100 TB; the probe prints the ratio per query so regressions are
visible before they matter.

Row keys are NOT remapped, so duplicate-sensitive queries (dedup
pair-finders) are excluded — this is a throughput probe for the
scan/shuffle/join/window paths.

Usage: python tools/stress_scale.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = ("region", "nation", "customer", "supplier", "part")
FACTS = ("orders", "lineitem", "events", "documents", "embeddings")

PROBE = [
    "agg_pricing_summary",
    "join_inner_revenue",
    "join_broadcast_region_revenue",
    "join_asof_purchase_prior_signup",
    "window_topk_orders_per_priority",
    "window_running_spend",
    "dedup_minhash_signatures",
    "text_quality_score",
    "cdc_upsert_latest_state",
    "stream_tumbling_hourly",
    "skew_salted_agg",
    "sort_limit_top_lineitems",
    # round 2: the heavy new shapes (dup-insensitive ones only — key
    # replication breaks pair-finders and per-key SCD compression)
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "join_interval_bucketed",
    "text_tfidf_top_terms",
    "pipeline_pack_shards",
    "ml_kmeans_two_rounds",
    "agg_histogram_prices",
    # round 3 (contamination excluded: replicating docs puts the same
    # doc_id on both join sides, so its output grows N² by corpus
    # construction, not by plan shape)
    "batch_merge_upsert",
    "text_repetition_signals",
    # round 4 (pagerank_deep excluded as a pair-finder derivative;
    # kmeans_deep's seed collect tolerates replicated vec_ids but
    # kmeans_two_rounds already probes the same plan shape)
    "dedup_chunk_level",
    "text_lexical_diversity",
    "events_window_dedup",
    "agg_corr_regr_battery",
    "agg_filter_clause",
    "agg_approx_percentile",
    "sample_per_source_cap",
    "sample_weighted_mixture",
    # round-4 late additions (dup-insensitive; accuracy/manifest track
    # the same bucketed stages their production pipelines run)
    "text_bigram_familiarity",
    "agg_mad_outliers",
    "pipeline_shard_manifest",
    "events_hourly_concurrency",
    "agg_grouping_id_sets",
    "scalar_try_safe_arithmetic",
    # round 5 (all dup-insensitive: counts/weights/thresholds scale
    # with replication without changing the plan under test)
    "events_hourly_concurrency_open",
    "pipeline_stratified_split",
    "pipeline_source_temperature_weights",
    "text_quality_quantile_filter",
    # round-5 second batch. Excluded as replication artifacts, not
    # plan risks: join_bloom_prefilter (duplicated o_orderkey makes
    # the join output N² by corpus construction; the prefilter+scan
    # path it tests is the same shape as join_inner_revenue), and the
    # PQ pair (duplicated vec_ids corrupt the k seed codebooks).
    "text_boilerplate_ngrams",
    "events_transition_matrix",
    "batch_incremental_rollup",
    # dup-insensitive late-r5 additions: counts/freqs scale with
    # replication, merge tables and check verdicts do not change.
    "text_bpe_merges",
    "dq_expectations_report",
    "scalar_variant_shred",
    # round-5 third batch. Excluded as replication artifacts:
    # dedup_prefix_filter_jaccard and graph_label_propagation are
    # pair-finders / pair-graph derivatives (replicated doc_ids make
    # their output N² by corpus construction; the inverted-index and
    # edge-join shapes they use are probed by minhash_signatures and
    # the oracle-scale runs). join_interval_overlap IS included: its
    # intervals come from DISTINCT days, so replication stresses the
    # explode+band-join linearly without changing the output.
    "events_pattern_cep",
    "events_ewma_smoothing",
    "text_bm25_topk",
    "text_bpe_apply",
    "agg_cms_heavy_hitters",
    "join_interval_overlap",
    # round-5 late additions (dup-insensitive: weights/counts/means
    # scale with replication, CIs/medians/statistics stay exact).
    # dedup_sorted_neighborhood excluded as a pair-finder (replicated
    # doc_ids put identical sort keys adjacent — output grows N² by
    # corpus construction); its rank machinery is the shard prefix-sum
    # shape already probed by pipeline_pack_shards.
    "agg_poisson_bootstrap_ci",
    "agg_weighted_median",
    "agg_chisq_independence",
    "agg_entropy_mixing",
    "udf_grouped_agg_gini",
    "join_temporal_scd2_enrich",
    # round 7: the two-pass bucketed global rank (replication
    # multiplies each customer's total, shifting ranks but keeping
    # the output one row per customer — dup-insensitive plan probe
    # for the new width_bucket + prefix-sum shape).
    "window_percent_rank_spend",
    # round 8: the native-decode headline entry (map-only; per-core
    # constant × corpus size, expect near-linear) and the tar-export
    # e2e (replicated doc_ids are byte-identical with equal token
    # counts, so tie order cannot change shard-boundary offsets —
    # counts and tar verification stay deterministic).
    "multimodal_image_decode_stats",
    "webdataset_export_verify",
    # round 12: map-only decode rotations (VP8L, legacy rasters,
    # blob decompression, blockhash — per-row featurizers, expect
    # near-linear), the exact-substring gram shuffle (replication
    # makes every gram duplicated: one full-doc span per doc, output
    # linear in N), window chunking (map-only fan-out), and two DS
    # shapes (rollup+rank aggregate; the 8-join returned-sales
    # chain). dedup_image_blockhash_pairs excluded as a pair-finder
    # (replicated identical images explode buckets N² by
    # construction, same class as dedup_sorted_neighborhood).
    "multimodal_webp_decode_stats",
    "multimodal_raster_decode_stats",
    "multimodal_decompress_stats",
    "multimodal_image_blockhash",
    "dedup_exact_substring_spans",
    "pipeline_chunk_token_windows",
    "tpcds_rollup_topk_per_group",
    "tpcds_returned_sales_two_year_chain",
    # round 13: the envelope fan-outs (WARC/ARC split, zip/tar
    # expansion — map-only, expect near-linear), the cleaned-corpus
    # side of exact-substring (same gram shuffle as spans plus the
    # anti-join), and the three new DS shapes (INTERSECT sets and
    # CTE/grain reuse are dup-insensitive: replication scales sums
    # uniformly, so thresholds/ratios keep the same survivors; the
    # date-chain join output scales linearly — the inventory side
    # stays pre-aggregated to (part, week) grain).
    "multimodal_warc_stats",
    "multimodal_archive_stats",
    "dedup_exact_substring_clean",
    "tpcds_crosschannel_intersect",
    "tpcds_frequent_best_customer",
    "tpcds_inventory_date_chain",
    # round 14: the charset/office/epub/wet-wat chains are all
    # map-only encode→decode passes (expect near-linear); the three
    # TPC-DS shapes above carry the r14 materialize-once rewrites
    "text_charset_decode",
    "text_office_extract",
    "text_epub_extract",
    "pipeline_wet_wat_ingest",
    # round 15: the CFB legacy-office chain (map-only encode→decode),
    # the wildcard-robots frontier filter + recrawl scheduler (host-
    # grain broadcast + per-host window), and the 5-leg PDF rotation
    # now carrying the filter chains; the rewritten inventory chain
    # stays (its demand side now pre-aggregates to (part,week,qty))
    "text_legacy_office_extract",
    "pipeline_robots_filter",
    "pipeline_recrawl_schedule",
    "multimodal_pdf_stats",
]


def build_multiplied(spark, src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        shutil.copy(os.path.join(src, f"{t}.parquet"), os.path.join(dst, f"{t}.parquet"))
    for t in FACTS:
        p = os.path.join(src, f"{t}.parquet")
        # Reading the same file n times replicates rows n-fold.
        df = spark.read.parquet(*([p] * n))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{t}.parquet"))


def time_queries(spark, sf_dir: str, names) -> dict[str, float]:
    from flink_hiveorc_spark.registry import QUERIES

    out = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # Cache keyed by BOTH N and the source dir (a key of N alone would
    # silently reuse an 8x-of-another-sf corpus), and populated via
    # build-to-tmp + atomic rename so a crashed build never passes the
    # exists check.
    src_tag = src.rstrip("/").replace("/", "_").lstrip("_")
    dst = f"/tmp/stress_{src_tag}_x{n}"

    from flink_hiveorc_spark.session import get_spark

    spark = get_spark("stress-scale")
    if not os.path.isdir(dst):
        attempt = f"{dst}__building_{os.getpid()}"
        build_multiplied(spark, src, attempt, n)
        try:
            os.rename(attempt, dst)
        except OSError:
            shutil.rmtree(attempt, ignore_errors=True)

    base = time_queries(spark, src, PROBE)   # also warms code paths
    big = time_queries(spark, dst, PROBE)

    report = {}
    worst = 0.0
    for name in PROBE:
        ratio = round(big[name] / max(base[name], 1e-9), 2)
        report[name] = {"t1x": base[name], f"t{n}x": big[name], "ratio": ratio}
        worst = max(worst, ratio)
    print(json.dumps({"n": n, "worst_ratio": worst, "queries": report}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
