"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized through the noop sink (all rows
computed, nothing collected to the driver) — the honest end-to-end
cost of the plan, not of driver-side serialization.

Load-contamination detection (VERDICT r3 #2: the driver's r3 numbers
were inflated 2-7x by ambient host load with nothing in the artifact
to prove it):
- "calibration": a FIXED-WORK pure-CPU Spark job (no I/O, same plan
  every run and every round) timed before and after the query loop.
  Its cost is a property of the host, not of this repo's code — if
  calibration_sec is inflated vs prior rounds, the whole run was
  taken under load and per-query numbers can be normalized by the
  calibration ratio (or the run rejected).
- "queries_min": per-query minimum of the 3 runs alongside the
  median — a median inflated far above its own min means the host
  was noisy DURING the run.
- "loadavg": 1-minute load average at start and end (32 cpus; a
  loadavg far above the cpu count that this process drives means
  external contention).
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
    "sim_topk_cosine_ivf",
    "text_quality_score",
    "sort_limit_top_lineitems",
    "skew_salted_agg",
    "stream_tumbling_hourly",
    "pipeline_clean_corpus",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q8_market_share",
    "tpch_q17_small_quantity_revenue",
    "text_tfidf_top_terms",
    "ml_kmeans_two_rounds",
    # round 3 additions
    "batch_merge_upsert",
    "text_repetition_signals",
    "text_contamination_eval_overlap",
    # round 4 additions
    "dedup_chunk_level",
    "ml_kmeans_deep",
    "agg_corr_regr_battery",
    "events_window_dedup",
    "sim_ivf_search_persisted",  # special: see _EXTRA below
    # round 5 additions
    "join_bloom_prefilter",
    "text_boilerplate_ngrams",
    "sim_topk_pq_adc",
    "text_bpe_merges",
    # round 5 third batch: retrieval ranking, CEP, diversified
    # rerank, and the interval-overlap band join
    "text_bm25_topk",
    "events_pattern_cep",
    "sim_mmr_rerank",
    "join_interval_overlap",
    # round 8 addition (r7 verdict #7b): the native decode stack's
    # per-core throughput constant, tracked round-over-round like
    # every other headline number (map-only, 0-exchange plan)
    "multimodal_image_decode_stats",
    # round 12 additions: the exact-substring dedup shuffle (the one
    # corpus-sized exchange class the L1/L2 battery had not yet
    # benched) and the VP8L decode rotation (entropy-coded image
    # decode throughput, per-payload Huffman table builds)
    "dedup_exact_substring_spans",
    "multimodal_webp_decode_stats",
    # round 13 additions: the WARC/ARC envelope split (the Common
    # Crawl ingest constant — per-record framing walk + per-record
    # gzip) and the end-to-end crawl chain (WARC split → HTML
    # extraction regex battery → URL normalization), the two new
    # throughput classes of the r13 surface
    "multimodal_warc_stats",
    "pipeline_crawl_extract",
    # round 14 additions: charset detection + transcoding (the
    # encode-9-ways → sniff → stdlib-codec decode chain, two Python
    # passes) and OOXML extraction (zip inflate + XML walk per doc) —
    # the round's two new throughput classes
    "text_charset_decode",
    "text_office_extract",
    # round 15 addition: legacy binary Office (MS-CFB container walk
    # + piece-table/SST/record-forest extraction, two Python passes)
    # — the round's new throughput class
    "text_legacy_office_extract",
]


def _make_ivf_search(spark, sf_dir: str):
    """Bench entry for the PERSISTED-IVF search path (r3 VERDICT #7):
    the index build is paid once outside the timed loop (that is the
    point of persisting it); the timed callable is the search alone,
    so a regression in the partition-pruned probe read shows up here
    rather than hiding behind the build cost."""
    import tempfile

    from pyspark.sql import functions as F
    from flink_hiveorc_spark.catalog import load_table
    from flink_hiveorc_spark.functions.similarity import (
        N_QUERIES,
        build_ivf_index,
        search_ivf_index,
    )

    index_path = os.path.join(tempfile.mkdtemp(prefix="fhs_ivf_bench_"), "ivf")
    build_ivf_index(spark, sf_dir, index_path)

    def run(spark, sf_dir):
        q = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        return search_ivf_index(spark, index_path, q)

    return run

# Fixed-work calibration: modular-hash sum over spark.range, 32 even
# splits, zero I/O, one codegen'd stage. Identical plan every
# invocation — any round-to-round drift in its timing measures the
# HOST, not the repo.
#
# VERDICT r8 #3: the r6-r8 probe (800M rows, ~0.2 s) was short enough
# that scheduler/GC granularity put ±20% on even a median-of-3,
# inverting the normalized trend vs the raw one. r9 runs the probe at
# 4× the work (~0.8 s — noise amortizes; 8 probe runs cost ~6 s
# against a 105 s idle-wait budget) and records the min..max spread so
# a noisy calibration is self-evident in the artifact. _CALIB_UNIT
# keeps the NORMALIZED figures in the same units as r6-r8: times are
# divided by (sec_before / _CALIB_UNIT), i.e. by the equivalent
# 800M-row probe cost, so normalized_total stays comparable
# round-over-round across the probe change.
_CALIB_SQL = "sum((id * 2654435761) % 1000003) AS s"
_CALIB_ROWS = 3_200_000_000
_CALIB_UNIT = 4.0  # this probe's work as a multiple of the r6-r8 probe


def _calib_once(spark) -> float:
    t0 = time.monotonic()
    (
        spark.range(0, _CALIB_ROWS, 1, 32)
        .selectExpr(_CALIB_SQL)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.monotonic() - t0


def _calibrate(spark) -> tuple[float, float, float]:
    """(median, min, max) of 3 probes after one discarded JIT-warm
    run — the spread makes a noisy calibration visible in-artifact."""
    _calib_once(spark)
    runs = sorted(round(_calib_once(spark), 3) for _ in range(3))
    return runs[1], runs[0], runs[2]


def _loadavg() -> float | None:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return None


def _wait_for_idle(threshold: float = 1.0, max_wait_sec: float = 180.0) -> float:
    """Spin-wait (bounded) until the 1-minute loadavg drops below
    ``threshold`` before the first timed query (VERDICT r5 #3: the r5
    run started at loadavg 2.65, making round-over-round comparison
    indistinguishable from load noise). Returns seconds actually
    waited; proceeds regardless after ``max_wait_sec`` — the wait and
    the residual load are both recorded in the artifact, so a
    contended run is at least self-evident."""
    t0 = time.monotonic()
    while True:
        load = _loadavg()
        waited = time.monotonic() - t0
        if load is None or load < threshold or waited >= max_wait_sec:
            return round(waited, 1)
        time.sleep(5.0)


def _next_round() -> int:
    """Current round number: $SPARK_GRAFT_ROUND when set, else inferred
    from the BENCH_r*.json artifacts the driver has already committed
    (r6 runs with r01..r05 present). The env override exists because
    the inference is wrong for a RE-run inside a round: once the driver
    writes this round's BENCH file, max+1 points at the next round
    (ADVICE r6)."""
    import re as _re

    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        try:
            return int(env)
        except ValueError:
            pass
    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [0]
    for f in os.listdir(here):
        m = _re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _details_path() -> str:
    """Round-keyed diagnostics filename; on collision (a bench re-run
    after this round's details file already exists) append a sequence
    suffix instead of silently overwriting (ADVICE r6)."""
    here = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(here, f"bench_details_r{_next_round():02d}")
    path = base + ".json"
    seq = 1
    while os.path.exists(path):
        path = f"{base}.{seq}.json"
        seq += 1
    return path


# The driver records only the last 2000 chars of stdout; the summary
# line (printed last) must fit that window WHOLE or the round's perf
# record is lost (BENCH_r04: parsed:null). Margin for the trailing
# newline + any stray executor stderr interleaving.
TAIL_BUDGET = 1950  # driver window 2000; keep newline margin


def compose_summary_line(
    *,
    total: float,
    sf: float | str,
    timings: dict[str, float],
    calibration: dict,
    loadavg: dict,
    normalized_total: float | None = None,
) -> str:
    """Build the final stdout line: the driver-required envelope
    {"metric", "value", "unit", "queries", "sf"} plus as much
    diagnostic context (calibration, loadavg) as fits in TAIL_BUDGET.
    Optional fields are dropped in reverse-importance order; the
    envelope itself is never dropped (per-query timings are the
    round-over-round record the judge reads)."""
    required = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    norm_extra = (
        {} if normalized_total is None else {"normalized_total": normalized_total}
    )
    for extras in (
        {**norm_extra, "calibration": calibration, "loadavg_1m": loadavg},
        {**norm_extra, "calibration": calibration},
        norm_extra,
        {},
    ):
        # compact separators: ~2 chars per query entry, the margin
        # that keeps the grown headline set inside the driver window
        line = json.dumps({**required, **extras}, separators=(",", ":"))
        if len(line) <= TAIL_BUDGET:
            return line
    # Envelope alone exceeds the budget (would need ~45+ headline
    # queries): keep metric/value parseable and move per-query detail
    # to the diagnostics line's sibling field.
    return json.dumps(
        {k: v for k, v in required.items() if k != "queries"},
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_hiveorc_spark.registry import QUERIES
    from flink_hiveorc_spark.session import get_spark

    idle_wait_sec = _wait_for_idle()
    load_start = _loadavg()
    spark = get_spark("bench")
    # Warm-up: run every headline query once at a SMALLER sf (warms
    # JIT/codegen/reader code paths without caching benched data), so
    # timings reflect the steady-state cost of the PLAN rather than
    # one-time JVM compilation (cf. JMH warm-up iterations). Skipped
    # when the warm dir is missing or IS the benched dir.
    # Note: orc_roundtrip_counts' partitioned write is cached per
    # sf_dir (/tmp/fhs_warehouse), so its timing covers the read-back
    # + aggregate path.
    extra = {"sim_ivf_search_persisted": _make_ivf_search(spark, sf_dir)}

    def _fn(name):
        return extra.get(name) or QUERIES[name]

    warm = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm) and os.path.realpath(warm) != os.path.realpath(sf_dir):
        for name in HEADLINE:
            if name in extra:  # index is built against sf_dir, not the warm dir
                extra[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                QUERIES[name](spark, warm).write.format("noop").mode("overwrite").save()

    calib_before, cb_lo, cb_hi = _calibrate(spark)

    # median-of-3: each query runs three times and the MIDDLE run is
    # recorded — robust to one-off GC pauses / ambient host load in
    # either direction, without the optimistic bias of min-of-3
    # (VERDICT r2 #7: tpch_q5's +15% round-to-round wobble is exactly
    # the noise a median removes). The min is recorded alongside so a
    # noisy median is self-evident in the artifact.
    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    for name in HEADLINE:
        fn = _fn(name)
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        runs.sort()
        timings[name] = round(runs[1], 3)
        timings_min[name] = round(runs[0], 3)

    calib_after, ca_lo, ca_hi = _calibrate(spark)

    total = round(sum(timings.values()), 3)
    sf_str = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf: float | str = float(sf_str)
    except ValueError:
        sf = sf_str
    calibration = {
        "work": "range(3.2e9).sum((id*2654435761)%1000003), 32 splits, noop sink",
        "sec_before": calib_before,
        "sec_after": calib_after,
        "spread_before": [cb_lo, cb_hi],
        "spread_after": [ca_lo, ca_hi],
        "unit_work_multiple": _CALIB_UNIT,
    }
    loadavg = {"start": load_start, "end": _loadavg(), "idle_wait_sec": idle_wait_sec}
    # Calibration-NORMALIZED record (VERDICT r6 #1: r6's zero-code-change
    # round drifted a uniform 1.08-1.23x vs r5 while the calibration
    # probe drifted 1.17x in lockstep — host state, not plans; the probe
    # was measured but never USED). Each query's time is divided by the
    # before-run probe cost, yielding a host-independent "calibration
    # units" figure: round-over-round, a real plan regression moves the
    # normalized number while pure host drift cancels out. sec_before is
    # the divisor (taken closest to idle, before any query heat); a
    # sec_after >> sec_before run is flagged by the raw fields anyway.
    # Divided by _CALIB_UNIT so the r9+ longer probe reports in the
    # same normalized units as the r6-r8 artifacts.
    unit_cost = calib_before / _CALIB_UNIT
    norm = lambda t: round(t / unit_cost, 3) if unit_cost else None  # noqa: E731
    timings_norm = {name: norm(t) for name, t in timings.items()}
    diagnostics = {
        "record": "bench_diagnostics",
        "sf": sf,
        "queries_median": timings,
        "queries_min": timings_min,
        "queries_normalized": timings_norm,
        "total_median": total,
        "total_min": round(sum(timings_min.values()), 3),
        "normalized_total": norm(total),
        "normalized_total_min": norm(sum(timings_min.values())),
        "calibration": calibration,
        "loadavg_1m": loadavg,
    }
    # Full diagnostics go to a COMMITTED side file keyed by round
    # (VERDICT r5 #2: the diagnostics line printed to stdout was
    # truncated mid-map by the driver's 2000-char tail window, losing
    # 27 of 38 per-query min values — round-over-round min-vs-min
    # comparison needs a durable artifact, not a log tail).
    details_path = _details_path()
    try:
        with open(details_path, "w") as fh:
            json.dump(diagnostics, fh, indent=1)
            fh.write("\n")
    except OSError:  # pragma: no cover — read-only checkout: stdout still has it
        pass
    # Diagnostics line FIRST on stdout (may be truncated out of the
    # driver's bounded tail capture — fine, the side file is canonical),
    # compact summary line LAST so the tail always ends with a complete
    # parseable JSON object (VERDICT r4 #1: r4's single 2.4k-char line
    # overflowed the 2000-char tail window → parsed:null).
    print(json.dumps(diagnostics))
    print(
        compose_summary_line(
            total=total,
            sf=sf,
            timings=timings,
            calibration=calibration,
            loadavg=loadavg,
            normalized_total=diagnostics["normalized_total"],
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
