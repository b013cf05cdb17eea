"""Plan-shape pins for the round-15 optimization work.

These fail on the specific regressions the optimization round fixed,
even when answers stay correct (the oracle can't see plan shape):

- pipeline_robots_filter used to carry NINE copies of the robots
  fold (Catalyst inlines the shared ``F.aggregate`` subtree into
  every consumer CASE branch when the fold is composed inline); the
  fix materializes it once through a projection boundary.
- The heavy per-row stages of several queries ran on the
  single-row-group scan's one task; the fix is a round-robin fan-out
  whose presence (and the guide §2.5 scale-adaptive floor) these
  tests pin.
- pipeline_jsonl_gz_ingest's 42-position CRC payload tree is built
  once per process (memo_constant_column) — ~250 py4j calls per
  build otherwise, paid by every invocation.
"""

from __future__ import annotations

from flink_hiveorc_spark.registry import QUERIES


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_robots_filter_folds_once(spark, sf_dir):
    """Exactly ONE robots fold in the executed plan — the 9×
    duplication class (inline composition of robots_rules +
    robots_crawl_delay) must not come back.

    Rendered with maxToStringFields raised (ADVICE r15): the default
    (25) elides long expression lists from the plan string, which
    could silently hide duplicated fold copies and mask a regression
    back to the 9×-fold plan."""
    prev = spark.conf.get("spark.sql.debug.maxToStringFields", None)
    spark.conf.set("spark.sql.debug.maxToStringFields", 100000)
    try:
        plan = _executed_plan(
            QUERIES["pipeline_robots_filter"](spark, sf_dir)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.debug.maxToStringFields")
        else:
            spark.conf.set("spark.sql.debug.maxToStringFields", prev)
    assert plan.count("aggregate(") == 1, plan


def test_fanout_present_on_heavy_single_task_stages(spark, sf_dir):
    """The round-robin fan-out exchanges pinned in place for the
    queries whose per-row work used to run on one task. At real
    scale parallelize_small_scan is a no-op, but these queries use
    an unconditional repartition (interval overlap's probe side) or
    a helper call on a narrow scan — on the single-file test corpus
    both must materialize as ROUNDROBIN exchanges."""
    for name in (
        "join_interval_overlap",
        "agg_poisson_bootstrap_ci",
        "pipeline_jsonl_gz_ingest",
        "dedup_prefix_filter_jaccard",
    ):
        plan = _executed_plan(QUERIES[name](spark, sf_dir))
        assert "ROUNDROBIN" in plan.upper(), (name, plan)


def test_jsonl_payload_tree_is_memoized(spark):
    """_jsonl_gz_payload returns the SAME JVM expression tree across
    calls within one process (plan-text memoization, never results)."""
    from flink_hiveorc_spark.functions.archive import _jsonl_gz_payload

    a = _jsonl_gz_payload()
    b = _jsonl_gz_payload()
    assert a._jc.equals(b._jc)


def test_fanout_floor_tracks_default_parallelism(spark, sf_dir):
    """The fan-out width is sparkContext.defaultParallelism (the
    session's core count), not a hard-coded constant — the driver's
    lower-core bench runs must adapt (round rule: nothing tuned to
    local[32])."""
    from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan

    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    assert (
        d.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_exact_substring_builds_grams_once(spark, sf_dir):
    """r16: the dup-gram front half is a count(*) window over ONE
    bucket of gram occurrences — the old groupBy+join-back shape
    re-ran the tokenize+posexplode lineage per consumer (two Generate
    nodes) and broadcast a corpus-sized dup set at 16x. Pin: exactly
    one Generate (the posexplode) in spans' executed plan, and no
    join nodes at all."""
    plan = _executed_plan(
        QUERIES["dedup_exact_substring_spans"](spark, sf_dir)
    )
    assert plan.count("Generate ") == 1, plan
    assert "Join" not in plan, plan


def test_exact_substring_clean_never_explodes_tokens(spark, sf_dir):
    """r16: the cleaned-corpus side reconstructs documents with array
    higher-order functions against the per-doc collected span list —
    token rows are never exploded, anti-joined, or re-aggregated. Pin:
    exactly ONE Generate (the gram posexplode) in the executed plan."""
    plan = _executed_plan(
        QUERIES["dedup_exact_substring_clean"](spark, sf_dir)
    )
    assert plan.count("Generate ") == 1, plan


def test_boilerplate_ngrams_builds_grams_once(spark, sf_dir):
    """r16: pass-1's bucket distinct-doc count runs as dense_rank/max
    windows over the same exchange pass 2 consumes — one gram build
    (one Generate), no broadcast bucket list, no join."""
    plan = _executed_plan(
        QUERIES["text_boilerplate_ngrams"](spark, sf_dir)
    )
    assert plan.count("Generate ") == 1, plan
    assert "Join" not in plan, plan


def test_fixture_encoder_queries_fuse_python_passes(spark, sf_dir):
    """r16: the fixture-encoder extraction queries (office/CFB/EPUB/
    RTF) run encode → parse as ONE fused mapInPandas — the former
    two-stage chain shipped every payload JVM→Python twice (guide
    §4). Pin: exactly one MapInPandas node per executed plan."""
    for name in (
        "text_office_extract",
        "text_legacy_office_extract",
        "text_epub_extract",
        "text_rtf_extract",
    ):
        plan = _executed_plan(QUERIES[name](spark, sf_dir))
        assert plan.count("MapInPandas") == 1, (name, plan)


def test_codegen_overflow_queries_stay_compact(spark, sf_dir):
    """r16: multimodal_flac_decode_stats and pipeline_jsonl_gz_ingest
    used to carry expression trees so large the whole-stage Java
    exceeded janino's 64 KB method limit and the stage silently ran
    INTERPRETED (plus a multi-second failed compile attempt per
    process). The flac payload now builds inside the fused Python
    decode pass; jsonl's 42-step CRC XOR chain is a data-driven
    aggregate fold. Pin: the formatted plans stay orders of magnitude
    below the old 100 KB+ trees (flac was 102 KB, jsonl 370 KB), the
    flac plan is a single fused Python pass, and the jsonl plan
    carries the fold."""
    flac = _executed_plan(
        QUERIES["multimodal_flac_decode_stats"](spark, sf_dir)
    )
    assert flac.count("MapInPandas") == 1, flac
    assert len(flac) < 20000, len(flac)
    jsonl = _executed_plan(
        QUERIES["pipeline_jsonl_gz_ingest"](spark, sf_dir)
    )
    assert "aggregate(" in jsonl, jsonl
    assert len(jsonl) < 40000, len(jsonl)
