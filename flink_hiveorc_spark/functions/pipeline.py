"""Composite training-data pipeline (the L1-L4 operators chained):
quality-gate → language-gate → exact near-dedup → corpus stats.

This is the shape a real 100 TB pretraining-corpus job takes — each
stage is one of the already-oracle-checked operators, composed into a
single declarative plan so Catalyst fuses the scans/filters (one pass
over `documents` up to the dedup shuffle, which carries only
(norm-hash, doc_id) pairs — never text — thanks to the min-per-hash
keep rule).

Stages (thresholds match the standalone operator queries):
1. quality: n_words >= 20, stopword_ratio >= 0.01, punct_ratio < 0.2
   (functions/text.py:text_quality_score)
2. language: English-stopword-density heuristic keeps 'en'
   (functions/text.py:text_langid_heuristic)
3. dedup: case/whitespace-normalized md5, keep min doc_id per hash
   (functions/dedup.py:dedup_exact_normalized)
4. stats per source: surviving docs, BPE-ish tokens, avg chars
   (functions/text.py:text_token_count's tokenizer)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.functions.text import STOPWORDS
from flink_hiveorc_spark.registry import query


@query(
    "pipeline_clean_corpus",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, text,
             len(string_split_regex(text, '\\s+')) AS n_words,
             len(list_filter(string_split_regex(text, '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in','is','it'], w))) AS n_stop,
             length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE n_words >= 20
        AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
        AND CAST(n_punct AS DOUBLE) / n_chars < 0.2
        AND n_stop * 10 >= n_words
    ),
    deduped AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
             min(doc_id) AS doc_id
      FROM gated
      GROUP BY 1
    )
    SELECT g.source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(g.text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS n_tokens,
           CAST(sum(g.n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM deduped d JOIN gated g ON g.doc_id = d.doc_id
    GROUP BY g.source
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+L4 composite: the full corpus-cleaning pass, one plan."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace("text", r"[a-z0-9\s]", ""))
    n_chars = F.length("text")

    gated = d.select(
        "doc_id", "source", "text", n_words.alias("n_words"),
        n_stop.alias("n_stop"), n_punct.alias("n_punct"), n_chars.alias("n_chars"),
    ).filter(
        (F.col("n_words") >= 20)
        & (F.col("n_stop").cast("double") / F.col("n_words") >= 0.01)
        & (F.col("n_punct").cast("double") / F.col("n_chars") < 0.2)
        & (F.col("n_stop") * 10 >= F.col("n_words"))  # lang gate: 'en'
    )
    norm_hash = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    keep = (
        gated.select(norm_hash.alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = keep.join(gated, on="doc_id")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])")))
    return survivors.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "pipeline_clean_corpus_v2",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, text,
             len(string_split_regex(text, '\\s+')) AS n_words,
             len(list_filter(string_split_regex(text, '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in','is','it'], w))) AS n_stop,
             length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents
    ),
    gated AS (
      SELECT * FROM scored
      WHERE n_words >= 20
        AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
        AND CAST(n_punct AS DOUBLE) / n_chars < 0.2
        AND n_stop * 10 >= n_words
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w
            FROM documents)
      WHERE len(w) >= 2
    ),
    gcount AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
    rep_ok AS (
      SELECT doc_id FROM gcount GROUP BY doc_id
      HAVING 1.0 - CAST(count(*) AS DOUBLE) / sum(cnt) <= 0.3
         AND CAST(max(cnt) AS DOUBLE) / sum(cnt) <= 0.1
    ),
    survivors0 AS (
      SELECT g.* FROM gated g JOIN rep_ok r ON g.doc_id = r.doc_id
    ),
    deduped AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
             min(doc_id) AS doc_id
      FROM survivors0
      GROUP BY 1
    )
    SELECT g.source,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(g.text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS n_tokens,
           CAST(sum(g.n_chars) AS DOUBLE) / count(*) AS avg_chars
    FROM deduped d JOIN survivors0 g ON g.doc_id = d.doc_id
    GROUP BY g.source
    """,
)
def pipeline_clean_corpus_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1+L4 composite v2: quality → language → REPETITION gate
    (the Gopher-family dup-2gram / top-2gram thresholds from
    text_repetition_signals, reused as a semi-join) → normalized
    exact dedup → per-source stats. Relative to v1 the repetition
    stage adds exactly one doc_id-keyed aggregate: the gram explosion
    collapses back to (doc_id, pass) before touching the main
    pipeline, so corpus text still flows through a single scan-gate
    path and only ids ride the extra shuffle."""
    from flink_hiveorc_spark.functions.text import text_repetition_signals

    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace("text", r"[a-z0-9\s]", ""))
    n_chars = F.length("text")

    gated = d.select(
        "doc_id", "source", "text", n_words.alias("n_words"),
        n_stop.alias("n_stop"), n_punct.alias("n_punct"), n_chars.alias("n_chars"),
    ).filter(
        (F.col("n_words") >= 20)
        & (F.col("n_stop").cast("double") / F.col("n_words") >= 0.01)
        & (F.col("n_punct").cast("double") / F.col("n_chars") < 0.2)
        & (F.col("n_stop") * 10 >= F.col("n_words"))  # lang gate: 'en'
    )
    rep_ok = (
        text_repetition_signals(spark, sf_dir)
        .filter(F.col("passes_repetition") == 1)
        .select("doc_id")
    )
    survivors0 = gated.join(rep_ok, "doc_id", "left_semi")
    norm_hash = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    keep = (
        survivors0.select(norm_hash.alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    survivors = keep.join(survivors0, on="doc_id")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])")))
    return survivors.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


@query(
    "sample_weighted_mixture",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source, text,
             CASE TRY_CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) % 4
               WHEN 0 THEN 100 WHEN 1 THEN 60 WHEN 2 THEN 30 ELSE 10
             END AS rate_pct,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents
    )
    SELECT source,
           max(rate_pct) AS rate_pct,
           count(*) AS n_docs,
           count(CASE WHEN bucket < rate_pct THEN 1 END) AS n_sampled,
           CAST(sum(CASE WHEN bucket < rate_pct
                    THEN len(string_split_regex(text, '\\s+')) END) AS BIGINT)
             AS sampled_tokens
    FROM rated
    GROUP BY source
    """,
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4j: deterministic per-source mixture sampling — the data-
    mixture step of a pretraining pipeline (oversample curated
    sources, downsample bulk web). Each source gets a retention rate
    (here derived from the source id; in production a broadcast
    config table) and each document is kept iff its md5 key-bucket
    falls under the rate.

    Why hash-gated, not df.sample(): reproducible across runs,
    engines, and repartitioning; a document's fate is a pure function
    of its id, so incremental reruns over a grown corpus keep
    previous decisions (critical when a 100 TB corpus is sampled
    incrementally); and rates are exact in expectation per source
    with no RNG-state coordination across 1000 executors. Map-only
    until the per-source count aggregate — one scan, one tiny
    shuffle of (source, counts) partials."""
    return weighted_mixture_stats(load_table(spark, sf_dir, "documents"))


def weighted_mixture_stats(d: DataFrame) -> DataFrame:
    """Reusable core of sample_weighted_mixture over any (doc_id,
    source, text) frame — separated for property tests
    (tests/test_properties.py drives it with generated corpora
    against a hashlib model)."""
    rate = (
        F.when(F.regexp_extract("source", r"src(\d+)", 1).cast("bigint") % 4 == 0, 100)
        .when(F.regexp_extract("source", r"src(\d+)", 1).cast("bigint") % 4 == 1, 60)
        .when(F.regexp_extract("source", r"src(\d+)", 1).cast("bigint") % 4 == 2, 30)
        .otherwise(10)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint")
        % 100
    )
    sampled = F.col("bucket") < F.col("rate_pct")
    return (
        d.select(
            "doc_id",
            "source",
            "text",
            rate.alias("rate_pct"),
            bucket.alias("bucket"),
        )
        .groupBy("source")
        .agg(
            F.max("rate_pct").alias("rate_pct"),
            F.count("*").alias("n_docs"),
            F.count(F.when(sampled, 1)).alias("n_sampled"),
            F.sum(F.when(sampled, F.size(F.split("text", r"\s+")))).alias("sampled_tokens"),
        )
    )


_PER_SOURCE_CAP = 15


@query(
    "sample_per_source_cap",
    oracle=f"""
    SELECT source, doc_id, n_chars, rnk
    FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rnk
      FROM documents
    )
    WHERE rnk <= {_PER_SOURCE_CAP}
    """,
)
def sample_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4k: per-source document cap — keep at most N documents per
    source, best-first (here: longest; in production: a quality
    score). The per-domain quota step of web-corpus curation: without
    it the head domains dominate the mixture no matter what the
    sampling rates say.

    Scale: rank-within-group + filter plans a WindowGroupLimit in
    Spark ≥3.5 — each shuffle partition keeps only its top-N per
    group BEFORE the final sort, so the shuffle carries O(sources·N)
    rows, not the corpus. Deterministic: (n_chars DESC, doc_id)
    total order."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= _PER_SOURCE_CAP)
    )


@query(
    "pipeline_stratified_split",
    oracle="""
    WITH tagged AS (
      SELECT lang, source,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split'), 1, 8))
                  AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT lang, source,
           CASE WHEN bucket < 98 THEN 'train'
                WHEN bucket < 99 THEN 'val' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM tagged
    GROUP BY 1, 2, 3
    """,
)
def pipeline_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4l: deterministic train/val/test split (98/1/1) stratified by
    (lang, source) — the holdout-carving step of a pretraining
    pipeline. Same hash-gated discipline as sample_weighted_mixture
    (a document's split is a pure function of its id: stable across
    runs, engines, repartitioning, and incremental corpus growth) but
    keyed on a SALTED hash (`doc_id || '|split'`) so split membership
    is statistically independent of the mixture-sampling bucket —
    reusing one hash for both decisions would systematically place
    sampled-out documents in a non-random subset of the holdout.

    Scale: map-only scan (hash, bucket, tokenize once per doc) into a
    (lang, source, split) hash aggregate — one tiny shuffle of
    partials; no window, no join."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|split"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 98, "train").when(bucket < 99, "val").otherwise("test")
    )
    return (
        d.select(
            "lang",
            "source",
            split.alias("split"),
            F.size(F.split("text", r"\s+")).alias("n_tokens"),
        )
        .groupBy("lang", "source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@query(
    "pipeline_source_temperature_weights",
    oracle="""
    WITH per_source AS (
      SELECT source,
             CAST(sum(len(string_split_regex(text, '\\s+'))) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    ),
    units AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS w_units
      FROM per_source
    )
    SELECT source, n_tokens,
           CAST(w_units AS DOUBLE) / CAST(sum(w_units) OVER () AS DOUBLE) AS weight_frac
    FROM units
    """,
)
def pipeline_source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4m: temperature-scaled source mixture weights — w_s ∝
    (tokens_s)^(1/T) with T=2, the standard flattening that keeps
    head sources from dominating a multi-source corpus in proportion
    to their raw size (multilingual/multi-domain sampling à la the
    published temperature-sampling recipes). Exponent fixed at 1/2
    because IEEE sqrt is correctly rounded in both engines — pow()
    with an arbitrary exponent is libm-dependent and would break
    bit-equality of the oracle comparison. Each sqrt is quantized to
    integer micro-units BEFORE normalization: a float sum over the
    sources is order-dependent (observed 1e-17 drift between
    engines), an integer sum is not — the BIGINT-moments discipline
    from agg_corr_regr_battery applied to weights.

    Scale: one corpus scan into a per-source token aggregate
    (map-side combined); the normalization window runs over the
    ~|sources| aggregated rows — a single-partition exchange of a few
    dozen rows, not a corpus shuffle."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", r"\s+"))).alias("n_tokens")
    )
    w_units = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000).cast("bigint")
    w_all = Window.partitionBy()
    return per_source.select(
        "source",
        "n_tokens",
        w_units.alias("w_units"),
    ).select(
        "source",
        "n_tokens",
        (F.col("w_units").cast("double") / F.sum("w_units").over(w_all).cast("double")).alias(
            "weight_frac"
        ),
    )


_QUALITY_KEEP_PCT = 0.75  # keep documents at or above their source's p75


@query(
    "text_quality_quantile_filter",
    oracle=f"""
    WITH vc AS (
      SELECT source, n_chars, count(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    thr AS (
      SELECT source,
             min(CASE WHEN cum >= CAST(ceil({_QUALITY_KEEP_PCT} * n) AS BIGINT)
                 THEN n_chars END) AS threshold_chars
      FROM (
        SELECT source, n_chars, c,
               sum(c) OVER (PARTITION BY source ORDER BY n_chars
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM vc
      )
      GROUP BY source
    )
    SELECT vc.source,
           max(thr.threshold_chars) AS threshold_chars,
           CAST(sum(vc.c) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN vc.n_chars >= thr.threshold_chars
                    THEN vc.c ELSE 0 END) AS BIGINT) AS n_kept
    FROM vc JOIN thr ON vc.source = thr.source
    GROUP BY vc.source
    """,
)
def text_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3f: per-source quantile quality gate — each source keeps only
    its documents at or above the source's own p75 length (n_chars as
    the quality proxy; in production a learned score column). ADAPTIVE
    thresholds are the point: a fixed global cutoff either guts short-
    form sources or lets verbose boilerplate through; per-source
    quantiles normalize for the source's native length distribution.

    Integer-exact percentile via the value-count + cumulative-count
    pattern (same as agg_mad_outliers' median): threshold = smallest
    n_chars whose cumulative count reaches ceil(p·n) — no float
    interpolation, bit-equal across engines.

    Scale: the corpus compresses to (source, n_chars) value counts
    FIRST (hash agg, map-side combined), so the percentile window and
    the threshold join run over ~|sources|·|distinct lengths| rows,
    never documents. Threshold frame is broadcast; counting kept docs
    reuses the value counts — one corpus scan total."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    vc = d.groupBy("source", "n_chars").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = vc.select(
        "source",
        "n_chars",
        "c",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    thr = ranked.groupBy("source").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(_QUALITY_KEEP_PCT) * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias("threshold_chars")
    )
    return (
        vc.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.max("threshold_chars").alias("threshold_chars"),
            F.sum("c").alias("n_docs"),
            F.sum(
                F.when(F.col("n_chars") >= F.col("threshold_chars"), F.col("c")).otherwise(0)
            ).alias("n_kept"),
        )
    )


@query(
    "pipeline_observed_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars >= 120 AND lang IN ('en', 'de')
    """,
)
def pipeline_observed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational parity (§4/metrics): the filter stage instrumented
    with OBSERVED METRICS — Spark's `observe()` accumulators are the
    engine twin of the reference framework's runtime metric counters
    (Flink operators expose records-in/records-out/filtered-rate the
    same way): input rows, kept rows, and null-text count ride the
    SAME job as the query, costing one accumulator update per row —
    no second scan, no driver-side recount.

    The returned frame is the filtered corpus (value-oracled like any
    query); the metrics land in the query listener / Observation
    handle, asserted equal to independently-computed counts in
    tests/test_r5c_operators.py. At 100 TB this is how a pipeline
    reports selectivity and DQ counters without doubling its I/O."""
    d = load_table(spark, sf_dir, "documents")
    kept = F.col("n_chars") >= 120
    langs = F.col("lang").isin("en", "de")
    return (
        d.observe(
            "pipeline_observed_filter_metrics",
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((kept & langs).cast("long")).alias("rows_kept"),
            F.sum(F.col("text").isNull().cast("long")).alias("null_texts"),
        )
        .filter(kept & langs)
        .select("doc_id", "lang", "source", "n_chars")
    )


@query(
    "curation_priority_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(least(n_chars, 32767) * 281474976710656 //
                  (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                        AS BIGINT) + 1) AS BIGINT) AS priority
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, priority
    FROM keyed
    ORDER BY priority DESC, doc_id
    LIMIT 200
    """,
)
def curation_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6e: weighted sampling WITHOUT replacement via priority
    sampling (Duffield/Lund/Thorup): each document gets priority
    w/u with weight w = n_chars and u a uniform derived from a salt
    of the document's own id; the k highest priorities are the
    sample. Inclusion probability is proportional to weight in
    expectation — the standard way a mixing pipeline takes a
    quality- or length-weighted subsample reproducibly.

    EXACT integer arithmetic end to end (cross-engine hash-stable):
    u = first 48 md5 bits of the doc_id string + 1 (never zero), and
    priority = (w << 48) div u — no ln/pow float keys (the
    Efraimidis-Spirakis u^(1/w) formulation is order-equivalent but
    a last-ulp float divergence could flip the k-th boundary between
    engines). The weight caps at 32767 so w·2^48 < 2^63 for ANY
    document (a megabyte doc would otherwise overflow int64 —
    silently wrapping in Spark, erroring in DuckDB). Ties broken by
    doc_id.

    Scale: one map to compute priorities, then a global top-k —
    Spark plans orderBy+limit as TakeOrdered (per-partition heap of
    k, single O(k) merge at the driver), no full sort, no shuffle of
    the corpus. Deterministic under any partitioning (2-cpu gate)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        ).cast("bigint")
        + F.lit(1).cast("bigint")
    )
    keyed = d.select(
        "doc_id", "lang", "source", "n_chars", u.alias("u")
    ).withColumn(
        # weight capped at 32767: w·2^48 must stay under 2^63 — a
        # megabyte document would otherwise overflow int64 (silently
        # wrapping in Spark, erroring in the oracle engine); beyond
        # ~32 KB the length signal is saturated anyway
        "priority",
        F.expr("least(n_chars, 32767) * 281474976710656 div u").cast("bigint"),
    )
    return (
        keyed.orderBy(F.col("priority").desc(), "doc_id")
        .limit(200)
        .select("doc_id", "lang", "source", "n_chars", "priority")
    )


# ----------------------------------------------------------------------
# Context-window chunking (r12): split documents into fixed-size token
# windows with overlap — the pretraining-prep step between cleaning and
# tokenization (every LM pipeline packs long documents into
# sequence-length windows; stride < window keeps boundary context).

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def chunk_token_windows(
    docs: DataFrame, window: int = CHUNK_WINDOW, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """(doc_id, text) -> (doc_id, chunk_idx, start_pos, n_tokens,
    chunk_text): whitespace-token windows of exactly `window` tokens
    at `stride` steps, plus a clamped tail window ending at the last
    token when the stride does not land there exactly (deduplicated
    when it does); documents at or under `window` tokens yield one
    whole-document chunk. Map-side only until the final per-doc
    window numbering (bounded by chunks-per-doc) — no corpus-sized
    shuffle. start_pos is 1-based."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = docs.select("doc_id", F.split("text", " ").alias("w"))
    starts = F.expr(
        f"CASE WHEN size(w) <= {window} THEN array(1) "
        f"ELSE array_distinct(concat("
        f"  transform(sequence(0, (size(w) - {window}) div {stride}),"
        f"            k -> 1 + k * {stride}),"
        f"  array(size(w) - {window} + 1))) END"
    )
    exploded = toks.select(
        "doc_id", "w", F.posexplode(starts).alias("chunk_idx", "start_pos")
    )
    # the starts array ascends (regular grid + clamped tail), so the
    # posexplode index IS the chunk index — assert via a window-free
    # projection; n_tokens is `window` except for short docs
    n_tok = F.least(F.lit(window), F.size("w"))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_pos").cast("long").alias("start_pos"),
        n_tok.cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("w"), F.col("start_pos"), n_tok), " "
        ).alias("chunk_text"),
    )


@query(
    "pipeline_chunk_token_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    s AS (
      SELECT doc_id, 1 + k * {CHUNK_STRIDE} AS start_pos
      FROM t, UNNEST(range(0,
           (len(w) - {CHUNK_WINDOW}) // {CHUNK_STRIDE} + 1)) AS r(k)
      WHERE len(w) > {CHUNK_WINDOW}
      UNION
      SELECT doc_id, len(w) - {CHUNK_WINDOW} + 1 FROM t
      WHERE len(w) > {CHUNK_WINDOW}
      UNION
      SELECT doc_id, 1 FROM t WHERE len(w) <= {CHUNK_WINDOW}
    )
    SELECT s.doc_id,
           CAST(row_number() OVER (PARTITION BY s.doc_id
                                   ORDER BY s.start_pos) - 1
                AS BIGINT) AS chunk_idx,
           CAST(s.start_pos AS BIGINT) AS start_pos,
           CAST(least({CHUNK_WINDOW}, len(t.w)) AS BIGINT) AS n_tokens,
           array_to_string(
             t.w[s.start_pos :
                 s.start_pos + least({CHUNK_WINDOW}, len(t.w)) - 1],
             ' ') AS chunk_text
    FROM s JOIN t ON t.doc_id = s.doc_id
    """,
)
def pipeline_chunk_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking over the documents table: 32-token
    windows at stride 24 (8-token overlap) with a clamped tail — see
    chunk_token_windows. The value hash covers every chunk's exact
    text, start, and numbering, so an off-by-one in the stride grid,
    tail clamp, dedup, or slice bounds flips it."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_token_windows(docs)


# ----------------------------------------------------------------------
# Corpus snapshot diff (r12): the incremental-refresh primitive — what
# changed between two corpus versions, by content hash. Drives delta
# re-tokenization (only 'added'/'modified' docs re-enter the pipeline)
# and retention audits.


def corpus_snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, text) x2 -> (doc_id, change, old_hash, new_hash) with
    change in {'added', 'removed', 'modified'}; unchanged documents
    (same md5) emit nothing. One full-outer join on doc_id over
    pre-hashed projections — at 100 TB both sides carry only
    (doc_id, 32-byte hash) into the shuffle, never the text."""
    oh = old.select(
        F.col("doc_id"), F.md5("text").alias("old_hash")
    )
    nh = new.select(
        F.col("doc_id"), F.md5("text").alias("new_hash")
    )
    j = oh.join(nh, "doc_id", "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("modified"))
    )
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select("doc_id", "change", "old_hash", "new_hash")
    )


@query(
    "pipeline_corpus_snapshot_diff",
    oracle="""
    WITH old AS (SELECT doc_id, text FROM documents),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 3 THEN text || ' [edited]'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 5
      UNION ALL
      SELECT doc_id + 1000000, 'new doc ' || CAST(doc_id AS VARCHAR)
      FROM documents WHERE doc_id % 11 = 0
    ),
    oh AS (SELECT doc_id, md5(text) AS old_hash FROM old),
    nh AS (SELECT doc_id, md5(text) AS new_hash FROM new)
    SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id,
           CASE WHEN oh.doc_id IS NULL THEN 'added'
                WHEN nh.doc_id IS NULL THEN 'removed'
                ELSE 'modified' END AS change,
           oh.old_hash, nh.new_hash
    FROM oh FULL OUTER JOIN nh ON nh.doc_id = oh.doc_id
    WHERE oh.doc_id IS NULL OR nh.doc_id IS NULL
       OR oh.old_hash <> nh.new_hash
    """,
)
def pipeline_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between the documents table and a derived 'v2'
    (doc_id % 7 == 3 edited, % 7 == 5 dropped, one synthetic new doc
    per % 11 == 0) — the three change classes and the
    unchanged-silence property all under the value oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edited = docs.where(F.col("doc_id") % 7 != 5).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 3, F.concat("text", F.lit(" [edited]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("doc_id").cast("string")).alias(
            "text"
        ),
    )
    return corpus_snapshot_diff(docs, edited.unionByName(added))
