"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10 L4):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in expressions (codegen'd, no UDFs) —
at 100 TB these run at scan speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_ish_tokens,
           length(text) AS n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, word tokens, and a BPE-ish
    regex segmentation (words | digit runs | single punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("([a-z]+)"))).alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"))).alias(
            "n_bpe_ish_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


@query(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           n_words,
           CAST(n_chars AS DOUBLE) / n_words AS avg_word_len,
           CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CASE WHEN n_words >= 20
                 AND CAST(n_stop AS DOUBLE) / n_words >= 0.01
                 AND CAST(n_punct AS DOUBLE) / n_chars < 0.2
                THEN 1 ELSE 0 END AS passes_quality
    FROM (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split_regex(text, '\\s+')) AS n_words,
             len(list_filter(string_split_regex(text, '\\s+'),
                 w -> list_contains(['the','a','of','and','to','in','is','it'], w))) AS n_stop,
             length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS n_punct
      FROM documents
    )
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword / punctuation heuristics with
    a pass/fail gate — the C4/Gopher-style filter shape, as pure SQL
    expressions (ratios are exact-int divisions → engine-identical)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    n_chars = F.length("text")
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_punct = F.length(F.regexp_replace("text", r"[a-z0-9\s]", ""))
    stop_ratio = n_stop.cast("double") / n_words
    punct_ratio = n_punct.cast("double") / n_chars
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        F.when((n_words >= 20) & (stop_ratio >= 0.01) & (punct_ratio < 0.2), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


@query(
    "text_langid_heuristic",
    oracle="""
    SELECT doc_id,
           lang AS labeled_lang,
           CASE WHEN len(list_filter(string_split_regex(text, '\\s+'),
                     w -> list_contains(['the','a','of','and','to','in','is','it'], w)))
                     * 10 >= len(string_split_regex(text, '\\s+'))
                THEN 'en'
                WHEN length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) > 0
                THEN 'non_latin'
                ELSE 'latin_other' END AS predicted_lang
    FROM documents
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: English-stopword density ≥ 10% → 'en';
    any non-ASCII characters → 'non_latin'; else 'latin_other'.
    (A real n-gram model plugs into the same shape; the point is the
    operator: per-doc classification at scan speed, no UDF.)"""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    n_words = F.size(words)
    n_non_ascii = F.length(F.regexp_replace("text", r"[\x00-\x7F]", ""))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(n_stop * 10 >= n_words, "en")
        .when(n_non_ascii > 0, "non_latin")
        .otherwise("latin_other")
        .alias("predicted_lang"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(lower(text), '\\s+'))), ' ')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (catches bag-of-words permuted duplicates that
    exact hashing misses). Deterministic across engines: md5 + byte-
    wise string sort."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_sort(F.array_distinct(F.split(F.lower("text"), r"\s+")))
    return d.select("doc_id", F.md5(F.array_join(toks, " ")).alias("fingerprint"))


@query(
    "text_repetition_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                    i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM t WHERE len(w) >= 2
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram)
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_2grams,
           1.0 - CAST(count(*) AS DOUBLE) / sum(cnt) AS frac_dup_2gram,
           CAST(max(cnt) AS DOUBLE) / sum(cnt) AS top_2gram_frac,
           CASE WHEN 1.0 - CAST(count(*) AS DOUBLE) / sum(cnt) <= 0.3
                 AND CAST(max(cnt) AS DOUBLE) / sum(cnt) <= 0.1
                THEN 1 ELSE 0 END AS passes_repetition
    FROM c GROUP BY doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: fraction of duplicate word
    2-grams and the share of the single most-frequent 2-gram —
    the signals that catch boilerplate/spam docs that length and
    punctuation ratios miss (Rae et al. 2021 §A1.1 use exactly this
    family: dup-n-gram fraction + top-n-gram share thresholds).

    One explode → (doc, gram) count → per-doc rollup: a single
    shuffle keyed by doc_id, no UDF, ratios are exact-int divisions.
    Docs with <2 words have no 2-grams and drop out (both engines)."""
    # Materialize the words array in its own projection: referencing
    # split() inside the lambda re-splits the text per gram position
    # (O(words²) per doc — same trap _shingle_docs documents; 6.6s →
    # 0.5s at sf0.1 for this two-line change).
    wd = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", F.split(F.lower("text"), r"\s+").alias("w"))
    words = F.col("w")
    n = F.size(words)
    grams = F.when(
        n >= 2,
        # sequence(1, n-1) would count DOWN for n<2 (Spark descends
        # when stop<start) — hence the guard.
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        wd.select("doc_id", F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    total = F.sum("cnt")
    distinct = F.count("*")
    top = F.max("cnt")
    frac_dup = F.lit(1.0) - distinct.cast("double") / total
    top_frac = top.cast("double") / total
    return per_gram.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_2grams"),
        frac_dup.alias("frac_dup_2gram"),
        top_frac.alias("top_2gram_frac"),
        F.when((frac_dup <= 0.3) & (top_frac <= 0.1), 1)
        .otherwise(0)
        .alias("passes_repetition"),
    )


@query(
    "text_contamination_eval_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents
    ),
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(generate_series(1, len(w) - 4),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                         || ' ' || w[i+4]))) AS gram
      FROM t WHERE len(w) >= 5
    ),
    ev AS (SELECT doc_id AS eval_doc_id, gram FROM g WHERE doc_id % 50 = 0),
    co AS (SELECT doc_id AS corpus_doc_id, gram FROM g WHERE doc_id % 50 <> 0)
    SELECT co.corpus_doc_id, ev.eval_doc_id,
           count(*) AS n_shared_5grams
    FROM co JOIN ev ON co.gram = ev.gram
    GROUP BY co.corpus_doc_id, ev.eval_doc_id
    """,
)
def text_contamination_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: distinct word-5-gram overlap
    between the corpus and a held-out eval set (docs with
    doc_id % 50 == 0 stand in for the benchmark). The shape every
    decontamination pass takes (GPT-3 appendix C / PaLM use 8-13-gram
    collision): explode BOTH sides to distinct n-grams, equi-join on
    the gram, count collisions per (corpus_doc, eval_doc).

    Scale posture: the eval side is tiny (benchmarks are ~10^5 grams)
    → broadcast, so the 100 TB corpus is ONE scan + map-side join, no
    corpus shuffle; the per-pair count aggregates the (rare) hits."""
    # Words materialized in their own projection (see
    # text_repetition_signals: in-lambda split() re-splits per gram
    # position; 15.9s → ~0.6s at sf0.1 here — 5 element_at calls per
    # position quintuple the blowup).
    wd = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", F.split(F.lower("text"), r"\s+").alias("w"))
    words = F.col("w")
    n = F.size(words)
    grams = F.when(
        n >= 5,
        F.transform(
            F.sequence(F.lit(1), n - 4),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
                F.element_at(words, i + 3),
                F.element_at(words, i + 4),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = wd.select(
        "doc_id", F.explode_outer(F.array_distinct(grams)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    ev = exploded.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "gram"
    )
    co = exploded.filter(F.col("doc_id") % 50 != 0).select(
        F.col("doc_id").alias("corpus_doc_id"), "gram"
    )
    return (
        co.join(F.broadcast(ev), "gram")
        .groupBy("corpus_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_5grams"))
    )


@query(
    "text_pii_redact",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             AS pii_text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(pii_text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(pii_text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(pii_text,
               '\\+?[0-9][0-9-]{6,}[0-9]')) AS BIGINT) AS n_phones
    FROM p
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email and phone-number redaction plus per-doc
    redaction counts. The corpus is synthetic (no real PII), so the
    query plants one deterministic email + phone per doc and proves
    the scrubber finds exactly those — the patterns are chosen to
    mean the same thing in Java regex (Spark) and RE2 (DuckDB):
    character classes and bounded repetition only, no lookaround."""
    d = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    phone_re = r"\+?[0-9][0-9-]{6,}[0-9]"
    redacted = F.regexp_replace(
        F.regexp_replace(pii_text, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(pii_text, F.lit(email_re)).cast("bigint").alias("n_emails"),
        F.regexp_count(pii_text, F.lit(phone_re)).cast("bigint").alias("n_phones"),
    )


@query(
    "text_fuzzy_name_pairs",
    oracle="""
    SELECT a.p_partkey AS part_a,
           b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a
    JOIN part b
      ON a.p_brand = b.p_brand
     AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 8
    """,
)
def text_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-adjacent fuzzy matching: edit-distance pairs BLOCKED on
    (brand, size) — the blocked-join shape every fuzzy dedup takes at
    scale (levenshtein is O(len²) per pair, so never all-pairs: block
    first on cheap equality keys, verify distance inside blocks only).
    """
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 8)
    )


@query(
    "text_lexical_diversity",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
      FROM documents
    ),
    counts AS (
      SELECT doc_id, w, count(*) AS c
      FROM words WHERE w <> '' GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           count(*) AS n_types,
           CAST(sum(c * c) AS BIGINT) AS collision_index,
           CAST(max(c) AS BIGINT) AS max_freq,
           CAST(count(*) AS DOUBLE) / sum(c) AS type_token_ratio
    FROM counts
    GROUP BY doc_id
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4i: integer-exact lexical-diversity signals per document —
    type count, type/token ratio, collision index Σc² (the integer
    Simpson/repeat-mass statistic: high = a few words dominate), max
    single-word frequency. The FP-safe stand-in for word-entropy
    filters (entropy's per-term c·ln c sums are float-order-dependent
    across engines; Σc² ranks documents the same way and is exact).

    Scale: explode → two hash aggregates keyed by (doc_id, word) then
    doc_id — partial aggregation absorbs the explosion map-side; no
    word-level shuffle of text beyond the (doc_id, word) pairs. The
    final ratio is one double division of exact integers."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("collision_index"),
        F.max("c").alias("max_freq"),
        (F.count("*").cast("double") / F.sum("c")).alias("type_token_ratio"),
    )


_FAMILIAR_MIN_DF = 3  # bigram must appear in >= this many OTHER docs


@query(
    "text_bigram_familiarity",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, UNNEST(range(1, len(ws))) AS t(i)
    ),
    df AS (
      SELECT bigram, count(DISTINCT doc_id) AS n_docs FROM bg GROUP BY bigram
    )
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           count(CASE WHEN df.n_docs - 1 >= {_FAMILIAR_MIN_DF} THEN 1 END)
             AS n_familiar,
           CAST(count(CASE WHEN df.n_docs - 1 >= {_FAMILIAR_MIN_DF} THEN 1 END)
                AS DOUBLE) / count(*) AS familiarity
    FROM bg JOIN df USING (bigram)
    GROUP BY bg.doc_id
    """,
)
def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4l: corpus-self-supervised fluency signal — the fraction of a
    document's bigrams that also occur in ≥3 OTHER documents. The
    integer-exact stand-in for n-gram language-model scoring
    (documents whose word transitions appear nowhere else in the
    corpus are gibberish, boilerplate-mangled, or wrong-language);
    the same two-pass corpus-statistics shape an actual KenLM-style
    filter takes, with the model estimated from the corpus itself.

    Exactness: counts and document frequencies are integers; the
    final ratio is one double division (log-probability averages
    would be float-sum-order-dependent across engines). Scale: pass
    1 aggregates bigram document-frequencies (map-side partials);
    pass 2 joins docs' bigrams to the DF table on the bigram hash —
    both shuffles carry (bigram, counts), never documents. The DF
    table is corpus-vocabulary-sized; for a web-scale corpus add a
    min-count pre-filter so it stays broadcastable."""
    d = load_table(spark, sf_dir, "documents")
    # ws materialized first — the in-lambda split() O(words^2) trap
    # (see _shingle_docs / text_bigram_topk): element_at(<split expr>, i)
    # re-splits the text per bigram position. 12.7 s -> 1.2 s at sf0.1
    # together with the exchange reuse below.
    wd = d.select("doc_id", F.split("text", r"\s+").alias("ws"))
    ws = F.col("ws")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Explicit repartition on the join key makes the exploded bigram
    # frame compute-once/read-twice: the DF aggregate and the join
    # probe both consume the SAME exchange instead of re-running the
    # split+transform+explode lineage per consumer (the
    # shingle-pipeline trick, dedup.py:shingle_shared_counts;
    # measured 12.7 s → 5.2 s at sf0.1 — the remainder is the
    # distinct-doc aggregate and the per-position bigram build, both
    # linear).
    bg = wd.select("doc_id", F.explode(bigrams).alias("bigram")).repartition(
        F.col("bigram")
    )
    df_tab = bg.groupBy("bigram").agg(F.countDistinct("doc_id").alias("n_docs"))
    fam = F.count(F.when(F.col("n_docs") - 1 >= _FAMILIAR_MIN_DF, 1))
    return (
        bg.join(df_tab, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            fam.alias("n_familiar"),
            (fam.cast("double") / F.count("*")).alias("familiarity"),
        )
    )


# ---------------------------------------------------------------------------
# L4k [ext]: boilerplate n-gram detection (C4/RefinedWeb-style shared-
# passage removal signal) with hash-bucket candidate pruning.
# ---------------------------------------------------------------------------

_BOILER_MIN_DF = 5  # trigram shared by >= this many distinct docs
_BOILER_BUCKETS = 1 << 16


@query(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
    ),
    tg AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      FROM t, UNNEST(range(1, len(ws) - 1)) AS u(i)
    )
    SELECT gram, count(*) AS df
    FROM tg
    GROUP BY gram
    HAVING count(*) >= {_BOILER_MIN_DF}
    ORDER BY df DESC, gram
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4k: trigrams shared by >= 5 distinct documents — the boilerplate
    (header/footer/license-block) signal web-corpus cleaners subtract
    before training.

    Two-pass candidate pruning keeps the heavy shuffle off the string
    long tail (the Spark-idiomatic replacement for a Misra-Gries
    sketch, with an EXACT result):

    - pass 1 shuffles distinct (bucket=xxhash64(gram) mod 2^16, doc_id)
      INTEGER pairs and keeps buckets whose distinct-doc count reaches
      the threshold. A gram with df >= T forces its bucket's df >= T
      (the bucket's doc set is a superset), so surviving buckets are a
      sound candidate superset; key width is 16 bytes regardless of
      gram length, and bucket cardinality caps the second aggregation
      level at 2^16 groups.
    - pass 2 exact-counts ONLY grams in surviving buckets (semi-join on
      the broadcast bucket list) — at 100 TB the string shuffle carries
      the few shared passages, not the ~unique long tail (here 16k-27k
      distinct trigrams; at corpus scale, billions).

    Output is exact, so the oracle is the direct GROUP BY/HAVING.
    Trigram arrays are materialized before the positional transform
    (the λ-recompute guard's bug class; PLANS.md pins 0 recomputes).
    """
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    wd = d.select("doc_id", F.split("text", r"\s+").alias("ws"))
    ws = F.col("ws")
    grams = F.when(
        F.size(ws) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1), F.element_at(ws, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # r16 restructure (guide §2.4, measured): the former two-pass shape
    # — distinct (doc_id, bucket) pairs → count per bucket → broadcast
    # the surviving bucket list → semi-join the gram frame — re-ran the
    # split+transform+explode lineage once per consumer (two full gram
    # builds; an explicit repartition(bucket) did NOT restore exchange
    # reuse because column pruning pushes a narrower projection below
    # the exchange on the aggregate branch, leaving two non-identical
    # subtrees). The bucket distinct-doc count is instead computed IN
    # PLACE over one bucket-partitioned exchange with the dense_rank
    # trick (bucket_df = max dense_rank over (bucket ORDER BY doc_id)
    # — exactly count(DISTINCT doc_id) per bucket): ONE gram build,
    # one shuffle, no broadcast, no join. 1x/16x A/B (alternating
    # arms, min of 4): dual-build 1.78/2.66 s, repartition arm
    # 1.85/2.66 s, in-invocation persist 1.84/2.58 s (and it holds a
    # corpus-sized cache), window 1.47/2.19 s. Candidate-superset
    # soundness is unchanged: a gram with df >= T forces its bucket's
    # distinct-doc count >= T.
    from pyspark.sql import Window

    bucketed = wd.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id",
        "gram",
        F.pmod(F.xxhash64("gram"), F.lit(_BOILER_BUCKETS)).alias("bucket"),
    )
    w_rank = Window.partitionBy("bucket").orderBy("doc_id")
    w_all = Window.partitionBy("bucket")
    candidates = (
        bucketed.withColumn("_rk", F.dense_rank().over(w_rank))
        .withColumn("_bucket_df", F.max("_rk").over(w_all))
        .where(F.col("_bucket_df") >= _BOILER_MIN_DF)
    )
    return (
        candidates.select("doc_id", "gram")
        .distinct()  # candidate strings only — the long tail never shuffles
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= _BOILER_MIN_DF)
        .orderBy(F.col("df").desc(), "gram")
    )


# ------------------------------------------- Unicode normalization

def unicode_normalized(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, <text_col>) → NFC + NFKC normalized twins with
    codepoint counts. Unicode normalization is dedup table stakes:
    'Café' composed and 'Cafe' + COMBINING ACUTE are byte-different,
    hash-different, and shingle-different while being the SAME text —
    an un-normalized corpus silently under-deduplicates; NFKC
    additionally folds compatibility forms (ﬁ ligature → fi,
    full-width Ａ → A, ② → 2) that matter for token statistics.

    Spark has no normalization builtin, so this is the documented
    Arrow path: a vectorized Series→Series pandas_udf over stdlib
    unicodedata (the same §2.9 shape as udf_pandas_normalize_text) —
    NOT a row-Python UDF. Map-only, zero shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFC", t))

    @pandas_udf("string")
    def nfkc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda t: unicodedata.normalize("NFKC", t))

    c = F.col(text_col)
    return df.select(
        "doc_id",
        nfc(c).alias("nfc_text"),
        nfkc(c).alias("nfkc_text"),
        F.length(c).cast("long").alias("len_raw"),
        F.length(nfc(c)).cast("long").alias("len_nfc"),
        F.length(nfkc(c)).cast("long").alias("len_nfkc"),
    )


@query(
    "text_unicode_normalize",
    # the é below are PRECOMPOSED (U+00E9); the ﬁ/②/Ａ stay verbatim
    # under NFC and fold under NFKC — the oracle recomputes both
    # expected strings by plain literal concat, no Unicode logic
    # oracle-side
    oracle="""
    SELECT doc_id,
           'Café ﬁrst ② Ａ ' || source || ' ' || text AS nfc_text,
           'Café first 2 A ' || source || ' ' || text AS nfkc_text,
           CAST(16 + length(source) + length(text) AS BIGINT) AS len_raw,
           CAST(15 + length(source) + length(text) AS BIGINT) AS len_nfc,
           CAST(16 + length(source) + length(text) AS BIGINT) AS len_nfkc
    FROM documents
    """,
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization under a GROUND-TRUTH oracle: each doc's
    text is prefixed with a DECOMPOSED 'Cafe' + U+0301 (which NFC
    must compose to é, shrinking the string by one codepoint) plus
    three compatibility characters (ﬁ U+FB01, ② U+2461, Ａ U+FF21)
    that NFC must keep VERBATIM and NFKC must fold to 'fi'/'2'/'A'.
    DuckDB recomputes both expected strings and all three codepoint
    counts by literal concat of the raw columns. Scale: map-only
    Arrow-vectorized UDF, zero exchanges."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("Cafe\u0301 \ufb01rst \u2461 \uff21 "),
        F.col("source"),
        F.lit(" "),
        F.col("text"),
    )
    return unicode_normalized(d.select("doc_id", raw.alias("text")))


# ------------------------------------------- invisible chars + wraps

# the invisible/format characters scraped text actually carries:
# ZWSP/ZWNJ/ZWJ (200B-D), LRM/RLM (200E-F), word joiner (2060),
# BOM-as-ZWNBSP (FEFF), soft hyphen (00AD)
_INVISIBLE_RE = "[\\u200b\\u200c\\u200d\\u200e\\u200f\\u2060\\ufeff\\u00ad]"


def strip_invisible(col) -> "F.Column":
    """Remove zero-width/format characters (they break tokenizers,
    dedup shingles, and length statistics while rendering as
    nothing). Pure JVM regexp — scan throughput."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _INVISIBLE_RE, "")


def count_invisible(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(strip_invisible(c))).cast("long")


def dehyphenate_wrapped(col) -> "F.Column":
    """Repair hard line-wraps in extracted document text (the PDF/
    column-layout artifact): 'exam-\\nple' rejoins to 'example'
    (hyphen + line break between word characters), then remaining
    line breaks become spaces and runs collapse. Pure JVM regexps."""
    c = F.col(col) if isinstance(col, str) else col
    rejoined = F.regexp_replace(
        c, "(\\p{L})-\\r?\\n(\\p{L})", "$1$2"
    )
    return F.trim(F.regexp_replace(rejoined, "\\s+", " "))


@query(
    "text_clean_invisible_wraps",
    oracle="""
    SELECT doc_id,
           'soft' || 'wrap example joined ' || source || ' ' || text
             AS clean_text,
           CAST(4 AS BIGINT) AS n_invisible
    FROM documents
    """,
)
def text_clean_invisible_wraps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invisible-character stripping + dehyphenation under a
    GROUND-TRUTH oracle: each doc's text is prefixed with a ZWSP +
    soft-hyphen-split 'soft\\u00adwrap', a BOM, a ZWJ, and a
    hyphen+newline hard wrap ('exam-\\nple' style) that must rejoin
    — DuckDB recomputes the expected clean string by plain concat of
    visible literals. The invisible count is pinned exactly (4
    format characters injected). Scale: one projection, zero
    exchanges, zero Python."""
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("\ufeffsoft\u00adwrap\u200b exam-\nple joined\u200d "),
        F.col("source"),
        F.lit(" "),
        F.col("text"),
    )
    cleaned = dehyphenate_wrapped(strip_invisible(raw))
    return d.select(
        "doc_id",
        cleaned.alias("clean_text"),
        count_invisible(raw).alias("n_invisible"),
    )
