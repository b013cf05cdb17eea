"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10 L4):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All pure built-in expressions (codegen'd, no UDFs) —
at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
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
