"""Scalar transforms (SURVEY.md §2.2 P1-P11): string / datetime / math
/ conditional / array / JSON expression surface, plus the reference's
CDC date-derivation as a batch query.

All pure built-in expressions → whole-stage codegen, fully
pushdown-transparent. No UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query
from flink_hiveorc_spark.sources.cdc import epoch_ms_to_local_date


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 8) AS name_head,
           len(string_split(p_name, ' ')) AS n_words,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_type, ' ', '_') AS type_snake,
           trim(concat(' ', p_brand, ' ')) AS brand_trim
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: string function surface (upper/length/substr/split/regexp/
    concat/replace/trim)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit(" "), "p_brand", F.lit(" "))).alias("brand_trim"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           quarter(o_orderdate) AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           datediff('day', o_orderdate::DATE, DATE '2000-01-01') AS days_to_y2k,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           dayofweek(o_orderdate) AS dow
    FROM orders
    """,
)
def scalar_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: datetime surface. DuckDB dayofweek is 0=Sunday..6; Spark
    dayofweek is 1=Sunday..7 — normalized to DuckDB's here."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.quarter(d).alias("q"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date")).alias("days_to_y2k"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        (F.dayofweek(d) - 1).alias("dow"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           abs(l_extendedprice - 1000.0) AS abs_diff,
           CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
           CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_q,
           sqrt(l_extendedprice) AS sqrt_price,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: math surface. sqrt/abs/ceil/floor/mod are IEEE-exact and
    engine-identical (log/pow are deliberately excluded from the
    oracle-checked set: their last bits are libm-specific)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 1000.0).alias("abs_diff"),
        F.ceil(F.col("l_quantity") / 7.0).alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7.0).alias("floor_q"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
           CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: CASE WHEN / coalesce / nullif / LIKE predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_label"),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT lang, word, count(*) AS cnt
    FROM (
      SELECT lang, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY lang, word
    HAVING count(*) >= 20
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: split → explode (generator) → re-aggregate: word counts per
    language. At scale the explode multiplies rows ~100×; the partial
    agg right after collapses them before any shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 20)
    )


@query(
    "scalar_array_higher_order",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long_words,
           CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)), 'sum') AS BIGINT) AS total_chars
    FROM documents
    """,
)
def scalar_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: higher-order array functions (filter/transform/aggregate)
    — per-row array work with NO explode, no row multiplication."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long_words"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@query(
    "scalar_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(25,6))) AS DOUBLE)
             / count(*) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: JSON field extraction from a string column (the reference's
    envelope-decode shape, App.txt:60-67) + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    n = F.count("*")
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (F.sum(k.cast("decimal(25,6)")).cast("double") / n).alias("avg_k"),
    )


@query(
    "cdc_city_pipeline",
    oracle="""
    SELECT strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d') AS c_date,
           lower(event_type) AS city_name,
           count(*) AS n,
           min(event_id) AS first_ref,
           max(event_id) AS last_ref
    FROM events
    GROUP BY 1, 2
    """,
)
def cdc_city_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4 parity query: the reference's transform chain
    (lowercase → field extraction → epoch→UTC+8 date, App.txt:58-70)
    as a batch query over events."""
    ev = load_table(spark, sf_dir, "events")
    epoch_ms = F.expr("ts_ns div 1000000")
    return (
        ev.select(
            epoch_ms_to_local_date(epoch_ms).alias("c_date"),
            F.lower("event_type").alias("city_name"),
            "event_id",
        )
        .groupBy("c_date", "city_name")
        .agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("first_ref"),
            F.max("event_id").alias("last_ref"),
        )
    )


@query(
    "scalar_map_funcs",
    oracle="""
    SELECT p_partkey,
           cardinality(MAP(['brand','type'],[p_brand,p_type])) AS n_keys,
           array_to_string(list_sort(map_keys(MAP(['brand','type'],[p_brand,p_type]))), ',') AS keys,
           array_to_string(map_values(MAP(['brand','type'],[p_brand,p_type])), ',') AS vals,
           MAP(['brand','type'],[p_brand,p_type])['brand'][1] AS brand_val
    FROM part
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9b: map construction + key/value extraction (create_map,
    map_keys, map_values, element_at). Maps stay inside codegen; the
    final projection is flat columns so the oracle can compare."""
    p = load_table(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return p.select(
        "p_partkey",
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
        F.array_join(F.map_values(m), ",").alias("vals"),
        F.element_at(m, F.lit("brand")).alias("brand_val"),
    )


@query(
    "cdc_upsert_latest_state",
    oracle="""
    SELECT user_id,
           arg_max(event_id, event_id) AS event_id,
           arg_max(event_type, event_id) AS event_type,
           arg_max(CAST(value AS DOUBLE), event_id) AS value
    FROM events
    GROUP BY user_id
    """,
)
def cdc_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert compaction: treat events as a change stream keyed by
    user_id with event_id as the LSN; materialize latest-per-key via
    max_by (one agg shuffle, no window sort — see sources/cdc.py
    latest_state)."""
    from flink_hiveorc_spark.sources.cdc import latest_state

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    return latest_state(ev, ["user_id"], "event_id")


@query(
    "scalar_json_typed_decode",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) IS NULL
                THEN 1 ELSE 0 END AS is_malformed
    FROM events
    """,
)
def scalar_json_typed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 typed path: from_json with an explicit StructType — unlike
    get_json_object (string-returning, re-parses per extraction) the
    document parses ONCE into a typed struct and every field access is
    a struct getter; malformed rows become NULL structs (PERMISSIVE),
    surfaced here as a flag."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    j = F.from_json("props", schema)
    return ev.select(
        "event_id",
        j["k"].alias("k"),
        (j["k"] % 10).alias("k_mod"),
        F.when(j["k"].isNull(), 1).otherwise(0).alias("is_malformed"),
    )


@query(
    "scalar_null_semantics",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type,
             nullif(json_extract_string(props, '$.k'), '29') AS k_val
      FROM events
    )
    SELECT event_id,
           k_val,
           k_val IS NOT DISTINCT FROM '42' AS nullsafe_eq_42,
           coalesce(k_val, '<missing>') AS k_or_default,
           CASE WHEN k_val IS NULL THEN 0 ELSE 1 END AS has_k,
           nullif(event_type, 'error') AS type_or_null
    FROM base
    """,
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics battery: null-safe equality (<=> ≙ IS NOT
    DISTINCT FROM), coalesce defaulting, IS NULL branching, and
    NULLIF — the constructs whose three-valued-logic corners differ
    across engines if anything is off. NULLs are produced from real
    data (nullif on a JSON field value), so every downstream op sees
    a genuine NULL/non-NULL mix."""
    ev = load_table(spark, sf_dir, "events")
    k_val = F.nullif(F.get_json_object("props", "$.k"), F.lit("29"))
    return ev.select(
        "event_id",
        k_val.alias("k_val"),
        k_val.eqNullSafe(F.lit("42")).alias("nullsafe_eq_42"),
        F.coalesce(k_val, F.lit("<missing>")).alias("k_or_default"),
        F.when(k_val.isNull(), 0).otherwise(1).alias("has_k"),
        F.nullif("event_type", F.lit("error")).alias("type_or_null"),
    )


@query(
    "scalar_json_nested_roundtrip",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           arg_min(event_type, event_id) AS first_type,
           count(*) AS n_items
    FROM events
    GROUP BY user_id
    """,
)
def scalar_json_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON machinery end-to-end ON THE SPARK SIDE: build a
    document {user:{id,n}, events:[{id,type},...]} per user with
    to_json(struct(...)), parse it back with from_json + an explicit
    nested schema (struct containing an ARRAY of structs), and
    extract scalars through the parsed tree. The oracle computes the
    expected values relationally — it verifies the roundtrip is
    LOSSLESS without needing DuckDB to replicate Spark's JSON
    serialization. Array order inside the doc is pinned by
    array_sort(collect_list(struct(event_id, ...)))."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    built = ev.groupBy("user_id").agg(
        F.to_json(
            F.struct(
                F.struct(F.col("user_id").alias("id"), F.count("*").alias("n")).alias("user"),
                F.array_sort(
                    F.collect_list(F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("type")))
                ).alias("events"),
            )
        ).alias("doc")
    )
    doc_schema = T.StructType(
        [
            T.StructField(
                "user",
                T.StructType(
                    [T.StructField("id", T.LongType()), T.StructField("n", T.LongType())]
                ),
            ),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [T.StructField("id", T.LongType()), T.StructField("type", T.StringType())]
                    )
                ),
            ),
        ]
    )
    parsed = built.select("user_id", F.from_json("doc", doc_schema).alias("j"))
    return parsed.select(
        "user_id",
        F.col("j.user.n").alias("n_events"),
        F.element_at(F.col("j.events"), 1).getField("type").alias("first_type"),
        F.size("j.events").cast("bigint").alias("n_items"),
    )


@query(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_lpad,
           rpad(p_type, 10, '.') AS type_rpad,
           translate(p_name, 'aeiou', 'AEIOU') AS name_vowels,
           levenshtein(p_brand, 'Brand#11') AS dist_to_b11,
           repeat(substr(p_type, 1, 2), 3) AS type2x3,
           reverse(p_name) AS name_rev
    FROM part
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 battery 2: padding, character translation, edit distance,
    repetition, reversal — the second tier of string functions a
    migrating user calls (levenshtein also backs the fuzzy-match
    blocking in text_fuzzy_name_pairs)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_type", 10, ".").alias("type_rpad"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels"),
        F.levenshtein("p_brand", F.lit("Brand#11")).alias("dist_to_b11"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("type2x3"),
        F.reverse("p_name").alias("name_rev"),
    )


@query(
    "scalar_datetime_funcs2",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           quarter(o_orderdate) AS q,
           isodow(o_orderdate) AS iso_dow,
           weekofyear(o_orderdate) AS iso_week
    FROM orders
    """,
)
def scalar_datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 battery 2: week truncation, month end, quarter, ISO
    day-of-week and ISO week — the calendar arithmetic set. ISO
    day-of-week is weekday()+1 on the Spark side (Spark's dayofweek
    is 1=Sunday; weekday is 0=Monday — the latter maps cleanly onto
    DuckDB's isodow)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.quarter("o_orderdate").alias("q"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
    )


@query(
    "scalar_array_posexplode",
    oracle="""
    SELECT doc_id, u.pos, u.word
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(len(w)),
                    i -> {'pos': i, 'word': w[i + 1]})) AS u
      FROM (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE doc_id < 50)
    )
    """,
)
def scalar_array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: posexplode — UNNEST WITH ORDINALITY: each word with its
    0-based position in the document (the tokenizer-output shape every
    sequence-labeling pipeline needs; position is what explode()
    silently loses). Restricted to a doc_id slice purely to keep the
    oracle diff tractable — the operator itself is a generator, scan-
    shaped at any scale."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@query(
    "scalar_try_safe_arithmetic",
    oracle="""
    SELECT event_id,
           value / NULLIF(CAST(user_id % 5 AS DOUBLE), 0) AS safe_ratio,
           TRY_CAST(props AS BIGINT) AS props_as_int,
           TRY_CAST(event_type AS DOUBLE) AS type_as_num,
           CASE WHEN user_id % 5 = 0 THEN NULL
                ELSE CAST(floor(value * 100) AS BIGINT) END AS scaled_or_null
    FROM events
    """,
)
def scalar_try_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+: error-safe arithmetic — try_divide / try_cast return NULL
    instead of raising, the semantics a 100 TB job needs (one
    malformed row must not kill a 10-hour pipeline; the NULLs flow to
    a dead-letter filter instead). Spark's try_* family maps to
    NULLIF-guarded division and TRY_CAST on the oracle side —
    identical three-valued results.

    try_cast on a non-numeric string (event_type, JSON props) is the
    canonical schema-drift guard: yesterday's int column arriving as
    text yields NULLs to quarantine, not a crashed stage."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("try_divide(value, cast(user_id % 5 as double))").alias("safe_ratio"),
        F.expr("try_cast(props as bigint)").alias("props_as_int"),
        F.expr("try_cast(event_type as double)").alias("type_as_num"),
        # floor() explicitly: DuckDB's double->BIGINT cast ROUNDS while
        # Spark's truncates - an implicit cast here diverges on 5% of rows
        F.when(
            F.col("user_id") % 5 != 0, F.floor(F.col("value") * 100).cast("bigint")
        ).alias("scaled_or_null"),
    )


@query(
    "scalar_variant_shred",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_units
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 [ext]: VARIANT-typed semi-structured handling (Spark 4
    native). The event row is re-serialized into ONE nested JSON
    document, parsed ONCE into a VARIANT (binary-encoded, schema-free
    — the open-format answer to JSON columns at 100 TB: parse cost is
    paid once per document, every ``variant_get`` afterwards is a
    typed binary path walk, and unlike a declared StructType the
    writer can evolve fields without a reader schema change), then
    shredded back out through typed paths ('$.props.k' BIGINT,
    '$.type' STRING, '$.value' DOUBLE) and aggregated.

    The oracle extracts the same values from the ORIGINAL props JSON
    — engine-specific VARIANT internals never surface; what is
    compared is that the to_json → parse_json → variant_get loop is
    lossless for every row. The double payload is floor-quantized to
    integer micro-units before summing (order-independence across
    engines, the corpus-wide discipline)."""
    ev = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("type"),
            F.from_json("props", "k bigint").alias("props"),
            F.col("value").alias("value"),
        )
    )
    v = ev.select(F.parse_json(doc).alias("v"))
    shredded = v.select(
        F.expr("variant_get(v, '$.type', 'string')").alias("event_type"),
        F.expr("variant_get(v, '$.props.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.value', 'double')").alias("value"),
    )
    return (
        shredded.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.floor(F.col("value") * 1_000_000).cast("bigint")).alias("value_units"),
        )
        .orderBy("event_type")
    )
