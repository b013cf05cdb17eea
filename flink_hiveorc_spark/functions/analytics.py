"""Corpus / event analytics operators (SURVEY.md §2.10 L4 extensions):
TF-IDF term weighting, corpus n-gram statistics, and event
sessionization. All built-in expressions — no Python in the hot path.

Scale notes (100 TB):
- TF-IDF is two aggregations over the exploded token stream (tf by
  (doc, term), df by term) re-joined on term; the df side is tiny
  (vocabulary-sized) and broadcast. The token explode is the dominant
  cost and is unavoidable — it streams, never materializes per-doc
  state.
- bigram counting never builds the bigram list per document: the
  pairs are generated positionally from the token array and go
  straight into a partial aggregate (map-side combine shrinks the
  shuffle to distinct-bigram cardinality per task).
- sessionization is ONE window pass per user (lag → gap flag →
  running sum) then a per-session aggregate: two shuffles on
  user_id total, no self-join, no state larger than a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

_DEC = "decimal(25,6)"

TOP_TERMS_PER_DOC = 5
TOP_BIGRAMS = 20
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes
_HOUR_US = 3_600_000_000


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df.df), 8) AS tfidf
      FROM tf JOIN df ON tf.term = df.term
    )
    SELECT doc_id, term, tf, df, tfidf
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    WHERE rn <= {TOP_TERMS_PER_DOC}
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4e: TF-IDF top-5 terms per document.

    tf = term count in doc; idf = ln(N / df). The df aggregate is
    vocabulary-sized → broadcast back onto the tf rows; the per-doc
    top-k is a window over (doc_id) ordered (tfidf DESC, term) —
    a total order, so ties are deterministic. The score is rounded
    to 8 decimals in BOTH engines: tf/df/N are integer-exact, the
    single ln+multiply is IEEE-deterministic, and the round absorbs
    any last-ulp libm divergence between JVM and DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.regexp_extract_all("text", F.lit("([a-z]+)"))).alias("term")
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scan of a count-star; cheap and cached by parquet footer
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 8).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_TERMS_PER_DOC)
        .drop("rn")
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


@query(
    "text_bigram_topk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents
    )
    SELECT ws[i] || ' ' || ws[i+1] AS bigram, count(*) AS n
    FROM w, UNNEST(range(1, len(ws))) AS t(i)
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {TOP_BIGRAMS}
    """,
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4f: corpus-level top-20 bigrams.

    Bigrams are formed positionally from the token array (transform
    over 1..len-1 — no self-join on position, no per-doc bigram list
    retained) and counted with map-side partial aggregation; the
    global top-20 is a TakeOrderedAndProject, not a full sort.
    DuckDB's 1-based list indexing is mirrored with getItem(i-1)."""
    d = load_table(spark, sf_dir, "documents")
    # ws is materialized in its OWN projection: referencing the split()
    # expression inside the transform lambda would re-split the text
    # once per bigram position (the O(words^2) in-lambda trap,
    # _shingle_docs in dedup.py; measured 5.7 s -> 0.4 s at sf0.1 for
    # the bare explode).
    wd = d.select("doc_id", F.split("text", r"\s+").alias("ws"))
    ws = F.col("ws")
    # Guard single-token docs: sequence(1, 0) would generate a
    # DESCENDING [1, 0] in Spark (and element_at(ws, 0) errors),
    # while DuckDB's range(1, 1) is empty.
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wd.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(TOP_BIGRAMS)
    )


@query(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, t_us,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, t_us,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(t_us) AS start_us,
           CAST((max(t_us) - min(t_us)) AS BIGINT) AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4g/T-adjacent: batch sessionization — split each user's event
    stream into sessions at >30-minute gaps, one row per session.

    Classic gaps-and-islands: lag → gap flag → running sum = session
    index, then a per-session aggregate. Exactly one shuffle on
    user_id (the window and the groupBy share partitioning).
    Timestamps are compared at µs precision on both engines (events
    carry ns; DuckDB truncates to µs on read — ordering ties broken
    by event_id identically)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.select(
        "*",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = flagged.select(
        "*",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            (F.max("t_us") - F.min("t_us")).cast("bigint").alias("duration_us"),
        )
        .orderBy("user_id", "session_seq")
    )


SHARD_TOKEN_BUDGET = 2000

# Shard packing splits the doc_id range into this many range buckets
# per (lang, source) stream. The bucket count is FIXED, so the
# offsets side stays ≤ PACK_RANGE_BUCKETS × n_streams rows (a few
# thousand) and always broadcasts, while per-cell work grows with the
# corpus — the ratio that keeps a 100 TB packing job parallel without
# the bookkeeping itself becoming big data.
PACK_RANGE_BUCKETS = 256


def assign_shard_idx(sized: DataFrame) -> DataFrame:
    """Append ``shard_idx`` to a sized corpus frame (doc_id, lang,
    source, n_tokens, ...extras): greedy sequential packing into
    SHARD_TOKEN_BUDGET-token shards per (lang, source) stream in
    doc_id order — a doc goes to the shard where its START offset
    (running sum minus own length) falls, so every engine that agrees
    on the order agrees on the assignment.

    Distributed two-pass prefix sum (VERDICT r4 #2 — the previous
    single window per (lang, source) stream made parallelism = stream
    count, a single-task total-order sort on a hot stream at scale):

    1. bucket each doc by doc_id range (PACK_RANGE_BUCKETS even
       splits of [min, max]);
    2. per-(lang, source, bucket) token subtotals — map-side-combined
       hash agg, output ≤ buckets × streams rows;
    3. exclusive running sum of subtotals per stream ordered by
       bucket — a window over the TINY subtotal table — gives each
       cell its global start offset;
    4. broadcast-join offsets back and finish with a running sum per
       (lang, source, bucket) CELL — the only window that touches
       corpus-sized data, and its partition key now splits every hot
       stream ~PACK_RANGE_BUCKETS ways.

    Output is bucket-independent (identical to the one-window
    formulation and to the SQL oracle): bucketing only changes WHERE
    each partial sum is computed, never its value. Integer token
    counts keep the cumsum exact. The min/max pre-scan is one
    column-pruned aggregate (parquet footer stats at scale)."""
    bounds = sized.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    if bounds["lo"] is None:  # empty corpus: no rows to assign
        return sized.withColumn("shard_idx", F.lit(None).cast("bigint"))
    lo = int(bounds["lo"])
    width = max(1, (int(bounds["hi"]) - lo) // PACK_RANGE_BUCKETS + 1)
    b = sized.withColumn(
        "_bucket", ((F.col("doc_id") - F.lit(lo)) / F.lit(width)).cast("bigint")
    )
    subtotals = b.groupBy("lang", "source", "_bucket").agg(
        F.sum("n_tokens").alias("_sub")
    )
    w_off = (
        Window.partitionBy("lang", "source")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = subtotals.select(
        "lang",
        "source",
        "_bucket",
        (F.sum("_sub").over(w_off) - F.col("_sub")).alias("_offset"),
    )
    w_cell = (
        Window.partitionBy("lang", "source", "_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offsets), ["lang", "source", "_bucket"])
        .withColumn(
            "shard_idx",
            # floor, EXPLICITLY in both engines: Spark's double->bigint
            # cast truncates but DuckDB's ROUNDS half-away (0.5255 -> 1)
            # — the divergence only fires once a stream accumulates
            # >= half a budget (invisible at sf0.01, corpus-wide wrong
            # at sf0.1; caught by the local sf0.1 oracle replica r5).
            F.floor(
                (F.col("_offset") + F.sum("n_tokens").over(w_cell) - F.col("n_tokens"))
                / SHARD_TOKEN_BUDGET
            ).cast("bigint"),
        )
        .drop("_bucket", "_offset")
    )


# The ONE definition of the sized/packed corpus both engines share:
# every shard-packing oracle builds on these CTEs, and every Spark
# twin builds on _sized_documents below — a tokenization or budget
# change lands in exactly one place per engine or the queries would
# silently disagree on shard assignment.
_PACKED_CTES = f"""sized AS (
      SELECT doc_id, lang, source, text,
             len(string_split_regex(text, '\\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, source, text, n_tokens,
             CAST(floor((sum(n_tokens) OVER (
                     PARTITION BY lang, source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tokens)
                  / {SHARD_TOKEN_BUDGET}) AS BIGINT) AS shard_idx
      FROM sized
    )"""


def _sized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id/lang/source/text + whitespace token counts — the shared
    Spark-side input of the shard-packing queries (single definition,
    twin of the oracle's ``sized`` CTE; Catalyst prunes ``text`` from
    the scan when a consumer never touches it)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )


@query(
    "pipeline_pack_shards",
    oracle=f"""
    WITH {_PACKED_CTES}
    SELECT doc_id, lang, source, n_tokens, shard_idx
    FROM packed
    """,
)
def pipeline_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4h: training-shard packing — assign documents to ~2000-token
    shards within each (lang, source) stream, the step that turns a
    cleaned corpus into fixed-budget training files.

    Greedy sequential packing via the two-pass distributed prefix sum
    (see assign_shard_idx): deterministic assignment — a doc goes to
    the shard where its START offset falls — with parallelism =
    (lang, source, range-bucket) cells rather than streams, so a hot
    stream (lang=en, source=web at 100 TB) is split ~256 ways instead
    of serializing on one task."""
    sized = _sized_documents(spark, sf_dir)
    return assign_shard_idx(sized).select(
        "doc_id", "lang", "source", "n_tokens", "shard_idx"
    )


@query(
    "cdc_scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS t_us, event_id,
             lag(event_type) OVER w AS prev_state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    changes AS (
      SELECT user_id, state, t_us, event_id
      FROM ordered
      WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           t_us AS valid_from_us,
           lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS valid_to_us
    FROM changes
    """,
)
def cdc_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC→SCD2: compress each user's event stream into slowly-
    changing-dimension type-2 validity intervals — consecutive
    same-state rows collapse, each surviving row gets
    [valid_from, valid_to) from its own time and the next change's
    (NULL = current). Two window passes over ONE user_id
    partitioning (change detection, then lead); the dimension a
    downstream as-of join consumes. µs timestamps + event_id ties as
    everywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.expr("ts_ns div 1000").alias("t_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    changes = ev.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state"))
    )
    w2 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    return changes.select(
        "user_id",
        "state",
        F.col("t_us").alias("valid_from_us"),
        F.lead("t_us").over(w2).alias("valid_to_us"),
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_view) AS n_viewed,
           count(CASE WHEN t_click > t_view THEN 1 END) AS n_clicked_after_view,
           count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
             AS n_full_funnel,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
                AS DOUBLE) / count(t_view) AS view_to_purchase_rate
    FROM steps
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4i: ordered funnel analysis — view → click → purchase, each
    step's FIRST occurrence must follow the previous step's. One
    conditional-min aggregate per user (no joins, no explode: the
    funnel state is three timestamps), then a 1-row conversion
    summary. The µs timestamps make the step comparisons exact; the
    final rate is one IEEE divide of integer counts. At 100 TB this
    is a single shuffle on user_id regardless of funnel depth."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("t_us")
    )
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t_us"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("t_us"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("t_us"))).alias("t_purchase"),
    )
    clicked = F.col("t_click") > F.col("t_view")
    full = (F.col("t_purchase") > F.col("t_click")) & clicked
    return steps.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count(F.when(clicked, 1)).alias("n_clicked_after_view"),
        F.count(F.when(full, 1)).alias("n_full_funnel"),
        (F.count(F.when(full, 1)).cast("double") / F.count("t_view")).alias(
            "view_to_purchase_rate"
        ),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(epoch_us(ts) // 86400000000) AS cohort_day
      FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_day,
             (epoch_us(e.ts) // 86400000000) - f.cohort_day AS day_offset
      FROM events e
      JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset, count(*) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4j: retention cohort matrix — users grouped by first-seen day,
    counted as active per day-offset for the first week (the
    engagement table every product dashboard draws). first-seen is a
    per-user min (one aggregate); the cohort join broadcasts the
    user→cohort map when it fits, and the distinct collapses
    multi-event days BEFORE the count. Day arithmetic is integer
    division of µs epochs — exact on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("(ts_ns div 1000) div 86400000000").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = (
        ev.join(F.broadcast(first_seen), "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_time_weighted_value",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             value,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id,
           CAST(sum(CAST(floor(value * dur_us) AS BIGINT)) AS DOUBLE)
             / CAST(sum(dur_us) AS DOUBLE) AS twap
    FROM seg
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4k: time-weighted average value per user (TWAP) — each
    observation holds until the next one, so its weight is its
    holding duration; the final sample (open-ended) is excluded. One
    window pass (lead) + one aggregate sharing the user_id shuffle.
    value·duration products are floor-quantized to integer µs-units
    before the sum (exact, order-free, and TIE-FREE — a decimal cast
    would diverge between Spark's half-up and DuckDB's half-even on
    boundary products; observed 1e-14 drift) — then one final
    divide. The sub-unit truncation is ~1e-14 relative at these
    magnitudes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.expr("ts_ns div 1000").alias("t_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seg = ev.select(
        "user_id", "value", (F.lead("t_us").over(w) - F.col("t_us")).alias("dur_us")
    ).filter(F.col("dur_us").isNotNull())
    return seg.groupBy("user_id").agg(
        (
            F.sum(F.floor(F.col("value") * F.col("dur_us")).cast("long")).cast("double")
            / F.sum("dur_us").cast("double")
        ).alias("twap")
    )


@query(
    "events_anomaly_daily_zscore",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(25,6))) * 100 AS BIGINT) AS dv
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    win AS (
      SELECT day, dv,
             count(*) OVER w AS n_w,
             sum(dv) OVER w AS s1,
             sum(dv * dv) OVER w AS s2
      FROM (SELECT day, dv,
                   date_diff('day', DATE '1970-01-01', day) AS day_num
            FROM daily)
      WINDOW w AS (ORDER BY day_num
                   RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(dv AS DOUBLE) / 100 AS total_value,
           n_w,
           CASE WHEN n_w >= 8
                 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_w)
                     / (n_w - 1) > 0
                THEN (CAST(dv AS DOUBLE) - CAST(s1 AS DOUBLE) / n_w)
                     / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_w)
                            / (n_w - 1))
           END AS zscore
    FROM win
    """,
)
def events_anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series anomaly scoring: each day's purchase total as a
    z-score against its own trailing 28-day window (the alerting
    primitive every metrics pipeline ships). Days inside the warm-up
    (< 8 observed days) emit NULL.

    Cross-engine determinism: daily totals are quantized to integer
    CENTS via exact decimal arithmetic, so the window's running
    sum/sum-of-squares are exact integers in ANY accumulation order
    (window frames accumulate in different orders across engines —
    double sums would diverge in the low bits); mean/std/z then run
    the identical double expression tree on both sides. The RANGE
    frame is over an epoch-day ordinal. At very large daily volumes
    move s2 to DECIMAL — bigint squares overflow past ~3·10^9 cents
    per day."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast(_DEC)) * 100)
            .cast("bigint")
            .alias("dv")
        )
        .select("*", F.datediff("day", F.lit("1970-01-01")).alias("day_num"))
    )
    w = Window.orderBy("day_num").rangeBetween(-27, Window.currentRow)
    win = daily.select(
        "day",
        "dv",
        F.count("*").over(w).alias("n_w"),
        F.sum("dv").over(w).alias("s1"),
        F.sum(F.col("dv") * F.col("dv")).over(w).alias("s2"),
    )
    n_w = F.col("n_w")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n_w) / (
        n_w - 1
    )
    z = (F.col("dv").cast("double") - F.col("s1").cast("double") / n_w) / F.sqrt(var)
    return win.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.col("dv").cast("double") / 100).alias("total_value"),
        "n_w",
        F.when((n_w >= 8) & (var > 0), z).alias("zscore"),
    )


@query(
    "events_window_dedup",
    oracle="""
    SELECT user_id, event_type, w_start_us, event_id AS kept_event_id,
           n AS n_in_window, n - 1 AS n_dropped
    FROM (
      SELECT user_id, event_type, event_id,
             (epoch_us(ts) // 300000000) * 300000000 AS w_start_us,
             row_number() OVER (
               PARTITION BY user_id, event_type, epoch_us(ts) // 300000000
               ORDER BY epoch_us(ts), event_id) AS rn,
             count(*) OVER (
               PARTITION BY user_id, event_type, epoch_us(ts) // 300000000) AS n
      FROM events
    )
    WHERE rn = 1
    """,
)
def events_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-adjacent: windowed deduplication — keep the FIRST event per
    (user, event_type) inside each 5-minute tumbling window, the
    batch twin of Flink's `deduplicate` / Spark's streaming
    dropDuplicates-within-watermark (bounded state: one row per live
    key×window, state expiry = window close; an unbounded
    dropDuplicates would hold every key forever at 100 TB/day).

    Deterministic keep rule: earliest (ts, event_id) — the unique-key
    tiebreak makes the survivor engine-independent even when two
    duplicates share a timestamp. One shuffle on the composite key;
    the count runs in the same window pass (same partitioning, no
    second exchange)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.expr("ts_ns div 1000").alias("t_us"),
        F.expr("((ts_ns div 1000) div 300000000) * 300000000").alias("w_start_us"),
    )
    key = ["user_id", "event_type", "w_start_us"]
    w_rank = Window.partitionBy(*key).orderBy("t_us", "event_id")
    w_all = Window.partitionBy(*key)
    return (
        base.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count("*").over(w_all))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "w_start_us",
            F.col("event_id").alias("kept_event_id"),
            F.col("n").alias("n_in_window"),
            (F.col("n") - 1).alias("n_dropped"),
        )
    )


@query(
    "events_hourly_concurrency_open",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, t_us, event_id,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sessions AS (
      SELECT user_id,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
             t_us
      FROM flagged
    ),
    spans AS (
      SELECT user_id, session_seq,
             min(t_us) // {_HOUR_US} AS h_lo,
             max(t_us) // {_HOUR_US} AS h_hi,
             max(t_us) AS last_us
      FROM sessions GROUP BY user_id, session_seq
    ),
    bound AS (SELECT max(epoch_us(ts)) AS end_us FROM events),
    eff AS (
      SELECT s.user_id,
             CASE WHEN b.end_us - s.last_us <= {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_open,
             s.h_lo,
             CASE WHEN b.end_us - s.last_us <= {SESSION_GAP_US}
                  THEN b.end_us // {_HOUR_US} ELSE s.h_hi END AS h_hi_eff
      FROM spans s, bound b
    )
    SELECT h AS hour_idx,
           count(*) AS n_active_sessions,
           count(DISTINCT user_id) AS n_active_users,
           CAST(sum(is_open) AS BIGINT) AS n_open_sessions
    FROM eff, UNNEST(range(h_lo, h_hi_eff + 1)) AS t(h)
    GROUP BY h
    """,
)
def events_hourly_concurrency_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4n variant with OPEN-interval semantics (VERDICT r4 #8): a
    session whose last event is within the session gap of the corpus'
    observation end has not actually ENDED — it is still running when
    the data stops. The closed-interval query truncates such sessions
    at their last event, under-counting concurrency in the final
    hours; this variant extends open sessions through the observation
    end and reports how many of each hour's active sessions are
    open-ended (the "currently online" figure a live dashboard needs).

    Scale: identical shape to events_hourly_concurrency (one user_id
    shuffle reused by sessionize + span aggregate, explode is
    O(sessions · avg_hours)); the observation end is a 1-row global
    aggregate joined in via broadcast — no extra corpus shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.select(
        "user_id",
        "t_us",
        "event_id",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("t_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "t_us", F.sum("is_start").over(w_seq).alias("session_seq")
    )
    spans = sess.groupBy("user_id", "session_seq").agg(
        F.expr(f"min(t_us) div {_HOUR_US}").alias("h_lo"),
        F.expr(f"max(t_us) div {_HOUR_US}").alias("h_hi"),
        F.max("t_us").alias("last_us"),
    )
    bound = ev.agg(F.max("t_us").alias("end_us"))
    is_open = F.col("end_us") - F.col("last_us") <= SESSION_GAP_US
    eff = spans.crossJoin(F.broadcast(bound)).select(
        "user_id",
        F.when(is_open, 1).otherwise(0).alias("is_open"),
        "h_lo",
        F.when(is_open, F.expr(f"end_us div {_HOUR_US}"))
        .otherwise(F.col("h_hi"))
        .alias("h_hi_eff"),
    )
    return (
        eff.select(
            "user_id",
            "is_open",
            F.explode(F.sequence(F.col("h_lo"), F.col("h_hi_eff"))).alias("hour_idx"),
        )
        .groupBy("hour_idx")
        .agg(
            F.count("*").alias("n_active_sessions"),
            F.countDistinct("user_id").alias("n_active_users"),
            F.sum("is_open").alias("n_open_sessions"),
        )
    )


@query(
    "agg_mad_outliers",
    oracle="""
    WITH vc AS (
      SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
    ),
    med AS (
      SELECT source,
             min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
                 THEN n_chars END) AS median_chars
      FROM (
        SELECT source, n_chars,
               sum(c) OVER (PARTITION BY source ORDER BY n_chars
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM vc
      )
      GROUP BY source
    ),
    dev AS (
      SELECT vc.source, abs(vc.n_chars - med.median_chars) AS d, sum(vc.c) AS c
      FROM vc JOIN med USING (source)
      GROUP BY 1, 2
    ),
    mad AS (
      SELECT source,
             min(CASE WHEN cum >= CAST(ceil(0.5 * n) AS BIGINT)
                 THEN d END) AS mad_chars
      FROM (
        SELECT source, d,
               sum(c) OVER (PARTITION BY source ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM dev
      )
      GROUP BY source
    )
    SELECT d.source,
           CAST(any_value(med.median_chars) AS BIGINT) AS median_chars,
           CAST(any_value(mad.mad_chars) AS BIGINT) AS mad_chars,
           count(*) AS n_docs,
           count(CASE WHEN abs(d.n_chars - med.median_chars)
                          > 3 * mad.mad_chars THEN 1 END) AS n_outliers
    FROM documents d
    JOIN med ON med.source = d.source
    JOIN mad ON mad.source = d.source
    GROUP BY d.source
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4m: robust per-source outlier detection — median and MAD
    (median absolute deviation) of document length, and the count of
    documents beyond 3 MADs. The robust-statistics quality gate
    (mean/stddev are dragged by the very outliers they should flag;
    median/MAD are not).

    Both medians are exact DISCRETE medians computed from
    per-(source, value) counts + a cumulative sum over DISTINCT
    values (same scalable shape as agg_approx_percentile's exact
    side: the parallel hash agg does the corpus-sized work, the
    sequential window only ever sees distinct lengths). Everything is
    integer — no FP anywhere. Final pass joins the two tiny per-
    source tables back (broadcast) and counts outliers in one scan."""
    d = load_table(spark, sf_dir, "documents")

    def disc_median(df: DataFrame, val: str, out: str) -> DataFrame:
        vc = df.groupBy("source", val).agg(F.count("*").alias("c"))
        w_cum = (
            Window.partitionBy("source")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("source")
        cum = vc.select(
            "source",
            F.col(val).alias("v"),
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        return cum.groupBy("source").agg(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                    F.col("v"),
                )
            ).alias(out)
        )

    med = disc_median(d.select("source", "n_chars"), "n_chars", "median_chars")
    dev = d.join(F.broadcast(med), "source").select(
        "source", F.abs(F.col("n_chars") - F.col("median_chars")).alias("dev")
    )
    mad = disc_median(dev, "dev", "mad_chars")
    return (
        d.join(F.broadcast(med), "source")
        .join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.first("median_chars").alias("median_chars"),
            F.first("mad_chars").alias("mad_chars"),
            F.count("*").alias("n_docs"),
            F.count(
                F.when(
                    F.abs(F.col("n_chars") - F.col("median_chars"))
                    > 3 * F.col("mad_chars"),
                    1,
                )
            ).alias("n_outliers"),
        )
    )


@query(
    "pipeline_shard_manifest",
    oracle=f"""
    WITH {_PACKED_CTES}
    SELECT lang, source, shard_idx,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)) AS BIGINT)
             AS content_checksum
    FROM packed
    GROUP BY lang, source, shard_idx
    """,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4h+: training-shard MANIFEST — per (lang, source, shard): doc
    count, token count, doc-id range, and an order-free content
    checksum (sum of 32-bit md5 prefixes; commutative, so the value
    is independent of partitioning/merge order — ≤2⁴¹ for any shard
    that fits in memory, no overflow). This is the artifact a 100 TB
    packing job actually ships: the consumer re-derives the checksum
    after download and a single flipped document (content OR
    membership) changes it.

    Scale: reuses pipeline_pack_shards' two-pass distributed
    prefix-sum assignment (assign_shard_idx — parallelism =
    range-bucket cells, not streams), then one hash aggregate on the
    shard key. The md5 runs once per document over text already in
    hand — no extra scan beyond the assignment's bucket-cell
    shuffle."""
    packed = assign_shard_idx(_sized_documents(spark, sf_dir))
    chk = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    return packed.groupBy("lang", "source", "shard_idx").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(chk).alias("content_checksum"),
    )


@query(
    "webdataset_export_verify",
    oracle=f"""
    WITH {_PACKED_CTES},
    ids AS (
      SELECT *,
             CAST(dense_rank() OVER (ORDER BY lang, source, shard_idx) - 1
                  AS BIGINT) AS shard_id
      FROM packed
    ),
    members AS (
      SELECT shard_id, lang, source, 'txt' AS ext, text AS payload FROM ids
      UNION ALL
      SELECT shard_id, lang, source, 'json' AS ext,
             '{{"lang":"' || lang || '","source":"' || source || '"}}'
               AS payload
      FROM ids
    )
    SELECT shard_id, lang, source,
           CAST(count(*) FILTER (WHERE ext = 'txt') AS BIGINT) AS n_docs,
           count(*) AS n_members,
           CAST(sum(strlen(payload)) AS BIGINT) AS payload_bytes,
           CAST(sum(CAST(('0x' || substr(md5(payload), 1, 8)) AS BIGINT))
                AS BIGINT) AS content_checksum,
           CAST(1 AS BIGINT) AS tar_ok
    FROM members
    GROUP BY shard_id, lang, source
    """,
)
def webdataset_export_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5×L4h e2e (r7 verdict #7a): the WebDataset EXPORT composed
    with the packing pipeline as ONE oracle-checkable manifest query —
    assign_shard_idx → dense shard ids → two members per document
    (``<key>.txt`` text + ``<key>.json`` metadata) →
    sources/webdataset.write_tar_shards → verify by manifest diff,
    the multimodal twin of sinks/shards.py::verify_shards.

    What the oracle checks directly (pure functions of the corpus):
    per-shard doc/member counts, payload byte totals, and the
    order-free content checksum (sum of 32-bit md5 prefixes).
    What only Spark can check — and folds into ``tar_ok`` (1 iff ALL
    hold; the oracle expects literal 1): the tars read BACK with
    exactly the expected members/bytes/checksums, each tar file's
    whole-file md5 equals the write manifest's streamed ``tar_md5``,
    and its on-disk size equals the manifest's ``n_bytes``. A write
    bug, a read bug, or a checksum drift flips ``tar_ok`` or the
    counts and fails the external hash gate.

    Scale: assignment is the two-pass distributed prefix sum and
    materializes ONCE as a parquet member manifest (the artifact a
    real packing job persists anyway) — the tar write and the
    expected-side verification both read the persisted assignment
    instead of recomputing the prefix sum; the dense-id window runs
    on the DISTINCT shard-key table (O(shards) rows); every
    verification join is per-shard (broadcast); the tar write/read
    are one task per shard. Everything lands in a fresh temp dir per
    call, the final result (O(shards) rows) is collected and
    LOCALIZED, and the temp dir is REMOVED before returning — no
    residue accumulates across bench/audit/oracle invocations.

    Because the whole job runs eagerly, the returned frame is a
    LocalTableScan and PLANS.md sees only that — the constituent
    plans are audited via their component queries instead
    (pipeline_pack_shards covers the assignment; the tar write/read
    shapes are pinned in tests/test_webdataset.py)."""
    import shutil
    import tempfile

    sized = _sized_documents(spark, sf_dir)
    packed = assign_shard_idx(sized)
    # dense shard ids: window over the DISTINCT key table (shard
    # count rows, not corpus rows) — the single-partition sort is on
    # O(shards) data, then broadcast back
    keys = packed.select("lang", "source", "shard_idx").distinct()
    ids = keys.withColumn(
        "shard_id",
        (F.row_number().over(Window.orderBy("lang", "source", "shard_idx")) - 1
         ).cast("bigint"),
    )
    with_id = packed.join(F.broadcast(ids), ["lang", "source", "shard_idx"])
    meta_json = F.concat(
        F.lit('{"lang":"'), F.col("lang"),
        F.lit('","source":"'), F.col("source"), F.lit('"}'),
    )
    key_col = F.lpad(F.col("doc_id").cast("string"), 12, "0")
    members = (
        with_id.select(
            "shard_id", "lang", "source",
            key_col.alias("key"), F.lit("txt").alias("ext"),
            F.col("text").alias("payload_str"),
        )
        .unionByName(
            with_id.select(
                "shard_id", "lang", "source",
                key_col.alias("key"), F.lit("json").alias("ext"),
                meta_json.alias("payload_str"),
            )
        )
        .withColumn("payload", F.encode("payload_str", "UTF-8"))
        .drop("payload_str")
    )

    from flink_hiveorc_spark.sources.webdataset import (
        WRITE_MANIFEST_SCHEMA,
        read_tar_shards,
        write_tar_shards,
    )

    import os as _os

    root = tempfile.mkdtemp(prefix="fhs_wds_export_")
    # try/finally from mkdtemp onward: a failure anywhere (parquet
    # write, tar export, readback, joins) must not leak a temp dir
    # holding a full corpus copy — the "no residue" claim above holds
    # on the error path too
    try:
        out_dir = f"{root}/shards"
        # pre-create: an EMPTY corpus writes no tars, but the read side
        # still needs an (empty) directory to scan
        _os.makedirs(out_dir, exist_ok=True)
        # materialize the member assignment ONCE; both the tar write and
        # the expected-side aggregate read it back (one prefix-sum pass,
        # not two)
        members.write.parquet(f"{root}/members")
        persisted = spark.read.parquet(f"{root}/members")
        chk = F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10).cast("bigint")
        expected = persisted.groupBy("shard_id", "lang", "source").agg(
            F.sum(F.when(F.col("ext") == "txt", 1).otherwise(0)).alias("n_docs"),
            F.count("*").alias("n_members"),
            F.sum(F.octet_length("payload")).alias("payload_bytes"),
            F.sum(chk).alias("content_checksum"),
        )
        # the manifest IS the write job; collect is O(shards) rows
        manifest_rows = write_tar_shards(
            persisted.select("shard_id", "key", "ext", "payload"), out_dir
        ).collect()
        # explicit schema: an EMPTY corpus yields zero manifest rows, and
        # schema inference cannot run on an empty row list
        manifest = spark.createDataFrame(
            manifest_rows, schema=WRITE_MANIFEST_SCHEMA
        ).select(
            "shard_id",
            F.col("n_samples").alias("m_samples"),
            F.col("n_members").alias("m_members"),
            "n_bytes",
            "tar_md5",
        )

        shard_no = F.regexp_extract("shard", r"shard-(\d+)\.tar", 1).cast("bigint")
        readback = (
            read_tar_shards(spark, out_dir)
            .groupBy(shard_no.alias("shard_id"))
            .agg(
                F.count("*").alias("rb_members"),
                F.sum(F.octet_length("payload")).alias("rb_bytes"),
                F.sum(chk).alias("rb_checksum"),
            )
        )
        file_no = F.regexp_extract("path", r"shard-(\d+)\.tar", 1).cast("bigint")
        files = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.tar")
            .load(out_dir)
            .select(
                file_no.alias("shard_id"),
                F.md5("content").alias("file_md5"),
                F.col("length").alias("file_len"),
            )
        )
        joined = (
            expected.join(F.broadcast(manifest), "shard_id")
            .join(F.broadcast(readback), "shard_id")
            .join(F.broadcast(files), "shard_id")
        )
        tar_ok = (
            (F.col("m_samples") == F.col("n_docs"))
            & (F.col("m_members") == F.col("n_members"))
            & (F.col("n_members") == F.col("rb_members"))
            & (F.col("payload_bytes") == F.col("rb_bytes"))
            & (F.col("content_checksum") == F.col("rb_checksum"))
            & (F.col("tar_md5") == F.col("file_md5"))
            & (F.col("n_bytes") == F.col("file_len"))
        )
        result_schema = (
            "shard_id bigint, lang string, source string, n_docs bigint, "
            "n_members bigint, payload_bytes bigint, content_checksum bigint, "
            "tar_ok bigint"
        )
        # collect (O(shards) rows) and LOCALIZE so the temp dir can be
        # removed NOW — the returned frame must not depend on the files
        rows = joined.select(
            "shard_id", "lang", "source", "n_docs",
            F.col("n_members").alias("n_members"),
            "payload_bytes", "content_checksum",
            F.when(tar_ok, 1).otherwise(0).cast("bigint").alias("tar_ok"),
        ).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema=result_schema)


@query(
    "events_hourly_concurrency",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, t_us, event_id,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sessions AS (
      SELECT user_id,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq,
             t_us
      FROM flagged
    ),
    spans AS (
      SELECT user_id, session_seq,
             min(t_us) // {_HOUR_US} AS h_lo,
             max(t_us) // {_HOUR_US} AS h_hi
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT h AS hour_idx,
           count(*) AS n_active_sessions,
           count(DISTINCT user_id) AS n_active_users
    FROM spans, UNNEST(range(h_lo, h_hi + 1)) AS t(h)
    GROUP BY h
    """,
)
def events_hourly_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4n: hourly concurrency — how many sessions (and distinct
    users) were ACTIVE in each hour, computed by flattening session
    intervals onto the hour grid (the interval→bucket explode that
    powers concurrency/occupancy/utilization analytics over any
    interval table).

    Scale: sessions compress each user's events to one row per
    session BEFORE the hour explode, and a session spans few hours —
    the exploded row count is O(sessions · avg_hours), never
    O(events). One shuffle for sessionization (reused by the span
    aggregate — same user_id partitioning), one for the final
    per-hour aggregate. Integer hour indices, exact everywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.select(
        "user_id",
        "t_us",
        "event_id",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    # (t_us, event_id) total order: under timestamp ties the running
    # sum would otherwise assign engine-dependent session membership
    w_seq = Window.partitionBy("user_id").orderBy("t_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = flagged.select(
        "user_id", "t_us", F.sum("is_start").over(w_seq).alias("session_seq")
    )
    spans = sess.groupBy("user_id", "session_seq").agg(
        F.expr(f"min(t_us) div {_HOUR_US}").alias("h_lo"),
        F.expr(f"max(t_us) div {_HOUR_US}").alias("h_hi"),
    )
    return (
        spans.select(
            "user_id",
            F.explode(F.sequence(F.col("h_lo"), F.col("h_hi"))).alias("hour_idx"),
        )
        .groupBy("hour_idx")
        .agg(
            F.count("*").alias("n_active_sessions"),
            F.countDistinct("user_id").alias("n_active_users"),
        )
    )


@query(
    "events_transition_matrix",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             lag(event_type) OVER w AS prev_type,
             lag(epoch_us(ts)) OVER w AS prev_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    transitions AS (
      SELECT prev_type, event_type AS next_type
      FROM ordered
      WHERE prev_type IS NOT NULL AND t_us - prev_us <= {SESSION_GAP_US}
    ),
    counted AS (
      SELECT prev_type, next_type, count(*) AS n
      FROM transitions GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type), 8) AS p
    FROM counted
    ORDER BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4l/§2.5-adjacent: first-order Markov transition matrix over
    within-session event pairs — the "what do users do next" model
    behind funnel design and next-action prediction features.

    Consecutive-event pairs come from a lag window on (user_id) —
    the SAME shuffle sessionization uses, so on a shared pipeline the
    exchange is reused. Cross-session pairs (gap > 30 min) are
    excluded: a transition spanning a sessions boundary is noise, not
    behavior. The transition count matrix is at most |event_types|²
    rows (here ≤ 25) regardless of corpus size — the groupBy collapses
    map-side, and the row-probability normalization runs on the tiny
    result, not the events. Probabilities are a single double divide
    rounded to 8 decimals in both engines (n and row totals are
    integer-exact)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    ordered = ev.select(
        "event_type",
        F.col("t_us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("t_us").over(w).alias("prev_us"),
    )
    counted = (
        ordered.filter(
            F.col("prev_type").isNotNull()
            & (F.col("t_us") - F.col("prev_us") <= SESSION_GAP_US)
        )
        .select(F.col("prev_type"), F.col("event_type").alias("next_type"))
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    return counted.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wp), 8).alias("p"),
    ).orderBy("prev_type", "next_type")


_TOP_PATHS = 20


@query(
    "events_top_paths",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us,
             lag(event_type, 1) OVER w AS p1,
             lag(epoch_us(ts), 1) OVER w AS t1,
             lag(event_type, 2) OVER w AS p2,
             lag(epoch_us(ts), 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS path, count(*) AS n
    FROM ordered
    WHERE p2 IS NOT NULL
      AND t_us - t1 <= {SESSION_GAP_US}
      AND t1 - t2 <= {SESSION_GAP_US}
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT {_TOP_PATHS}
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4n/§2.5: top 3-step behavioral paths (sequence mining) — the
    journey view funnels and transition matrices summarize away: which
    exact a→b→c sequences dominate within sessions.

    Two lags over the SAME (user_id, time) window sessionization and
    the transition matrix use — in a shared pipeline all three reuse
    one exchange + sort. Both inter-event gaps must sit inside the
    session window (a path spanning a session boundary is two visits,
    not one journey). The path space is ≤ |event_types|³ = 125 after
    the map-side-combined count, and the top-20 is a
    TakeOrderedAndProject, not a full sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    ordered = ev.select(
        "event_type",
        "t_us",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("t_us", 1).over(w).alias("t1"),
        F.lag("event_type", 2).over(w).alias("p2"),
        F.lag("t_us", 2).over(w).alias("t2"),
    )
    return (
        ordered.filter(
            F.col("p2").isNotNull()
            & (F.col("t_us") - F.col("t1") <= SESSION_GAP_US)
            & (F.col("t1") - F.col("t2") <= SESSION_GAP_US)
        )
        .select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_TOP_PATHS)
    )


@query(
    "sessionize_native_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, t_us,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, t_us,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT user_id,
           count(*) AS n_events,
           min(t_us) AS start_us,
           CAST((max(t_us) - min(t_us)) AS BIGINT) AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, start_us
    """,
)
def sessionize_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/L4g twin: sessionization via Spark's NATIVE session_window
    operator, value-pinned EQUAL to the hand-rolled gaps-and-islands
    formulation (sessionize_events) through the same SQL oracle.

    Why both exist: session_window is one groupBy (Spark merges
    overlapping per-event windows internally — no lag, no running
    sum, and it is the only formulation Structured Streaming accepts
    for session aggregation), while gaps-and-islands generalizes to
    per-event session attribution. Proving them equal on the corpus
    certifies the native operator can replace the window pass in any
    downstream pipeline. Boundary semantics differ ONLY on exact
    30-minute gaps (native: window end is exclusive, an event at
    exactly prev+gap starts a NEW session; hand-rolled `> gap` keeps
    it) — the corpus has zero exact-gap pairs at any sf (checked), so
    the oracle pins equality on everything else."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr("ts_ns div 1000").alias("t_us"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("t_us").alias("start_us"),
            (F.max("t_us") - F.min("t_us")).cast("bigint").alias("duration_us"),
        )
        .select("user_id", "n_events", "start_us", "duration_us")
        .orderBy("user_id", "start_us")
    )


_CEP_TOKENS = "click(>view)*>purchase"
# Anchored so tokens match WHOLE event types, not substrings (ADVICE
# r5: unanchored, a future 'preview' or 'clickthrough' event type
# would silently false-match and diverge from the streaming
# automaton's exact token comparison). Lookarounds are out — DuckDB's
# RE2 lacks them — so the anchors consume the bounding '>' (or
# string edge) and both engines strip them back off the extracted
# match, keeping the `matched` artifact format unchanged.
_CEP_PATTERN = f"(^|>){_CEP_TOKENS}($|>)"

# Session-assignment CTE chain shared by the CEP query (same
# gaps-and-islands formulation as sessionize_events, with event_type
# carried through to the per-session sequence string).
_SESSION_SEQ_SQL = f"""
    ordered AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, event_type, t_us,
             CASE WHEN prev_us IS NULL OR t_us - prev_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, event_id, event_type, t_us,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY t_us, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_seq
      FROM flagged
    ),
    seqs AS (
      SELECT user_id, session_seq,
             count(*) AS n_events,
             string_agg(event_type, '>' ORDER BY t_us, event_id) AS seq
      FROM sessions
      GROUP BY user_id, session_seq
    )
"""


@query(
    "events_pattern_cep",
    oracle=f"""
    WITH {_SESSION_SEQ_SQL}
    SELECT user_id, session_seq, n_events,
           regexp_replace(regexp_extract(seq, '{_CEP_PATTERN}', 0), '^>|>$', '', 'g') AS matched
    FROM seqs
    WHERE regexp_matches(seq, '{_CEP_PATTERN}')
    """,
)
def events_pattern_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-adjacent/§2.8: complex-event-processing pattern detection —
    the batch twin of Flink CEP's `Pattern.begin("click")
    .followedBy(view*).next("purchase")`: find sessions whose event
    sequence contains click (>view)* purchase, i.e. a click that
    converts to a purchase with only views in between.

    MATCH_RECOGNIZE-style sequence patterns compile to a REGEX over
    the per-session event-type string: one window pass assigns
    sessions (shared shape with sessionize_events), one aggregate
    builds the ordered `a>b>c` sequence string, and the pattern is a
    single regexp per session row. Both engines use leftmost-first
    regex semantics (java.util.regex / RE2), and the sequence order
    is total (t_us, event_id), so the matched substring is
    deterministic.

    100 TB: state per session is one bounded string (sessions are
    gap-bounded); the pattern match is a scan over the session table,
    not the event stream — CEP as a corpus-sized, not event-sized,
    operator. Longer patterns and within-window constraints compose
    by editing the regex / adding a duration predicate; per-event
    state machines (Flink's runtime shape) are only needed online —
    see streaming/windows.py applyInPandasWithState for that half."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    flagged = ev.select(
        "*",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sess = flagged.select(
        "*",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    seqs = (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.array_sort(
                F.collect_list(F.struct("t_us", "event_id", "event_type"))
            ).alias("arr"),
        )
        .select(
            "user_id",
            "session_seq",
            "n_events",
            F.concat_ws(">", F.transform("arr", lambda x: x["event_type"])).alias("seq"),
        )
    )
    return seqs.filter(F.col("seq").rlike(_CEP_PATTERN)).select(
        "user_id",
        "session_seq",
        "n_events",
        F.regexp_replace(
            F.regexp_extract("seq", _CEP_PATTERN, 0), "^>|>$", ""
        ).alias("matched"),
    )


_EWMA_TAPS = 16  # trailing events in the dyadic smoother


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"coalesce(lag(v_cents, {k}) OVER (PARTITION BY user_id ORDER BY t_us, event_id), 0) * {1 << (_EWMA_TAPS - 1 - k)}"
        for k in range(_EWMA_TAPS)
    )
    return f"""
    WITH vc AS (
      SELECT event_id, user_id, epoch_us(ts) AS t_us,
             CAST(round(value * 100) AS BIGINT) AS v_cents
      FROM events
    )
    SELECT event_id, user_id, t_us, v_cents,
           CAST({terms} AS BIGINT) AS ewma_units
    FROM vc
    """


@query("events_ewma_smoothing", oracle=_ewma_oracle())
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5/L4 time-series: exponentially-weighted moving average of
    per-user event values — the classic stream smoother s_t = v_t +
    s_{t-1}/2, truncated at 16 taps, IN INTEGER UNITS: values are
    quantized to cents and the weight for the k-th most recent event
    is the integer 2^(15-k) (α = 1/2 half-life, scaled by 2^15 so
    the smallest weight is exactly 1). ewma_units is a BIGINT —
    renormalize by 2^15/... ≈ /65536 downstream if a float view is
    wanted; keeping the artifact integral makes it engine- and
    partition-order-exact (the same 2^k discipline as PageRank's rank
    units and SimHash's bit blocks).

    Truncation error is bounded by max|v|·2^-16 of the untruncated
    EWMA — below one cent-unit here. The 16 lag terms compile into
    ONE window pass (all lags share the (user_id, t_us, event_id)
    frame — Spark evaluates them in a single WindowExec over one
    shuffle), so at 100 TB this costs exactly what any per-key window
    costs; no per-row state machine, no UDF."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts_ns div 1000").alias("t_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("v_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    ewma = sum(
        F.coalesce(F.lag("v_cents", k).over(w), F.lit(0))
        * F.lit(1 << (_EWMA_TAPS - 1 - k))
        for k in range(_EWMA_TAPS)
    )
    return ev.select(
        "event_id", "user_id", "t_us", "v_cents", ewma.cast("bigint").alias("ewma_units")
    )


_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_QUERY = ("hash", "join", "stream")
_BM25_TOPK = 20


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH tokens AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY doc_id),
    stats AS (
      SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             count(*) AS n_docs
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tokens
      WHERE term IN {_BM25_QUERY!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             count(*) AS n_query_terms_hit,
             round(sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
             ), 8) AS score
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, n_query_terms_hit, score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4e': BM25 full-text ranking (Robertson & Zaragoza 2009, "The
    Probabilistic Relevance Framework: BM25 and Beyond"; idf in the
    Lucene ln(1 + (N-df+0.5)/(df+0.5)) form, k1=1.2, b=0.75) — the
    retrieval-scoring complement to raw TF-IDF: tf saturation plus
    doc-length normalization, scored for a fixed 3-term query and
    reporting the top-20 documents.

    Shape: token explode → per-doc length aggregate + per-(doc,
    query-term) tf aggregate (the tf side filters to the query terms
    BEFORE aggregating, so the shuffled volume is queries-hit rows,
    not the whole postings list); df and the (avgdl, N) stats are
    tiny aggregates broadcast onto the scored rows; top-20 is a
    TakeOrdered on (score DESC, doc_id). Scores round to 8 decimals
    in both engines before ranking (the tfidf discipline: inputs are
    exact ints, one ln + a few IEEE ops, round absorbs last-ulp libm
    drift — and ranking on the ROUNDED score keeps the order
    engine-identical).

    100 TB: this is the batch "score the corpus against a query"
    sweep (eval-retrieval, contamination scoring); per-query cost is
    one corpus scan with term filters pushed to the parquet reader
    when the postings are pre-exploded."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.regexp_extract_all("text", F.lit("([a-z]+)"))).alias("term")
    )
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf = (
        tokens.filter(F.col("term").isin(*_BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (
        F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_query_terms_hit"),
            F.round(F.sum(idf * tf_part), 8).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(_BM25_TOPK)


@query(
    "agg_entropy_mixing",
    oracle="""
    WITH src AS (
      SELECT lang, source, count(*) AS c
      FROM documents GROUP BY lang, source
    ),
    per_lang AS (
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_docs,
             count(*) AS n_sources,
             CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1e9 ) AS BIGINT)) AS BIGINT)
               AS clnc_e9
      FROM src GROUP BY lang
    )
    SELECT lang, n_docs, n_sources,
           round(ln(CAST(n_docs AS DOUBLE)) - (clnc_e9 / 1e9) / n_docs, 8) AS entropy_nats,
           round((ln(CAST(n_docs AS DOUBLE)) - (clnc_e9 / 1e9) / n_docs)
                 / ln(CAST(n_sources AS DOUBLE)), 8) AS norm_entropy
    FROM per_lang
    WHERE n_sources > 1
    """,
)
def agg_entropy_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4o: Shannon entropy of the SOURCE mix per language — the
    mixture-diversity health metric of a training-data pipeline (a
    lang whose tokens come from two sources has low entropy however
    many documents it has; the normalized form is entropy / ln(k),
    1.0 = perfectly balanced).

    Order-independence engineering: H = ln N − (Σ c·ln c)/N, and the
    only floating SUM (Σ c·ln c over sources) is quantized per TERM
    to integer 1e-9 units before aggregation — each term is one
    deterministic ln+multiply on exact integers, the sum is then a
    BIGINT sum (partition-order independent), and the final H is
    arithmetic on two scalars. Same discipline as chi2_total_e8 and
    the temperature-weights query (SURVEY §7.5's order-dependent-
    float-sum trap).

    Shape: one (lang, source) count aggregate — cardinality
    languages × sources, tiny forever — then a per-lang aggregate of
    that. Two map-side-combined shuffles over cell-sized data."""
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    per_lang = src.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").alias("n_sources"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c").cast("double")) * 1e9).cast("bigint")
        )
        .cast("bigint")
        .alias("clnc_e9"),
    )
    h = F.log(F.col("n_docs").cast("double")) - (F.col("clnc_e9") / 1e9) / F.col("n_docs")
    return per_lang.filter(F.col("n_sources") > 1).select(
        "lang",
        "n_docs",
        "n_sources",
        F.round(h, 8).alias("entropy_nats"),
        F.round(h / F.log(F.col("n_sources").cast("double")), 8).alias("norm_entropy"),
    )


@query(
    "compaction_service_verify",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n_orders,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(sum((o_orderkey * 2654435761) % 1000003) AS BIGINT)
             AS key_checksum,
           CAST(1 AS BIGINT) AS compact_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def compaction_service_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 e2e (r8 verdict #7): the small-file COMPACTION SERVICE
    (sinks/compaction.py) as one oracle-checked query — the
    sinks-side analog of webdataset_export_verify. The orders table
    is landed as three micro-batches of small ORC files (a
    hand-authored `_spark_metadata` manifest per batch, the file-sink
    layout the compactor consumes), then: minor run over batches 0-1
    → incremental batch 2 → landing-tail read → major fold → no-op
    convergence re-run, with crash debris (a data-bearing `__tmp` run
    dir) planted to prove the manifest protocol keeps it invisible.

    What the oracle checks directly (pure functions of orders): the
    per-status counts, key range, and the order-free multiplicative-
    hash checksum of the SERVING table after the major fold — if
    compaction dropped, duplicated, or corrupted any row anywhere in
    the landing→run→manifest→read chain, these diverge. What only
    Spark can check — folded into ``compact_ok`` (1 iff ALL hold; the
    oracle expects literal 1): minor-run commit/coverage, the
    tail-inclusive read completing the not-yet-compacted suffix, the
    major fold retiring runs to exactly one, the convergence re-run
    committing nothing, and the serving file count SHRINKING below
    the landing file count (the metric compaction exists for).

    Scale: every compaction input is the NEW batches' files only
    (incremental, cost ∝ ingest since last run); the major is the
    deliberate full rewrite; verification aggregates are one hash-agg
    per side. Temp dir try/finally — no residue on any path."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile
    from glob import glob as _glob

    from flink_hiveorc_spark.sinks.compaction import (
        compact_streaming_sink,
        data_file_count,
        read_compacted,
    )

    ord_df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    root = _tempfile.mkdtemp(prefix="fhs_compaction_verify_")
    try:
        landing = f"{root}/landing"
        serving = f"{root}/serving"
        _os.makedirs(landing, exist_ok=True)

        def _list_files():
            return {
                p
                for p in _glob(f"{landing}/**/*.orc", recursive=True)
                if "_spark_metadata" not in p
            }

        meta = f"{landing}/_spark_metadata"
        _os.makedirs(meta, exist_ok=True)
        seen: set = set()

        def _land_batch(i: int) -> None:
            (
                ord_df.filter(F.col("o_orderkey") % 3 == i)
                .repartition(4)
                .write.format("orc")
                .mode("append")
                .partitionBy("o_orderstatus")
                .save(landing)
            )
            new = sorted(_list_files() - seen)
            seen.update(new)
            import json as _json

            with open(f"{meta}/{i}", "w") as fh:
                fh.write("v1\n")
                for p in new:
                    fh.write(_json.dumps({"path": "file:" + p, "action": "add"}) + "\n")

        result_schema = (
            "status string, n_orders bigint, min_key bigint, max_key bigint, "
            "key_checksum bigint, compact_ok bigint"
        )
        _land_batch(0)
        _land_batch(1)
        if not seen:
            # empty corpus: the landing sink wrote no files, so there
            # is nothing to compact and nothing to verify — zero
            # groups, exactly what the oracle returns
            return spark.createDataFrame([], schema=result_schema)
        n01 = ord_df.filter(F.col("o_orderkey") % 3 < 2).count()
        n_total = ord_df.count()

        # crash debris: a data-bearing tmp run dir the protocol must ignore
        debris = f"{serving}/run-0000000099-0099__tmp"
        _os.makedirs(debris, exist_ok=True)
        _shutil.copy(next(iter(seen)), f"{debris}/part-junk.orc")

        rep1 = compact_streaming_sink(
            spark, landing, serving, "o_orderstatus", fmt="orc"
        )
        ok = rep1["committed"] and rep1["through"] == 1 and len(rep1["runs"]) == 1
        ok = ok and read_compacted(
            spark, landing, serving, fmt="orc", include_landing_tail=False
        ).count() == n01

        _land_batch(2)
        ok = ok and read_compacted(spark, landing, serving, fmt="orc").count() == n_total

        rep2 = compact_streaming_sink(
            spark, landing, serving, "o_orderstatus", fmt="orc", major=True
        )
        ok = ok and rep2["committed"] and len(rep2["runs"]) == 1
        ok = ok and rep2["gen"] == rep1["gen"] + 1
        serving_df = read_compacted(
            spark, landing, serving, fmt="orc", include_landing_tail=False
        )
        # convergence: nothing new → the re-run must commit nothing
        rep3 = compact_streaming_sink(
            spark, landing, serving, "o_orderstatus", fmt="orc"
        )
        ok = ok and not rep3["committed"]
        ok = ok and data_file_count(serving) < data_file_count(landing)

        # collect (O(statuses) rows) and LOCALIZE so the temp dir can
        # be removed now — the returned frame must not depend on it
        chk = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(1000003)
        rows = (
            serving_df.groupBy(F.col("o_orderstatus").alias("status"))
            .agg(
                F.count("*").alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
                F.sum(chk).alias("key_checksum"),
                F.lit(1 if ok else 0).cast("bigint").alias("compact_ok"),
            )
            .collect()
        )
    finally:
        _shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, schema=result_schema)


@query(
    "events_funnel_dwell_times",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events
    ),
    s1 AS (
      SELECT user_id, min(t_us) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.t_us) AS t2, min(s1.t1) AS t1
      FROM ev e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.t_us > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.t_us) AS t3, min(s2.t2) AS t2
      FROM ev e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.t_us > s2.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1) AS n_viewed,
           (SELECT count(*) FROM s2) AS n_clicked,
           (SELECT count(*) FROM s3) AS n_purchased,
           (SELECT CAST(sum(t2 - t1) AS BIGINT) FROM s2)
             AS sum_view_to_click_us,
           (SELECT CAST(sum(t3 - t2) AS BIGINT) FROM s3)
             AS sum_click_to_purchase_us
    """,
)
def events_funnel_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4o: step-CHAINED funnel with dwell times — view → click →
    purchase where each step is the first occurrence strictly AFTER
    the previous step's chosen time. Distinct from
    events_funnel_conversion, which compares each type's GLOBAL first
    occurrence: a user whose first click precedes their first view
    but who clicks again afterwards advances here and not there —
    the chained semantics is what time-to-convert measurement needs,
    and this variant reports the dwell sums. Also distinct from the
    CEP automaton (events_pattern_cep matches contiguous patterns);
    a funnel tolerates arbitrary interleaved events between steps.

    Semantics: per user, t1 = first 'view'; t2 = first 'click' with
    t > t1; t3 = first 'purchase' with t > t2. Counts per stage plus
    exact integer µs dwell sums (averages are one trailing division
    away and deliberately left to the consumer — keeping the record
    exact-int keeps it engine-portable).

    Scale: each stage filters its event type FIRST (predicate reaches
    the scan), min-aggregates per user (map-side partial shrinks the
    shuffle to one row per user), then joins user-level tables on
    user_id — never event×event. Three user_id shuffles total; the
    final three 1-row aggregates broadcast-cross-join into one row."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("t_us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("t_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2"), "user_id")
        .filter(F.col("t_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("t_us").alias("t3"), F.min("t2").alias("t2"))
    )
    a = s1.agg(F.count("*").alias("n_viewed"))
    b = s2.agg(
        F.count("*").alias("n_clicked"),
        F.sum(F.col("t2") - F.col("t1")).alias("sum_view_to_click_us"),
    )
    c = s3.agg(
        F.count("*").alias("n_purchased"),
        F.sum(F.col("t3") - F.col("t2")).alias("sum_click_to_purchase_us"),
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .select(
            "n_viewed", "n_clicked", "n_purchased",
            "sum_view_to_click_us", "sum_click_to_purchase_us",
        )
    )
