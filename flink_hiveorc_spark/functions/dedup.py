"""Deduplication operators for LLM data pipelines (SURVEY.md §2.10
L1/L2): exact hash dedup, n-gram Jaccard near-dup, MinHash signatures
+ LSH candidate pairing, SimHash fingerprints.

Engine-portability design: every hash is md5-derived (identical hex in
Spark and DuckDB) and every similarity is a ratio of exact integer
counts, so the oracle hash-matches bit-for-bit. At 100 TB:

- exact dedup is a hash aggregate (shuffle on the 128-bit digest —
  uniformly distributed, skew-free by construction);
- near-dup NEVER does an O(n²) cross join: candidates come from an
  inverted index on shingles (or MinHash bands), i.e. a self-join on
  a high-cardinality key. At real scale you additionally drop
  ultra-frequent shingles (document-frequency cap) before the join —
  the `df_cap` parameter below; with md5-banded LSH the candidate
  count is tunable via (bands, rows-per-band).

Algorithms are the published classics: MinHash resemblance sketches
(Broder, "On the resemblance and containment of documents", 1997),
banded LSH candidate generation (Leskovec/Rajaraman/Ullman, "Mining
of Massive Datasets" ch. 3), SimHash similarity fingerprints
(Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002) — re-expressed as declarative Spark plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_hiveorc_spark.catalog import load_table, parallelize_small_scan
from flink_hiveorc_spark.registry import query
from flink_hiveorc_spark.session import reliable_checkpoint

N_MINHASH = 8
JACCARD_THRESHOLD = 0.2


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact content dedup — group on the content digest, keep the
    lowest doc_id as canonical. One shuffle on a uniform key."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "dedup_exact_normalized",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 variant: case/whitespace-normalized before hashing."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return d.groupBy(F.md5(norm).alias("content_hash")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
    )


def _shingle_docs(d: DataFrame) -> DataFrame:
    """documents → (doc_id, s: array<string> of distinct 3-word
    shingles); docs shorter than 3 words yield one degenerate shingle
    (the whole text).

    The words array is materialized in its own projection before the
    shingle transform — referencing `split(text)` inside the lambda
    would re-split the text per shingle position (O(words²) per doc;
    measured 9s → <1s at sf0.1 for this exact reason).
    """
    wd = d.select("doc_id", "text", F.split("text", " ").alias("w"))
    w = F.col("w")
    n = F.size(w)
    tri = F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2), F.element_at(w, i + 3)
        ),
    )
    return wd.select(
        "doc_id",
        F.array_distinct(F.when(n >= 3, tri).otherwise(F.array(F.col("text")))).alias("s"),
    )


_SHINGLES_SQL = """
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
               ELSE [text] END) AS s
      FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
"""


@query(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS n_sh FROM sh),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) AS jaccard
    FROM shared
    WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2a: near-duplicate pairs by 3-gram shingle Jaccard ≥ 0.2.

    Candidates come from an inverted-index self-join on shingles (only
    docs sharing ≥1 shingle ever meet) — no cross join. Jaccard =
    |∩| / (|A|+|B|-|∩|), all exact integer counts. Uncapped here for
    oracle parity; at scale pass ``df_cap`` (see ngram_jaccard_pairs)
    or use the MinHash-LSH variant below.
    """
    return ngram_jaccard_pairs(
        parallelize_small_scan(load_table(spark, sf_dir, "documents")), df_cap=None
    )


def ngram_jaccard_pairs(d: DataFrame, df_cap: int | None = None) -> DataFrame:
    """Near-duplicate pairs by 3-gram shingle Jaccard (the reusable
    operator behind the registered query).

    ``df_cap``: drop shingles appearing in more than `df_cap`
    documents BEFORE the self-join. A shingle in k docs contributes
    k² candidate rows — one viral boilerplate line in 10⁶ docs is a
    10¹²-row join all by itself, so at scale an explicit cap on
    shingle document-frequency is mandatory (the dropped shingles are
    exactly the ones with no discriminative power). Note the cap
    slightly UNDERCOUNTS n_shared for pairs that shared a dropped
    shingle — acceptable for near-dup mining, which is why the
    oracle-checked query runs uncapped.
    """
    shared = shingle_shared_counts(d, df_cap)
    jac = F.col("n_shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return shared.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def shingle_shared_counts(d: DataFrame, df_cap: int | None = None) -> DataFrame:
    """Inverted-index shared-shingle counting — the common core of the
    Jaccard and containment pair miners: (doc_a, doc_b, n_shared,
    n_a, n_b) for every doc pair sharing ≥1 shingle."""
    sh = _shingle_docs(d)
    # explode_outer, NOT explode: plain explode pushes an implicit
    # `size(s)>0 AND isnotnull(s)` filter below the shingle projection,
    # re-inlining the whole O(words²) expression into the Filter (4.8s
    # → 1.3s at sf0.1). `s` is non-empty by construction, so outer is
    # semantically identical here.
    #
    # The explicit repartition on the self-join key makes the exploded
    # frame compute-once/read-twice (both join sides consume the same
    # exchange, already partitioned for the join): 4.3s → 1.7s at
    # sf0.1.
    ex = sh.select(
        "doc_id", F.explode_outer("s").alias("shingle"), F.size("s").alias("n_sh")
    ).repartition(F.col("shingle"))
    if df_cap is not None:
        # Window count over the shingle partitioning already in place
        # (no extra shuffle: the frame is partitioned on shingle).
        from pyspark.sql.window import Window as _W

        df_count = F.count("*").over(_W.partitionBy("shingle"))
        ex = ex.select("*", df_count.alias("_df")).filter(F.col("_df") <= df_cap).drop("_df")
    a = ex.alias("a")
    b = ex.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_shared"),
            F.first("a.n_sh").alias("n_a"),
            F.first("b.n_sh").alias("n_b"),
        )
    )


CONTAINMENT_THRESHOLD = 0.6


@query(
    "dedup_ngram_containment_pairs",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS n_sh FROM sh),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / least(n_a, n_b) AS containment
    FROM shared
    WHERE CAST(n_shared AS DOUBLE) / least(n_a, n_b) >= {CONTAINMENT_THRESHOLD}
    """,
)
def dedup_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2a': SUBSET duplication — containment C(A,B) = |A∩B| /
    min(|A|,|B|) ≥ 0.6 (Broder's resemblance-vs-containment split,
    SEQUENCES '97): a short doc quoted inside a long one scores ~1.0
    here but near 0 on Jaccard (the union is dominated by the long
    doc), so this catches the quote/boilerplate-embedding duplicates
    the symmetric measures structurally cannot. Same inverted-index
    core as the Jaccard miner (shingle_shared_counts) — only the
    final score differs; all counts exact integers."""
    shared = shingle_shared_counts(
        parallelize_small_scan(load_table(spark, sf_dir, "documents")), df_cap=None
    )
    cont = F.col("n_shared").cast("double") / F.least("n_a", "n_b")
    return shared.select("doc_a", "doc_b", cont.alias("containment")).filter(
        F.col("containment") >= CONTAINMENT_THRESHOLD
    )


def _hash_pairs_col(s: F.Column | str = "s") -> F.Column:
    """Per-shingle 2×32-bit hash pair from ONE md5: h1 = digest hex
    [1..8], h2 = hex [9..16]. The N_MINHASH families are derived as
    g_i = h1 + i·h2 (Kirsch–Mitzenmacher double hashing — standard
    substitute for independent hash families in Bloom/MinHash
    constructions). One md5 per shingle instead of N_MINHASH of them:
    the digest stage was the measured hot spot (0.9s of 1.9s at
    sf0.1), and at 100 TB hashing IS the dedup job's compute bill.

    Max value h1 + 7·h2 < 2³⁵ — no BIGINT overflow in either engine
    (DuckDB raises on overflow rather than wrapping, so staying far
    below 2⁶³ is correctness, not just hygiene)."""
    s = F.col(s) if isinstance(s, str) else s
    return F.transform(
        s,
        lambda x: F.struct(
            F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("bigint").alias("h1"),
            F.conv(F.substring(F.md5(x), 9, 8), 16, 10).cast("bigint").alias("h2"),
        ),
    )


def _minhash_from_pairs(hs: F.Column | str = "hs") -> list[F.Column]:
    """Signature component i = min over shingles of h1 + i·h2, via
    array_min(transform(...)) — a pure per-row projection over the
    hash-pair ARRAY. No explode, no 52×-row blowup, no groupBy
    shuffle: at 100 TB the signature stage is map-only. Must be
    applied to a SEPARATE projection of _hash_pairs_col (two selects)
    so CollapseProject cannot inline the md5 transform into each of
    the N_MINHASH mins."""
    hs = F.col(hs) if isinstance(hs, str) else hs
    return [
        F.array_min(
            F.transform(hs, lambda p: p.getField("h1") + F.lit(i) * p.getField("h2"))
        ).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]


_MINHASH_SQL_COLS = ",\n           ".join(
    f"min(h1 + {i} * h2) AS mh{i}" for i in range(N_MINHASH)
)

# Per-shingle hash pair for oracles: one md5, split into two 32-bit
# halves (hex → BIGINT via the 0x-prefix cast).
_HASH_PAIR_SQL = """
      SELECT doc_id,
             CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
             CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
"""


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hp AS (
      {_HASH_PAIR_SQL}
      FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
    )
    SELECT doc_id,
           {_MINHASH_SQL_COLS}
    FROM hp
    GROUP BY doc_id
    """,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b: per-document MinHash signature (8 hashes), map-only —
    signature size is constant per doc regardless of document length:
    the sketch that makes near-dup feasible at 100 TB (downstream
    stages carry 8 longs per doc, not shingle sets, and the
    signature stage itself shuffles nothing). Two-step projection:
    md5 hash pairs once, then the 8 derived mins (see
    _hash_pairs_col)."""
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    return (
        _shingle_docs(d)
        .select("doc_id", _hash_pairs_col("s").alias("hs"))
        .select("doc_id", *_minhash_from_pairs("hs"))
    )


_BANDS = [(0, 1), (2, 3), (4, 5), (6, 7)]  # 4 bands × 2 rows


# The full pairs oracle is also reused (as a CTE) by the
# connected-components oracle below. Verification happens on the
# DISTINCT h1 (32-bit md5-derived) hashed shingle sets, mirroring the
# Spark side exactly: both engines derive h1 from the same md5 hex, so
# any h1 collision collapses the same two shingles in both — the
# Jaccard values stay bit-identical cross-engine.
_LSH_PAIRS_ORACLE = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hp AS (
      {_HASH_PAIR_SQL}
      FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
    ),
    sig AS (
      SELECT doc_id,
             {_MINHASH_SQL_COLS}
      FROM hp
      GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS key FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
      UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    hx AS (SELECT DISTINCT doc_id, h1 FROM hp),
    nx AS (SELECT doc_id, count(*) AS n_sh FROM hx GROUP BY doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_shared
      FROM cand c
      JOIN hx a ON a.doc_id = c.doc_a
      JOIN hx b ON b.doc_id = c.doc_b AND b.h1 = a.h1
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT v.doc_a, v.doc_b,
           CAST(v.n_shared AS DOUBLE) / (na.n_sh + nb.n_sh - v.n_shared) AS jaccard
    FROM verified v
    JOIN nx na ON na.doc_id = v.doc_a
    JOIN nx nb ON nb.doc_id = v.doc_b
    WHERE CAST(v.n_shared AS DOUBLE) / (na.n_sh + nb.n_sh - v.n_shared) >= {JACCARD_THRESHOLD}
"""


@query("dedup_minhash_lsh_pairs", oracle=_LSH_PAIRS_ORACLE)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2c: the full MinHash → LSH banding → verify pipeline.

    4 bands × 2 rows: docs colliding on any band become candidates
    (P[cand] = 1-(1-j²)⁴ — steep around j≈0.4), then Jaccard over the
    hashed shingle sets verifies ≥ 0.2. The banded join is the scale
    path: candidate generation touches only (doc, band-key) rows,
    never pairs.

    The verify stage intersects DISTINCT h1 (32-bit md5-derived)
    hashed shingle sets, not the string shingle arrays: at 100 TB the
    verify join's shuffle payload is a dominant cost, and 8-byte
    ints are ~an order of magnitude smaller than 3-word shingle
    strings (with the parallelized hash stage: 1.57s → 1.35s at
    sf0.1, where compute, not shuffle, is the local bottleneck — the
    payload ratio is the scale win). A per-pair h1 collision
    (P ≈ |union|²/2³³) can merge two shingles, but the oracle derives
    h1 from the same md5 hex, so both engines collapse identically —
    cross-engine bit-equality is preserved, and the Jaccard estimate
    error from a single collision at realistic set sizes is < 1e-2.
    """
    d = load_table(spark, sf_dir, "documents")
    # Hash pairs are projected BEFORE the repartition, so the exchange
    # carries (doc_id, array<struct<h1,h2>>) — fixed 16 B/shingle, no
    # strings. The plan references this frame THREE times (signature
    # path + both verify sides); without a shuffle boundary each
    # reference would recompute shingling+md5 from the scan. The
    # exchange makes it compute-once/read-thrice (ReuseExchange), and
    # the verify joins on doc_a/doc_b reuse its partitioning
    # (3.5s → 1.4s at sf0.1 for the reuse).
    hp = (
        _shingle_docs(parallelize_small_scan(d))
        .select("doc_id", _hash_pairs_col("s").alias("hs"))
        .repartition(F.col("doc_id"))
    )
    # Map-only signatures straight off the hash-pair arrays (see
    # _hash_pairs_col / _minhash_from_pairs).
    sig = hp.select("doc_id", *_minhash_from_pairs("hs"))
    # One row per (doc, band) in a single pass (no 4-way union re-scan).
    stack_args = ", ".join(
        f"{band}, concat(mh{i}, '|', mh{j})" for band, (i, j) in enumerate(_BANDS)
    )
    bands = sig.selectExpr(
        "doc_id", f"stack({len(_BANDS)}, {stack_args}) AS (band, key)"
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify candidates by intersecting the distinct-h1 sets —
    # candidates are rare (that's LSH's point), so joining the hashed
    # arrays to the pair list beats re-exploding the corpus. (A
    # semi-join restricting hx to candidate docs was measured SLOWER
    # here: it serializes the stage DAG behind cand's completion,
    # while the unfiltered branch overlaps with candidate generation
    # and reuses hp's exchange. At 100 TB, if the candidate set is a
    # tiny fraction of the corpus, revisit — the filter saves a full
    # corpus projection at the cost of a scheduling barrier.)
    hx = hp.select(
        "doc_id",
        F.array_distinct(F.transform("hs", lambda p: p.getField("h1"))).alias("h"),
    )
    ha = hx.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("h_a"))
    hb = hx.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("h_b"))
    paired = cand.join(ha, "doc_a").join(hb, "doc_b")
    n_shared = F.size(F.array_intersect("h_a", "h_b"))
    jac = n_shared.cast("double") / (F.size("h_a") + F.size("h_b") - n_shared)
    # SEVEN registered queries consume this pair table (connected
    # components, both PageRank variants, LPA, k-core, both canonical
    # selections, the accuracy report); without materialization each
    # one re-runs the whole MinHash→band→verify pipeline. The lazy
    # persist makes the pair table compute-once per session —
    # CacheManager dedupes every consumer's identical subtree onto one
    # entry (the shingle-table/triangle-edge posture), and plan-only
    # consumers never trigger the build. The cached table is the
    # verified near-dup PAIR set — tiny relative to the corpus — so at
    # 100 TB this is exactly the artifact you'd materialize once and
    # feed to the whole graph-analytics suite (MEMORY_AND_DISK spills
    # it if a dense corpus makes it big; a multi-job deployment would
    # write it to parquet at the same point in the DAG).
    from pyspark.storagelevel import StorageLevel

    return (
        paired.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


_SIMHASH_ORACLE = """
    WITH words AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM words
    ),
    bits AS (
      SELECT doc_id, b.b AS b,
             sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed, (SELECT unnest(range(32)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2d: 32-bit SimHash over the distinct-word set (hash = first 8
    md5 hex digits → int; each bit votes ±1; fingerprint = sign
    vector). Near-dups then pair by Hamming distance on the
    fingerprint (blocked by fingerprint bytes at scale). Fingerprint
    is exact integer arithmetic → engine-identical."""
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode_outer(F.array_distinct(F.split("text", " "))).alias("w"))
    hashed = words.select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint").alias("h")
    )
    bits = (
        hashed.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.sum(F.expr("CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END")).alias("s"))
    )
    # Lazily persisted: dedup_simhash_pairs blocks and pairs these same
    # fingerprints (one cache entry per session, the LSH-pair-table
    # posture); the fingerprint table is one int64 per doc — the
    # explode-32-bits vote aggregate, the expensive part, runs once.
    from pyspark.storagelevel import StorageLevel

    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END")
            ).alias("simhash")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


_SIMHASH_BLOCKS = 4  # 4 × 8-bit blocks of the 32-bit fingerprint
_HAMMING_MAX = 3  # pigeonhole: d ≤ blocks-1 ⇒ ≥1 block equal ⇒ blocking is LOSSLESS


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH fp AS ({_SIMHASH_ORACLE}),
    blocks AS (
      SELECT doc_id, simhash, b.b AS blk, (simhash >> (8 * b.b)) & 255 AS key
      FROM fp, (SELECT unnest(range({_SIMHASH_BLOCKS})) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS f_a, b.simhash AS f_b
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(f_a, f_b)) AS hamming
    FROM cand
    WHERE bit_count(xor(f_a, f_b)) <= {_HAMMING_MAX}
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2e: near-duplicate pairs by SimHash Hamming distance ≤ 3 —
    the pairing half of the SimHash dedup path (dedup_simhash computes
    the fingerprints; this blocks and pairs them).

    Blocking (Charikar-style): split the 32-bit fingerprint into 4
    byte blocks; only docs agreeing on at least one (position, byte)
    become candidates. By pigeonhole, Hamming distance ≤ 3 < 4 blocks
    forces ≥ 1 untouched block, so the blocked join finds EVERY
    qualifying pair — lossless, never all-pairs. At 100 TB the
    candidate join shuffles on (blk, key) — 1024 uniform-ish buckets
    per corpus here; with a 64-bit fingerprint the same plan uses
    8-bit or 16-bit blocks to keep buckets small. Verification is one
    integer xor + popcount per candidate — no payload beyond two
    64-bit fingerprints."""
    fp = dedup_simhash(spark, sf_dir)
    stack_args = ", ".join(
        f"{b}, shiftright(simhash, {8 * b}) & 255" for b in range(_SIMHASH_BLOCKS)
    )
    blocks = fp.selectExpr(
        "doc_id", "simhash", f"stack({_SIMHASH_BLOCKS}, {stack_args}) AS (blk, key)"
    )
    a = blocks.alias("a")
    b = blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("f_a"),
            F.col("b.simhash").alias("f_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("f_a ^ f_b"))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= _HAMMING_MAX
    )

# ---------------------------------------------------------------------------
# Connected components over the near-dup pair graph: turns pairwise
# LSH matches into dedup GROUPS (the form a 100 TB dedup job actually
# needs — keep one doc per component, not one per pair). Iterative
# min-label propagation, the simple member of the large-star/small-star
# family (Kiveris et al., "CC in MapReduce and Beyond"): one join +
# one aggregate per iteration; iterations = graph diameter (near-dup
# graphs are shallow — dup clusters are cliques-ish, diameter <= ~3).
# Lineage is cut per iteration with a RELIABLE checkpoint
# (session.reliable_checkpoint — survives executor loss, unlike
# localCheckpoint's unreplicated executor blocks); convergence is a
# count of changed labels (driver-coordinated loop by design, like
# every iterative Spark algorithm).

@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT src AS doc_id, min(dst) AS component
    FROM reach
    GROUP BY src
    """,
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2f: near-duplicate GROUPS — connected components over the
    MinHash-LSH pair graph; component id = min doc_id reachable.
    Docs with no near-dup partner are not emitted (singletons are
    the complement — at scale you anti-join them out anyway).

    Spark side: iterative min-label propagation (see module
    docstring). DuckDB side: transitive closure via recursive CTE —
    O(n·component) rows, fine at oracle scale, and an exact oracle
    for an algorithm SQL can't express iteratively."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return min_label_components(pairs, "doc_a", "doc_b")


def min_label_components(
    pairs: DataFrame, col_a: str, col_b: str, max_iters: int = 20
) -> DataFrame:
    """Connected components over an undirected pair list → (doc_id,
    component = min reachable id). The reusable iterative core behind
    dedup_cluster_components and the semantic (embedding) dedup:
    min-label propagation, one join + one aggregate per iteration,
    reliable checkpoints between iterations (see module docstring)."""
    edges = reliable_checkpoint(  # pair generation runs ONCE, not per iteration
        pairs.select(F.col(col_a).alias("u"), F.col(col_b).alias("v")).unionAll(
            pairs.select(F.col(col_b).alias("u"), F.col(col_a).alias("v"))
        )
    )
    labels = edges.select("u").distinct().select(
        F.col("u").alias("doc_id"), F.col("u").alias("component")
    )
    for _ in range(max_iters):  # diameter bound; near-dup graphs converge in ~3
        nbr_min = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.doc_id == nbr_min.u, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        new_labels = reliable_checkpoint(new_labels)
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


@query(
    "dedup_canonical_corpus",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    LEFT JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.component = d.doc_id
    """,
)
def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2g: the dedup END ARTIFACT — the corpus with near-duplicates
    REMOVED: singletons pass through untouched, and each connected
    component of the LSH pair graph keeps exactly its min-doc_id
    representative. Composition of dedup_cluster_components + an
    anti-join-shaped filter (left join + keep-if-unclustered-or-
    canonical); at 100 TB the component map is tiny relative to the
    corpus and broadcasts, so the cleanup pass is one scan of the
    documents table."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    comp = dedup_cluster_components(spark, sf_dir)
    drop = comp.filter(F.col("component") != F.col("doc_id")).select("doc_id")
    return d.join(F.broadcast(drop), "doc_id", "left_anti")


_PR_SCALE = 1_000_000_000_000  # rank unit: 1.0 == 10^12
_PR_BASE = 150_000_000_000  # 0.15 in rank units

_PAGERANK_ORACLE = """
    WITH RECURSIVE pairs AS (SELECT * FROM ({pairs})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u),
    r0 AS (SELECT u, CAST({scale} AS BIGINT) AS r FROM deg),
    r1 AS (
      SELECT e.v AS u,
             CAST({base} + sum((85 * r0.r) // (100 * deg.d)) AS BIGINT) AS r
      FROM edges e
      JOIN r0 ON r0.u = e.u
      JOIN deg ON deg.u = e.u
      GROUP BY e.v
    ),
    r2 AS (
      SELECT e.v AS u,
             CAST({base} + sum((85 * r1.r) // (100 * deg.d)) AS BIGINT) AS r
      FROM edges e
      JOIN r1 ON r1.u = e.u
      JOIN deg ON deg.u = e.u
      GROUP BY e.v
    )
    SELECT u AS doc_id, r AS rank_units FROM r2
""".format(pairs="{pairs}", scale=_PR_SCALE, base=_PR_BASE)


@query(
    "graph_pagerank_two_rounds",
    oracle=_PAGERANK_ORACLE.format(pairs=_LSH_PAIRS_ORACLE),
)
def graph_pagerank_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2h: two unrolled PageRank iterations over the near-dup graph
    (damping 0.85) — which duplicates are HUBS (documents near-equal
    to many others), the prioritization signal for manual dedup
    review.

    Determinism engineering (same discipline as ml_kmeans_two_rounds
    and the 2^k quantizations): ranks live as INTEGER units
    (1.0 = 10^12) and each neighbor contribution is the integer floor
    (85·r)//(100·deg) — no floating point anywhere, so partition
    order and engine cannot change a single unit. Each round is one
    edge join + one aggregate — the standard scalable PageRank step
    (edges shuffle on src, partial sums on dst)."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = reliable_checkpoint(  # LSH runs once, not once per round
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    ranks = deg.select("u", F.lit(_PR_SCALE).cast("long").alias("r"))
    for _ in range(2):
        contrib = (
            edges.join(ranks, "u")
            .join(deg, "u")
            .select(F.col("v"), F.expr(f"(85 * r) div (100 * d)").alias("c"))
        )
        ranks = contrib.groupBy(F.col("v").alias("u")).agg(
            (F.lit(_PR_BASE) + F.sum("c")).cast("long").alias("r")
        )
    return ranks.select(F.col("u").alias("doc_id"), F.col("r").alias("rank_units"))


_CHUNK_WORDS = 10  # fixed-stride chunker span (words per chunk)


@query(
    "dedup_chunk_level",
    oracle=f"""
    WITH chunked AS (
      SELECT doc_id,
             md5(unnest(list_transform(
               range(0, CAST(ceil(len(w) / {_CHUNK_WORDS}.0) AS BIGINT)),
               i -> array_to_string(
                 w[(i * {_CHUNK_WORDS} + 1):(i * {_CHUNK_WORDS} + {_CHUNK_WORDS})], ' ')
             ))) AS chunk_h
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    occ AS (
      SELECT doc_id, chunk_h, count(*) AS c
      FROM chunked GROUP BY doc_id, chunk_h
    ),
    keeper AS (
      SELECT chunk_h, min(doc_id) AS keep_doc FROM occ GROUP BY chunk_h
    )
    SELECT o.doc_id,
           CAST(sum(o.c) AS BIGINT) AS n_chunks,
           count(*) AS n_unique_in_doc,
           CAST(count(CASE WHEN k.keep_doc = o.doc_id THEN 1 END) AS BIGINT)
             AS n_kept,
           CAST(count(CASE WHEN k.keep_doc = o.doc_id THEN 1 END) AS DOUBLE)
             / sum(o.c) AS kept_frac
    FROM occ o JOIN keeper k USING (chunk_h)
    GROUP BY o.doc_id
    """,
)
def dedup_chunk_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1c: sub-document (paragraph-level) exact dedup — split every
    document into fixed-stride {10}-word chunks, dedup chunk CONTENT
    across the whole corpus (first-writer-wins: the chunk survives
    only in the lowest doc_id containing it), and report per document
    how much of it survives. This is the cross-document repeated-
    passage removal step of pretraining pipelines (boilerplate,
    licenses, templated paragraphs); the chunker is a stand-in for a
    paragraph split on corpora that carry newlines (this corpus does
    not — TESTDATA documents are single-line).

    Scale (100 TB): chunks are md5-hashed BEFORE the corpus-wide
    group/join, so every shuffle carries 32-byte digests, never chunk
    text (same discipline as the shingle pipeline above). Two hash
    aggregates + one hash join, all keyed on the digest — uniform md5
    keys, skew-free. The words array is materialized in its own
    projection before the slicing transform (the in-lambda split()
    O(words²) trap documented at _shingle_docs)."""
    return chunk_level_stats(load_table(spark, sf_dir, "documents"))


def chunk_level_stats(d: DataFrame) -> DataFrame:
    """Reusable core of dedup_chunk_level over any (doc_id, text)
    frame — separated so property tests can drive it with arbitrary
    generated corpora (tests/test_properties.py)."""
    wd = d.select("doc_id", F.split("text", " ").alias("w"))
    n_chunks = F.ceil(F.size("w") / F.lit(float(_CHUNK_WORDS))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice("w", i * _CHUNK_WORDS + 1, _CHUNK_WORDS), " "),
    )
    occ = (
        wd.select("doc_id", F.explode(chunks).alias("chunk"))
        .groupBy("doc_id", F.md5("chunk").alias("chunk_h"))
        .agg(F.count("*").alias("c"))
    )
    keeper = occ.groupBy("chunk_h").agg(F.min("doc_id").alias("keep_doc"))
    kept = F.count(F.when(F.col("keep_doc") == F.col("doc_id"), F.lit(1)))
    return (
        occ.join(keeper, "chunk_h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_chunks"),
            F.count("*").alias("n_unique_in_doc"),
            kept.alias("n_kept"),
            (kept.cast("double") / F.sum("c")).alias("kept_frac"),
        )
    )


_PR_DEEP_ROUNDS = 4


def _pagerank_oracle_rounds(rounds: int) -> str:
    """The graph_pagerank CTE chain generated for any round count —
    integer rank units make every round exactly reproducible, so
    deepening the unroll is purely textual."""
    ctes = [
        "pairs AS (SELECT * FROM ({pairs}))",
        """edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    )""",
        "deg AS (SELECT u, count(*) AS d FROM edges GROUP BY u)",
        f"r0 AS (SELECT u, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT e.v AS u,
             CAST({_PR_BASE} + sum((85 * r{i - 1}.r) // (100 * deg.d)) AS BIGINT) AS r
      FROM edges e
      JOIN r{i - 1} ON r{i - 1}.u = e.u
      JOIN deg ON deg.u = e.u
      GROUP BY e.v
    )"""
        )
    return (
        "\n    WITH RECURSIVE "
        + ",\n    ".join(ctes)
        + f"\n    SELECT u AS doc_id, r AS rank_units FROM r{rounds}\n"
    )


@query(
    "graph_pagerank_deep",
    oracle=_pagerank_oracle_rounds(_PR_DEEP_ROUNDS).format(pairs=_LSH_PAIRS_ORACLE),
)
def graph_pagerank_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2h deepened (r3 VERDICT #7): FOUR PageRank rounds over the
    near-dup graph — the integer-unit determinism survives arbitrary
    iteration depth because each round's ranks are exact integers
    (floor-divided contributions summed as longs; no float drift to
    accumulate).

    Scale: identical per-round shape to graph_pagerank_two_rounds
    (edge join + aggregate); the edge set is checkpointed ONCE before
    the loop so the expensive LSH pair generation is never replayed,
    and each round's rank frame is a slim (doc_id, long) table. At
    real scale the per-round rank frame would also be checkpointed
    every ~5 rounds to cap lineage depth — four rounds stays well
    under that."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = reliable_checkpoint(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("d"))
    ranks = deg.select("u", F.lit(_PR_SCALE).cast("long").alias("r"))
    for _ in range(_PR_DEEP_ROUNDS):
        contrib = (
            edges.join(ranks, "u")
            .join(deg, "u")
            .select(F.col("v"), F.expr("(85 * r) div (100 * d)").alias("c"))
        )
        ranks = contrib.groupBy(F.col("v").alias("u")).agg(
            (F.lit(_PR_BASE) + F.sum("c")).cast("long").alias("r")
        )
    return ranks.select(F.col("u").alias("doc_id"), F.col("r").alias("rank_units"))


_MATCH_SQL = " + ".join(
    f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASH)
)


@query(
    "dedup_minhash_accuracy",
    oracle=f"""
    WITH pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE})),
    sh AS ({_SHINGLES_SQL}),
    hp AS (
      {_HASH_PAIR_SQL}
      FROM (SELECT doc_id, unnest(s) AS shingle FROM sh)
    ),
    sig AS (
      SELECT doc_id,
             {_MINHASH_SQL_COLS}
      FROM hp
      GROUP BY doc_id
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           CAST({_MATCH_SQL} AS BIGINT) AS n_matches,
           CAST({_MATCH_SQL} AS DOUBLE) / {N_MINHASH} AS est_jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.doc_a
    JOIN sig b ON b.doc_id = p.doc_b
    """,
)
def dedup_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2b accuracy report: for every verified near-dup pair, the
    MinHash ESTIMATE of Jaccard (matching signature components / 8)
    next to the TRUE hashed-shingle Jaccard — the sim_ivf_recall_
    report pattern applied to the dedup sketch: the sketch's accuracy
    is a measured column in the artifact, not a claim in a docstring
    (E[est] = J with σ = √(J(1-J)/8); a broken hash family or band
    layout shows up as systematic divergence here before it silently
    degrades recall).

    Scale: joins the 8-long signatures onto the (already bucketed)
    pair list — payload is 64 bytes per doc side; the expensive parts
    (signatures, banded candidates, verification) are the SAME stages
    the production pipeline already runs."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir)
    sig = dedup_minhash_signatures(spark, sf_dir)
    a = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)]
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)]
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(N_MINHASH)
    )
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            matches.cast("bigint").alias("n_matches"),
            (matches.cast("double") / N_MINHASH).alias("est_jaccard"),
        )
    )


PREFIX_JACCARD_THRESHOLD = 0.5


@query(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH sh AS ({{shingles}}),
    ex AS (SELECT doc_id, unnest(s) AS shingle, len(s) AS n_sh FROM sh),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(*) AS n_shared,
             any_value(a.n_sh) AS n_a, any_value(b.n_sh) AS n_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) AS jaccard
    FROM shared
    WHERE CAST(n_shared AS DOUBLE) / (n_a + n_b - n_shared) >= {PREFIX_JACCARD_THRESHOLD}
    """.format(shingles=_SHINGLES_SQL),
)
def dedup_prefix_filter_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2a'': prefix-filtered set-similarity self-join (SSJoin/
    All-Pairs/PPJoin family: Chaudhuri et al. ICDE'06, Bayardo et al.
    WWW'07) — the candidate-pruned formulation of the shingle-Jaccard
    near-dup miner for HIGH thresholds.

    Instead of indexing every shingle of every doc (the plain inverted
    index of dedup_ngram_jaccard_pairs), each doc indexes only the
    PREFIX of its shingle set under a global canonical order
    (ascending document frequency, ties by shingle — rarest first).
    For Jaccard ≥ t a pair must overlap within the first
    n - ⌈t·n⌉ + 1 shingles of each side's ordering (if the prefixes
    were disjoint, the intersection would fit inside one suffix of
    length ⌈t·n⌉ - 1 < ⌈t·n⌉ ≤ |A∩B|), so joining prefixes only is
    LOSSLESS while shrinking the index ~2× at t=0.5 and — because the
    dropped entries are exactly the most-frequent shingles — cutting
    the candidate-pair blowup far more than 2× (candidate count per
    shingle is quadratic in its document frequency).

    With t = 0.5 the prefix length is the integer n_sh - (n_sh+1) div
    2 + 1 (engine-exact; no float ceil). Candidates are verified
    EXACTLY with a full-set array intersection, so the output equals
    the unfiltered formulation at the same threshold — the oracle IS
    the plain inverted-index SQL, and a pytest pins equality against
    ngram_jaccard_pairs on the same frame.

    100 TB: the df aggregate is vocabulary-sized; the rank window
    partitions by doc_id (bounded rows per doc); the self-join key
    space is the PRUNED index. This is the scale path for t ≥ 0.5
    dedup sweeps, complementing MinHash-LSH (which stays the choice
    for low thresholds where prefixes barely prune)."""
    d = parallelize_small_scan(load_table(spark, sf_dir, "documents"))
    return prefix_filter_jaccard_pairs(d)


def prefix_filter_jaccard_pairs(d: DataFrame) -> DataFrame:
    """The reusable prefix-filtered similarity self-join behind the
    registered query (property-tested against brute force on random
    corpora in tests/test_properties.py)."""
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    # The shingle-set table feeds SIX plan subtrees (document-
    # frequency agg, the rank window via both self-join sides, and
    # both sides of the exact verification); without materialization
    # the executed plan rebuilds the per-doc split + transform +
    # array_distinct once per subtree (6× array_distinct, 0 reused
    # exchanges). persist() collapses all six into InMemoryTableScans
    # of ONE cached build (verified in the plan; CacheManager dedupes
    # re-invocations onto the same entry, the lazy posture of
    # graph_triangle_count). Wall-clock at sf0.1 is NEUTRAL (~5 s
    # either way — the candidate self-join + per-doc window dominate
    # at small corpora); the change is for corpus scale, where each
    # avoided rebuild is a full table scan + shingle pass. There,
    # MEMORY_AND_DISK spills blocks to executor disk (one shuffle's
    # worth of local I/O instead of five recomputed scans); for a
    # one-shot sweep, writing the shingle table to parquet and
    # reading it back is the equivalent cluster-durable form.
    sh = _shingle_docs(d).persist(StorageLevel.MEMORY_AND_DISK)
    ex = sh.select(
        "doc_id", F.explode_outer("s").alias("shingle"), F.size("s").alias("n_sh")
    )
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = ex.join(dfreq, "shingle").select(
        "doc_id",
        "shingle",
        "n_sh",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("df", "shingle"))
        .alias("rn"),
    )
    prefix = ranked.filter(F.col("rn") <= F.expr("n_sh - (n_sh + 1) div 2 + 1"))
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Fan the candidate list out before exact verification: the
    # distinct's AQE-coalesced output (few tasks at bench scale)
    # serializes the array_intersect pass over every candidate pair;
    # the exchanged payload is (doc_a, doc_b) int pairs — the
    # guide §8 lightweight-proxy rule (the shingle SETS attach via
    # the broadcast joins below, after the fan-out). Measured at
    # sf0.1: 5.5-5.8 → 3.7-4.1 s; a probe-side fan-out of the
    # candidate self-join itself was additionally tried and was
    # neutral-to-worse (no hot shingles: max df 25), left out.
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism
    )
    sets_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sets_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= PREFIX_JACCARD_THRESHOLD)
    )


_LPA_ROUNDS = 2


def _lpa_oracle(rounds: int) -> str:
    """Unrolled synchronous label-propagation oracle over the LSH
    near-dup graph: per round, a neighbor-label count CTE and a
    deterministic argmax CTE (count DESC, label ASC) — the same
    generated-CTE idiom as the PageRank and BPE oracles."""
    ctes = [
        f"pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE}))",
        """edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    )""",
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)",
    ]
    for r in range(1, rounds + 1):
        prev = f"l{r - 1}"
        ctes.append(
            f"""c{r} AS (
      SELECT e.v AS node, l.lbl, count(*) AS c
      FROM edges e JOIN {prev} l ON l.node = e.u
      GROUP BY e.v, l.lbl
    )"""
        )
        ctes.append(
            f"""l{r} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM c{r}
      ) WHERE rn = 1
    )"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node AS doc_id, lbl AS community FROM l{rounds}\n"
    )


@query("graph_label_propagation", oracle=_lpa_oracle(_LPA_ROUNDS))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2i: community detection by synchronous label propagation
    (Raghavan et al. 2007, "Near linear time algorithm to detect
    community structures") over the near-dup LSH pair graph — two
    unrolled rounds, each node adopting the MODE of its neighbors'
    labels (ties broken by MIN label, so every round is a pure
    function of the graph: engine- and partition-order-independent).

    Where connected components (dedup_cluster_components) merges
    everything reachable, LPA finds DENSE cores: a chain of borderline
    near-dups does not collapse into one community unless the
    majority vote carries — the finer-grained grouping used to pick
    per-cluster canonical documents without over-merging.

    Shape per round: one edge⋈label join (shuffle on node id) + one
    (node, label) count aggregate + one argmax window over the count
    table — the standard scalable LPA step; labels are integers, the
    argmax is total-ordered, nothing floats. Edges are checkpointed
    once (LSH runs once, not per round)."""
    from pyspark.sql.window import Window

    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = reliable_checkpoint(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), "lbl")
    for _ in range(_LPA_ROUNDS):
        counts = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            counts.select("node", "lbl", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("community"))


_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled peeling oracle: per round, a degree CTE, a survivor
    CTE, and an induced-edge CTE — same generated-CTE idiom as the
    PageRank and LPA oracles."""
    ctes = [
        f"pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE}))",
        """g0 AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    )""",
    ]
    for r in range(1, rounds + 1):
        prev = f"g{r - 1}"
        ctes.append(
            f"d{r} AS (SELECT u, count(*) AS d FROM {prev} GROUP BY u)"
        )
        ctes.append(f"keep{r} AS (SELECT u FROM d{r} WHERE d >= {k})")
        ctes.append(
            f"""g{r} AS (
      SELECT e.u, e.v FROM {prev} e
      JOIN keep{r} a ON e.u = a.u
      JOIN keep{r} b ON e.v = b.u
    )"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT u AS doc_id, count(*) AS degree FROM g{rounds} GROUP BY u\n"
    )


@query("graph_kcore_peel", oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2j: k-core peeling (Seidman 1983, "Network structure and
    minimum degree"; the distributed peel is Montresor et al.'s
    iterative formulation) over the near-dup LSH graph — 3 unrolled
    rounds toward the k=2 core: drop nodes with degree < 2, induce
    the surviving subgraph, repeat. The surviving core separates
    DENSELY duplicated regions (template farms, mirror clusters)
    from incidental pairwise matches, which is the triage signal for
    what to bulk-delete vs review; output is (doc_id, degree) in the
    round-3 subgraph.

    Each round is two hash aggregates (degrees, survivors) + one
    induced-subgraph semi-join — all on integer node ids, no floats,
    so partition order cannot change anything. A FIXED round count
    keeps the oracle expressible as unrolled CTEs (the converged
    k-core just iterates this to fixpoint with the same per-round
    plan; near-dup graphs converge in a handful of rounds). Edges
    are checkpointed once — LSH runs once, not per round."""
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = reliable_checkpoint(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).unionAll(
            pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
        )
    )
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= _KCORE_K).select("u")
        edges = (
            edges.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
        )
    return edges.groupBy(F.col("u").alias("doc_id")).agg(
        F.count("*").alias("degree")
    )


@query(
    "dedup_canonical_longest",
    oracle=f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({_LSH_PAIRS_ORACLE})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(src, dst) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    ),
    comp AS (
      SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src
    ),
    keeper AS (
      SELECT component, doc_id AS keep_doc FROM (
        SELECT c.component, c.doc_id,
               row_number() OVER (
                 PARTITION BY c.component
                 ORDER BY d.n_chars DESC, c.doc_id
               ) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
      ) WHERE rn = 1
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    LEFT JOIN comp c ON d.doc_id = c.doc_id
    LEFT JOIN keeper k ON k.component = c.component
    WHERE c.doc_id IS NULL OR k.keep_doc = d.doc_id
    """,
)
def dedup_canonical_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2g': dedup end artifact with CONTENT-AWARE canonical selection
    — each near-dup cluster keeps its LONGEST member (n_chars DESC,
    doc_id tiebreak) instead of the arbitrary min-id: the standard
    web-corpus heuristic (the longest variant of a mirrored page is
    usually the un-truncated one), and the shape every "keep best by
    <quality score>" policy reuses — swap n_chars for any scoring
    column and the plan is unchanged.

    Composition: connected components over the LSH pair graph
    (min-label propagation, iterative core shared with
    dedup_cluster_components), an argmax-per-component window over
    the CLUSTERED docs only (cluster-membership-sized, not
    corpus-sized), and a broadcast drop-list anti-join — one full
    scan of the corpus total, same 100 TB posture as
    dedup_canonical_corpus."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = min_label_components(pairs, "doc_a", "doc_b")
    scored = comp.join(d.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.col("n_chars").desc(), "doc_id")
    drop = (
        scored.select("doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") > 1)
        .select("doc_id")
    )
    return d.join(F.broadcast(drop), "doc_id", "left_anti")


_SNM_WINDOW = 3  # sorted-neighborhood width (pairs within w ranks)


@query(
    "dedup_sorted_neighborhood",
    oracle=f"""
    WITH sh AS ({{shingles}}),
    keyed AS (
      SELECT d.doc_id,
             substr(regexp_replace(lower(d.text), '[^a-z]', '', 'g'), 1, 20) AS k,
             sh.s
      FROM documents d JOIN sh ON sh.doc_id = d.doc_id
    ),
    ranked AS (
      SELECT doc_id, k, s,
             row_number() OVER (ORDER BY k, doc_id) AS rn
      FROM keyed
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM ranked a JOIN ranked b
      ON b.rn - a.rn BETWEEN 1 AND {_SNM_WINDOW}
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {JACCARD_THRESHOLD}
    """.format(shingles=_SHINGLES_SQL),
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2a''': sorted-neighborhood near-dup mining (Hernández &
    Stolfo SIGMOD'95, the merge/purge method) — the THIRD blocking
    family next to the inverted index / prefix filter and
    MinHash-LSH: sort the corpus by a normalization key (first 20
    letters of the lowercased alpha-only text) and compare only rows
    within w=3 ranks of each other, then verify candidates with the
    exact shingle Jaccard. Catches prefix-similar near-dups with a
    LINEAR candidate count (n·w pairs regardless of content), the
    cheap first pass of a multi-blocking dedup sweep.

    The global rank is the scale-critical part: row_number over a
    global ORDER BY is a single-partition window in Spark, so the
    rank is assigned with the SAME two-pass distributed prefix sum as
    shard packing (functions/analytics.assign_shard_idx): partition
    by the 2-char key prefix (lexicographic buckets — prefix order IS
    key order), per-bucket row_number in parallel, then broadcast the
    tiny per-bucket offsets and add. The neighborhood self-join is an
    equi-join on rank-block (rn div w on the left meeting blocks {b, b+1} on the right — complete for rank gaps in [1, w]), never
    a cross join.

    The oracle states the same pairs with DuckDB's plain global
    window + band join; the ranks agree because (k, doc_id) is a
    total order."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    sh = _shingle_docs(parallelize_small_scan(d))
    keyed = (
        d.select(
            "doc_id",
            F.substring(
                F.regexp_replace(F.lower("text"), "[^a-z]", ""), 1, 20
            ).alias("k"),
        )
        .join(sh, "doc_id")
    )
    # two-pass global rank: per-bucket row_number + broadcast offsets
    b = keyed.select("*", F.substring("k", 1, 2).alias("_bucket"))
    wb = Window.partitionBy("_bucket").orderBy("k", "doc_id")
    local = b.select("*", F.row_number().over(wb).alias("_rn"))
    sizes = b.groupBy("_bucket").agg(F.count("*").alias("_n"))
    wo = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_bucket", F.coalesce(F.sum("_n").over(wo), F.lit(0)).alias("_off")
    )  # bucket-count rows: the window is over the TINY size table
    ranked = local.join(F.broadcast(offsets), "_bucket").select(
        "doc_id", "s", (F.col("_off") + F.col("_rn")).alias("rn")
    )
    a = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("s").alias("sa"),
        F.col("rn").alias("rn_a"),
        F.expr(f"rn div {_SNM_WINDOW}").alias("block"),
    )
    bb = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("sb"),
        F.col("rn").alias("rn_b"),
        F.explode(
            F.array(
                F.expr(f"rn div {_SNM_WINDOW}"),
                F.expr(f"rn div {_SNM_WINDOW} - 1"),
            )
        ).alias("block"),
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter.cast("double") / (F.size("sa") + F.size("sb") - inter)
    return (
        a.join(bb, "block")
        .filter(
            (F.col("rn_b") - F.col("rn_a") >= 1)
            & (F.col("rn_b") - F.col("rn_a") <= _SNM_WINDOW)
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# ----------------------------------------------------------------------
# L1c: exact-substring dedup (Lee et al., "Deduplicating Training Data
# Makes Language Models Better", ACL 2022 — the ExactSubstr operator).
# Pretraining pipelines remove MAXIMAL substrings of >= L tokens that
# occur more than once in the corpus; chunk dedup and n-gram
# containment only approximate this. Distributed formulation for fixed
# L: hash every L-gram -> group -> keep grams with >= 2 occurrences
# (across docs AND within a doc) -> mark every token position covered
# by a duplicated gram -> merge adjacent covered positions into
# maximal spans (gaps-and-islands).
#
# 100 TB posture: one shuffle on the gram (map-side partial agg
# collapses per-partition repeats before the exchange), one shuffle
# joining grams back to the duplicate set, and a per-doc window whose
# partition is bounded by document length. Unlike the pair-based
# near-dup operators there is NO quadratic candidate blowup to guard:
# a gram occurring k times contributes k interval rows — linear in
# occurrence count — so a viral boilerplate gram costs O(corpus), not
# O(corpus^2), and no df_cap is needed. (The suffix-array formulation
# of the paper finds variable-L maximal matches in O(n log n); the
# fixed-L gram formulation is its standard distributed counterpart
# and finds the same spans for matches >= L.)
#
# r13 rewrite (r12 verdict): coverage used to EXPLODE every covered
# token position (k*L rows per duplicated gram) and .distinct() them
# before the islands pass — the round's worst stress entry. Duplicated
# grams now stay as [pos, pos+L-1] INTERVALS and merge with the
# running-max gaps-and-islands window (an interval joins the current
# island iff its start <= 1 + max(end) over all earlier intervals),
# ~L x less window/shuffle volume and one exchange fewer (no distinct),
# same spans by construction.

EXACT_SUBSTR_MIN_TOKENS = 5


def _dup_gram_intervals(docs: DataFrame, min_tokens: int) -> DataFrame:
    """(doc_id, text) -> one [s, e] token interval per occurrence of a
    corpus-duplicated L-gram (the shared front half of the two Lee et
    al. operators): tokenize, slide the L-gram window, keep grams with
    >= 2 occurrences corpus-wide. `pos` is unique per doc, so the
    intervals need no dedup.

    r16 restructure (guide §2.3/§2.4, measured): the former shape —
    groupBy(gram).count() >= 2 into a dup set, then join the gram
    frame back on the string — tokenized and gram-exploded the corpus
    TWICE (each consumer re-ran the split+transform+posexplode
    lineage), shuffled the ~unique distinct-gram long tail once for
    the aggregate (map-side partials collapse nothing on mostly-unique
    grams), and, past the broadcast threshold, shuffled every gram
    OCCURRENCE a second time for the join probe (at 16x the dup set is
    corpus-sized and the serial broadcast build dominated wall time).
    A count(*) window over (partition by gram) computes the same
    corpus-wide occurrence count with ONE gram build and ONE shuffle
    of the occurrences, no dup table, no join, no broadcast: 16x A/B
    base 8.28 s -> 5.13 s (exchange-reuse arm) -> 3.32 s (this form);
    1x 1.62 -> 1.01 s; a bloom/hash semi-join prefilter arm measured
    WORSE at both scales (1.56/9.24 s — at small scale dup already
    broadcasts, and on a duplicate-heavy corpus the filter drops
    nothing). Same rows by construction: the window count is the
    total occurrence count of the gram corpus-wide, exactly the old
    HAVING count >= 2 (oracle value-pass re-verified at sf0.01 and
    sf0.1 for both consumers)."""
    from pyspark.sql import Window

    toks = docs.select("doc_id", F.split("text", " ").alias("w"))
    grams = (
        toks.where(F.size("w") >= min_tokens)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, size(w) - {min_tokens - 1}),"
                    f" i -> concat_ws(' ', slice(w, i, {min_tokens})))"
                )
            ).alias("p0", "gram"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")
    )
    n_occ = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    return (
        grams.withColumn("_n", n_occ)
        .where(F.col("_n") >= 2)
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + min_tokens - 1).alias("e"),
        )
    )


def _merge_intervals(iv: DataFrame) -> DataFrame:
    """Merge overlapping/adjacent [s, e] intervals per doc into maximal
    spans (doc_id, span_start, span_end) — the classic running-max
    gaps-and-islands: a new island starts where s exceeds 1 + the max
    end of every earlier interval. One per-doc sort; both window frames
    share the (doc_id, s) ordering so Spark evaluates them in a single
    exchange; s is unique per doc (one gram start per position), so the
    order — and the result — is total and deterministic."""
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.select(
        "doc_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    return (
        flagged.select(
            "doc_id", "s", "e", F.sum("_new").over(w_run).alias("_grp")
        )
        .groupBy("doc_id", "_grp")
        .agg(
            F.min("s").alias("span_start"),
            F.max("e").alias("span_end"),
        )
        .drop("_grp")
    )


def exact_substring_spans(
    docs: DataFrame, min_tokens: int = EXACT_SUBSTR_MIN_TOKENS
) -> DataFrame:
    """(doc_id, text) -> maximal duplicated spans (doc_id, span_start,
    span_end, span_tokens), token positions 1-based inclusive.

    A span is a maximal run of token positions each covered by some
    L-gram (L = min_tokens, whitespace tokens) that occurs >= 2 times
    in the corpus (counting all positions, including repeats within
    one document). Spans are contiguous by construction, so
    span_tokens = span_end - span_start + 1."""
    iv = _dup_gram_intervals(docs, min_tokens)
    return _merge_intervals(iv).select(
        "doc_id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("span_tokens"),
    )


@query(
    "dedup_exact_substring_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[i:i+{EXACT_SUBSTR_MIN_TOKENS - 1}], ' ') AS gram
      FROM t, UNNEST(range(1, len(w) - {EXACT_SUBSTR_MIN_TOKENS - 2})) AS r(i)
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT g.doc_id, u.j
      FROM g JOIN dup USING (gram),
           UNNEST(range(g.pos, g.pos + {EXACT_SUBSTR_MIN_TOKENS})) AS u(j)
    ),
    isl AS (
      SELECT doc_id, j,
             j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS grp
      FROM cov
    )
    SELECT doc_id,
           CAST(min(j) AS BIGINT) AS span_start,
           CAST(max(j) AS BIGINT) AS span_end,
           CAST(count(*) AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
    """,
)
def dedup_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1c: maximal exact-substring duplicate spans (>= 5 whitespace
    tokens, Lee et al. 2022 class) over the documents table — the one
    canonical LLM-curation dedup operator the L1/L2 battery did not
    yet cover. See exact_substring_spans for semantics and the 100 TB
    plan shape (linear in occurrences; no quadratic candidates).
    Reference has no text surface (SURVEY.md §0); need is
    BASELINE.json's dedup north star."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return exact_substring_spans(docs)


def exact_substring_clean(
    docs: DataFrame, min_tokens: int = EXACT_SUBSTR_MIN_TOKENS
) -> DataFrame:
    """The dedup OUTPUT of the Lee et al. operator: each document with
    its duplicated spans removed — (doc_id, cleaned_text,
    n_tokens_kept, n_tokens_removed). Tokens covered by any
    duplicated >= L-gram are dropped; survivors rejoin in order with
    single spaces. Docs with no duplicated span pass through intact
    (cleaned_text = the space-normalized original). Same plan shape
    as exact_substring_spans plus one anti-join of token positions
    against the coverage set and a per-doc ordered re-aggregation
    (sort_array over (pos, token) structs — bounded by doc length,
    deterministic)."""
    # r16 restructure (guide §2.3/§2.4, measured): the former shape
    # posexploded EVERY token (corpus-token-sized rows), anti-joined
    # them against the span positions on (doc_id, pos) — a token-level
    # shuffle — and re-assembled each document with a
    # sort_array(collect_list(struct)) aggregate (a second token-level
    # shuffle plus a per-doc sort). The spans per document are FEW and
    # bounded, so they are collected to one array row per doc instead,
    # left-joined to the words table at DOC grain, and the surviving
    # tokens are selected in place with array higher-order functions
    # (filter positions not covered by any span, map to tokens) —
    # token rows never shuffle at all. 1x/16x A/B (min of 2): old
    # 1.97/5.04 s → 4.07/4.16 s at 16x and 1.24–1.91 s at 1x,
    # exceptAll = 0 both directions. Equivalences: sequence order
    # preserves the old (pos, tok) sort; a doc with no spans takes the
    # sp-IS-NULL branch (cleaned = the space-normalized original,
    # exactly the old right-join pass-through, including the
    # empty-text [""] → "" row); a fully-covered doc yields the empty
    # array → '' / 0 kept, the old coalesce defaults.
    toks = docs.select("doc_id", F.split("text", " ").alias("w"))
    spans = (
        _merge_intervals(_dup_gram_intervals(docs, min_tokens))
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("sp")
        )
    )
    j = toks.join(spans, "doc_id", "left")
    w, sp = F.col("w"), F.col("sp")
    kept = F.when(sp.isNull(), w).otherwise(
        F.transform(
            F.filter(
                F.sequence(F.lit(1), F.size(w)),
                lambda p: ~F.exists(
                    sp,
                    lambda s: (p >= s["span_start"]) & (p <= s["span_end"]),
                ),
            ),
            lambda p: F.element_at(w, p),
        )
    )
    return j.select(
        "doc_id",
        F.array_join(kept, " ").alias("cleaned_text"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
        (F.size(w) - F.size(kept)).cast("long").alias("n_tokens_removed"),
    )


@query(
    "dedup_exact_substring_clean",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tok AS (
      SELECT doc_id, i AS pos, w[i] AS tok
      FROM t, UNNEST(range(1, len(w) + 1)) AS r(i)
    ),
    g AS (
      SELECT doc_id, i AS pos,
             array_to_string(w[i:i+{EXACT_SUBSTR_MIN_TOKENS - 1}], ' ') AS gram
      FROM t, UNNEST(range(1, len(w) - {EXACT_SUBSTR_MIN_TOKENS - 2})) AS r(i)
    ),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
    cov AS (
      SELECT DISTINCT g.doc_id, u.j
      FROM g JOIN dup USING (gram),
           UNNEST(range(g.pos, g.pos + {EXACT_SUBSTR_MIN_TOKENS})) AS u(j)
    ),
    kept AS (
      SELECT tok.doc_id, tok.pos, tok.tok
      FROM tok LEFT JOIN cov
        ON cov.doc_id = tok.doc_id AND cov.j = tok.pos
      WHERE cov.j IS NULL
    ),
    agg AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned_text,
             count(*) AS n_tokens_kept
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS n_total FROM tok GROUP BY doc_id)
    SELECT totals.doc_id,
           COALESCE(agg.cleaned_text, '') AS cleaned_text,
           CAST(COALESCE(agg.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
           CAST(totals.n_total - COALESCE(agg.n_tokens_kept, 0) AS BIGINT)
             AS n_tokens_removed
    FROM totals LEFT JOIN agg ON agg.doc_id = totals.doc_id
    """,
)
def dedup_exact_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1c output side: the CLEANED corpus after exact-substring
    removal (>= 5-token duplicated spans dropped, Lee et al. 2022) —
    one row per document with the surviving text and kept/removed
    token counts. See exact_substring_clean for semantics and scale
    shape."""
    docs = parallelize_small_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return exact_substring_clean(docs)
