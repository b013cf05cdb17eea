"""Multimodal column handling (SURVEY.md §2.10 L5): opaque binary
payloads + typed metadata structs, processed with Arrow-batched
`mapInPandas`.

Decode status: UNCOMPRESSED formats decode for real, in pure numpy —
binary netpbm (P6/P5) and 24/32-bit BMP (`decode_image`), integer
PCM WAV (`decode_audio`) — each with a distributed decode→featurize
path (`image_stats` / `audio_stats`, mapInPandas) pytest-verified
against independently serialized payloads. Compressed formats
(PNG/JPEG/MP3/...) still need a codec this container lacks: images
dispatch to PIL when importable; otherwise both raise a
clearly-marked NotImplementedError. Everything Spark-side — schema,
binary columns, metadata structs, batch iteration, output schema —
is real and oracle-checked regardless.

100 TB posture: binary payloads ride in their own column so column
pruning drops them unless the UDF needs them; `mapInPandas` streams
Arrow batches (bounded memory regardless of per-file blob sizes);
partition count should target ~128 MB of blobs per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_hiveorc_spark.catalog import load_table
from flink_hiveorc_spark.registry import query

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def _parse_pnm_header(data: bytes) -> tuple[list[int], int]:
    """Parse the P5/P6 netpbm header: three ASCII integers (width,
    height, maxval) separated by whitespace, '#' comments allowed.
    Returns ([w, h, maxval], offset_of_first_pixel_byte)."""
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    return vals, pos + 1  # exactly ONE whitespace byte after maxval


def _decode_pnm(data: bytes):
    import numpy as np

    channels = 3 if data[:2] == b"P6" else 1
    (w, h, maxval), off = _parse_pnm_header(data)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    n = w * h * channels
    px = np.frombuffer(data, dtype=np.uint8, count=n, offset=off)
    return px.reshape(h, w, channels)


def _decode_bmp(data: bytes):
    import struct

    import numpy as np

    pix_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    nch = bpp // 8
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * nch + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if flip:
        rows = rows[::-1]
    return rows[:, :, [2, 1, 0]] if nch == 3 else rows[:, :, [2, 1, 0, 3]]  # BGR(A)→RGB(A)


def decode_image(payload: bytes):
    """Decode an image payload → HxWxC uint8 numpy array.

    REAL for the uncompressed formats a codec-less container can
    honestly own: binary netpbm (P6 PPM → HxWx3, P5 PGM → HxWx1,
    8-bit) and uncompressed 24/32-bit BMP (bottom-up or top-down,
    row padding handled, BGR(A)→RGB(A)) — pure numpy, no image
    library, pytest-verified round-trip against independently built
    pixel arrays. Compressed formats (PNG/JPEG/...) dispatch to PIL
    when importable and stay a clearly-marked NotImplementedError
    here (this container has no codec — swap-in point documented).

    Error contract (what a DLQ-style caller can rely on):
    NotImplementedError = the FORMAT needs a codec/feature this
    build lacks; ValueError = the payload claims a supported format
    but is malformed (truncated body, corrupt header, undecodable
    by PIL). Nothing else escapes."""
    if payload[:2] in (b"P5", b"P6"):
        try:
            return _decode_pnm(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed netpbm payload: {e}") from e
    if payload[:2] == b"BM":
        try:
            return _decode_bmp(payload)
        except NotImplementedError:
            raise
        except Exception as e:
            raise ValueError(f"malformed BMP payload: {e}") from e
    try:  # compressed formats: only with a real codec on the cluster
        import io

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "compressed-image decoding requires a codec (PIL/cv2) not present "
            "in this container; PPM/PGM/BMP decode natively"
        ) from None
    import numpy as np

    try:
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception as e:  # UnidentifiedImageError etc. — keep the contract
        raise ValueError(f"undecodable image payload: {e}") from e


_IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def _image_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode → feature rows (mapInPandas): per image, shape plus
    mean pixel byte from the decoded array — the actual
    resize/embed/feature step's batch shape, exercised end-to-end on
    genuinely decoded pixels (not the fake). Exact mean: integer pixel
    sum / count, one final double division."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "height", "width", "channels", "mean_byte")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = decode_image(bytes(payload))
            out["doc_id"].append(doc_id)
            out["height"].append(arr.shape[0])
            out["width"].append(arr.shape[1])
            out["channels"].append(arr.shape[2])
            out["mean_byte"].append(int(arr.sum(dtype="int64")) / arr.size)
        yield pd.DataFrame(out)


def image_stats(images: DataFrame) -> DataFrame:
    """Distributed decode+featurize over an (doc_id, payload) frame of
    real image payloads. Column pruning keeps the blob column out of
    every plan that doesn't call this; Arrow streams the batches."""
    return images.select("doc_id", "payload").mapInPandas(
        _image_stats, _IMAGE_STATS_SCHEMA
    )


def decode_audio(payload: bytes):
    """Decode a WAV payload → (samples array of shape
    (n_frames, n_channels), sample_rate_hz).

    REAL for uncompressed PCM (RIFF/WAVE, format tag 1, 8/16/32-bit
    integer samples, any channel count) — pure struct/numpy chunk
    walking, no audio library, pytest-verified round-trip against
    independently serialized waveforms. 8-bit WAV is unsigned
    (returned as uint8 per spec); 16/32-bit are signed little-endian.
    Compressed/float formats (MP3, AAC, IEEE-float WAV, A-law...)
    raise a clearly-marked NotImplementedError — this container has
    no audio codec; a torchaudio/soundfile dispatch drops in here on
    a cluster that has one."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed-audio decoding requires a codec not present in this "
            "container; uncompressed PCM WAV decodes natively"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16, 32):
        raise NotImplementedError(
            f"only integer PCM WAV supported (format={audio_format}, bits={bits})"
        )
    if n_ch < 1 or rate < 1:
        # malformed, not unsupported: 0 channels would ZeroDivide the
        # frame math and 0 Hz the duration downstream
        raise ValueError(f"malformed WAV fmt chunk (channels={n_ch}, rate={rate})")
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    frame_bytes = n_ch * bits // 8
    n_frames = len(data) // frame_bytes
    samples = np.frombuffer(data, dtype=dtype, count=n_frames * n_ch)
    return samples.reshape(n_frames, n_ch), rate


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def _sum_of_squares_exact(samples) -> int:
    """Exact Σx² over an integer sample array, as a Python int.

    A plain int64 ``(x**2).sum()`` overflows for 32-bit PCM — one
    full-scale sample squares to 2^62, so TWO of them wrap the
    accumulator (observed: negative sums → complex RMS). Same cure as
    agg_corr_regr_battery's moment sums: hi/lo split x = q·2^16 + r,
    so Σx² = 2^32·Σq² + 2^17·Σqr + Σr², where every partial stays
    safely inside int64 (|q| ≤ 2^15 ⇒ q² ≤ 2^30; qr ≤ 2^31; r² < 2^32
    — headroom for > 2^30 samples per clip), and the three partials
    recombine in arbitrary-precision Python ints."""
    import numpy as np

    x = samples.astype("int64").ravel()
    q, r = np.divmod(x, 1 << 16)  # r in [0, 2^16) even for negative x
    return (
        (int((q * q).sum()) << 32)
        + (int((q * r).sum()) << 17)
        + int((r * r).sum())
    )


def _audio_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode → per-clip features: shape, duration, RMS amplitude
    from the decoded samples — the windowing/embedding step's batch
    shape on genuinely decoded audio. RMS from an exact integer
    sum-of-squares, one final sqrt/divide."""
    for pdf in batches:
        out = {
            k: []
            for k in (
                "doc_id",
                "sample_rate",
                "n_frames",
                "n_channels",
                "duration_s",
                "rms",
            )
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples, rate = decode_audio(bytes(payload))
            n, ch = samples.shape
            sq = _sum_of_squares_exact(samples)
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["n_frames"].append(n)
            out["n_channels"].append(ch)
            out["duration_s"].append(n / rate)
            out["rms"].append((sq / (n * ch)) ** 0.5 if n else 0.0)
        yield pd.DataFrame(out)


def audio_stats(clips: DataFrame) -> DataFrame:
    """Distributed decode+featurize over (doc_id, payload) PCM-WAV
    clips; same Arrow-batched mapInPandas shape as image_stats."""
    return clips.select("doc_id", "payload").mapInPandas(
        _audio_stats, _AUDIO_STATS_SCHEMA
    )


def _fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic feature extraction over binary payloads: byte
    length, first-4-bytes hex, md5 digest. Stands in for a real
    embed/resize/frame-sample step; identical batch shape."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "head_hex": payloads.map(lambda b: b[:4].hex().upper()),
                "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal shape: opaque binary payload + typed
    metadata struct (the L5 column model: binary + sidecar struct)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("language"),
            F.lit("text/plain").alias("mime"),
            F.length("text").alias("declared_len"),
        ).alias("meta"),
    )


@query(
    "multimodal_binary_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           -- first 4 BYTES of the utf-8 payload (hex-then-substr), not
           -- the first 4 CHARACTERS: multi-byte text would diverge from
           -- the byte-oriented Spark side otherwise.
           substr(upper(hex(encode(text))), 1, 8) AS head_hex,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: binary-column pipeline — build payload+meta columns, run
    Arrow-batched mapInPandas feature extraction. The extraction is a
    deterministic fake (hash/length) so the oracle can verify the
    whole binary plumbing end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select("doc_id", "payload").mapInPandas(_fake_features, FEATURE_SCHEMA)


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("z_len", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-language z-score of document length.

    Moments come from EXACT integer sums (Python ints, no fp
    accumulation order) and the final arithmetic is the same IEEE
    double expression tree the oracle SQL spells out — pandas
    .mean()/.std() would drift in the last bit vs DuckDB's Welford
    accumulator (observed 4e-16), which the exact-compare gate
    rejects. Arrow hands the whole group as one pandas frame."""
    x = pdf["n_chars"]
    n = len(x)
    if n < 2:
        # stddev_samp of one row is NULL in SQL; a naive n-1 division
        # here would raise ZeroDivisionError and kill the task. Emit
        # real NULLs (nullable Float64 -> Arrow null) to match.
        z = pd.array([pd.NA] * n, dtype="Float64")
        return pd.DataFrame({"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": z})
    s1 = int(x.sum())
    s2 = int((x * x).sum())
    mu = s1 / n
    var = (s2 - (s1 * s1) / n) / (n - 1)
    if var <= 0:
        # Zero variance: SQL yields NULL (x/0); mirror it rather than
        # emitting +-inf.
        z = pd.array([pd.NA] * n, dtype="Float64")
        return pd.DataFrame({"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": z})
    sd = var**0.5
    xf = x.astype("float64")
    return pd.DataFrame(
        {"lang": pdf["lang"], "doc_id": pdf["doc_id"], "z_len": (xf - mu) / sd}
    )


@query(
    "udf_grouped_zscore",
    oracle="""
    WITH m AS (
      SELECT lang, doc_id, n_chars,
             sum(n_chars) OVER (PARTITION BY lang) AS s1,
             sum(n_chars * n_chars) OVER (PARTITION BY lang) AS s2,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           doc_id,
           (CAST(n_chars AS DOUBLE) - s1 / n)
             / sqrt((s2 - (s1 * s1) / n) / (n - 1)) AS z_len
    FROM m
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 UDAF/grouped-map shape: applyInPandas over groupBy — the
    sanctioned custom-aggregation escape hatch (Arrow batches, whole
    group per call). Oracle-checked against window-function SQL.

    100 TB caveat: each GROUP materializes in one worker's memory —
    fine for bounded groups (languages, dates), wrong for unbounded
    keys; that case belongs to built-in window/agg functions.
    """
    d = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    return d.groupBy("lang").applyInPandas(_zscore_group, _ZSCORE_SCHEMA)


_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("chunk_len", T.LongType()),
        T.StructField("chunk_md5", T.StringType()),
    ]
)

_CHUNK = 256  # bytes per frame/chunk


def _frame_manifest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One→many frame sampling over binary payloads: split each blob
    into fixed 256-byte chunks and emit one manifest row per chunk —
    the batch shape of video frame-extraction / audio windowing
    (N input blobs → sum(ceil(len/256)) output rows, streamed per
    Arrow batch). The per-chunk digest is md5 over the UPPERCASE HEX
    of the chunk: content-equivalent to hashing the bytes, and
    expressible in the oracle engine (DuckDB has no BLOB md5)."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "frame_idx", "byte_offset", "chunk_len", "chunk_md5")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            # ceil(len/CHUNK) chunks; an empty payload yields zero
            # rows (mirrors the oracle's range(0, ceil(0)) = empty).
            for i in range(-(-len(payload) // _CHUNK)):
                chunk = payload[i * _CHUNK : (i + 1) * _CHUNK]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["byte_offset"].append(i * _CHUNK)
                out["chunk_len"].append(len(chunk))
                out["chunk_md5"].append(hashlib.md5(chunk.hex().upper().encode()).hexdigest())
        yield pd.DataFrame(out)


@query(
    "multimodal_frame_manifest",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT doc_id,
           i AS frame_idx,
           i * {_CHUNK} AS byte_offset,
           least({_CHUNK}, n - i * {_CHUNK}) AS chunk_len,
           md5(substr(hx, i * {_CHUNK} * 2 + 1, {_CHUNK} * 2)) AS chunk_md5
    FROM p, UNNEST(range(0, CAST(ceil(n / {_CHUNK}.0) AS BIGINT))) AS t(i)
    """,
)
def multimodal_frame_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5b: frame/chunk manifest — the one→many mapInPandas shape of
    video frame sampling or audio windowing, with deterministic chunk
    digests so the WHOLE fan-out (row multiplication, offsets,
    lengths, per-chunk content identity) is oracle-verified. Swap the
    chunker for a real frame extractor on a cluster with codecs; the
    Spark-side plumbing (binary column in, per-chunk rows out,
    Arrow-batched) is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    mm = with_binary_payload(docs)
    return mm.select("doc_id", "payload").mapInPandas(_frame_manifest, _MANIFEST_SCHEMA)


def _normalize_series(texts: pd.Series) -> pd.Series:
    """Vectorized text normalization: lower → strip non-alphanumerics
    → collapse whitespace → trim. Pure pandas string kernels over
    Arrow batches — the Series→Series fast path (no per-row Python
    function calls; ~10-100× over a row UDF)."""
    return (
        texts.str.lower()
        .str.replace(r"[^a-z0-9 ]", " ", regex=True)
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )


@query(
    "udf_pandas_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                               '\\s+', ' ', 'g')) AS norm_text,
           length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                      '\\s+', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
)
def udf_pandas_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar pandas UDF (Series→Series): the third Arrow shape
    next to mapInPandas (multimodal_binary_features) and
    applyInPandas (udf_grouped_zscore). Normalization is the
    canonical pre-dedup step; the oracle runs the equivalent regex
    chain in SQL, verifying the vectorized kernel byte-for-byte."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def norm(texts: pd.Series) -> pd.Series:
        return _normalize_series(texts)

    d = load_table(spark, sf_dir, "documents")
    # Two-step select: the UDF runs once; the length derives from its
    # output column instead of a second UDF evaluation.
    return d.select("doc_id", norm("text").alias("norm_text")).select(
        "doc_id", "norm_text", F.length("norm_text").alias("n_chars_norm")
    )


@query(
    "udf_grouped_agg_gini",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    r AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS i,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           any_value(n) AS n_events,
           CAST(sum((2 * i - n - 1) * cents) AS DOUBLE)
             / (any_value(n) * sum(cents)) AS gini
    FROM r
    GROUP BY event_type
    """,
)
def udf_grouped_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 GROUPED_AGG pandas UDF — the fourth Arrow shape (true
    UDAF: Series→scalar inside .agg()), completing the surface next
    to scalar (udf_pandas_normalize_text), grouped-map
    (udf_grouped_zscore), and map-iter (multimodal_binary_features).

    The aggregate is the Gini concentration coefficient of event
    value per type (sorted-rank formula G = Σ(2i−n−1)x_(i) /
    (n·Σx)) — computed over CENTS as int64 inside the kernel, so the
    only float op is one final division of two exact < 2^53 integers:
    engine-identical, no tolerance needed. Ties contribute
    index-permutation-invariant sums (equal x across an index block
    factor out), so the sort inside the kernel is deterministic-
    enough by construction.

    Scale caveat (documented, inherent to GROUPED_AGG): the whole
    group materializes in one kernel invocation — no partial
    aggregation. Right for bounded group counts/sizes (5 types here);
    for unbounded groups use the built-in-expression formulation the
    oracle itself demonstrates (window rank + integer sums), which
    does stream. Both shapes shown on purpose: the UDF is the
    escape hatch, the oracle is the scale path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def gini(v: pd.Series) -> float:
        cents = np.floor(v.to_numpy(dtype="float64") * 100.0 + 0.5).astype("int64")
        cents.sort()
        n = len(cents)
        total = int(cents.sum())
        if n == 0 or total == 0:
            return None
        num = int(((2 * np.arange(1, n + 1) - n - 1) * cents).sum())
        return float(num) / float(n * total)

    ev = load_table(spark, sf_dir, "events")
    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one .agg() (INVALID_PANDAS_UDF_PLACEMENT) — the
    # count runs as its own plain aggregate and joins back on the
    # group key, the same split-agg shape as agg_approx_count_distinct.
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n_events"))
    ginis = ev.groupBy("event_type").agg(gini("value").alias("gini"))
    return counts.join(ginis, "event_type").select("event_type", "n_events", "gini")
