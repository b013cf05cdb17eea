"""End-to-end multimodal corpus pipeline — the round-7 components
composed as one job, the way a training-data team would run them:

  raw blobs (mixed formats, some corrupt, some duplicated)
    → write WebDataset tar shards (deterministic, manifest)
    → read shards back, group samples
    → REAL decode featurize with quarantine (bad blobs → DLQ rows)
    → exact dedup on decoded content (md5 of pixels, not bytes:
      the SAME image encoded as PNG and as PGM is one duplicate)
    → repack the clean, deduped corpus into new shards

Each stage is asserted: manifest counts, quarantine classes, the
cross-encoding duplicate collapsing to one survivor, and the final
clean-shard manifest."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from flink_hiveorc_spark.sources import webdataset as wd

from test_gif_decode import _PAL8, _gif_bytes
from test_image_decode import _pgm_bytes, _rng
from test_png_g711_decode import ALL_FILTERS, _png_from_array


def test_multimodal_corpus_pipeline_end_to_end(spark, tmp_path):
    rng = _rng(900)
    # --- corpus: 6 unique gray images; image 0 appears TWICE, once
    # as PGM and once as PNG (same pixels, different bytes); plus one
    # corrupt blob and one codec-needing blob
    arrs = [
        rng.integers(0, 256, size=(6, 6, 1), dtype=np.uint8) for _ in range(6)
    ]
    rows = [(0, f"{i:04d}", "pgm", bytearray(_pgm_bytes(arrs[i]))) for i in range(6)]
    rows += [
        (1, "0100", "png", bytearray(_png_from_array(arrs[0], ALL_FILTERS))),
        (1, "0101", "pgm", bytearray(b"P5\n8 8\n255\n" + b"\x00" * 4)),  # corrupt
        # arithmetic-coded JPEG (SOF9): outside the native decoder
        (1, "0102", "jpg", bytearray(b"\xff\xd8\xff\xc9" + b"\x00" * 24)),
        (1, "0103", "gif", bytearray(
            _gif_bytes(rng.integers(0, 8, size=(4, 4), dtype=np.uint8), _PAL8)
        )),
    ]
    blobs = spark.createDataFrame(
        rows, "shard_id long, key string, ext string, payload binary"
    )

    # --- stage 1: pack the raw corpus into WebDataset shards
    raw_dir = str(tmp_path / "raw_shards")
    manifest = {r["shard_id"]: r for r in wd.write_tar_shards(blobs, raw_dir).collect()}
    assert manifest[0]["n_members"] == 6 and manifest[1]["n_members"] == 4

    # --- stage 2: read back + featurize with quarantine (REAL decode)
    from flink_hiveorc_spark.functions.multimodal import decode_image, image_stats

    members = wd.read_tar_shards(spark, raw_dir)
    assert members.count() == 10
    keyed = members.select(
        F.expr("cast(key as long)").alias("doc_id"), "payload"
    )
    feats = image_stats(keyed, quarantine=True).cache()
    bad = {r["doc_id"]: r["error"] for r in feats.filter("error is not null").collect()}
    assert bad == {
        101: bad[101],  # malformed (truncated PGM)
        102: bad[102],  # unsupported (arithmetic JPEG, no codec)
    }
    assert bad[101].startswith("malformed:") and bad[102].startswith("unsupported:")
    good = feats.filter("error is null")
    assert good.count() == 8  # 6 pgm + the PNG twin + the GIF

    # --- stage 3: exact dedup on DECODED pixel content, not payload
    # bytes — the PNG re-encode of image 0 must collapse with its PGM
    def pixel_md5(payload):
        return hashlib.md5(decode_image(bytes(payload)).tobytes()).hexdigest()

    import pandas as pd

    def digest_batch(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pixel_md5": [
                        pixel_md5(p) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    decodable = keyed.join(good.select("doc_id"), "doc_id")
    digests = decodable.mapInPandas(digest_batch, "doc_id long, pixel_md5 string")
    survivors = digests.groupBy("pixel_md5").agg(F.min("doc_id").alias("doc_id"))
    assert survivors.count() == 7  # 8 good - 1 cross-encoding dup
    kept_ids = {r["doc_id"] for r in survivors.collect()}
    assert 0 in kept_ids and 100 not in kept_ids  # first-writer wins

    # --- stage 4: repack the clean corpus into fresh shards
    clean = (
        keyed.join(survivors.select("doc_id"), "doc_id")
        .withColumn("shard_id", (F.col("doc_id") % 2).cast("long"))
        .withColumn("key", F.format_string("%04d", F.col("doc_id")))
        .withColumn("ext", F.lit("img"))
        .select("shard_id", "key", "ext", "payload")
    )
    clean_dir = str(tmp_path / "clean_shards")
    clean_manifest = wd.write_tar_shards(clean, clean_dir).collect()
    assert sum(r["n_members"] for r in clean_manifest) == 7
    # the clean store round-trips and every member decodes
    reread = wd.read_tar_shards(spark, clean_dir)
    refeats = image_stats(
        reread.select(F.expr("cast(key as long)").alias("doc_id"), "payload")
    )
    assert refeats.filter("height is null").count() == 0
    assert refeats.count() == 7
    feats.unpersist()
