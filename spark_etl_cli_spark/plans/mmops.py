"""Multimodal-column query coverage (binary payload plumbing).

The media payloads are opaque ``binary`` columns (here: UTF-8 document
bytes standing in for image/video blobs — real codecs aren't in the
container, see operators/multimodal.py). What these queries verify for
real: the media schema normalization, Arrow-batched ``mapInPandas``
feature extraction (batch shape, output schema, partition parallelism),
and the explode-per-frame pattern.

The fake decoder is sha256-derived, which DuckDB can replicate —so even
the Python-UDF path is oracle-verified end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_features,
    sample_frames,
)
from spark_etl_cli_spark.operators.util import fan_out
from spark_etl_cli_spark.plans.registry import query, t

# d[i] = i-th byte of sha256(payload), as int (payload = UTF-8 text)
def _sql_digest_byte(i: int) -> str:
    return f"CAST('0x' || substr(sha256(text), {2 * i + 1}, 2) AS INT)"


def _media(spark, sf_dir):
    """documents → media frame: payload = UTF-8 bytes of the text."""
    d = fan_out(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    ).withColumn("payload", F.encode("text", "UTF-8"))
    return attach_binary_payload(d, id_col="doc_id", kind="image", payload_col="payload")


# --- q44: image feature extraction via mapInPandas ----------------------
# Arrow batches of binary payloads → per-image (width, height, luma,
# size). The only Python-side operator in the engine's query library;
# everything else is codegen'd.
@query(
    "q44_multimodal_features",
    oracle=f"""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(64 + {_sql_digest_byte(0)} AS INT) AS width,
           CAST(64 + {_sql_digest_byte(1)} AS INT) AS height,
           {_sql_digest_byte(2)} / 255.0 AS mean_luma,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 200
    """,
)
def q44_multimodal_features(spark, sf_dir):
    return decode_image_features(_media(spark, sf_dir), fake=True)


# --- q45: video frame sampling + per-media rollup -----------------------
# sample_frames explodes each payload into frame rows (every 10th of a
# size-derived frame count); the rollup counts sampled frames per media.
@query(
    "q45_frame_sampling",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(((octet_length(encode(text)) % 100) + 10) // 10 AS BIGINT)
             AS n_frames
    FROM documents WHERE doc_id < 200
    """,
)
def q45_frame_sampling(spark, sf_dir):
    frames = sample_frames(_media(spark, sf_dir), every_n=10, fake=True)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames")
    )


# Planted-dup media corpus: every doc < 100 re-appears under a new id
# with an IDENTICAL payload (content-addressable dup, unlike the
# whitespace-noised text-dedup corpus in plans/textops.py).
_SQL_MEDIA_DUPS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 100
"""


def _media_dups(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return (
        fan_out(d.unionByName(copies))
        .withColumn("payload", F.encode("text", "UTF-8"))
        .select(F.col("doc_id").alias("media_id"), "payload")
    )


# --- q146: content-addressable media dedup -------------------------------
# Exact payload dedup by sha256 digest — all JVM codegen over the
# binary column (the 100 TB shape: the shuffle carries 64-byte
# digests, never payloads).
@query(
    "q146_media_payload_dedup",
    oracle=f"""
    WITH media AS ({_SQL_MEDIA_DUPS})
    SELECT sha256(text) AS digest,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM media GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def q146_media_payload_dedup(spark, sf_dir):
    from spark_etl_cli_spark.operators.multimodal import payload_dedup_groups

    return payload_dedup_groups(_media_dups(spark, sf_dir))


# --- q147: fixed-size chunk dedup ratio ----------------------------------
# The blob-store savings estimate: 256-byte chunk digests, global
# distinct-vs-total. DuckDB rebuilds identical chunks because the
# corpus is ASCII (byte slicing == char slicing; asserted in tests).
@query(
    "q147_chunk_dedup_ratio",
    oracle=f"""
    WITH media AS ({_SQL_MEDIA_DUPS}),
    ch AS (
      SELECT unnest(list_transform(
               generate_series(1, CAST(ceil(length(text) / 256.0) AS BIGINT)),
               i -> sha256(substring(text,
                                     CAST((i-1)*256+1 AS INT), 256)))) AS d
      FROM media WHERE length(text) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total_chunks,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS unique_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT d) AS BIGINT) AS dup_chunks,
           CAST(COUNT(DISTINCT d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS dedup_ratio
    FROM ch
    """,
)
def q147_chunk_dedup_ratio(spark, sf_dir):
    from spark_etl_cli_spark.operators.multimodal import chunk_dedup_stats

    return chunk_dedup_stats(_media_dups(spark, sf_dir), chunk_bytes=256)
