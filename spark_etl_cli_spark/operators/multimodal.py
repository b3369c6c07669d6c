"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for 100 TB image/audio/video pipelines on Spark: the media
payload is an opaque ``binary`` column riding next to typed metadata;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so
each Python worker touches a whole batch of payloads at once, and the
schema contract is explicit up front (Catalyst can still prune/push the
metadata columns because they are ordinary columns).

The actual codec step is STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder produces
(width, height, mean_luma) from a hash of the bytes — which makes the
Spark-side plumbing (schema, batching, partitioning) fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, kind: str, payload_col: str
) -> DataFrame:
    """Normalize an arbitrary frame into the media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image codec: derives (w, h, luma)
    from the payload digest. Replaces PIL/libvips in this container."""
    d = hashlib.sha256(payload or b"").digest()
    width = 64 + d[0]
    height = 64 + d[1]
    mean_luma = d[2] / 255.0
    return width, height, mean_luma


IMAGE_FEATURES_SCHEMA = "media_id long, width int, height int, mean_luma double, n_bytes long"


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Extract per-image features via Arrow-batched ``mapInPandas``.

    Real decode (PIL/turbojpeg) is not available in this container —
    pass ``fake=True`` to use the deterministic stub; otherwise this
    raises NotImplementedError at plan execution time.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decoding requires PIL/libvips (not in container); "
                    "pass fake=True for the deterministic stub"
                )
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx) rows.

    Real frame extraction needs ffmpeg; the fake variant derives a
    deterministic frame count from payload size so downstream operators
    (explode → per-frame features) are exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decoding requires ffmpeg (not in container); "
                    "pass fake=True for the deterministic stub"
                )
            rows = {"media_id": [], "frame_idx": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(payload or b"") % 100) + 1
                for i in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int"
    )


RESIZED_SCHEMA = "media_id long, payload binary, width int, height int"


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Batch image resize via ``mapInPandas`` — binary in, binary out.

    The payload round-trip (Arrow binary columns both directions) is the
    part that matters for pipeline plumbing; the pixel work itself needs
    PIL/libvips. The fake variant re-frames the original bytes with a
    12-byte deterministic header (magic + target dims) so tests can
    verify the payload actually passed through Python and back.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resizing requires PIL/libvips (not in "
                    "container); pass fake=True for the deterministic stub"
                )
            header = b"RSZ0" + width.to_bytes(4, "big") + height.to_bytes(4, "big")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda b: header + bytes(b or b"")
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, duration_s double, rms double, n_bytes long"
)


def decode_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-clip audio features via Arrow-batched ``mapInPandas``.

    Real decode (soundfile/librosa) is not in this container; the fake
    variant derives (sample_rate, duration, rms) deterministically from
    the payload digest so the batch plumbing is exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decoding requires soundfile/librosa (not in "
                    "container); pass fake=True for the deterministic stub"
                )

            def feats(b):
                d = hashlib.sha256(bytes(b or b"")).digest()
                rate = (8000, 16000, 22050, 44100)[d[3] % 4]
                duration = 1.0 + d[4] / 16.0
                rms = d[5] / 255.0
                return rate, duration, rms

            rows = [feats(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [r[0] for r in rows],
                    "duration_s": [r[1] for r in rows],
                    "rms": [r[2] for r in rows],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def payload_dedup_groups(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Content-addressable exact dedup over binary payloads.

    Groups media by ``sha2(payload, 256)`` — the storage-dedup
    primitive every blob lake runs before ingesting media. Everything
    is JVM codegen (sha2 over binary, one map-side-combined groupBy);
    the shuffle carries 64-byte digests, not payloads. Returns
    ``(digest, keep_id, group_size, n_bytes)`` per duplicate group.
    Non-numeric id columns (e.g. ``binaryfile://`` paths) are hashed
    to a stable 64-bit id — a silent ``min(path).cast(bigint)`` would
    NULL every keep_id.
    """
    id_expr = F.col(id_col)
    if dict(df.dtypes).get(id_col) not in (
        "bigint",
        "int",
        "long",
        "smallint",
        "tinyint",
    ):
        id_expr = F.xxhash64(id_expr)
    return (
        df.select(
            F.sha2(F.col(payload_col), 256).alias("digest"),
            id_expr.alias("__id"),
            F.octet_length(F.col(payload_col)).cast("bigint").alias("__b"),
        )
        .groupBy("digest")
        .agg(
            F.min("__id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.min("__b").alias("n_bytes"),
        )
        .filter(F.col("group_size") > 1)
    )


def chunk_dedup_stats(
    df: DataFrame, payload_col: str = "payload", chunk_bytes: int = 256
) -> DataFrame:
    """Fixed-size chunk dedup ratio over binary payloads.

    Splits every payload into ``chunk_bytes`` slices, digests each
    (sha2, JVM-side — substring works on binary), and reports ONE row:
    (total_chunks, unique_chunks, dup_chunks, dedup_ratio) — the
    dedup-savings estimate a content-addressable store computes before
    ingest. The exact-distinct count is a digest groupBy (map-side
    combined, 32-byte keys); nothing ever collects payloads. Empty
    payloads are skipped (Spark's sequence(1, 0) counts DOWN).
    """
    chunks = (
        df.filter(F.octet_length(F.col(payload_col)) > 0)
        .select(F.col(payload_col).alias("__p"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, int(ceil(octet_length(__p) / "
                    f"{float(chunk_bytes)}))), i -> "
                    f"sha2(substring(__p, (i-1)*{chunk_bytes}+1, "
                    f"{chunk_bytes}), 256))"
                )
            ).alias("d")
        )
    )
    per_digest = chunks.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return per_digest.agg(
        F.sum("n").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("unique_chunks"),
        (F.sum("n") - F.count(F.lit(1))).cast("bigint").alias("dup_chunks"),
        (
            F.count(F.lit(1)).cast("double")
            / F.sum("n").cast("double")
        ).alias("dedup_ratio"),
    )
