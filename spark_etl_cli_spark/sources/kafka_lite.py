"""``kafka-lite://`` — a file-backed Kafka topic emulation.

The sandbox has no broker or kafka jar, so ``format("kafka")`` can only
be exercised up to the option boundary (see ``kafka_reader_contract`` /
``kafka_writer_contract`` in ``sources/optional.py``). This module
closes the rest of the gap: a topic is a directory of parquet segment
files whose rows carry EXACTLY the kafka source's record shape
(``key binary, value binary, topic, partition, offset, timestamp,
timestampType``), and reads/writes run through the SAME serde module
(``streaming/serde.py``) as the real connector — so the full
produce → serde → consume → diff pipeline of the reference's Test 1
(``etl/src/test/scala/dev/mauch/spark/dfio/ETLTest.scala:92-128``,
which needed a Testcontainers broker) runs end-to-end here with no
broker at all.

Semantics and their limits (documented, not hidden):
- Appends are atomic at segment-file granularity (a parquet part file
  is complete or absent), mirroring "a record is either in the log or
  not".
- ``offset`` is monotone per (producer-)partition but NOT globally
  contiguous — consumers that only need ordering/uniqueness (which is
  what Kafka itself guarantees across partitions: nothing) are
  faithful; exact offset arithmetic is not emulated.
- Streaming reads use Spark's native file streaming over the segment
  directory (new segments = new micro-batch input), giving watermarks,
  exactly-once file tracking, and checkpoint/resume for free.

Scale posture: segments are plain parquet written/read distributed;
nothing is collected. A 100 TB topic is just a 100 TB parquet dataset
with kafka's column contract.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_etl_cli_spark.sources.base import apply_watermark, reader_options
from spark_etl_cli_spark.uri import ParsedUri

# the kafka source's fixed record schema (KafkaSourceProvider's output
# columns) — segment files store exactly this
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def _topic_dir(uri: ParsedUri) -> tuple[str, str]:
    """kafka-lite:///root/dir/topicname → (dir, topic)."""
    path = uri.path.rstrip("/")
    return path, os.path.basename(path)


@dataclass
class KafkaLiteSource:
    """``kafka-lite:///dir/topic?serde=json[:schema]|avro:...|none``."""

    uri: ParsedUri

    def read(self, spark: SparkSession) -> DataFrame:
        from spark_etl_cli_spark.streaming.serde import deserialize_values

        path, topic = _topic_dir(self.uri)
        opts = reader_options(self.uri)
        serde = opts.pop("serde", "json")
        include_key = opts.pop("include-key", None)
        compacted = opts.pop("compacted", "").lower() in ("1", "true", "yes")
        if self.uri.is_stream:
            if compacted:
                raise ValueError(
                    "kafka-lite ?compacted= is a batch read (log compaction "
                    "is a whole-log view; streams see the raw log)"
                )
            raw = (
                spark.readStream.schema(KAFKA_RECORD_SCHEMA)
                .options(**opts)
                .parquet(path)
            )
        else:
            if not os.path.isdir(path):
                raise FileNotFoundError(
                    f"kafka-lite topic dir {path!r} does not exist — "
                    "produce to it first"
                )
            raw = spark.read.schema(KAFKA_RECORD_SCHEMA).options(**opts).parquet(path)
        if compacted:
            raw = _compacted_view(raw)
        df = deserialize_values(
            spark, raw, serde, topic=topic, include_key=include_key
        )
        return apply_watermark(df, self.uri.params.get("watermark"))


@dataclass
class KafkaLiteSink:
    uri: ParsedUri

    def write(self, df: DataFrame) -> bool:
        from spark_etl_cli_spark.streaming.serde import serialize_values

        path, topic = _topic_dir(self.uri)
        opts = reader_options(self.uri)
        serde = opts.pop("serde", "json")
        out = serialize_values(
            df, serde, topic=topic, key_col=opts.pop("key-column", None)
        )
        framed = _frame_records(out, topic, streaming=df.isStreaming)
        if df.isStreaming:
            writer = (
                framed.writeStream.format("parquet")
                .option("path", path)
                .options(**opts)
            )
            if "checkpointLocation" not in opts:
                writer = writer.option(
                    "checkpointLocation", os.path.join(path, "_ckpt")
                )
            writer.start()
            return True
        framed.write.mode("append").options(**opts).parquet(path)
        return True


def _compacted_view(raw: DataFrame) -> DataFrame:
    """Kafka log compaction semantics over the segment log: latest
    record per key wins (by offset), tombstones (null value) DELETE the
    key, unkeyed records are dropped (a compacted topic requires
    keys — Kafka itself rejects keyless produces there). One window per
    key partition-group; keys hash-shuffle once.
    """
    from pyspark.sql import Window

    # recency order: timestamp first (constant per produce batch,
    # increases across batches), offset as the within-batch tiebreak —
    # offsets alone restart per produce, so they cannot order batches
    w = Window.partitionBy("key").orderBy(
        F.col("timestamp").desc(), F.col("offset").desc()
    )
    return (
        raw.filter(F.col("key").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("value").isNotNull())
        .drop("__rn")
    )


def _frame_records(
    out: DataFrame, topic: str, streaming: bool = False
) -> DataFrame:
    """Serde output (``value`` [+ ``key``]) → full kafka record rows.

    Batch: ``offset`` is monotone within a producer partition
    (monotonically_increasing_id packs the partition id in the high
    bits — same guarantee Kafka gives across partitions: none).
    Streaming: Spark's UnsupportedOperationChecker rejects
    monotonically_increasing_id in streaming plans, so streamed
    records carry offset -1 — recency ordering comes from the
    per-batch timestamp, which is what the compacted view keys on
    anyway.
    """
    cols = set(out.columns)
    offset = (
        F.lit(-1).cast("long")
        if streaming
        else F.monotonically_increasing_id()
    )
    framed = out.select(
        (F.col("key") if "key" in cols else F.lit(None)).cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
        offset.alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),  # CREATE_TIME
    )
    return framed
