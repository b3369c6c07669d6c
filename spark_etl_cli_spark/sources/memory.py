"""In-session connectors: ``view://`` source and ``memory://`` streaming sink.

``view://name`` reads an already-registered temp view — handy for
composing pipelines programmatically. ``memory://name`` is the
Structured Streaming memory sink (queryable as a temp view), the
standard way to make streaming tests synchronous and deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spark_etl_cli_spark.registry import register_sink, register_source
from spark_etl_cli_spark.uri import ParsedUri


@dataclass
class ViewSource:
    uri: ParsedUri

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.uri.path.lstrip("/") or self.uri.authority)


@dataclass
class MemorySink:
    uri: ParsedUri

    def write(self, df: DataFrame) -> bool:
        name = self.uri.path.lstrip("/") or self.uri.authority or "memory_out"
        if not df.isStreaming:
            df.createOrReplaceTempView(name)
            return True
        writer = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(self.uri.params.get("outputMode", "append"))
        )
        from spark_etl_cli_spark.sources.base import apply_trigger

        writer = apply_trigger(writer, self.uri.params.get("trigger-interval"))
        writer.start()
        return True


@register_source("view")
def view_source(p: ParsedUri) -> ViewSource:
    return ViewSource(p)


@register_sink("memory", "memory-stream", "view")
def memory_sink(p: ParsedUri) -> MemorySink:
    return MemorySink(p)
