"""Built-in file-format connectors: parquet, csv/tsv text, json, orc, avro.

Capability parity targets in the reference:

- ``parquet://`` — ``core/.../ParquetDataFrameIO.scala:7-26``
- ``text://`` (csv/tsv with delimiter from extension) —
  ``core/.../TextFileDataFrameSource.scala:9-42``
- ``avro://`` / ``avro-stream://`` — ``avro/.../AvroFileDataFrameSource.scala:9-33``
  (gated: the spark-avro jar may be absent locally; the connector
  registers regardless and fails with a clear message if the format is
  unavailable at read time)

Flat text formats serialize nested struct/array columns to JSON strings
on write (reference ``core/.../DataFrameUtils.scala:8-14``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spark_etl_cli_spark.operators.schema_tools import json_encode_complex
from spark_etl_cli_spark.registry import register_sink, register_source
from spark_etl_cli_spark.sources.base import FileSink, FileSource, reader_options
from spark_etl_cli_spark.uri import ParsedUri


@register_source("parquet", "parquet-stream")
def parquet_source(p: ParsedUri) -> FileSource:
    return FileSource(p, "parquet")


@register_sink("parquet", "parquet-stream")
def parquet_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "parquet")


@register_source("orc", "orc-stream")
def orc_source(p: ParsedUri) -> FileSource:
    return FileSource(p, "orc")


@register_sink("orc", "orc-stream")
def orc_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "orc")


@register_source("json", "json-stream")
def json_source(p: ParsedUri) -> FileSource:
    return FileSource(p, "json")


@register_sink("json", "json-stream")
def json_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "json")


@register_source("avro", "avro-stream")
def avro_source(p: ParsedUri) -> FileSource:
    return FileSource(p, "avro")


@register_sink("avro", "avro-stream")
def avro_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "avro")


def _text_delimiter(path: str, params: dict[str, str]) -> str:
    if "delimiter" in params:
        return params["delimiter"]
    if path.endswith(".tsv"):
        return "\t"
    return ","


@dataclass
class TextSource:
    uri: ParsedUri

    def read(self, spark: SparkSession) -> DataFrame:
        opts = reader_options(self.uri)
        opts.setdefault("header", "true")
        opts["delimiter"] = _text_delimiter(self.uri.path, opts)
        inner = FileSource(self.uri, "csv", default_options=opts)
        return inner.read(spark)


@dataclass
class TextSink:
    uri: ParsedUri

    def write(self, df: DataFrame) -> bool:
        opts = reader_options(self.uri)
        opts.setdefault("header", "true")
        opts["delimiter"] = _text_delimiter(self.uri.path, opts)
        flat = df if df.isStreaming else json_encode_complex(df)
        inner = FileSink(self.uri, "csv", default_options=opts)
        return inner.write(flat)


@register_source("text", "csv", "text-stream", "csv-stream")
def text_source(p: ParsedUri) -> TextSource:
    return TextSource(p)


@register_sink("text", "csv", "text-stream", "csv-stream")
def text_sink(p: ParsedUri) -> TextSink:
    return TextSink(p)


@register_source("xml", "xml-stream")
def xml_source(p: ParsedUri) -> FileSource:
    """``xml://path?rowTag=row`` — Spark 4's built-in XML source
    (spark-xml was folded into core). ``rowTag`` defaults to ``row``;
    any other reader option passes through the query string."""
    return FileSource(p, "xml", default_options={"rowTag": "row"})


@register_sink("xml", "xml-stream")
def xml_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "xml", default_options={"rowTag": "row"})


@register_source("binaryfile")
def binaryfile_source(p: ParsedUri) -> FileSource:
    """``binaryfile://dir?pathGlobFilter=*.png`` — Spark's binaryFile
    source: one row per file as (path, modificationTime, length,
    content BINARY). The ingestion front door for the multimodal
    operators (operators/multimodal.py): content maps straight onto
    their ``payload`` column. Read-only by design (Spark has no
    binaryFile writer; persist payloads as parquet instead)."""
    return FileSource(p, "binaryFile")


@register_source("lines", "lines-stream")
def lines_source(p: ParsedUri) -> FileSource:
    """``lines://path`` — Spark's ``text`` source: one row per line in
    a single ``value`` string column (the raw-corpus front door;
    ``text://`` keeps the reference's CSV/TSV semantics)."""
    return FileSource(p, "text")


@register_sink("lines", "lines-stream")
def lines_sink(p: ParsedUri) -> FileSink:
    return FileSink(p, "text")
