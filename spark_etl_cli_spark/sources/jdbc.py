"""JDBC connector: any database Spark's JDBC data source can reach.

The reference has no JDBC connector; this extends the connector surface
with Spark's built-in one (the natural PySpark answer to "read from a
database" — no reference-code analogue to cite). URI form:

    jdbc:///TABLE?url=<jdbc-url>&user=...&password=...
    jdbc://?url=...&query=SELECT ...           (ad-hoc query source)

All query params are forwarded verbatim as Spark JDBC options; the URI
path (if given) becomes ``dbtable``. The bundled Derby driver makes the
connector testable without external services (embedded
``jdbc:derby:/path;create=true`` URLs).

Scale design — a naive JDBC read is ONE task holding one connection:
pass ``partitionColumn`` + ``lowerBound`` + ``upperBound`` +
``numPartitions`` and Spark issues range-predicated parallel reads;
writes batch per partition (``batchsize``, default 1000). Those options
forward straight through this connector. Filter pushdown and column
pruning reach the database as WHERE/SELECT clauses via Catalyst's JDBC
relation, so declarative plans stay efficient.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from spark_etl_cli_spark.registry import register_sink, register_source
from spark_etl_cli_spark.sources.base import reader_options
from spark_etl_cli_spark.uri import ParsedUri


def _jdbc_options(p: ParsedUri) -> dict[str, str]:
    opts = reader_options(p)
    table = p.path.strip("/")
    if table and "dbtable" not in opts and "query" not in opts:
        opts["dbtable"] = table
    if "url" not in opts:
        raise ValueError("jdbc:// requires a ?url=<jdbc-url> parameter")
    return opts


@dataclass
class JdbcSource:
    uri: ParsedUri

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**_jdbc_options(self.uri)).load()


@dataclass
class JdbcSink:
    uri: ParsedUri

    def write(self, df: DataFrame) -> bool:
        if df.isStreaming:
            # batch-only Spark sink -> per-micro-batch writes; default
            # append (per-batch overwrite would clobber prior batches)
            from spark_etl_cli_spark.sources.base import stream_via_foreach_batch

            return stream_via_foreach_batch(
                df, lambda b: self._write_batch(b, default_mode="append"),
                self.uri,
            )
        return self._write_batch(df, default_mode="overwrite")

    def _write_batch(self, df: DataFrame, default_mode: str) -> bool:
        opts = _jdbc_options(self.uri)
        mode = self.uri.params.get("mode", default_mode)
        for k in ("mode", "checkpointLocation", "trigger-interval"):
            opts.pop(k, None)
        df.write.format("jdbc").options(**opts).mode(mode).save()
        return True


@register_source("jdbc")
def jdbc_source(p: ParsedUri) -> JdbcSource:
    return JdbcSource(p)


@register_sink("jdbc")
def jdbc_sink(p: ParsedUri) -> JdbcSink:
    return JdbcSink(p)
