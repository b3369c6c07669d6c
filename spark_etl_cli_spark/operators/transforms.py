"""Transform URI registrations: identity, sql, sql-file, flatten,
flatten-explode, diff.

Transform semantics mirror the reference's transformer registry
(``core/.../TransformerParser.scala:17-144``,
``diff/.../DiffTransformerParser.scala:9-62``): each scheme maps to a
``(spark, df) -> df`` function; the pipeline registers the input view as
``input`` before invoking, so ``sql://`` can reference it.
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import DataFrame, SparkSession

from spark_etl_cli_spark.operators.diff import apply_diff_handling, diff
from spark_etl_cli_spark.operators.schema_tools import flatten, flatten_explode
from spark_etl_cli_spark.pipeline import TransformFn
from spark_etl_cli_spark.registry import register_transform
from spark_etl_cli_spark.uri import ParsedUri


@register_transform("identity")
def identity_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: df


@register_transform("sql")
def sql_transform(p: ParsedUri) -> TransformFn:
    # URI "path" carries URL-encoded SQL (reference TransformerParser.scala:24).
    # SQL rarely survives urlparse's netloc/path split, so use the full
    # percent-decoded text after 'sql://'; also accept ?query=.
    sql = p.params.get("query") or p.rest
    if not p.params.get("query") and "?query=" in sql:
        sql = sql.split("?query=", 1)[0]
    sql = urllib.parse.unquote(sql) if "%" in sql else sql

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        return spark.sql(sql)

    return run


@register_transform("sql-file")
def sql_file_transform(p: ParsedUri) -> TransformFn:
    path = p.path

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        with open(path) as fh:
            return spark.sql(fh.read())

    return run


@register_transform("flatten")
def flatten_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: flatten(df)


@register_transform("flatten-explode")
def flatten_explode_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: flatten_explode(df)


@register_transform("diff")
def diff_transform(p: ParsedUri) -> TransformFn:
    """``in+out+diff://otherView?id=a,b&ignore=c&handleDifferences=filter|fail``.

    Compares the input view against another registered view (right side),
    like the reference (``DiffTransformerParser.scala:35``).
    """
    other_view = p.path.lstrip("/") or p.authority
    id_cols = [c for c in p.params.get("id", "").split(",") if c]
    ignore = [c for c in p.params.get("ignore", "").split(",") if c]
    handle = p.params.get("handleDifferences")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        right = spark.table(other_view)
        return apply_diff_handling(diff(df, right, id_cols, ignore), handle)

    return run
