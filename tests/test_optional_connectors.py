"""Catalog connector round-trip + clean gating of absent dependencies.

The container ships no delta/spark-avro/kafka jars and no Excel engine;
each connector must still register its scheme and fail with a clear,
actionable error — never a silent no-op.
"""

import pytest

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.sources.optional import MissingDependencyError


def test_table_sink_and_source_round_trip(spark):
    spark.sql("DROP TABLE IF EXISTS t_rt")
    run_pipeline(
        spark,
        sources=["v+values://?header=id:long,name&values=1,ann;2,bo"],
        sinks=["v+table://t_rt?mode=overwrite"],
    )
    run_pipeline(
        spark,
        sources=["back+table://t_rt"],
        sinks=["back+memory://table_back"],
    )
    got = sorted((r.id, r.name) for r in spark.table("table_back").collect())
    assert got == [(1, "ann"), (2, "bo")]


def test_table_sink_skips_empty_input(spark):
    spark.sql("DROP TABLE IF EXISTS t_empty")
    res = run_pipeline(
        spark,
        sources=["v+values://?header=id:long&values="],
        sinks=["v+table://t_empty"],
        fail_fast=False,
    )
    # reference semantics: empty input -> write reports failure and the
    # table is never created (HiveDataFrameSource.scala:22)
    assert list(res.values()) == [False]
    assert not spark.catalog.tableExists("t_empty")


def test_table_sink_aligns_columns_on_append(spark):
    spark.sql("DROP TABLE IF EXISTS t_align")
    spark.createDataFrame([(1, "a")], "id bigint, name string").write.saveAsTable(
        "t_align"
    )
    # source columns in the wrong order: connector must realign
    run_pipeline(
        spark,
        sources=["v+values://?header=name,id:long&values=b,2"],
        sinks=["v+table://t_align"],
    )
    got = sorted((r.id, r.name) for r in spark.table("t_align").collect())
    assert got == [(1, "a"), (2, "b")]


def test_excel_without_engine_raises_clearly(spark, tmp_path):
    with pytest.raises(MissingDependencyError, match="excel"):
        run_pipeline(
            spark,
            sources=["v+values://?header=a:int&values=1"],
            sinks=[f"v+excel://{tmp_path}/out.xlsx"],
        )


def test_delta_without_jars_raises_clearly(spark, tmp_path):
    with pytest.raises(MissingDependencyError, match="delta"):
        run_pipeline(
            spark,
            sources=["v+values://?header=a:int&values=1"],
            sinks=[f"v+delta://{tmp_path}/dt"],
        )


def test_kafka_without_jars_raises_clearly(spark):
    with pytest.raises(MissingDependencyError, match="kafka"):
        run_pipeline(spark, sources=["k+kafka://localhost:9092/topic"])


def test_solr_without_endpoint_raises_clearly(spark):
    with pytest.raises(MissingDependencyError, match="[Ss]olr"):
        run_pipeline(
            spark,
            sources=["v+values://?header=a:int&values=1"],
            sinks=["v+solr://collection1"],
        )
