"""Bucketed tables co-locate joins: no Exchange on the join key.

At 100 TB, pre-bucketing both sides of a recurring join on its key is
the difference between an every-query shuffle and a local zip of
buckets. This verifies Spark's bucketed saveAsTable + join planning
drops the shuffle when bucket specs line up.
"""

import pytest
from pyspark.sql import Row


@pytest.fixture(scope="module")
def bucketed(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    orders = spark.createDataFrame(
        [Row(okey=i, cust=i % 17) for i in range(1000)]
    )
    items = spark.createDataFrame(
        [Row(okey=i % 500, amount=float(i)) for i in range(3000)]
    )
    (
        orders.write.bucketBy(8, "okey").sortBy("okey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        items.write.bucketBy(8, "okey").sortBy("okey")
        .mode("overwrite").saveAsTable("b_items")
    )
    return spark.table("b_orders"), spark.table("b_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders, items = bucketed
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(items, "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # buckets line up
        assert joined.count() == 3000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_shuffles_for_contrast(spark, bucketed):
    orders, _ = bucketed
    plain = orders.sparkSession.createDataFrame(
        [Row(okey=i, extra="x") for i in range(100)]
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            orders.join(plain, "okey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_table_sink_bucketed_write_joins_without_shuffle(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline

    run_pipeline(
        spark,
        sources=["a+values://?header=k:long,v:int&values=1,10;2,20;3,30"],
        sinks=["a+table://uri_bucketed_a?mode=overwrite&bucket-by=k&buckets=4&sort-by=k"],
    )
    run_pipeline(
        spark,
        sources=["b+values://?header=k:long,w:int&values=1,7;3,9"],
        sinks=["b+table://uri_bucketed_b?mode=overwrite&bucket-by=k&buckets=4&sort-by=k"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("uri_bucketed_a").join(
            spark.table("uri_bucketed_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 2
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
