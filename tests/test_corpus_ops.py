"""Unit tests for corpus-curation operators (clustering, sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_chain_and_pair(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    from spark_etl_cli_spark.operators.dedup import connected_components

    got = {
        (r["id"], r["comp"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_merges_via_bridge(spark):
    # two clusters joined by a bridge edge collapse to one component
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (20, 21), (7, 20)], ["src", "dst"]
    )
    from spark_etl_cli_spark.operators.dedup import connected_components

    comps = connected_components(edges)
    assert comps.select("comp").distinct().count() == 1
    assert comps.agg(F.min("comp")).first()[0] == 5


def test_quantize_zero_vector_guard(spark):
    from spark_etl_cli_spark.plans.vectorops import q64_vector_quantize

    df = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, -0.5], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    df.createOrReplaceTempView("_tmp_emb")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    quant = F.transform(
        F.col("embedding"),
        lambda v: F.when(F.col("maxabs") == 0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / F.col("maxabs") * 127).cast("int")
        ),
    )
    rows = {
        r["vec_id"]: r["q"]
        for r in df.withColumn("maxabs", maxabs)
        .select("vec_id", quant.alias("q"))
        .collect()
    }
    assert rows[0] == [0, 0]
    assert rows[1] == [127, -64]  # floor(-0.5*127) = -64


def test_stratified_sample_rates(spark):
    """Hash sampling keeps ~rate% per source and is deterministic."""
    from spark_etl_cli_spark.plans.corpusops import q48_stratified_sample

    a = q48_stratified_sample(spark, "/root/testdata/sf0.001")
    b = q48_stratified_sample(spark, "/root/testdata/sf0.001")
    ra = {(r["doc_id"], r["bucket"]) for r in a.collect()}
    rb = {(r["doc_id"], r["bucket"]) for r in b.collect()}
    assert ra == rb
    assert all(0 <= bkt < 100 for _, bkt in ra)
