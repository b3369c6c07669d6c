"""Salted aggregation/join must be exact rewrites of the plain plans."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.skew import salted_agg, salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [Row(k="hot", uid=i, v=i % 7) for i in range(900)]
    rows += [Row(k=f"t{i % 10}", uid=1000 + i, v=i % 5) for i in range(100)]
    return spark.createDataFrame(rows)


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.s, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.count("uid").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.s, r.mx)
        for r in salted_agg(
            skewed,
            keys=["k"],
            aggs={"n": ("uid", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
            salt_from="uid",
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], {"a": ("v", "avg")}, salt_from="uid")


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [Row(k="hot", label="H")] + [Row(k=f"t{i}", label=f"L{i}") for i in range(10)]
    )
    plain = sorted(
        (r.uid, r.label) for r in skewed.join(dim, "k").select("uid", "label").collect()
    )
    salted = sorted(
        (r.uid, r.label)
        for r in salted_join(skewed, dim, on=["k"], salt_from="uid", buckets=8)
        .select("uid", "label")
        .collect()
    )
    assert salted == plain


def test_salted_join_left_outer(spark, skewed):
    dim = spark.createDataFrame([Row(k="hot", label="H")])
    out = salted_join(skewed, dim, on=["k"], salt_from="uid", buckets=4, how="left")
    assert out.count() == skewed.count()
    assert out.filter(F.col("label").isNull()).count() == 100
