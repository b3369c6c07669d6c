"""Unit tests for retrieval/hygiene operators (decontamination, BM25)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.retrieval import (
    bm25_scores,
    contamination_pairs,
    decontaminate,
)


@pytest.fixture()
def corpus(spark):
    # bench doc 100 leaks into train as doc 3 (one token prepended);
    # docs 1/2 share nothing 4-gram-sized with the benchmark.
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "one two three four five six seven eight nine"),
        (2, "red green blue cyan magenta yellow black white"),
        (3, "intro " + bench_text),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    return train, bench


def test_contamination_pairs_finds_leak(corpus):
    train, bench = corpus
    pairs = contamination_pairs(train, bench, n=4).collect()
    assert len(pairs) == 1
    row = pairs[0]
    # 8 tokens + 1 prefix -> positions 2..6 of the leak align with the
    # benchmark's five distinct 4-grams
    assert (row["train_doc_id"], row["bench_doc_id"]) == (3, 100)
    assert row["n_shared"] == 5


def test_contamination_pairs_short_docs_no_crash(spark):
    train = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "also tiny")], "doc_id long, text string")
    assert contamination_pairs(train, bench, n=4).count() == 0


def test_decontaminate_drops_only_leaked(corpus):
    train, bench = corpus
    kept = decontaminate(train, bench, n=4)
    assert sorted(r["doc_id"] for r in kept.select("doc_id").collect()) == [1, 2]


def test_bm25_ranks_term_matches_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "join join join hash"),
            (2, "join hash other words here now"),
            (3, "nothing relevant at all in here"),
        ],
        "doc_id long, text string",
    )
    scored = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["join", "hash"]).collect()}
    assert scored[1] > scored[2] > scored[3]
    assert scored[3] == 0.0  # tf=0 for every term -> zero numerator


def test_bm25_plan_has_no_python_udf(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = bm25_scores(docs, ["a"])._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_broadcast_plan(spark):
    # the benchmark side must arrive via a broadcast exchange
    train = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "a b c d e f g h i")], "doc_id long, text string")
    plan = (
        contamination_pairs(train, bench, n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_decontaminate_and_bm25_transforms(spark):
    from pyspark.sql import Row

    from spark_etl_cli_spark.pipeline import run_pipeline

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    spark.createDataFrame(
        [
            Row(doc_id=1, text="one two three four five six seven eight"),
            Row(doc_id=3, text="intro " + bench_text),
        ]
    ).createOrReplaceTempView("rt_train")
    spark.createDataFrame(
        [Row(doc_id=100, text=bench_text)]
    ).createOrReplaceTempView("rt_bench")
    run_pipeline(
        spark,
        sources=["rt_train+view://rt_train"],
        transforms=["rt_train+rt_clean+decontaminate://rt_bench?n=4"],
        sinks=["rt_clean+memory://rt_out"],
    )
    assert [r.doc_id for r in spark.table("rt_out").collect()] == [1]

    run_pipeline(
        spark,
        sources=["rt_train+view://rt_train"],
        transforms=["rt_train+rt_scored+bm25://one,two?top-k=1"],
        sinks=["rt_scored+memory://rt_bm25"],
    )
    top = spark.table("rt_bm25").collect()
    assert len(top) == 1 and top[0].doc_id == 1 and top[0].score > 0


def test_epoch_upsample_copy_counts(spark):
    from spark_etl_cli_spark.operators.mixture import epoch_upsample, id_bucket
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "heavy") for i in range(20)] + [(i + 100, "drop") for i in range(5)],
        "doc_id long, source string",
    )
    out = epoch_upsample(df, {"heavy": 2.5, "drop": 0.0})
    rows = out.groupBy("doc_id").count().collect()
    # dropped source gone entirely
    assert all(r["doc_id"] < 100 for r in rows)
    # every heavy doc appears 2 or 3 times; bucket<50 decides the extra
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.filter("source = 'heavy'")
        .select("doc_id", id_bucket(F.col("doc_id")).alias("b"))
        .collect()
    }
    for r in rows:
        expected = 3 if buckets[r["doc_id"]] < 50 else 2
        assert r["count"] == expected


def test_mixture_transform_pipeline(spark):
    from pyspark.sql import Row

    from spark_etl_cli_spark.pipeline import run_pipeline

    spark.createDataFrame(
        [Row(doc_id=1, source="a"), Row(doc_id=2, source="b")]
    ).createOrReplaceTempView("mx_docs")
    run_pipeline(
        spark,
        sources=["mx_docs+view://mx_docs"],
        transforms=["mx_docs+mx_out+mixture://?weights=a:2.0,b:0.0"],
        sinks=["mx_out+memory://mx_mem"],
    )
    got = [(r.doc_id, r.epoch) for r in spark.table("mx_mem").collect()]
    assert sorted(got) == [(1, 1), (1, 2)]


def test_kmeans_lloyd_two_separated_clusters(spark):
    from spark_etl_cli_spark.operators.clustering import kmeans_lloyd

    # ids 0/1 seed the two centroids; the far group converges onto (10, 10)
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.5, 0.5]),
        (3, [10.5, 9.5]),
        (4, [9.5, 10.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=2, iters=2)
    stats = {(r.cluster_id, r.dim): r for r in out.collect()}
    assert stats[(0, 0)].n_points == 2  # vectors 0 and 2
    assert stats[(1, 0)].n_points == 3  # vectors 1, 3, 4
    # cluster 1 mean per dim = (10 + 10.5 + 9.5) / 3 = 10 in micro units
    assert abs(stats[(1, 0)].mean_micro - 10_000_000) < 2
    assert abs(stats[(1, 1)].mean_micro - 10_000_000) < 2


def test_kmeans_seeds_from_lowest_ids_any_domain(spark):
    """ADVICE round 1: filter(id < k) under-seeded when the id domain
    doesn't start near 0. Seeding is ORDER BY id LIMIT k now."""
    from spark_etl_cli_spark.operators.clustering import kmeans_lloyd

    rows = [
        (1000, [0.0, 0.0]),
        (1001, [10.0, 10.0]),
        (1002, [0.5, 0.5]),
        (1003, [10.5, 9.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=2, iters=1).collect()
    # seeds are vec_ids 1000 and 1001; every point lands on one of them
    assert {r.cluster_id for r in out} == {1000, 1001}
    n_by_cluster = {r.cluster_id: r.n_points for r in out if r.dim == 0}
    assert n_by_cluster == {1000: 2, 1001: 2}


def test_kmeans_arrow_round_bit_identical_to_jvm_twin(spark):
    """r10: the Arrow assignment+partial-update stage must reproduce
    the JVM `_assign` + posexplode/groupBy update EXACTLY — same
    left-fold distance order, same first-minimum tie rule, same
    floor(x*1e6) integer micro-units. Awkward magnitudes + exact ties
    included."""
    import math

    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.clustering import (
        MICRO,
        _assign,
        _assign_update_arrow,
    )

    dim = 5
    rows = [
        (i, [math.sin(i * dim + d) * 10 ** ((i + d) % 5 - 2) for d in range(dim)])
        for i in range(64)
    ]
    # exact-tie rows: equidistant from centroids 0 and 1 -> cluster 0
    rows += [(100 + j, [float(j)] * dim) for j in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pts = df.select(
        F.col("vec_id").alias("__id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("__v"),
    )
    cents = {
        0: [0.5] * dim,
        3: [-0.5] * dim,
        7: [0.001, 10.0, -3.0, 0.25, 1e-4],
    }
    jvm = (
        pts.withColumn("cl", _assign(F.col("__v"), cents))
        .select("cl", F.posexplode("__v").alias("d", "x"))
        .groupBy("cl", "d")
        .agg(
            F.sum(F.floor(F.col("x") * MICRO).cast("bigint")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    arw = _assign_update_arrow(pts, cents).collect()
    j = {(r["cl"], r["d"]): (r["s"], r["n"]) for r in jvm}
    a = {(int(r["cl"]), r["d"]): (r["s"], r["n"]) for r in arw}
    assert j == a


def test_kmeans_empty_input_raises_clearly(spark):
    import pytest

    from spark_etl_cli_spark.operators.clustering import kmeans_lloyd

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no vectors"):
        kmeans_lloyd(df, k=2, iters=1)


def test_epoch_upsample_sql_empty_weights_is_valid_sql(spark):
    """ADVICE round 1: weights={} emitted 'CASE ELSE ... END' (invalid);
    the twin must stay executable and match the Spark path."""
    import duckdb

    from spark_etl_cli_spark.operators.mixture import (
        epoch_upsample,
        epoch_upsample_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        "(1, 'a'), (2, 'b'), (3, 'a')) t(doc_id, source)"
    )
    sql = epoch_upsample_sql("docs", {}, default=2.0)
    oracle = con.execute(sql).fetchall()
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "doc_id long, source string"
    )
    got = epoch_upsample(df, {}, default=2.0).collect()
    assert len(oracle) == len(got) == 6  # every row exactly twice
