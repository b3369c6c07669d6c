"""Join-acceleration operators: bloom semi-prune, binned range join."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.joins import (
    bloom_params,
    bloom_semi_prune,
    range_join_binned,
)


def test_bloom_params_sizing():
    n_bits, n_hashes = bloom_params(1000, 0.01)
    assert n_bits % 64 == 0
    assert 1 <= n_hashes <= 8
    # fpp=1% needs ~9.6 bits/item
    assert 8 * 1000 <= n_bits <= 16 * 1000
    # cap holds for absurd sizes
    assert bloom_params(10**12, 0.0001)[0] <= 1 << 24


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    keys = spark.range(0, 100).select((F.col("id") * 7).alias("dk"))
    pruned = bloom_semi_prune(fact, keys, "k", "dk", expected_items=100)
    n_fact, n_pruned = fact.count(), pruned.count()
    # matching keys: multiples of 7 < 700 → 100 dim keys, but k < 1000
    exact = fact.join(keys, fact.k == keys.dk, "left_semi")
    # every truly-matching row survives pruning
    assert exact.exceptAll(
        pruned.join(keys, pruned.k == keys.dk, "left_semi")
    ).count() == 0
    assert pruned.join(keys, pruned.k == keys.dk).count() == exact.count() * 1
    # and pruning removed the bulk of the non-matching volume
    assert n_pruned < n_fact / 2


def test_bloom_prune_empty_keys_prunes_everything(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    keys = spark.range(0, 10).filter("id < 0").select(F.col("id").alias("k"))
    assert bloom_semi_prune(fact, keys, "k", expected_items=1).count() == 0


def test_range_join_binned_matches_naive(spark):
    pts = spark.range(0, 500).select(F.col("id").alias("p"))
    iv = spark.createDataFrame(
        [
            Row(lo=10, hi=25, tag="a"),   # within one bin pair
            Row(lo=90, hi=210, tag="b"),  # spans many bins
            Row(lo=300, hi=300, tag="c"),  # degenerate single point
            Row(lo=400, hi=399, tag="d"),  # empty (lo > hi) — dropped
            Row(lo=480, hi=600, tag="e"),  # overhangs the point domain
        ]
    )
    out = range_join_binned(pts, iv, "p", "lo", "hi", bin_width=16)
    naive = pts.join(iv, (pts.p >= iv.lo) & (pts.p <= iv.hi))
    assert out.count() == naive.count()
    assert out.select("p", "tag").exceptAll(naive.select("p", "tag")).count() == 0
    assert out.filter("tag = 'd'").count() == 0
    assert out.filter("tag = 'c'").count() == 1


def test_range_join_binned_plans_hash_join_not_nested_loop(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pts = spark.range(0, 1000).select(F.col("id").alias("p"))
        iv = spark.range(0, 50).select(
            (F.col("id") * 20).alias("lo"), (F.col("id") * 20 + 30).alias("hi")
        )
        plan = range_join_binned(
            pts, iv, "p", "lo", "hi", bin_width=32
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_range_join_binned_rejects_column_collision(spark):
    pts = spark.range(0, 10).select(F.col("id").alias("p"), F.lit(1).alias("lo"))
    iv = spark.range(0, 2).select(F.col("id").alias("lo"), (F.col("id") + 5).alias("hi"))
    try:
        range_join_binned(pts, iv, "p", "lo", "hi", bin_width=4)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_assign_sequential_ids_dense_and_ordered(spark):
    from spark_etl_cli_spark.operators.ids import assign_sequential_ids

    from pyspark.sql import functions as F

    df = spark.range(0, 1000).select(
        (999 - F.col("id")).alias("k"), (F.col("id") % 7).alias("grp")
    )
    out = assign_sequential_ids(df, ["k"], num_partitions=8)
    rows = out.orderBy("k").collect()
    # dense 0..N-1, and id order == k order
    assert [r.seq_id for r in rows] == list(range(1000))
    assert rows[0].k == 0 and rows[-1].k == 999


def test_assign_sequential_ids_requires_order(spark):
    from spark_etl_cli_spark.operators.ids import assign_sequential_ids

    try:
        assign_sequential_ids(spark.range(3), [])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_assign_ids_transform_pipeline(spark):
    from spark_etl_cli_spark.pipeline import run_pipeline

    run_pipeline(
        spark,
        sources=["v+values://?header=x:int&values=30;10;20"],
        transforms=["v+w+assign-ids://?order=x&id-col=rk&partitions=2"],
        sinks=["w+memory://ids_out"],
    )
    got = {(r.x, r.rk) for r in spark.table("ids_out").collect()}
    assert got == {(10, 0), (20, 1), (30, 2)}


def test_z_value_interleaves_bits(spark):
    from spark_etl_cli_spark.operators.zorder import z_value

    df = spark.createDataFrame([Row(x=3, y=1)])
    # x=0b11, y=0b01 -> z bits: x0@0, y0@1, x1@2, y1@3 = 1+2+4+0 = 7
    assert df.select(z_value([F.col("x"), F.col("y")], 2).alias("z")).head().z == 7
    # capacity guard
    try:
        z_value([F.col("x")] * 8, bits=8)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_zorder_sort_preserves_rows_and_clusters(spark):
    from spark_etl_cli_spark.operators.zorder import zorder_sort

    df = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("a"), (F.col("id") % 37).alias("b"),
        F.col("id").alias("v"),
    )
    out = zorder_sort(df, ["a", "b"], bits=6, num_partitions=4)
    assert out.columns == ["a", "b", "v"]
    assert out.count() == 1000
    assert out.exceptAll(df).count() == 0


def test_zorder_transform_pipeline(spark):
    from spark_etl_cli_spark.pipeline import run_pipeline

    run_pipeline(
        spark,
        sources=["v+values://?header=a:int,b:int&values=9,1;0,0;5,5;1,9"],
        transforms=["v+w+zorder://?by=a,b&bits=4&partitions=1"],
        sinks=["w+memory://z_out"],
    )
    assert spark.table("z_out").count() == 4


def test_zorder_layout_narrows_per_file_stats(spark, tmp_path):
    """Z-ordered files have narrower per-file [min,max] on BOTH dims
    than a single-dimension sort — the property parquet row-group
    skipping feeds on."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from spark_etl_cli_spark.operators.zorder import zorder_sort

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"), ((F.col("id") / 64).cast("int")).alias("b")
    )

    def spread(path):
        files = list(Path(path).glob("*.parquet"))
        tot = {"a": 0, "b": 0}
        for f in files:
            t = pq.read_table(f)
            for c in ("a", "b"):
                col = t.column(c).to_pylist()
                tot[c] += (max(col) - min(col)) if col else 0
        return {c: tot[c] / len(files) for c in tot}, len(files)

    zorder_sort(df, ["a", "b"], bits=6, num_partitions=8).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "z"))
    df.repartitionByRange(8, "a").sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lin"))

    z_spread, zn = spread(tmp_path / "z")
    lin_spread, ln = spread(tmp_path / "lin")
    # the one-dim sort is perfect on `a` but unclustered on `b`;
    # z-order must beat it substantially on `b` without giving up
    # all clustering on `a`
    assert z_spread["b"] < lin_spread["b"] / 2
    assert z_spread["a"] < 64 * 0.7


def test_table_checksum_order_and_partition_invariant(spark):
    from spark_etl_cli_spark.operators.checksum import table_checksum

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    a = table_checksum(df.repartition(13), ["k", "g"], ["g"])
    b = table_checksum(df.orderBy(F.desc("k")).coalesce(1), ["k", "g"], ["g"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # a single changed row changes its group's checksum
    tampered = df.withColumn(
        "k", F.when(F.col("k") == 250, F.lit(9999)).otherwise(F.col("k"))
    )
    c = table_checksum(tampered, ["k", "g"], ["g"])
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))
