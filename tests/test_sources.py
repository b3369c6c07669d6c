"""File connector round-trips and the values/view/memory connectors."""

import pytest
from pyspark.sql import Row

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.registry import known_schemes


def test_registry_covers_reference_schemes():
    # every scheme family the reference ships (SURVEY.md §2a/2b)
    known = known_schemes()
    assert {"console", "values", "text", "parquet", "delta", "avro",
            "excel", "hive", "kafka", "solr"} <= set(known["sinks"])
    assert {"kafka-stream", "delta-stream", "avro-stream"} <= set(known["sources"])
    assert {"identity", "sql", "sql-file", "flatten", "flatten-explode",
            "diff"} <= set(known["transforms"])


@pytest.mark.parametrize("fmt", ["parquet", "json", "orc", "csv"])
def test_file_round_trip(spark, tmp_path, fmt):
    path = f"{tmp_path}/out.{fmt}"
    run_pipeline(
        spark,
        sources=["t+values://?header=id:long,name&values=1,ann;2,bo"],
        sinks=[f"t+{fmt}://{path}"],
    )
    run_pipeline(spark, sources=[f"back+{fmt}://{path}"])
    back = spark.table("back")
    got = sorted((int(r.id), r.name) for r in back.collect())
    assert got == [(1, "ann"), (2, "bo")]


def test_tsv_delimiter_from_extension(spark, tmp_path):
    path = f"{tmp_path}/data.tsv"
    run_pipeline(
        spark,
        sources=["t+values://?header=a,b&values=x,y"],
        sinks=[f"t+text://{path}?single-file=true"],
    )
    import glob

    files = glob.glob(f"{path}/part*")
    assert len(files) == 1
    content = open(files[0]).read()
    assert "x\ty" in content


def test_csv_nested_cols_jsonified(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, s=Row(a=5), arr=[1, 2])])
    df.createOrReplaceTempView("nested_src")
    path = f"{tmp_path}/nested.csv"
    run_pipeline(
        spark,
        sources=["nested_src+view://nested_src"],
        sinks=[f"nested_src+csv://{path}"],
    )
    run_pipeline(spark, sources=[f"back2+csv://{path}"])
    r = spark.table("back2").collect()[0]
    assert r.s == '{"a":5}' and r.arr == "[1,2]"


def test_values_types(spark):
    run_pipeline(
        spark,
        sources=[
            "v+values://?header=i:int,l:long,d:double,b:boolean,dt:date,s"
            "&values=1,2,1.5,true,2024-01-31,hi"
        ],
        sinks=["v+memory://typed_out"],
    )
    r = spark.table("typed_out").collect()[0]
    assert (r.i, r.l, r.d, r.b, str(r.dt), r.s) == (1, 2, 1.5, True, "2024-01-31", "hi")
    types = dict(spark.table("typed_out").dtypes)
    assert types == {"i": "int", "l": "bigint", "d": "double",
                     "b": "boolean", "dt": "date", "s": "string"}


def test_streaming_file_source_available_now(spark, tmp_path):
    # write a parquet dir, stream it back through the pipeline into a
    # memory sink driven by availableNow
    src = f"{tmp_path}/stream_src"
    spark.createDataFrame([Row(k=i) for i in range(10)]).write.parquet(src)
    schema = "k BIGINT"
    run_pipeline(
        spark,
        sources=[f"s+parquet-stream://{src}?schema={schema}"],
        sinks=["s+memory-stream://stream_out?trigger-interval=availableNow"],
    )
    # availableNow terminates on its own, but under a loaded full-suite
    # run a fixed 30 s wait flaked — poll for termination against a
    # generous deadline instead
    import time

    deadline = time.monotonic() + 120
    while any(q.isActive for q in spark.streams.active):
        if time.monotonic() > deadline:
            raise AssertionError(
                "availableNow query still active after 120 s: "
                + str([q.status for q in spark.streams.active])
            )
        for q in spark.streams.active:
            q.awaitTermination(5)
    assert spark.table("stream_out").count() == 10


def test_partitioned_sorted_write(spark, tmp_path):
    path = f"{tmp_path}/part_out"
    run_pipeline(
        spark,
        sources=["t+values://?header=k,v:int&values=a,1;b,2;a,3;b,4"],
        sinks=[f"t+parquet://{path}?partition-by=k&sort-by=v"],
    )
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("k="))
    assert dirs == ["k=a", "k=b"]
    back = spark.read.parquet(path)
    assert back.count() == 4
    # partition pruning: reading one partition value scans only that dir
    pruned = back.filter("k = 'a'")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan


def test_repartition_coalesce_cache_transforms(spark):
    run_pipeline(
        spark,
        sources=["t+values://?header=a:int&values=1;2;3;4"],
        transforms=[
            "t+wide+repartition://?n=8",
            "wide+narrow+coalesce://?n=2",
            "narrow+cached+cache://",
        ],
        sinks=["cached+memory://layout_out"],
    )
    out = spark.table("layout_out")
    assert out.count() == 4
    assert spark.table("narrow").rdd.getNumPartitions() == 2
    assert spark.table("wide").rdd.getNumPartitions() == 8
    spark.table("cached").unpersist()


def test_range_source(spark):
    from spark_etl_cli_spark.registry import resolve_source

    _, src = resolve_source("r+range://?start=5&end=50&step=5&partitions=3")
    df = src.read(spark)
    assert df.rdd.getNumPartitions() == 3
    vals = sorted(r["id"] for r in df.collect())
    assert vals == list(range(5, 50, 5))


def test_jdbc_roundtrip_derby(spark, tmp_path):
    """Embedded-Derby round-trip: overwrite write, plain read, and a
    range-partitioned parallel read (the at-scale JDBC shape)."""
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    _, sink = resolve_sink(f"t+jdbc:///T1?url={url}")
    assert sink.write(df) is True

    _, src = resolve_source(f"t+jdbc:///T1?url={url}")
    back = src.read(spark)
    assert back.count() == 100
    assert sorted(r["k"] for r in back.collect()) == list(range(100))

    _, psrc = resolve_source(
        f"t+jdbc:///T1?url={url}&partitionColumn=k"
        "&lowerBound=0&upperBound=100&numPartitions=4"
    )
    pdf = psrc.read(spark)
    assert pdf.rdd.getNumPartitions() == 4
    assert pdf.count() == 100


def test_rate_micro_batch_source_streams(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_source

    _, src = resolve_source("rate-micro-batch://?rowsPerBatch=5&numPartitions=1")
    df = src.read(spark)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["timestamp", "value"]
    q = (
        df.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    rows = spark.table("rate_probe").collect()
    assert len(rows) >= 5 and all(r.value >= 0 for r in rows)


def test_xml_round_trip(spark, tmp_path):
    from pyspark.sql import Row

    from spark_etl_cli_spark.pipeline import run_pipeline

    spark.createDataFrame(
        [Row(id=1, name="a"), Row(id=2, name="b")]
    ).createOrReplaceTempView("xml_in")
    out = tmp_path / "xml_out"
    run_pipeline(
        spark,
        sources=["xml_in+view://xml_in"],
        transforms=[],
        sinks=[f"xml_in+xml://{out}"],
    )
    run_pipeline(
        spark,
        sources=[f"back+xml://{out}"],
        transforms=["back+agg+sql://SELECT CAST(COUNT(*) AS BIGINT) AS n FROM back"],
        sinks=["agg+memory://xml_back"],
    )
    assert spark.table("xml_back").collect()[0].n == 2


def test_binaryfile_source_reads_payloads(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_source

    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload")
    (tmp_path / "b.bin").write_bytes(b"other")
    _, src = resolve_source(f"binaryfile://{tmp_path}")
    rows = src.read(spark).select("path", "length", "content").collect()
    got = {r.path.rsplit("/", 1)[-1]: bytes(r.content) for r in rows}
    assert got == {"a.bin": b"\x00\x01payload", "b.bin": b"other"}


def test_lines_round_trip(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline
    from pyspark.sql import Row

    spark.createDataFrame(
        [Row(value="alpha"), Row(value="beta")]
    ).createOrReplaceTempView("ln_in")
    out = tmp_path / "lines_out"
    run_pipeline(
        spark,
        sources=["ln_in+view://ln_in"],
        transforms=[],
        sinks=[f"ln_in+lines://{out}"],
    )
    run_pipeline(
        spark,
        sources=[f"back+lines://{out}"],
        transforms=[],
        sinks=["back+memory://ln_back"],
    )
    assert sorted(r.value for r in spark.table("ln_back").collect()) == ["alpha", "beta"]
