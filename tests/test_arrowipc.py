"""Arrow IPC connector: Python DataSource round-trip, partitioning, pushdown."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pytest

from spark_etl_cli_spark.registry import resolve_sink, resolve_source


def _write_ipc(path: str, n_batches: int, rows_per_batch: int) -> None:
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, schema) as w:
        i = 0
        for _ in range(n_batches):
            ks = list(range(i, i + rows_per_batch))
            w.write_batch(
                pa.record_batch(
                    [pa.array(ks), pa.array([f"s{k}" for k in ks])], schema=schema
                )
            )
            i += rows_per_batch


def test_arrow_roundtrip_and_partitions(spark, tmp_path):
    src_file = str(tmp_path / "in.arrow")
    _write_ipc(src_file, n_batches=6, rows_per_batch=10)

    _, src = resolve_source(f"a+arrow://{src_file}?batches-per-task=2")
    df = src.read(spark)
    # 6 batches / 2 per task = 3 input partitions
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 60
    assert sorted(r["k"] for r in df.collect()) == list(range(60))

    # write back through the sink, then read the directory form
    out_dir = str(tmp_path / "out")
    _, sink = resolve_sink(f"a+arrow://{out_dir}")
    assert sink.write(df) is True
    parts = glob.glob(os.path.join(out_dir, "part-*.arrow"))
    assert len(parts) >= 1
    _, src2 = resolve_source(f"a+arrow://{out_dir}")
    df2 = src2.read(spark)
    assert sorted(r["k"] for r in df2.collect()) == list(range(60))
    assert df2.schema == df.schema


def test_arrow_filter_pushdown_semantics(spark, tmp_path):
    src_file = str(tmp_path / "in.arrow")
    _write_ipc(src_file, n_batches=4, rows_per_batch=25)
    _, src = resolve_source(f"a+arrow://{src_file}")
    df = src.read(spark)
    got = sorted(
        r["k"] for r in df.filter("k >= 10 AND k < 20 AND v IS NOT NULL").collect()
    )
    assert got == list(range(10, 20))
    # Filter spark can't push (string contains) still evaluates correctly.
    assert df.filter("v LIKE '%99%'").count() == 1


def test_arrow_overwrite_replaces(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    df1 = spark.range(0, 10).withColumnRenamed("id", "k")
    df2 = spark.range(100, 105).withColumnRenamed("id", "k")
    _, sink = resolve_sink(f"a+arrow://{out_dir}")
    sink.write(df1)
    sink.write(df2)  # overwrite default
    _, src = resolve_source(f"a+arrow://{out_dir}")
    assert sorted(r["k"] for r in src.read(spark).collect()) == list(range(100, 105))


def test_arrow_empty_dataframe_roundtrip(spark, tmp_path):
    out_dir = str(tmp_path / "empty")
    df = spark.range(0, 1).filter("id < 0").withColumnRenamed("id", "k")
    _, sink = resolve_sink(f"a+arrow://{out_dir}")
    sink.write(df)
    _, src = resolve_source(f"a+arrow://{out_dir}")
    back = src.read(spark)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["k"]


def test_arrow_stream_microbatches(spark, tmp_path):
    """arrow-stream://: files already present are batch 0; files
    appearing later arrive in subsequent micro-batches (offset = set of
    processed files, robust to non-sorted part names)."""
    src = str(tmp_path / "stream")
    os.makedirs(src)
    _write_ipc(os.path.join(src, "b-first.arrow"), 2, 5)

    _, s = resolve_source(f"s+arrow-stream://{src}")
    stream = s.read(spark)
    assert stream.isStreaming

    q = (
        stream.writeStream.format("memory")
        .queryName("arrow_stream_t")
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("arrow_stream_t").count() == 10:
                break
            time.sleep(0.3)
        assert spark.table("arrow_stream_t").count() == 10

        # "a-second" sorts BEFORE the already-processed file on purpose
        _write_ipc(os.path.join(src, "a-second.arrow"), 1, 7)
        while time.time() < deadline:
            if spark.table("arrow_stream_t").count() == 17:
                break
            time.sleep(0.3)
        assert spark.table("arrow_stream_t").count() == 17
    finally:
        q.stop()
