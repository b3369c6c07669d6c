"""Engine-free Hudi COW reader tests: tables hand-built per the public
timeline spec (parquet base files + .hoodie commit JSONs)."""

import json
import os

import pytest


def _write_base_file(spark, table, part, name, df):
    d = os.path.join(table, part) if part else table
    tmp = os.path.join(d, f"_tmp_{name}")
    df.coalesce(1).write.parquet(tmp)
    src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.replace(os.path.join(tmp, src), os.path.join(d, name))
    import shutil

    shutil.rmtree(tmp)
    return os.path.join(part, name) if part else name


def _commit(table, ts, stats, action="commit", replaced=None):
    tdir = os.path.join(table, ".hoodie")
    os.makedirs(tdir, exist_ok=True)
    body = {"partitionToWriteStats": stats}
    if replaced:
        body["partitionToReplaceFileIds"] = replaced
    with open(os.path.join(tdir, f"{ts}.{action}"), "w") as fh:
        json.dump(body, fh)


def _props(table, ttype="COPY_ON_WRITE"):
    tdir = os.path.join(table, ".hoodie")
    os.makedirs(tdir, exist_ok=True)
    with open(os.path.join(tdir, "hoodie.properties"), "w") as fh:
        fh.write(f"hoodie.table.name=t\nhoodie.table.type={ttype}\n")


def test_hudi_cow_latest_file_slice_wins(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_source

    table = str(tmp_path / "hudi_t")
    os.makedirs(table)
    _props(table)
    # commit 1: file group fg1 with ids 0..4 (v1)
    p1 = _write_base_file(
        spark, table, "", "fg1_v1.parquet",
        spark.range(5).selectExpr("id", "'v1' AS ver"),
    )
    _commit(table, "20240101000000", {"": [{"fileId": "fg1", "path": p1}]})
    # commit 2: fg1 REWRITTEN (update) + new group fg2
    p2 = _write_base_file(
        spark, table, "", "fg1_v2.parquet",
        spark.range(5).selectExpr("id", "'v2' AS ver"),
    )
    p3 = _write_base_file(
        spark, table, "", "fg2_v1.parquet",
        spark.range(5, 8).selectExpr("id", "'v2' AS ver"),
    )
    _commit(table, "20240102000000", {
        "": [{"fileId": "fg1", "path": p2}, {"fileId": "fg2", "path": p3}],
    })
    _, src = resolve_source(f"h+hudi://{table}")
    out = src.read(spark)
    rows = {(r.id, r.ver) for r in out.collect()}
    # fg1's v1 file must NOT appear — latest slice only
    assert rows == {(i, "v2") for i in range(8)}
    # time travel to the first commit
    _, src0 = resolve_source(f"h+hudi://{table}?as-of=20240101000000")
    assert {(r.id, r.ver) for r in src0.read(spark).collect()} == {
        (i, "v1") for i in range(5)
    }


def test_hudi_replacecommit_drops_file_groups(spark, tmp_path):
    from spark_etl_cli_spark.sources.hudi_lite import read_hudi_lite

    table = str(tmp_path / "hudi_rc")
    os.makedirs(table)
    _props(table)
    p1 = _write_base_file(
        spark, table, "", "a.parquet", spark.range(3).selectExpr("id")
    )
    p2 = _write_base_file(
        spark, table, "", "b.parquet", spark.range(3, 6).selectExpr("id")
    )
    _commit(table, "20240101000000", {
        "": [{"fileId": "ga", "path": p1}, {"fileId": "gb", "path": p2}],
    })
    # clustering: both groups replaced by one compacted file
    p3 = _write_base_file(
        spark, table, "", "c.parquet", spark.range(6).selectExpr("id")
    )
    _commit(table, "20240102000000",
            {"": [{"fileId": "gc", "path": p3}]},
            action="replacecommit", replaced={"": ["ga", "gb"]})
    out = read_hudi_lite(spark, table)
    assert sorted(r.id for r in out.collect()) == list(range(6))
    # exactly one live file -> no double counting
    assert out.count() == 6


def test_hudi_meta_columns_dropped(spark, tmp_path):
    from spark_etl_cli_spark.sources.hudi_lite import read_hudi_lite

    table = str(tmp_path / "hudi_meta")
    os.makedirs(table)
    _props(table)
    df = spark.range(2).selectExpr(
        "'k' AS _hoodie_record_key", "id", "id * 2 AS v"
    )
    p = _write_base_file(spark, table, "", "m.parquet", df)
    _commit(table, "20240101000000", {"": [{"fileId": "g", "path": p}]})
    out = read_hudi_lite(spark, table)
    assert out.columns == ["id", "v"]


def test_hudi_mor_raises_clearly(spark, tmp_path):
    from spark_etl_cli_spark.sources.hudi_lite import read_hudi_lite

    table = str(tmp_path / "hudi_mor")
    os.makedirs(table)
    _props(table, ttype="MERGE_ON_READ")
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        read_hudi_lite(spark, table)


def test_hudi_missing_table_raises(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.optional import MissingDependencyError

    _, src = resolve_source(f"h+hudi://{tmp_path}/nope")
    with pytest.raises(MissingDependencyError, match="[Hh]udi"):
        src.read(spark)


def test_hudi_write_read_roundtrip(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline
    from spark_etl_cli_spark.sources.hudi_lite import (
        read_hudi_lite,
        write_hudi_lite,
    )

    table = str(tmp_path / "hw")
    t1 = write_hudi_lite(spark.range(4).selectExpr("id"), table)
    t2 = write_hudi_lite(spark.range(4, 6).selectExpr("id"), table)
    assert int(t2) == int(t1) + 1
    assert sorted(r.id for r in read_hudi_lite(spark, table).collect()) == [
        0, 1, 2, 3, 4, 5
    ]
    # as-of the first instant
    assert read_hudi_lite(spark, table, as_of=t1).count() == 4
    # overwrite replaces everything but history stays readable
    write_hudi_lite(
        spark.range(100, 102).selectExpr("id"), table, mode="overwrite"
    )
    assert {r.id for r in read_hudi_lite(spark, table).collect()} == {100, 101}
    assert read_hudi_lite(spark, table, as_of=t2).count() == 6
    # pipeline surface both directions
    run_pipeline(
        spark,
        sources=["v+range://?end=3"],
        sinks=[f"v+hudi://{tmp_path}/hw2"],
    )
    run_pipeline(
        spark,
        sources=[f"h+hudi://{tmp_path}/hw2"],
        sinks=["h+memory://hudi_rt"],
    )
    assert spark.table("hudi_rt").count() == 3
