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


def test_excel_pipeline_works_without_engine(spark, tmp_path):
    # excel no longer needs openpyxl: the stdlib SpreadsheetML codec
    # (sources/xlsx_lite.py) backs the connector everywhere
    run_pipeline(
        spark,
        sources=["v+values://?header=a:int&values=1"],
        sinks=[f"v+excel://{tmp_path}/out.xlsx"],
    )
    from spark_etl_cli_spark.sources.xlsx_lite import read_xlsx

    assert read_xlsx(f"{tmp_path}/out.xlsx") == (["a"], [[1]])


def test_delta_batch_write_works_engine_free(spark, tmp_path):
    # batch writes fall back to the protocol writer (delta_lite); only
    # STREAMING delta sinks still require the jars (real LogStore)
    run_pipeline(
        spark,
        sources=["v+values://?header=a:int&values=1;2"],
        sinks=[f"v+delta://{tmp_path}/dt"],
    )
    run_pipeline(
        spark,
        sources=[f"d+delta://{tmp_path}/dt"],
        sinks=["d+memory://dt_roundtrip"],
    )
    assert sorted(r.a for r in spark.table("dt_roundtrip").collect()) == [1, 2]


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


def test_excel_roundtrip_stdlib_codec(spark, tmp_path):
    """excel:// works with no Excel engine installed: the stdlib
    SpreadsheetML codec writes and reads the file, and inferSchema
    recovers long/double/boolean/string column types."""
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source

    path = str(tmp_path / "t.xlsx")
    df = spark.createDataFrame(
        [(1, 1.5, True, "a & <b>"), (2, 2.5, False, None)],
        "k long, x double, flag boolean, s string",
    )
    _, sink = resolve_sink(f"e+excel://{path}")
    assert sink.write(df) is True

    _, src = resolve_source(f"e+excel://{path}")
    back = src.read(spark)
    assert [f.simpleString() for f in back.schema.fields] == [
        "k:bigint", "x:double", "flag:boolean", "s:string",
    ]
    rows = {r["k"]: r for r in back.collect()}
    assert rows[1]["s"] == "a & <b>" and rows[1]["flag"] is True
    assert rows[2]["s"] is None and rows[2]["x"] == 2.5


def test_excel_shared_strings_parse(tmp_path):
    """Files from other producers use sharedStrings; the codec reads
    them (our writer emits inline strings only)."""
    import zipfile
    from spark_etl_cli_spark.sources import xlsx_lite as xl

    path = str(tmp_path / "ss.xlsx")
    xl.write_xlsx(path, ["a"], [("x",)])
    # splice in a sharedStrings part + a cell referencing it
    with zipfile.ZipFile(path) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    sheet = parts["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace(
        "</sheetData>",
        '<row r="3"><c r="A3" t="s"><v>0</v></c></row></sheetData>',
    )
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    parts["xl/sharedStrings.xml"] = (
        b'<?xml version="1.0"?><sst xmlns="%b"><si><t>shared!</t></si></sst>'
        % xl._NS.encode()
    )
    with zipfile.ZipFile(path, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)
    header, rows = xl.read_xlsx(path)
    assert header == ["a"]
    assert rows == [["x"], ["shared!"]]  # empty row 2 skipped


def _write_fake_delta_table(path, spark):
    """Hand-craft a protocol-conformant Delta table: two partitioned data
    files, one later removed, plus a column added via a second add."""
    import json as _json
    import os

    os.makedirs(f"{path}/_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    data_schema = "k long"
    spark.createDataFrame([(1,), (2,)], data_schema).coalesce(1).write.parquet(f"{path}/tmp_a")
    spark.createDataFrame([(3,)], data_schema).coalesce(1).write.parquet(f"{path}/tmp_b")
    spark.createDataFrame([(9,)], data_schema).coalesce(1).write.parquet(f"{path}/tmp_dead")
    import glob
    import shutil

    files = {}
    for tag in ("a", "b", "dead"):
        src = glob.glob(f"{path}/tmp_{tag}/part-*.parquet")[0]
        dst = f"part={tag}/f_{tag}.parquet"
        os.makedirs(f"{path}/part={tag}", exist_ok=True)
        shutil.move(src, f"{path}/{dst}")
        shutil.rmtree(f"{path}/tmp_{tag}")
        files[tag] = dst

    def add(tag):
        return {"add": {"path": files[tag], "partitionValues": {"part": tag},
                        "size": 1, "modificationTime": 0, "dataChange": True}}

    log0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t1", "format": {"provider": "parquet"},
                      "schemaString": _json.dumps(schema),
                      "partitionColumns": ["part"], "configuration": {}}},
        add("a"), add("dead"),
    ]
    log1 = [
        add("b"),
        {"remove": {"path": files["dead"], "dataChange": True}},
    ]
    for v, actions in ((0, log0), (1, log1)):
        with open(f"{path}/_delta_log/{v:020d}.json", "w") as fh:
            fh.writelines(_json.dumps(a) + "\n" for a in actions)


def test_delta_lite_log_replay_read(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline

    table = f"{tmp_path}/dl"
    _write_fake_delta_table(table, spark)
    run_pipeline(
        spark,
        sources=[f"d+delta://{table}"],
        sinks=["d+memory://dl_out"],
    )
    got = {(r.k, r.part) for r in spark.table("dl_out").collect()}
    # the removed file's row (9, dead) must NOT appear
    assert got == {(1, "a"), (2, "a"), (3, "b")}


def test_delta_lite_time_travel(spark, tmp_path):
    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    table = f"{tmp_path}/dl_tt"
    _write_fake_delta_table(table, spark)
    # version 0: adds a + dead (before the remove and before b)
    v0 = {(r.k, r.part) for r in read_delta_lite(spark, table, 0).collect()}
    assert v0 == {(1, "a"), (2, "a"), (9, "dead")}
    v1 = {(r.k, r.part) for r in read_delta_lite(spark, table, 1).collect()}
    assert v1 == {(1, "a"), (2, "a"), (3, "b")}
    import pytest as _pt

    with _pt.raises(ValueError, match="versionAsOf=7"):
        read_delta_lite(spark, table, 7)


def test_delta_lite_url_encoded_paths(spark, tmp_path):
    """ADVICE round 1: the Delta log stores file paths URL-encoded
    (RFC 2396); add/remove must decode before joining/popping."""
    import json as _json
    import os as _os

    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    table = f"{tmp_path}/dl_enc"
    _os.makedirs(f"{table}/_delta_log")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    import glob as _glob
    import shutil as _shutil

    files = {}
    for tag, val in (("live", 1), ("dead", 9)):
        spark.createDataFrame([(val,)], "k long").coalesce(1).write.parquet(
            f"{table}/tmp_{tag}"
        )
        src = _glob.glob(f"{table}/tmp_{tag}/part-*.parquet")[0]
        # partition value with a space -> %20 in the logged path
        _os.makedirs(f"{table}/part=x {tag}", exist_ok=True)
        _shutil.move(src, f"{table}/part=x {tag}/f.parquet")
        _shutil.rmtree(f"{table}/tmp_{tag}")
        files[tag] = f"part=x%20{tag}/f.parquet"

    def add(tag):
        return {"add": {"path": files[tag],
                        "partitionValues": {"part": f"x {tag}"},
                        "size": 1, "modificationTime": 0, "dataChange": True}}

    log0 = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t2", "format": {"provider": "parquet"},
                      "schemaString": _json.dumps(schema),
                      "partitionColumns": ["part"], "configuration": {}}},
        add("live"), add("dead"),
    ]
    log1 = [{"remove": {"path": files["dead"], "dataChange": True}}]
    for v, actions in ((0, log0), (1, log1)):
        with open(f"{table}/_delta_log/{v:020d}.json", "w") as fh:
            fh.writelines(_json.dumps(a) + "\n" for a in actions)

    got = {(r.k, r.part) for r in read_delta_lite(spark, table).collect()}
    assert got == {(1, "x live")}


def test_excel_sink_appends_across_micro_batches(spark, tmp_path):
    """ADVICE round 1: per-batch rewrite kept only the last micro-batch
    (last-write-wins loss); streaming batches must accumulate."""
    from spark_etl_cli_spark.sources.optional import ExcelSink
    from spark_etl_cli_spark.sources.xlsx_lite import read_xlsx
    from spark_etl_cli_spark.uri import parse_uri

    path = f"{tmp_path}/stream.xlsx"
    sink = ExcelSink(parse_uri(f"v+excel://{path}"))
    b1 = spark.createDataFrame([(1, "a")], "id bigint, name string")
    b2 = spark.createDataFrame([(2, "b")], "id bigint, name string")
    # simulate what stream_via_foreach_batch now does per micro-batch
    sink._write_batch(b1, append=True)
    sink._write_batch(b2, append=True)
    header, rows = read_xlsx(path)
    assert header == ["id", "name"]
    assert sorted(tuple(r) for r in rows) == [(1, "a"), (2, "b")]

    # batch mode still overwrites
    sink._write_batch(b2, append=False)
    _, rows = read_xlsx(path)
    assert [tuple(r) for r in rows] == [(2, "b")]


def test_delta_lite_write_append_overwrite_roundtrip(spark, tmp_path):
    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_delta_lite,
    )

    table = f"{tmp_path}/dlw"
    df1 = spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")])
    write_delta_lite(df1, table, mode="append")
    df2 = spark.createDataFrame([Row(k=3, v="c")])
    write_delta_lite(df2, table, mode="append")
    got = {(r.k, r.v) for r in read_delta_lite(spark, table).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # time travel still sees the first commit alone
    v0 = {(r.k, r.v) for r in read_delta_lite(spark, table, 0).collect()}
    assert v0 == {(1, "a"), (2, "b")}
    # overwrite removes every active file in one commit
    df3 = spark.createDataFrame([Row(k=9, v="z")])
    write_delta_lite(df3, table, mode="overwrite")
    got = {(r.k, r.v) for r in read_delta_lite(spark, table).collect()}
    assert got == {(9, "z")}


def test_delta_lite_write_partitioned(spark, tmp_path):
    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_delta_lite,
    )

    table = f"{tmp_path}/dlp"
    df = spark.createDataFrame(
        [Row(k=1, part="a b"), Row(k=2, part="c=d"), Row(k=3, part=None)]
    )
    write_delta_lite(df, table, mode="append", partition_by=["part"])
    got = {(r.k, r.part) for r in read_delta_lite(spark, table).collect()}
    assert got == {(1, "a b"), (2, "c=d"), (3, None)}
    # mismatched partitioning on append is refused
    import pytest as _pt

    with _pt.raises(ValueError, match="partition_by"):
        write_delta_lite(df, table, mode="append", partition_by=["k"])


def test_delta_lite_write_commit_is_protocol_shaped(spark, tmp_path):
    import json as _json
    import os as _os

    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite

    table = f"{tmp_path}/dls"
    write_delta_lite(spark.createDataFrame([Row(a=1)]), table)
    log = f"{table}/_delta_log/{0:020d}.json"
    actions = [
        _json.loads(line) for line in open(log) if line.strip()
    ]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and "metaData" in kinds and "add" in kinds
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["format"]["provider"] == "parquet"
    add = next(a["add"] for a in actions if "add" in a)
    assert _os.path.exists(f"{table}/{add['path']}")
    assert add["dataChange"] is True and add["size"] > 0


def test_delta_lite_checkpoint_roundtrip(spark, tmp_path):
    import os as _os

    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_checkpoint,
        write_delta_lite,
    )

    table = f"{tmp_path}/dlc"
    for i in range(3):
        write_delta_lite(
            spark.createDataFrame([Row(k=i)]), table, mode="append"
        )
    v = write_checkpoint(spark, table)
    assert v == 2
    assert _os.path.exists(f"{table}/_delta_log/{v:020d}.checkpoint.parquet")
    assert _os.path.exists(f"{table}/_delta_log/_last_checkpoint")
    # reads resume from the checkpoint and still see everything
    got = sorted(r.k for r in read_delta_lite(spark, table).collect())
    assert got == [0, 1, 2]
    # appends after the checkpoint replay as the tail
    write_delta_lite(spark.createDataFrame([Row(k=9)]), table, mode="append")
    got = sorted(r.k for r in read_delta_lite(spark, table).collect())
    assert got == [0, 1, 2, 9]
    # time travel replays JSON commits from scratch, ignoring checkpoints
    v1 = sorted(r.k for r in read_delta_lite(spark, table, 1).collect())
    assert v1 == [0, 1]


def test_delta_lite_auto_checkpoint_interval(spark, tmp_path, monkeypatch):
    import os as _os

    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    monkeypatch.setattr(dl, "CHECKPOINT_INTERVAL", 4)
    table = f"{tmp_path}/dla"
    for i in range(4):
        dl.write_delta_lite(
            spark.createDataFrame([Row(k=i)]), table, mode="append"
        )
    # version 3 is the 4th commit → auto-checkpointed
    assert _os.path.exists(f"{table}/_delta_log/{3:020d}.checkpoint.parquet")
    got = sorted(r.k for r in dl.read_delta_lite(spark, table).collect())
    assert got == [0, 1, 2, 3]


def test_delta_lite_optimize_compacts_and_streams_skip_readds(spark, tmp_path):
    """OPTIMIZE bin-packs small files with a dataChange=false commit:
    same snapshot rows, fewer files, time travel intact — and the
    jar-less stream reader must NOT re-deliver the compacted rows."""
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlopt"
    for i in range(4):  # 4 commits -> >=4 small files
        dl.write_delta_lite(
            spark.createDataFrame([Row(k=i)]), table, mode="append"
        )
    n_files_before = len(dl._replay(spark, table)[0])
    assert n_files_before >= 4
    # stream the table fully BEFORE optimize (checkpointed offset)
    from spark_etl_cli_spark.sources.deltastream import ensure_registered

    ensure_registered(spark)
    ckpt = f"{tmp_path}/opt_ckpt"
    out = f"{tmp_path}/opt_out"

    def drain():
        q = (
            spark.readStream.format("deltalite-stream")
            .option("path", table)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 4
    stats = dl.optimize_delta_lite(spark, table, target_file_bytes=10**9)
    assert stats["partitions_compacted"] == 1
    assert stats["files_removed"] == n_files_before
    assert stats["files_added"] == 1
    # snapshot identical, fewer files
    assert sorted(r.k for r in dl.read_delta_lite(spark, table).collect()) == [
        0, 1, 2, 3
    ]
    assert len(dl._replay(spark, table)[0]) == 1
    # time travel to the pre-optimize version still sees the old layout
    assert dl.read_delta_lite(spark, table, version_as_of=3).count() == 4
    # resumed stream sees NOTHING new (dataChange=false adds skipped)
    drain()
    assert spark.read.parquet(out).count() == 4
    # second optimize is a no-op (one big file left)
    assert dl.optimize_delta_lite(spark, table)["files_removed"] == 0


def test_delta_lite_optimize_partitioned_respects_groups(spark, tmp_path):
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dloptp"
    for i in range(2):
        dl.write_delta_lite(
            spark.createDataFrame(
                [Row(k=i, part="a"), Row(k=i + 10, part="b")]
            ),
            table, mode="append", partition_by=["part"],
        )
    stats = dl.optimize_delta_lite(spark, table, target_file_bytes=10**9)
    assert stats["partitions_compacted"] == 2
    got = {(r.k, r.part) for r in dl.read_delta_lite(spark, table).collect()}
    assert got == {(0, "a"), (1, "a"), (10, "b"), (11, "b")}
    # partition pruning still works on the compacted layout
    pruned, _ = dl._replay(spark, table, where="part = 'b'")
    assert len(pruned) == 1


def test_delta_lite_vacuum(spark, tmp_path):
    """VACUUM removes files unreferenced by the current snapshot and
    older than retention; referenced and fresh files survive."""
    import os as _os

    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlvac"
    dl.write_delta_lite(spark.createDataFrame([Row(k=1)]), table)
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=2)]), table, mode="overwrite"
    )
    # the overwritten v0 file is unreferenced but FRESH: retention holds
    assert dl.vacuum_delta_lite(spark, table, retention_hours=1) == []
    # age everything; dry run lists, then real run deletes
    for root, dirs, files in _os.walk(table):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for f in files:
            p = _os.path.join(root, f)
            _os.utime(p, (1, 1))
    listed = dl.vacuum_delta_lite(spark, table, retention_hours=1)
    referenced = {a["path"] for a in dl._replay(spark, table)[0]}
    assert listed and not (set(listed) & referenced)
    assert _os.path.exists(_os.path.join(table, listed[0]))  # dry run
    gone = dl.vacuum_delta_lite(
        spark, table, retention_hours=1, dry_run=False
    )
    assert gone == listed
    assert not _os.path.exists(_os.path.join(table, listed[0]))
    # current snapshot unharmed; pre-vacuum time travel now broken (the
    # documented trade)
    assert {r.k for r in dl.read_delta_lite(spark, table).collect()} == {2}
    with pytest.raises(Exception):
        dl.read_delta_lite(spark, table, version_as_of=0).collect()


def test_delta_lite_timestamp_as_of(spark, tmp_path):
    import json as _json
    import os as _os

    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlts"
    dl.write_delta_lite(spark.createDataFrame([Row(k=1)]), table)
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=2)]), table, mode="append"
    )
    # pin distinct commit timestamps by rewriting commitInfo
    log = f"{table}/_delta_log"
    for v, ts in [(0, 1_000_000), (1, 2_000_000)]:
        p = _os.path.join(log, f"{v:020d}.json")
        lines = [
            _json.loads(line) for line in open(p) if line.strip()
        ]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
        with open(p, "w") as fh:
            for a in lines:
                fh.write(_json.dumps(a) + "\n")
    assert {r.k for r in dl.read_delta_lite(
        spark, table, timestamp_as_of=1_500_000).collect()} == {1}
    assert {r.k for r in dl.read_delta_lite(
        spark, table, timestamp_as_of=2_000_000).collect()} == {1, 2}
    with pytest.raises(ValueError, match="at or before"):
        dl.read_delta_lite(spark, table, timestamp_as_of=999)
    with pytest.raises(ValueError, match="not both"):
        dl.read_delta_lite(
            spark, table, version_as_of=0, timestamp_as_of=1_500_000
        )
    # ISO string form resolves through UTC
    assert {r.k for r in dl.read_delta_lite(
        spark, table, timestamp_as_of="1970-01-01T00:25:00").collect()} == {1}


def test_delta_lite_checkpointless_stream_sink_not_deduped(spark, tmp_path):
    """A checkpoint-LESS streaming run restarts epochs at 0 every run;
    txn dedupe keyed on the table path would silently drop later runs'
    batches. Without a checkpoint, no txn is used — later runs append."""
    from pyspark.sql import Row

    from spark_etl_cli_spark.registry import resolve_sink
    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    src = f"{tmp_path}/ncs_src"
    table = f"{tmp_path}/ncs_tbl"
    spark.createDataFrame([Row(k=1)]).write.parquet(src)

    def run():
        stream = spark.readStream.schema("k long").parquet(src)
        _, sink = resolve_sink(
            f"s+delta-stream://{table}?trigger-interval=availableNow"
        )
        sink.write(stream)
        for q in spark.streams.active:
            q.awaitTermination(120)

    run()
    assert read_delta_lite(spark, table).count() == 1
    run()  # no checkpoint: re-reads and re-appends — but NEVER skips
    assert read_delta_lite(spark, table).count() == 2


def test_delta_stream_survives_merge_schema_widening(spark, tmp_path):
    """Files committed before a mergeSchema widening lack the new
    column; the jar-less stream reader fills null instead of crashing,
    for partitioned and unpartitioned tables alike."""
    from pyspark.sql import Row

    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite
    from spark_etl_cli_spark.sources.optional import _has_delta

    if _has_delta(spark):
        pytest.skip("delta-spark present")
    table = f"{tmp_path}/ds_widen"
    write_delta_lite(spark.createDataFrame([Row(k=1)]), table)
    write_delta_lite(
        spark.createDataFrame([Row(k=2, extra="x")]), table,
        mode="append", merge_schema=True,
    )
    _, src = resolve_source(f"s+delta-stream://{table}")
    stream = src.read(spark)
    assert stream.columns == ["k", "extra"]
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_widen_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.k, r.extra) for r in spark.table("ds_widen_t").collect()}
    assert got == {(1, None), (2, "x")}


def test_delta_lite_merge_schema_append(spark, tmp_path):
    """mergeSchema appends widen the table: new nullable columns land
    in a metaData action in the same commit; old files read null for
    them, frames missing table columns read null too; type conflicts
    still raise."""
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlmerge"
    dl.write_delta_lite(spark.createDataFrame([Row(k=1)]), table)
    with pytest.raises(ValueError, match="mergeSchema"):
        dl.write_delta_lite(
            spark.createDataFrame([Row(k=2, extra="x")]), table,
            mode="append",
        )
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=2, extra="x")]), table,
        mode="append", merge_schema=True,
    )
    out = dl.read_delta_lite(spark, table)
    assert out.columns == ["k", "extra"]
    assert {(r.k, r.extra) for r in out.collect()} == {(1, None), (2, "x")}
    # a frame MISSING a table column appends too under merge_schema
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=3)]), table,
        mode="append", merge_schema=True,
    )
    assert {(r.k, r.extra) for r in dl.read_delta_lite(spark, table).collect()} == {
        (1, None), (2, "x"), (3, None)
    }
    # type conflicts are never merged silently
    with pytest.raises(ValueError, match="types"):
        dl.write_delta_lite(
            spark.createDataFrame([Row(k=4, extra=1.5)]), table,
            mode="append", merge_schema=True,
        )
    # URI surface
    from spark_etl_cli_spark.registry import resolve_sink

    resolve_sink(f"v+delta://{table}?mode=append&mergeSchema=true")[1].write(
        spark.createDataFrame([Row(k=5, extra="y", more=7)])
    )
    out = dl.read_delta_lite(spark, table)
    assert out.columns == ["k", "extra", "more"]
    assert out.count() == 4


def test_delta_lite_txn_idempotent_writes(spark, tmp_path):
    """txn (SetTransaction) actions make replayed writes no-ops: the
    exactly-once primitive behind the jar-less streaming sink."""
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dltxn"
    df = spark.createDataFrame([Row(k=1)])
    dl.write_delta_lite(df, table, txn_app_id="app", txn_version=0)
    # replay of the same (app, version): committed NOTHING
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=99)]), table,
        txn_app_id="app", txn_version=0,
    )
    assert {r.k for r in dl.read_delta_lite(spark, table).collect()} == {1}
    # next version commits; an unrelated app is independent
    dl.write_delta_lite(df.selectExpr("k + 1 AS k"), table,
                        txn_app_id="app", txn_version=1)
    dl.write_delta_lite(df.selectExpr("k + 9 AS k"), table,
                        txn_app_id="other", txn_version=0)
    assert {r.k for r in dl.read_delta_lite(spark, table).collect()} == {
        1, 2, 10
    }
    assert dl._last_txn_version(f"{table}/_delta_log", "app") == 1
    with pytest.raises(ValueError, match="txn_version"):
        dl.write_delta_lite(df, table, txn_app_id="app")


def test_delta_lite_streaming_sink_without_jars(spark, tmp_path):
    """streaming writes no longer need delta-spark: foreachBatch +
    per-epoch txn actions give exactly-once appends; a restart from the
    same checkpoint re-reads nothing and re-commits nothing."""
    from pyspark.sql import Row

    from spark_etl_cli_spark.registry import resolve_sink
    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    src = f"{tmp_path}/dstream_src"
    table = f"{tmp_path}/dstream_tbl"
    ckpt = f"{tmp_path}/dstream_ckpt"
    spark.createDataFrame([Row(k=i) for i in range(4)]).write.parquet(src)
    stream = spark.readStream.schema("k long").parquet(src)

    def run():
        _, sink = resolve_sink(
            f"s+delta-stream://{table}?checkpointLocation={ckpt}"
            "&trigger-interval=availableNow"
        )
        assert sink.write(stream) is True
        for q in spark.streams.active:
            q.awaitTermination(120)

    run()
    assert sorted(r.k for r in read_delta_lite(spark, table).collect()) == [
        0, 1, 2, 3
    ]
    # append more source data; resumed run picks up ONLY the new file
    spark.createDataFrame([Row(k=9)]).write.mode("append").parquet(src)
    run()
    assert sorted(r.k for r in read_delta_lite(spark, table).collect()) == [
        0, 1, 2, 3, 9
    ]
    # a third run with nothing new commits nothing
    run()
    assert read_delta_lite(spark, table).count() == 5


def test_delta_lite_checkpoint_protocol_gate(spark, tmp_path):
    """Protocol actions stored IN a checkpoint (not just JSON commits)
    must hit the same reader-feature validation — a checkpointed table
    with an unsupported feature must raise, not silently read."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import pytest as _pt
    from pyspark.sql import types as T2

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlpg"
    log_dir = f"{table}/_delta_log"
    _os.makedirs(log_dir)
    cp_schema = T2.StructType(
        [
            T2.StructField(
                "protocol",
                T2.StructType(
                    [
                        T2.StructField("minReaderVersion", T2.IntegerType()),
                        T2.StructField("minWriterVersion", T2.IntegerType()),
                        T2.StructField(
                            "readerFeatures", T2.ArrayType(T2.StringType())
                        ),
                    ]
                ),
            ),
            T2.StructField(
                "metaData",
                T2.StructType(
                    [
                        T2.StructField("id", T2.StringType()),
                        T2.StructField("schemaString", T2.StringType()),
                        T2.StructField(
                            "partitionColumns", T2.ArrayType(T2.StringType())
                        ),
                    ]
                ),
            ),
            T2.StructField(
                "add",
                T2.StructType(
                    [
                        T2.StructField("path", T2.StringType()),
                        T2.StructField(
                            "partitionValues",
                            T2.MapType(T2.StringType(), T2.StringType()),
                        ),
                        T2.StructField("size", T2.LongType()),
                        T2.StructField("modificationTime", T2.LongType()),
                    ]
                ),
            ),
        ]
    )
    schema_str = T2.StructType([T2.StructField("k", T2.LongType())]).json()
    rows = [
        ((3, 7, ["variantType"]), None, None),
        (None, ("tid", schema_str, []), None),
        (None, None, ("f1.parquet", {}, 10, 0)),
    ]
    cp_df = spark.createDataFrame(rows, cp_schema)
    tmp = f"{tmp_path}/cp_out"
    cp_df.coalesce(1).write.parquet(tmp)
    part = next(
        f for f in _os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    _shutil.move(
        f"{tmp}/{part}", f"{log_dir}/{0:020d}.checkpoint.parquet"
    )
    with open(f"{log_dir}/_last_checkpoint", "w") as fh:
        _json.dump({"version": 0, "size": 3}, fh)
    with _pt.raises(NotImplementedError, match="variantType"):
        dl.read_delta_lite(spark, table)


def test_delta_lite_where_prunes_file_list(spark, tmp_path):
    """`where` over partition columns prunes the FILE LIST during log
    replay: non-matching partitions' data files never reach the scan."""
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlprune"
    df = spark.createDataFrame(
        [Row(k=i, part=p) for i, p in enumerate(["a", "a", "b", "c"])]
    )
    dl.write_delta_lite(df, table, partition_by=["part"])
    all_adds, meta = dl._replay(spark, table)
    pruned, _ = dl._replay(spark, table, where="part = 'b'")
    assert len(pruned) < len(all_adds)
    assert all(a["partitionValues"] == {"part": "b"} for a in pruned)
    got = {(r.k, r.part)
           for r in dl.read_delta_lite(spark, table, where="part = 'b'").collect()}
    assert got == {(2, "b")}
    # checkpoint path: pruning happens DataFrame-side before collect
    dl.write_delta_lite(
        spark.createDataFrame([Row(k=9, part="b")]), table, mode="append"
    )
    dl.write_checkpoint(spark, table)
    pruned_cp, _ = dl._replay(spark, table, where="part = 'b'")
    assert all(a["partitionValues"] == {"part": "b"} for a in pruned_cp)
    assert len(pruned_cp) >= 2
    # non-partition predicate: no file pruning, but rows stay exact
    unpruned, _ = dl._replay(spark, table, where="k > 2")
    assert len(unpruned) == len(dl._replay(spark, table)[0])
    got = {r.k for r in dl.read_delta_lite(spark, table, where="k > 2").collect()}
    assert got == {3, 9}


def test_delta_lite_large_checkpoint_bounded_driver(spark, tmp_path, monkeypatch):
    """Synthetic 100k-add checkpoint: snapshot reconstruction stays
    DataFrame-side (tail reconciliation via anti-join), the driver sees
    only the final list, and the file-count guard trips when lowered."""
    import json as _json
    import os as _os
    import shutil as _shutil

    import pytest as _pt
    from pyspark.sql import functions as F2
    from pyspark.sql import types as T2

    import spark_etl_cli_spark.sources.delta_lite as dl

    table = f"{tmp_path}/dlbig"
    log_dir = f"{table}/_delta_log"
    _os.makedirs(log_dir)
    n = 100_000
    schema_str = T2.StructType(
        [T2.StructField("k", T2.LongType()), T2.StructField("part", T2.StringType())]
    ).json()
    # checkpoint generated distributed — 100k add rows, 50 partitions
    cp = spark.range(n).select(
        F2.lit(None).cast(
            "struct<minReaderVersion:int,minWriterVersion:int>"
        ).alias("protocol"),
        F2.lit(None).cast(
            "struct<id:string,schemaString:string,partitionColumns:array<string>>"
        ).alias("metaData"),
        F2.struct(
            F2.concat(F2.lit("part-"), F2.col("id")).alias("path"),
            F2.create_map(
                F2.lit("part"), (F2.col("id") % 50).cast("string")
            ).alias("partitionValues"),
            F2.lit(10).cast("long").alias("size"),
            F2.lit(0).cast("long").alias("modificationTime"),
        ).alias("add"),
    )
    nullable_schema = T2.StructType(
        [T2.StructField(f.name, f.dataType, True) for f in cp.schema.fields]
    )
    meta_row = spark.createDataFrame(
        [(None, ("tid", schema_str, ["part"]), None)], nullable_schema
    )
    tmp = f"{tmp_path}/cp_out"
    cp.unionByName(meta_row).coalesce(1).write.parquet(tmp)
    part = next(
        f for f in _os.listdir(tmp)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    _shutil.move(f"{tmp}/{part}", f"{log_dir}/{0:020d}.checkpoint.parquet")
    with open(f"{log_dir}/_last_checkpoint", "w") as fh:
        _json.dump({"version": 0, "size": n + 1}, fh)
    # JSON tail: remove 10 checkpoint files, re-add 5 of them, add 3 new
    with open(f"{log_dir}/{1:020d}.json", "w") as fh:
        for i in range(10):
            fh.write(_json.dumps({"remove": {"path": f"part-{i}"}}) + "\n")
        for i in range(5):
            fh.write(_json.dumps({"add": {
                "path": f"part-{i}",
                "partitionValues": {"part": str(i % 50)}, "size": 11,
                "modificationTime": 1, "dataChange": True}}) + "\n")
        for i in range(3):
            fh.write(_json.dumps({"add": {
                "path": f"new-{i}",
                "partitionValues": {"part": "0"}, "size": 12,
                "modificationTime": 1, "dataChange": True}}) + "\n")
    adds, meta = dl._replay(spark, table)
    assert len(adds) == n - 10 + 5 + 3
    by_path = {a["path"]: a for a in adds}
    assert "part-5" not in by_path          # removed, not re-added
    assert by_path["part-3"]["size"] == 11  # tail re-add wins
    assert "new-2" in by_path
    # partition pruning shrinks the collected list before it reaches
    # the driver: 1/50 of the checkpoint + the matching tail adds
    pruned, _ = dl._replay(spark, table, where="part = '7'")
    assert len(pruned) == n // 50 - 1  # part-7 was removed by the tail
    assert all(a["partitionValues"]["part"] == "7" for a in pruned)
    # the guard trips rather than letting the driver absorb the list
    monkeypatch.setenv("SPARK_ETL_DELTA_LITE_MAX_FILES", "1000")
    with _pt.raises(RuntimeError, match="more than 1000 active files"):
        dl._replay(spark, table)


def test_delta_lite_append_schema_mismatch_refused(spark, tmp_path):
    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_delta_lite,
    )

    table = f"{tmp_path}/dlschema"
    write_delta_lite(spark.createDataFrame([Row(k=1, v="a")]), table)
    import pytest as _pt

    with _pt.raises(ValueError, match="does not match"):
        write_delta_lite(
            spark.createDataFrame([Row(k=2, other=1.5)]), table, mode="append"
        )
    # overwrite MAY evolve the schema: new metaData in the same commit
    write_delta_lite(
        spark.createDataFrame([Row(k=2, other=1.5)]), table, mode="overwrite"
    )
    rows = read_delta_lite(spark, table).collect()
    assert [(r.k, r.other) for r in rows] == [(2, 1.5)]


def test_delta_lite_empty_append_commits_metadata_only(spark, tmp_path):
    from pyspark.sql import types as T2

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_delta_lite,
    )

    table = f"{tmp_path}/dlempty"
    schema = T2.StructType([T2.StructField("k", T2.LongType())])
    write_delta_lite(spark.createDataFrame([], schema), table)
    out = read_delta_lite(spark, table)
    assert out.count() == 0 and out.schema == schema


def test_excel_sink_streams_rows_not_collect(spark, tmp_path, monkeypatch):
    # the sink must never materialize the frame driver-side: it feeds
    # toLocalIterator() into the incremental xlsx writer. Guard by
    # poisoning DataFrame.collect for the duration of the write.
    from pyspark.sql import DataFrame

    from spark_etl_cli_spark.registry import resolve_sink
    from spark_etl_cli_spark.sources.xlsx_lite import read_xlsx

    def _boom(self):
        raise AssertionError("excel sink must not collect()")

    path = str(tmp_path / "big.xlsx")
    df = spark.range(0, 5000, 1, 8).selectExpr(
        "id", "concat('row-', id) AS label"
    )
    _, sink = resolve_sink(f"e+excel://{path}")
    monkeypatch.setattr(DataFrame, "collect", _boom)
    assert sink.write(df) is True
    monkeypatch.undo()
    header, rows = read_xlsx(path)
    assert header == ["id", "label"]
    assert len(rows) == 5000
    assert rows[0] == [0, "row-0"] and rows[-1] == [4999, "row-4999"]

    # append path (micro-batch shape) also streams and keeps old rows
    more = spark.range(5000, 5100).selectExpr(
        "id", "concat('row-', id) AS label"
    )
    monkeypatch.setattr(DataFrame, "collect", _boom)
    assert sink._write_batch(more, append=True) is True
    monkeypatch.undo()
    _, rows2 = read_xlsx(path)
    assert len(rows2) == 5100 and rows2[-1] == [5099, "row-5099"]


class _SolrStub:
    """In-process Solr lookalike: records /update POSTs, serves /select
    with cursorMark paging over an in-memory doc list."""

    def __init__(self, docs=None):
        import json
        import threading
        from http.server import BaseHTTPRequestHandler, HTTPServer
        from urllib.parse import parse_qs, urlsplit

        stub = self
        self.docs = docs or []
        self.updates = []  # (path, query, parsed_json_body)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def _json(self, payload):
                body = json.dumps(payload).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n))
                u = urlsplit(self.path)
                stub.updates.append((u.path, parse_qs(u.query), body))
                self._json({"responseHeader": {"status": 0}})

            def do_GET(self):
                u = urlsplit(self.path)
                q = parse_qs(u.query)
                rows = int(q.get("rows", ["10"])[0])
                cursor = q.get("cursorMark", ["*"])[0]
                start = 0 if cursor == "*" else int(cursor[3:])
                page = stub.docs[start : start + rows]
                nxt = cursor if not page else f"AoE{start + len(page)}"
                self._json({
                    "responseHeader": {"status": 0},
                    "response": {
                        "numFound": len(stub.docs),
                        "start": start,
                        "docs": page,
                    },
                    "nextCursorMark": nxt,
                })

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.endpoint = f"http://127.0.0.1:{self.server.server_port}/solr"
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_solr_sink_batches_and_commits_against_stub(spark):
    stub = _SolrStub()
    try:
        run_pipeline(
            spark,
            sources=["v+range://?end=25&partitions=2"],
            transforms=["v+v2+sql://SELECT id, concat('d-', id) AS name FROM input"],
            sinks=[
                f"v2+solr://col1?endpoint={stub.endpoint}&batchSize=10"
            ],
        )
        assert stub.updates, "sink never POSTed"
        # every POST hits /update on the named collection with commit=true
        for path, query, body in stub.updates:
            assert path == "/solr/col1/update"
            assert query.get("commit") == ["true"]
            assert isinstance(body, list) and len(body) <= 10
        sent = [d for _, _, body in stub.updates for d in body]
        assert len(sent) == 25
        assert {d["id"] for d in sent} == set(range(25))
        assert all(d["name"] == f"d-{d['id']}" for d in sent)
        # batchSize=10 over 25 rows: at least one full batch of 10
        assert any(len(body) == 10 for _, _, body in stub.updates)
    finally:
        stub.close()


def test_solr_source_pages_with_cursormark(spark):
    docs = [{"id": str(i), "score_i": i} for i in range(23)]
    stub = _SolrStub(docs)
    try:
        run_pipeline(
            spark,
            sources=[
                f"s+solr://col1?endpoint={stub.endpoint}&rows=10&sort=id+asc"
            ],
            sinks=["s+memory://solr_rows"],
        )
        got = spark.table("solr_rows").collect()
        assert len(got) == 23
        assert {r.id for r in got} == {str(i) for i in range(23)}
        assert {r.score_i for r in got} == set(range(23))
    finally:
        stub.close()


def test_solr_roundtrip_sink_then_source(spark):
    stub = _SolrStub()
    try:
        run_pipeline(
            spark,
            sources=["v+range://?end=7"],
            transforms=["v+v2+sql://SELECT cast(id AS string) AS id, id * 2 AS dbl FROM input"],
            sinks=[f"v2+solr://c?endpoint={stub.endpoint}"],
        )
        # feed what the sink sent into the stub's /select store
        stub.docs = [d for _, _, body in stub.updates for d in body]
        run_pipeline(
            spark,
            sources=[f"s+solr://c?endpoint={stub.endpoint}&rows=3"],
            sinks=["s+memory://solr_rt"],
        )
        rows = spark.table("solr_rt").collect()
        assert {(r.id, r.dbl) for r in rows} == {(str(i), i * 2) for i in range(7)}
    finally:
        stub.close()


def test_solr_source_max_rows_guard(spark):
    docs = [{"id": str(i)} for i in range(50)]
    stub = _SolrStub(docs)
    try:
        with pytest.raises(Exception, match="max-rows"):
            run_pipeline(
                spark,
                sources=[
                    f"s+solr://c?endpoint={stub.endpoint}&rows=20&max-rows=30"
                ],
                sinks=["s+memory://solr_capped"],
            )
    finally:
        stub.close()


def test_delta_lite_multipart_checkpoint(spark, tmp_path):
    # PROTOCOL.md multi-part form: N files <v>.checkpoint.<i>.<N>.parquet.
    # Build a table, checkpoint it, then split the single-file
    # checkpoint into 2 parts and prove replay resumes from them (the
    # pre-checkpoint JSON commits are deleted so the checkpoint is the
    # only source of the early adds).
    import glob
    import json as _json
    import os

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_checkpoint,
        write_delta_lite,
    )

    path = str(tmp_path / "mp_delta")
    write_delta_lite(spark.range(0, 5).selectExpr("id", "id * 2 AS v"), path)
    write_delta_lite(
        spark.range(5, 9).selectExpr("id", "id * 2 AS v"), path, mode="append"
    )
    version = write_checkpoint(spark, path)
    log_dir = os.path.join(path, "_delta_log")
    single = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    cp = spark.read.parquet(single)
    rows = cp.collect()
    assert len(rows) >= 2
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]], start=1):
        part = os.path.join(
            log_dir, f"{version:020d}.checkpoint.{i:010d}.{2:010d}.parquet"
        )
        spark.createDataFrame(chunk, cp.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
    os.unlink(single)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        _json.dump({"version": version, "size": len(rows), "parts": 2}, fh)
    # remove replayable history before the checkpoint
    for f in glob.glob(os.path.join(log_dir, "*.json")):
        if int(os.path.basename(f)[:20]) <= version:
            os.unlink(f)
    back = read_delta_lite(spark, path)
    assert {(r.id, r.v) for r in back.collect()} == {
        (i, i * 2) for i in range(9)
    }


def test_delta_lite_column_mapping_read(spark, tmp_path):
    # column mapping mode=name: parquet files store col-<uuid> physical
    # names; the reader must map them back to the logical schema,
    # including a partition column whose partitionValues key is the
    # PHYSICAL name (per PROTOCOL.md Column Mapping).
    import json as _json
    import os

    from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

    table = str(tmp_path / "cm_delta")
    log_dir = os.path.join(table, "_delta_log")
    os.makedirs(log_dir)
    # data file: physical names only, partition col not stored
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "`col-1111` long, `col-2222` string"
    ).coalesce(1).write.parquet(os.path.join(table, "part0"))
    data_file = [
        f"part0/{f}"
        for f in os.listdir(os.path.join(table, "part0"))
        if f.endswith(".parquet")
    ][0]
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-1111"}},
            {"name": "name", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-2222"}},
            {"name": "day", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "col-3333"}},
        ],
    }
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t1", "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": ["day"],
            "configuration": {"delta.columnMapping.mode": "name"},
        }},
        {"add": {
            "path": data_file,
            "partitionValues": {"col-3333": "2024-01-01"},
            "size": 1, "modificationTime": 0, "dataChange": True,
        }},
    ]
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(a) for a in actions))
    out = read_delta_lite(spark, table)
    assert out.columns == ["id", "name", "day"]
    rows = {r.id: (r.name, r.day) for r in out.collect()}
    assert rows == {1: ("a", "2024-01-01"), 2: ("b", "2024-01-01")}


def test_solr_source_empty_collection(spark):
    stub = _SolrStub([])
    try:
        from spark_etl_cli_spark.registry import resolve_source

        _, source = resolve_source(
            f"s+solr://c?endpoint={stub.endpoint}&rows=5"
        )
        out = source.read(spark)
        assert out.count() == 0
    finally:
        stub.close()


def test_delta_lite_timestamp_ntz_schema(spark, tmp_path):
    # timestampNtz is an allowed reader feature: schemaString types
    # "timestamp_ntz" must round-trip through the lite reader
    import datetime as dt

    from spark_etl_cli_spark.sources.delta_lite import (
        read_delta_lite,
        write_delta_lite,
    )

    path = str(tmp_path / "ntz_delta")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1, 10, 30))],
        "id long, ts timestamp_ntz",
    )
    write_delta_lite(df, path)
    back = read_delta_lite(spark, path)
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    assert back.collect()[0].ts == dt.datetime(2024, 3, 1, 10, 30)


@pytest.mark.parametrize("rows", [1, 7, 100])
def test_solr_source_page_size_invariance(spark, rows):
    # the cursorMark loop must yield the same set regardless of page
    # size (incl. rows > collection size)
    docs = [{"id": str(i)} for i in range(23)]
    stub = _SolrStub(docs)
    try:
        from spark_etl_cli_spark.registry import resolve_source

        _, source = resolve_source(
            f"s+solr://c?endpoint={stub.endpoint}&rows={rows}"
        )
        got = {r.id for r in source.read(spark).collect()}
        assert got == {str(i) for i in range(23)}
    finally:
        stub.close()


def test_delta_stream_incremental_commits_jarless(spark, tmp_path):
    # delta-stream:// without delta-spark: commit-version offsets —
    # first run drains commit 0, a later append streams only commit 1
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite
    from spark_etl_cli_spark.sources.optional import _has_delta

    if _has_delta(spark):
        pytest.skip("delta-spark present: the jar path is the real one")
    table = str(tmp_path / "ds_t")
    write_delta_lite(spark.range(4).selectExpr("id"), table)
    _, src = resolve_source(f"s+delta-stream://{table}")
    stream = src.read(spark)
    assert stream.isStreaming and stream.columns == ["id"]
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert {r.id for r in spark.read.parquet(out).collect()} == {0, 1, 2, 3}
    write_delta_lite(
        spark.range(4, 6).selectExpr("id"), table, mode="append"
    )
    q2 = (
        src.read(spark).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
        0, 1, 2, 3, 4, 5
    ]


def test_delta_stream_partitioned_restores_columns(spark, tmp_path):
    """Partitioned tables stream jar-less too: partition values come
    from the log and are restored as typed constant columns in the
    table schema's order (they are NOT in the data files)."""
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite
    from spark_etl_cli_spark.sources.optional import _has_delta

    if _has_delta(spark):
        pytest.skip("delta-spark present")
    table = str(tmp_path / "ds_part")
    write_delta_lite(
        spark.range(4).selectExpr("id", "id % 2 AS p"), table,
        partition_by=["p"],
    )
    _, src = resolve_source(f"s+delta-stream://{table}")
    stream = src.read(spark)
    assert stream.columns == ["id", "p"]
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_part_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.id, r.p) for r in spark.table("ds_part_t").collect()}
    assert got == {(i, i % 2) for i in range(4)}
    # null partition value round-trips as NULL, not the hive sentinel
    write_delta_lite(
        spark.sql("SELECT CAST(9 AS BIGINT) AS id, CAST(NULL AS BIGINT) AS p"),
        table, mode="append",
    )
    q2 = (
        src.read(spark)
        .writeStream.format("memory")
        .queryName("ds_part_t2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    rows = {(r.id, r.p) for r in spark.table("ds_part_t2").collect()}
    assert (9, None) in rows and len(rows) == 5
