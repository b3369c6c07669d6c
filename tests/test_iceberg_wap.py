"""Iceberg branches + write-audit-publish (spec ``refs``).

Stage commits onto a named branch (write_iceberg_lite(branch=...)),
audit them via ?ref= reads while main stays untouched, publish with a
strict fast-forward — and refuse diverged lines, tag writes, and
branch writes to nonexistent tables."""

import pytest

from spark_etl_cli_spark.sources.iceberg_lite import (
    _load_metadata,
    fast_forward_iceberg_ref,
    read_iceberg_lite,
    set_iceberg_ref,
    write_iceberg_lite,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_wap_stage_audit_publish(spark, tmp_path):
    table = str(tmp_path / "wap")
    write_iceberg_lite(_mk(spark, [(1, "a"), (2, "b")]), table)

    # stage two commits onto the branch (auto-created from current)
    write_iceberg_lite(_mk(spark, [(3, "c")]), table, branch="audit")
    write_iceberg_lite(_mk(spark, [(4, "d")]), table, branch="audit")

    # main readers see NOTHING staged; ?ref=audit sees the full stage
    assert _ids(read_iceberg_lite(spark, table)) == [1, 2]
    meta = _load_metadata(table)
    head = meta["refs"]["audit"]["snapshot-id"]
    assert _ids(read_iceberg_lite(spark, table, snapshot_id=head)) == [
        1, 2, 3, 4,
    ]
    # branch chain records parents back to the fork
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert by_id[head]["parent-snapshot-id"] == head - 1
    assert by_id[head - 1]["parent-snapshot-id"] == meta[
        "current-snapshot-id"
    ]

    # publish: main fast-forwards to the branch head
    published = fast_forward_iceberg_ref(table, "audit")
    assert published == head
    assert _ids(read_iceberg_lite(spark, table)) == [1, 2, 3, 4]
    # publishing again is a no-op fast-forward (main == head ∈ ancestry)
    assert fast_forward_iceberg_ref(table, "audit") == head


def test_wap_publish_refuses_diverged_main(spark, tmp_path):
    table = str(tmp_path / "wap_div")
    write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    write_iceberg_lite(_mk(spark, [(2, "b")]), table, branch="audit")
    # someone commits to MAIN after the fork → lines diverge
    write_iceberg_lite(_mk(spark, [(9, "z")]), table)
    with pytest.raises(ValueError, match="not a fast-forward"):
        fast_forward_iceberg_ref(table, "audit")
    # main kept its own line
    assert _ids(read_iceberg_lite(spark, table)) == [1, 9]


def test_wap_guards(spark, tmp_path):
    table = str(tmp_path / "wap_g")
    # branch write needs an existing table
    with pytest.raises(ValueError, match="existing table"):
        write_iceberg_lite(_mk(spark, [(1, "a")]), table, branch="b")
    write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    # tags are immutable: writes refuse them
    set_iceberg_ref(table, "v1", ref_type="tag")
    with pytest.raises(ValueError, match="is a tag"):
        write_iceberg_lite(_mk(spark, [(2, "b")]), table, branch="v1")
    with pytest.raises(ValueError, match="is a tag"):
        fast_forward_iceberg_ref(table, "v1")
    with pytest.raises(ValueError, match="unknown iceberg branch"):
        fast_forward_iceberg_ref(table, "nope")


def test_wap_branch_isolation_from_overwrite(spark, tmp_path):
    # an overwrite staged on the branch must not disturb main either
    table = str(tmp_path / "wap_ow")
    write_iceberg_lite(_mk(spark, [(1, "a"), (2, "b")]), table)
    write_iceberg_lite(
        _mk(spark, [(7, "x")]), table, mode="overwrite", branch="audit"
    )
    assert _ids(read_iceberg_lite(spark, table)) == [1, 2]
    meta = _load_metadata(table)
    head = meta["refs"]["audit"]["snapshot-id"]
    assert _ids(read_iceberg_lite(spark, table, snapshot_id=head)) == [7]
    fast_forward_iceberg_ref(table, "audit")
    assert _ids(read_iceberg_lite(spark, table)) == [7]


def test_wap_via_uri_pipeline(spark, tmp_path):
    # the CLI shape: stage with ?branch=, audit with ?ref=, publish
    # with rep+iceberg-publish://
    from spark_etl_cli_spark.pipeline import run_pipeline

    table = str(tmp_path / "wap_uri")
    write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    run_pipeline(
        spark,
        sources=["s+values://?header=id:long,v:string&values=3,c"],
        sinks=[f"s+iceberg://{table}?branch=audit"],
    )
    assert _ids(read_iceberg_lite(spark, table)) == [1]
    run_pipeline(
        spark,
        sources=[f"p+iceberg-publish://{table}?branch=audit"],
        sinks=["p+console://"],
    )
    assert _ids(read_iceberg_lite(spark, table)) == [1, 3]


def test_rollback_to_snapshot(spark, tmp_path):
    table = str(tmp_path / "rb")
    s1 = write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    s2 = write_iceberg_lite(_mk(spark, [(2, "b")]), table)
    assert _ids(read_iceberg_lite(spark, table)) == [1, 2]

    from spark_etl_cli_spark.sources.iceberg_lite import rollback_iceberg_lite

    assert rollback_iceberg_lite(table, s1) == s1
    assert _ids(read_iceberg_lite(spark, table)) == [1]
    # the abandoned snapshot stays readable by id (nothing deleted)
    assert _ids(read_iceberg_lite(spark, table, snapshot_id=s2)) == [1, 2]
    # the next append builds on the rolled-back state
    write_iceberg_lite(_mk(spark, [(3, "c")]), table)
    assert _ids(read_iceberg_lite(spark, table)) == [1, 3]
    with pytest.raises(ValueError, match="not found"):
        rollback_iceberg_lite(table, 99)


def test_rollback_via_uri(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline

    table = str(tmp_path / "rb_uri")
    s1 = write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    write_iceberg_lite(_mk(spark, [(2, "b")]), table)
    run_pipeline(
        spark,
        sources=[f"r+iceberg-rollback://{table}?snapshot-id={s1}"],
        sinks=["r+console://"],
    )
    assert _ids(read_iceberg_lite(spark, table)) == [1]


def test_sorted_write_records_order_and_clusters_rows(spark, tmp_path):
    """?sortBy= writes in-file-sorted data and records the spec's sort
    order (identity asc, nulls-first) as the default; unsorted appends
    keep the recorded orders."""
    import glob

    from spark_etl_cli_spark.pipeline import run_pipeline

    table = str(tmp_path / "sorted")
    df = spark.createDataFrame(
        [(i * 37 % 100, f"v{i}") for i in range(100)], "k long, v string"
    ).repartition(2)
    write_iceberg_lite(df, table, sort_by=["k"])
    meta = _load_metadata(table)
    assert meta["default-sort-order-id"] == 1
    order = next(
        o for o in meta["sort-orders"] if o["order-id"] == 1
    )
    assert [f["direction"] for f in order["fields"]] == ["asc"]
    assert [f["transform"] for f in order["fields"]] == ["identity"]
    # every data file is internally sorted on k
    for p in glob.glob(f"{table}/data/**/*.parquet", recursive=True):
        ks = [r.k for r in spark.read.parquet(p).collect()]
        assert ks == sorted(ks), p
    # an unsorted append keeps the recorded orders (and the default)
    write_iceberg_lite(
        spark.createDataFrame([(1, "x")], "k long, v string"), table
    )
    meta = _load_metadata(table)
    assert meta["default-sort-order-id"] == 1
    assert len(meta["sort-orders"]) == 2
    # URI surface
    t2 = str(tmp_path / "sorted_uri")
    run_pipeline(
        spark,
        sources=["s+values://?header=k:long&values=3;1;2"],
        sinks=[f"s+iceberg://{t2}?sortBy=k"],
    )
    assert _load_metadata(t2)["default-sort-order-id"] == 1


def test_wap_streaming_sink_stages_on_branch(spark, tmp_path):
    """A streaming iceberg sink with ?branch= stages every micro-batch
    onto the branch; main stays untouched until publish."""
    from spark_etl_cli_spark.pipeline import run_pipeline

    table = str(tmp_path / "wap_stream")
    write_iceberg_lite(_mk(spark, [(1, "a")]), table)
    src_dir = str(tmp_path / "in")
    spark.createDataFrame([(2, "b"), (3, "c")], "id long, v string").write.json(
        src_dir
    )
    run_pipeline(
        spark,
        sources=[
            f"s+json-stream://{src_dir}?schema=id long, v string"
        ],
        sinks=[
            f"s+iceberg://{table}?branch=audit"
            f"&trigger-interval=availableNow"
            f"&checkpointLocation={tmp_path}/cp"
        ],
    )
    # availableNow terminates on its own; wait so no active query
    # leaks into later tests
    import time

    deadline = time.monotonic() + 120
    while any(q.isActive for q in spark.streams.active):
        assert time.monotonic() < deadline, "stream still active"
        for q in spark.streams.active:
            q.awaitTermination(5)
    assert _ids(read_iceberg_lite(spark, table)) == [1]
    fast_forward_iceberg_ref(table, "audit")
    assert _ids(read_iceberg_lite(spark, table)) == [1, 2, 3]
