"""Maintenance actions surfaced as pipeline sources: the action runs,
its report comes back as a DataFrame, and the underlying table is
actually maintained."""

from __future__ import annotations

import os


def test_delta_optimize_and_vacuum_sources(spark, tmp_path):
    from pyspark.sql import Row

    import spark_etl_cli_spark.sources.delta_lite as dl
    from spark_etl_cli_spark.registry import resolve_source

    table = f"{tmp_path}/m_dl"
    for i in range(3):
        dl.write_delta_lite(
            spark.createDataFrame([Row(k=i)]), table, mode="append"
        )
    _, src = resolve_source(
        f"rep+delta-optimize://{table}?target-file-bytes=1000000000"
    )
    rep = src.read(spark).collect()[0]
    assert rep.files_removed == 3 and rep.files_added == 1
    assert len(dl._replay(spark, table)[0]) == 1
    # vacuum report (dry run by default): the 3 compacted-away files,
    # once aged past retention
    for root, dirs, files in os.walk(table):
        dirs[:] = [d for d in dirs if d != "_delta_log"]
        for f in files:
            os.utime(os.path.join(root, f), (1, 1))
    _, vsrc = resolve_source(f"rep+delta-vacuum://{table}?retention-hours=1")
    rows = vsrc.read(spark).collect()
    assert len(rows) == 3 and all(r.dry_run for r in rows)
    # files still exist (dry run)
    assert all(os.path.exists(os.path.join(table, r.path)) for r in rows)
    _, vsrc2 = resolve_source(
        f"rep+delta-vacuum://{table}?retention-hours=1&dry-run=false"
    )
    gone = vsrc2.read(spark).collect()
    assert len(gone) == 3
    assert not any(os.path.exists(os.path.join(table, r.path)) for r in gone)
    assert dl.read_delta_lite(spark, table).count() == 3


def test_iceberg_compact_and_expire_sources(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.iceberg_lite import (
        read_iceberg_lite,
        write_iceberg_lite,
    )

    table = f"{tmp_path}/m_ice"
    for i in range(3):
        write_iceberg_lite(spark.range(i, i + 1).selectExpr("id"), table)
    _, csrc = resolve_source(
        f"rep+iceberg-compact://{table}?target-file-bytes=1000000000"
    )
    rep = csrc.read(spark).collect()[0]
    assert rep.files_removed >= 3 and rep.files_added == 1
    assert sorted(r.id for r in read_iceberg_lite(spark, table).collect()) == [
        0, 1, 2
    ]
    _, esrc = resolve_source(
        f"rep+iceberg-expire://{table}?keep-last=1&delete-orphans=true"
    )
    erep = esrc.read(spark).collect()[0]
    assert erep.snapshots_expired == 3  # three appends + compaction kept
    assert read_iceberg_lite(spark, table).count() == 3


def test_metadata_tables(spark, tmp_path):
    """?meta= serves the engines' metadata-table surface jar-less:
    iceberg snapshots/refs/history/files, delta history/files."""
    from spark_etl_cli_spark.pipeline import run_pipeline
    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite
    from spark_etl_cli_spark.sources.iceberg_lite import (
        set_iceberg_ref,
        write_iceberg_lite,
    )
    from spark_etl_cli_spark.sources.meta_tables import (
        delta_meta_df,
        iceberg_meta_df,
    )

    it = str(tmp_path / "imeta")
    s1 = write_iceberg_lite(
        spark.createDataFrame([(1, "a")], "id long, v string"), it
    )
    write_iceberg_lite(
        spark.createDataFrame([(2, "b")], "id long, v string"), it
    )
    set_iceberg_ref(it, "v1", snapshot_id=s1, ref_type="tag")

    snaps = iceberg_meta_df(spark, it, "snapshots").collect()
    assert [r.snapshot_id for r in snaps] == [1, 2]
    assert snaps[1].parent_id == 1 and snaps[1].operation == "append"
    refs = {(r.name, r.type, r.snapshot_id)
            for r in iceberg_meta_df(spark, it, "refs").collect()}
    assert ("v1", "tag", 1) in refs and ("main", "branch", 2) in refs
    hist = {r.snapshot_id: r.is_current_ancestor
            for r in iceberg_meta_df(spark, it, "history").collect()}
    assert hist == {1: True, 2: True}
    files = iceberg_meta_df(spark, it, "files").collect()
    assert len(files) == 2
    assert all(r.record_count == 1 for r in files)

    dt = str(tmp_path / "dmeta")
    write_delta_lite(
        spark.createDataFrame([(1, "a")], "id long, v string"), dt
    )
    write_delta_lite(
        spark.createDataFrame([(2, "b")], "id long, v string"),
        dt, mode="append",
    )
    h = delta_meta_df(spark, dt, "history").collect()
    assert [r.version for r in h] == [0, 1]
    assert all(r.operation == "WRITE" and r.num_added_files >= 1 for r in h)
    f = delta_meta_df(spark, dt, "files").collect()
    assert len(f) == 2 and all(not r.has_deletion_vector for r in f)

    # URI surface
    run_pipeline(
        spark,
        sources=[f"m+iceberg://{it}?meta=snapshots"],
        sinks=["m+memory://imeta_snaps"],
    )
    assert spark.table("imeta_snaps").count() == 2
    run_pipeline(
        spark,
        sources=[f"m+delta://{dt}?meta=history"],
        sinks=["m+memory://dmeta_hist"],
    )
    assert spark.table("dmeta_hist").count() == 2
    # hudi: timeline + live file-slice inventory
    from spark_etl_cli_spark.sources.hudi_lite import write_hudi_lite
    from spark_etl_cli_spark.sources.meta_tables import hudi_meta_df

    ht = str(tmp_path / "hmeta")
    write_hudi_lite(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        ht, record_key="id", table_type="MERGE_ON_READ",
    )
    write_hudi_lite(
        spark.createDataFrame([(1, "a2")], "id long, v string"),
        ht, mode="upsert", record_key="id",
    )
    tl = hudi_meta_df(spark, ht, "timeline").collect()
    assert [r.action for r in tl] == ["deltacommit", "deltacommit"]
    fs = hudi_meta_df(spark, ht, "files").collect()
    assert len(fs) >= 1 and any(r.num_log_files == 1 for r in fs)
    run_pipeline(
        spark,
        sources=[f"m+hudi://{ht}?meta=timeline"],
        sinks=["m+memory://hmeta_tl"],
    )
    assert spark.table("hmeta_tl").count() == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="meta"):
        iceberg_meta_df(spark, it, "bogus")
    with _pytest.raises(ValueError, match="meta"):
        hudi_meta_df(spark, ht, "bogus")
