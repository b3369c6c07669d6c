"""Table-maintenance operators: changelog merge, gap fill, expectations —
both the Python API (operators/maintenance.py) and the URI transforms."""

import datetime

import pytest
from pyspark.sql import Row

from spark_etl_cli_spark.operators.maintenance import (
    expectations,
    gap_fill,
    merge_changelog,
)
from spark_etl_cli_spark.pipeline import run_pipeline


def test_merge_changelog_upsert_delete_insert(spark):
    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v="b2", seq=1, op="U"),   # update (stale)
            Row(k=2, v="b3", seq=2, op="U"),   # update (winner)
            Row(k=3, v=None, seq=1, op="D"),   # delete
            Row(k=4, v="d", seq=1, op="I"),    # insert (any non-delete op)
        ]
    )
    out = merge_changelog(base, changes, ["k"], "seq", op_col="op")
    got = {r.k: (r.v, r.src) for r in out.collect()}
    assert got == {1: ("a", "base"), 2: ("b3", "change"), 4: ("d", "change")}


def test_merge_changelog_composite_seq_tiebreak(spark):
    base = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame(
        [Row(k=1, v="x", ts=5, sub=1, op="U"), Row(k=1, v="y", ts=5, sub=2, op="U")]
    )
    out = merge_changelog(base, changes, ["k"], ["ts", "sub"], op_col="op")
    assert out.collect()[0].v == "y"


def test_merge_changelog_missing_value_col_raises(spark):
    base = spark.createDataFrame([Row(k=1, v="a")])
    changes = spark.createDataFrame([Row(k=1, w="x", seq=1)])
    with pytest.raises(ValueError, match="missing changelog value columns"):
        merge_changelog(base, changes, ["k"], "seq")


def test_gap_fill_densifies_and_ffills(spark):
    d = datetime.date
    df = spark.createDataFrame(
        [
            Row(k="a", day=d(2024, 1, 1), v=1.0),
            Row(k="a", day=d(2024, 1, 4), v=4.0),
            Row(k="b", day=d(2024, 1, 2), v=2.0),
        ]
    )
    out = gap_fill(df, ["k"], "day", ["v"]).orderBy("k", "day").collect()
    assert [(r.k, r.day.day, r.v, r.v_filled) for r in out] == [
        ("a", 1, 1.0, 1.0),
        ("a", 2, None, 1.0),
        ("a", 3, None, 1.0),
        ("a", 4, 4.0, 4.0),
        ("b", 2, 2.0, 2.0),
    ]


def test_expectations_counts_violations(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, status="O", amount=10.0, ref=1),
            Row(id=1, status="X", amount=-5.0, ref=2),
            Row(id=2, status=None, amount=None, ref=None),
        ]
    )
    parent = spark.createDataFrame([Row(pid=1)])
    out = expectations(
        df,
        not_null=["status"],
        unique=[["id"]],
        accepted={"status": ["O", "F"]},
        positive=["amount"],
        foreign_keys=[("ref", parent, "pid")],
    )
    got = {r.check: r.violations for r in out.collect()}
    assert got == {
        "not_null:status": 1,
        "accepted:status": 2,   # 'X' and NULL
        "positive:amount": 2,   # -5.0 and NULL
        "unique:id": 1,         # one extra row for id=1
        "fk:ref->pid": 1,       # ref=2 orphan (NULL ref not counted)
    }


def test_merge_and_expect_uri_transforms(spark):
    spark.createDataFrame([Row(k=1, v="a"), Row(k=2, v="b")]).createOrReplaceTempView(
        "mt_base"
    )
    spark.createDataFrame(
        [Row(k=2, v="b2", seq=1, op="U"), Row(k=1, v=None, seq=1, op="D")]
    ).createOrReplaceTempView("mt_changes")
    run_pipeline(
        spark,
        sources=["mt_base+view://mt_base"],
        transforms=["mt_base+mt_merged+merge://mt_changes?keys=k&seq-col=seq&op-col=op"],
        sinks=["mt_merged+memory://mt_out"],
    )
    assert {(r.k, r.v) for r in spark.table("mt_out").collect()} == {(2, "b2")}

    run_pipeline(
        spark,
        sources=["mt_base+view://mt_base"],
        transforms=["mt_base+mt_audit+expect://?not-null=v&unique=k"],
        sinks=["mt_audit+memory://mt_audit_out"],
    )
    audit = {r.check: r.violations for r in spark.table("mt_audit_out").collect()}
    assert audit == {"not_null:v": 0, "unique:k": 0}


def test_expect_fail_mode_raises(spark):
    spark.createDataFrame([Row(k=1), Row(k=1)]).createOrReplaceTempView("mt_dup")
    with pytest.raises(ValueError, match="expectations failed"):
        run_pipeline(
            spark,
            sources=["mt_dup+view://mt_dup"],
            transforms=["mt_dup+mt_a+expect://?unique=k&mode=fail"],
            sinks=["mt_a+memory://mt_a_out"],
        )


def test_gapfill_uri_transform(spark):
    d = datetime.date
    spark.createDataFrame(
        [Row(k="a", day=d(2024, 1, 1), v=1.0), Row(k="a", day=d(2024, 1, 3), v=3.0)]
    ).createOrReplaceTempView("mt_series")
    run_pipeline(
        spark,
        sources=["mt_series+view://mt_series"],
        transforms=["mt_series+mt_dense+gapfill://?keys=k&date-col=day&value-cols=v"],
        sinks=["mt_dense+memory://mt_dense_out"],
    )
    assert spark.table("mt_dense_out").count() == 3
