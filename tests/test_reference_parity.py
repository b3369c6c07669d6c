"""Replicas of the reference's OWN two end-to-end tests (ETLTest.scala),
run through this engine's pipeline with the same fixtures (FIXTURES.md §A).

- Test 1 (ETLTest.scala:92-128): five Person JSON payloads arrive as
  Kafka-shaped (key, value-bytes) rows, pass through the schemaless
  json serde, and are diffed against the expected inline values table
  with ``handleDifferences=filter`` — the pipeline output must be EMPTY
  (correctness expressed inside the pipeline). No broker here: the
  serde sees exactly the frame Kafka would deliver.
- Test 2 (ETLTest.scala:129-273): streaming interval join
  ``bossSince BETWEEN employeeSince AND employeeSince + INTERVAL 1000
  seconds`` with watermarks on both sides; asserts the joined row set
  and that exactly one employee (the highest id) has no boss
  (ETLTest.scala:251-261). File streams replace Kafka/Avro containers;
  availableNow replaces the 100 ms trigger polling loop.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import Row

from spark_etl_cli_spark.pipeline import run_pipeline

PEOPLE = [
    (1, "Alice", 30),
    (2, "Bob", 25),
    (3, "Charlie", 35),
    (4, "Dave", 40),
    (5, "Eve", 22),
]


def test_reference_batch_roundtrip_selfchecking_diff(spark):
    # Kafka-shaped frame: value carries the JSON payload bytes
    kafka_like = spark.createDataFrame(
        [
            (None, bytearray(f'{{"id":{i},"name":"{n}","age":{a}}}'.encode()))
            for i, n, a in PEOPLE
        ],
        "key binary, value binary",
    )
    from spark_etl_cli_spark.streaming.serde import deserialize_values

    typed = deserialize_values(spark, kafka_like, "json")
    typed.createOrReplaceTempView("people_actual")

    values_uri = (
        "expected+values://?header=id:long,name,age:long&values="
        + ";".join(f"{i},{n},{a}" for i, n, a in PEOPLE)
    )
    run_pipeline(
        spark,
        sources=["people_actual+view://people_actual", values_uri],
        transforms=[
            "people_actual+checked+diff://expected?id=id&handleDifferences=filter"
        ],
        sinks=["checked+memory://ref_t1_out"],
    )
    # reference assertion: the filtered diff is empty (ETLTest.scala:119-127)
    assert spark.table("ref_t1_out").count() == 0


BASE = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)


def _ts(offset_s: int) -> datetime:
    return datetime.fromtimestamp(BASE.timestamp() + offset_s, tz=timezone.utc)


@pytest.mark.slow
def test_reference_streaming_interval_join(spark, tmp_path):
    # employee i: employeeSince = base-1000s+10s*i; boss rows for all but
    # the highest id: bossSince = base-100s+10s*i  (FIXTURES.md §A)
    employees = [
        Row(id=i, name=f"emp{i}", bossId=(i + 1 if i < 5 else None),
            employeeSince=_ts(-1000 + 10 * i))
        for i in range(1, 6)
    ]
    bosses = [
        Row(employeeId=i, bossId=i + 1, bossSince=_ts(-100 + 10 * i))
        for i in range(1, 5)
    ]
    emp_dir, boss_dir = f"{tmp_path}/emp", f"{tmp_path}/boss"
    spark.createDataFrame(employees).write.parquet(emp_dir)
    spark.createDataFrame(bosses).write.parquet(boss_dir)

    out = f"{tmp_path}/joined"
    emp_schema = ("id BIGINT, name STRING, bossId BIGINT, "
                  "employeeSince TIMESTAMP")
    boss_schema = "employeeId BIGINT, bossId BIGINT, bossSince TIMESTAMP"
    run_pipeline(
        spark,
        sources=[
            f"emp+parquet-stream://{emp_dir}?schema={emp_schema}"
            "&watermark=employeeSince:1000 seconds",
            f"boss+parquet-stream://{boss_dir}?schema={boss_schema}"
            "&watermark=bossSince:1000 seconds",
        ],
        transforms=[
            "emp+joined+sql://SELECT e.id, e.name, br.bossId, br.bossSince "
            "FROM emp e JOIN boss br ON e.id = br.employeeId "
            "AND br.bossSince BETWEEN e.employeeSince "
            "AND e.employeeSince + INTERVAL 1000 seconds"
        ],
        sinks=[
            f"joined+parquet-stream://{out}?checkpointLocation={tmp_path}/ck"
            "&trigger-interval=availableNow"
        ],
    )
    for q in spark.streams.active:
        q.awaitTermination(60)

    joined = spark.read.parquet(out)
    got = {(r.id, r.bossId) for r in joined.collect()}
    # reference assertion 1: every employee with a boss relation joins
    assert got == {(i, i + 1) for i in range(1, 5)}
    # reference assertion 2: exactly 1 employee has no boss (ETLTest.scala:251-261)
    all_ids = {e.id for e in employees}
    assert len(all_ids - {i for i, _ in got}) == 1
