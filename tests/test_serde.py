"""Kafka serde unit tests: conf harvest, registry subject/auth, wire format.

No broker or avro jar in the container, so registry fetches and
from_avro/to_avro are monkeypatched; what IS tested for real is the
logic the round-1 review flagged: the subject string built from the
topic, Basic-auth header propagation, session-conf harvesting
(reference ``KafkaDataFrameSource.scala:20-23``), and the Confluent
5-byte frame header on serialize.
"""

from __future__ import annotations

import base64
import io
import json

import pytest
from pyspark.sql import functions as F

import spark_etl_cli_spark.streaming.serde as serde_mod
from spark_etl_cli_spark.streaming.serde import (
    deserialize_values,
    harvest_serde_conf,
    resolve_serde,
    serialize_values,
)

REG_CONFS = [
    "spark.kafka.schema.registry.url",
    "spark.kafka.schema.registry.basic.auth.user.info",
    "spark.kafka.schema.file.path",
    "spark.kafka.schema.resource.path",
]


@pytest.fixture
def clean_confs(spark):
    yield
    for key in REG_CONFS:
        spark.conf.unset(key)


def test_harvest_strips_spark_kafka_prefix(spark, clean_confs):
    spark.conf.set("spark.kafka.schema.registry.url", "http://reg:8081")
    spark.conf.set(
        "spark.kafka.schema.registry.basic.auth.user.info", "user:pw"
    )
    conf = harvest_serde_conf(spark)
    assert conf["schema.registry.url"] == "http://reg:8081"
    assert conf["schema.registry.basic.auth.user.info"] == "user:pw"


def test_resolve_bare_avro_prefers_registry(spark, clean_confs):
    spark.conf.set("spark.kafka.schema.registry.url", "http://reg:8081")
    assert resolve_serde(spark, "avro") == "avro-registry:http://reg:8081"
    # explicit spec always wins
    assert resolve_serde(spark, "avro:/tmp/x.avsc") == "avro:/tmp/x.avsc"
    assert resolve_serde(spark, "json") == "json"


def test_resolve_bare_avro_falls_back_to_file_conf(spark, clean_confs, tmp_path):
    schema_file = tmp_path / "s.avsc"
    schema_file.write_text('{"type": "string"}')
    spark.conf.set("spark.kafka.schema.file.path", str(schema_file))
    assert resolve_serde(spark, "avro") == f"avro:{schema_file}"


def test_resolve_resource_path_reads_schema_inline(spark, clean_confs, tmp_path):
    schema_file = tmp_path / "r.avsc"
    schema_file.write_text('{"type": "int"}')
    spark.conf.set("spark.kafka.schema.resource.path", str(schema_file))
    assert resolve_serde(spark, "avro") == 'avro:{"type": "int"}'


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_registry_fetch_builds_subject_url_and_auth(monkeypatch):
    seen = {}

    def fake_urlopen(req):
        seen["url"] = req.full_url
        seen["auth"] = req.get_header("Authorization")
        return _FakeResponse(
            json.dumps({"id": 7, "schema": '{"type": "string"}'}).encode()
        )

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    sid, schema = serde_mod._registry_fetch_latest(
        "http://reg:8081", "events-value", auth="user:pw"
    )
    assert sid == 7 and schema == '{"type": "string"}'
    assert seen["url"] == "http://reg:8081/subjects/events-value/versions/latest"
    expected = "Basic " + base64.b64encode(b"user:pw").decode()
    assert seen["auth"] == expected


def test_registry_fetch_honors_url_userinfo(monkeypatch):
    seen = {}

    def fake_urlopen(req):
        seen["url"] = req.full_url
        seen["auth"] = req.get_header("Authorization")
        return _FakeResponse(json.dumps({"id": 1, "schema": "{}"}).encode())

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    serde_mod._registry_fetch_latest("http://u:p@reg:8081/", "t-value")
    assert seen["url"] == "http://reg:8081/subjects/t-value/versions/latest"
    assert seen["auth"] == "Basic " + base64.b64encode(b"u:p").decode()


def test_deserialize_registry_uses_topic_subject(spark, monkeypatch):
    """Round-1 bug: the kafka source called deserialize_values without
    topic=, producing subject 'None-value'. Locks the fix in."""
    seen = {}

    def fake_fetch(url, subject, auth=None):
        seen["subject"] = subject
        seen["url"] = url
        return 3, '{"type": "record"}'

    monkeypatch.setattr(serde_mod, "_registry_fetch_latest", fake_fetch)
    monkeypatch.setattr(serde_mod, "_avro_functions_usable", lambda s: True)
    import pyspark.sql.avro.functions as avro_fns

    monkeypatch.setattr(
        avro_fns,
        "from_avro",
        lambda col, schema: F.struct(F.lit(1).alias("a")),
    )
    raw = spark.createDataFrame([(b"\x00\x00\x00\x00\x03xx",)], "value binary")
    out = deserialize_values(
        spark, raw, "avro-registry:http://reg:8081", topic="events"
    )
    assert seen["subject"] == "events-value"
    assert out.collect()[0].a == 1


def test_serialize_registry_prepends_confluent_header(spark, monkeypatch):
    monkeypatch.setattr(
        serde_mod,
        "_registry_fetch_latest",
        lambda url, subject, auth=None: (7, '{"type": "record"}'),
    )
    monkeypatch.setattr(serde_mod, "_avro_functions_usable", lambda s: True)
    import pyspark.sql.avro.functions as avro_fns

    monkeypatch.setattr(
        avro_fns, "to_avro", lambda col, schema: F.lit(b"PAYLOAD")
    )
    df = spark.createDataFrame([(1,)], "x int")
    out = serialize_values(df, "avro-registry:http://reg:8081", topic="t")
    value = bytes(out.collect()[0].value)
    assert value == bytes([0, 0, 0, 0, 7]) + b"PAYLOAD"


def test_json_serde_roundtrip_unchanged(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    ser = serialize_values(df, "json")
    row = ser.collect()[0]
    assert json.loads(row.value) == {"id": 1, "name": "a"}


def test_schemaless_json_inference_stays_jvm_side(spark):
    # schema inference must use the JVM Dataset[String] overload (no
    # Python-worker round-trip); the .rdd hop exists only as a Spark
    # Connect fallback inside _read_json_dataset's except branch.
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.streaming.serde import (
        _read_json_dataset,
        deserialize_values,
    )

    raw = spark.createDataFrame(
        [(b'{"k": 1, "s": "x"}',), (b'{"k": 2, "t": true}',)], ["value"]
    )
    out = deserialize_values(spark, raw, "json")
    assert set(out.columns) == {"k", "s", "t"}
    assert out.count() == 2

    # the fast path itself (not the fallback) must work in classic mode
    strings = raw.select(F.col("value").cast("string").alias("json"))
    jvm = spark._jvm
    ds = getattr(strings._jdf, "as")(jvm.org.apache.spark.sql.Encoders.STRING())
    assert spark._jsparkSession.read().json(ds).count() == 2
    # and the helper's physical plan must not contain a Python scan node
    plan = _read_json_dataset(spark, strings)._jdf.queryExecution().executedPlan().toString()
    assert "PythonRDD" not in plan and "EvalPython" not in plan


# ---------------------------------------------------------------------------
# jar-less avro serde (avro_lite fallback) — byte-level, not just unit-level
# ---------------------------------------------------------------------------

_WIRE_SCHEMA = (
    '{"type": "record", "name": "m", "fields": ['
    '{"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}'
)
# Confluent wire format fixture: magic 0x00 + schema id 42 (big-endian
# int32) + avro body for {a: 27, b: "foo"} per the Avro spec's own
# example encoding (zigzag 27 = 0x36; "foo" = len 3 -> 0x06 + bytes)
_WIRE_FIXTURE = b"\x00\x00\x00\x00\x2a" + b"\x36\x06foo"


def test_avro_serde_golden_wire_bytes_deserialize(spark, monkeypatch):
    monkeypatch.setattr(
        serde_mod,
        "_registry_fetch_latest",
        lambda url, subject, auth=None: (42, _WIRE_SCHEMA),
    )
    raw = spark.createDataFrame([(_WIRE_FIXTURE,)], "value binary")
    out = deserialize_values(
        spark, raw, "avro-registry:http://reg:8081", topic="t"
    )
    row = out.collect()[0]
    assert (row.a, row.b) == (27, "foo")


def test_avro_serde_golden_wire_bytes_serialize(spark, monkeypatch):
    monkeypatch.setattr(
        serde_mod,
        "_registry_fetch_latest",
        lambda url, subject, auth=None: (42, _WIRE_SCHEMA),
    )
    df = spark.createDataFrame([(27, "foo")], "a long, b string")
    # non-null schema from the registry: encode exactly per fixture
    out = serialize_values(df, "avro-registry:http://reg:8081", topic="t")
    assert bytes(out.collect()[0].value) == _WIRE_FIXTURE


def test_avro_serde_roundtrip_without_jar(spark):
    # explicit-schema avro:<schema> serde, full loop through the
    # fallback encoder and decoder (nullable fields included)
    schema = (
        '{"type": "record", "name": "ev", "fields": ['
        '{"name": "id", "type": ["null", "long"]},'
        '{"name": "name", "type": ["null", "string"]},'
        '{"name": "score", "type": ["null", "double"]}]}'
    )
    df = spark.createDataFrame(
        [(1, "x", 0.5), (2, None, None)], "id long, name string, score double"
    )
    enc = serialize_values(df, f"avro:{schema}")
    assert enc.columns == ["value"]
    back = deserialize_values(spark, enc, f"avro:{schema}")
    rows = {r.id: r for r in back.collect()}
    assert rows[1].name == "x" and rows[1].score == 0.5
    assert rows[2].name is None and rows[2].score is None


def test_avro_serde_null_value_tombstone(spark):
    # kafka tombstones (null value) must decode like the jar-backed
    # from_avro path (null struct -> null fields) — not crash on
    # bytes(None). The two serde codepaths must agree on this input.
    schema = (
        '{"type": "record", "name": "ev", "fields": ['
        '{"name": "id", "type": ["null", "long"]},'
        '{"name": "name", "type": ["null", "string"]}]}'
    )
    df = spark.createDataFrame([(1, "x")], "id long, name string")
    enc_rows = serialize_values(df, f"avro:{schema}").collect()
    raw = spark.createDataFrame(
        [(bytes(enc_rows[0].value),), (None,)], "value binary"
    )
    from spark_etl_cli_spark.streaming.serde import _avro_decode_lite

    rows = _avro_decode_lite(raw, schema).collect()
    assert len(rows) == 2
    assert {(r.id, r.name) for r in rows} == {(1, "x"), (None, None)}


def test_avro_serde_roundtrip_arrays_without_jar(spark):
    # array columns arrive in the encode UDF as numpy arrays — the
    # NaN-cleaning step must not trip over them
    schema = (
        '{"type": "record", "name": "v", "fields": ['
        '{"name": "id", "type": ["null", "long"]},'
        '{"name": "xs", "type": ["null", {"type": "array", '
        '"items": ["null", "double"]}]}]}'
    )
    df = spark.createDataFrame(
        [(1, [0.5, 1.5]), (2, None)], "id long, xs array<double>"
    )
    enc = serialize_values(df, f"avro:{schema}")
    back = deserialize_values(spark, enc, f"avro:{schema}")
    rows = {r.id: r.xs for r in back.collect()}
    assert rows[1] == [0.5, 1.5] and rows[2] is None
