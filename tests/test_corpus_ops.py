"""Unit tests for corpus-curation operators (clustering, sampling)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_connected_components_chain_and_pair(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    from spark_etl_cli_spark.operators.dedup import connected_components

    got = {
        (r["id"], r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_connected_components_merges_via_bridge(spark):
    # two clusters joined by a bridge edge collapse to one component
    edges = spark.createDataFrame(
        [(5, 6), (6, 7), (20, 21), (7, 20)], ["src", "dst"]
    )
    from spark_etl_cli_spark.operators.dedup import connected_components

    comps = connected_components(edges)
    assert comps.select("component").distinct().count() == 1
    assert comps.agg(F.min("component")).first()[0] == 5


def test_quantize_zero_vector_guard(spark):
    from spark_etl_cli_spark.plans.vectorops import q64_vector_quantize

    df = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, -0.5], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    df.createOrReplaceTempView("_tmp_emb")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    quant = F.transform(
        F.col("embedding"),
        lambda v: F.when(F.col("maxabs") == 0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / F.col("maxabs") * 127).cast("int")
        ),
    )
    rows = {
        r["vec_id"]: r["q"]
        for r in df.withColumn("maxabs", maxabs)
        .select("vec_id", quant.alias("q"))
        .collect()
    }
    assert rows[0] == [0, 0]
    assert rows[1] == [127, -64]  # floor(-0.5*127) = -64


def test_stratified_sample_rates(spark):
    """Hash sampling keeps ~rate% per source and is deterministic."""
    from spark_etl_cli_spark.plans.corpusops import q48_stratified_sample

    a = q48_stratified_sample(spark, "/root/testdata/sf0.001")
    b = q48_stratified_sample(spark, "/root/testdata/sf0.001")
    ra = {(r["doc_id"], r["bucket"]) for r in a.collect()}
    rb = {(r["doc_id"], r["bucket"]) for r in b.collect()}
    assert ra == rb
    assert all(0 <= bkt < 100 for _, bkt in ra)


def test_quality_filter_and_sample_transforms(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    _, qf = resolve_transform("quality-filter://?min-tokens=5&max-punct=0.3")
    kept = qf(spark, docs)
    assert 0 < kept.count() <= docs.count()

    _, smp = resolve_transform("sample://?rate=20&id-col=doc_id")
    sampled = smp(spark, docs)
    n, total = sampled.count(), docs.count()
    assert 0 < n < total
    # deterministic: second run identical
    assert smp(spark, docs).count() == n


def test_pii_scrub_transform(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    df = spark.createDataFrame(
        [(1, "mail me at bob@example.com or +1-555-0199 ok")],
        ["id", "text"],
    )
    _, scrub = resolve_transform("pii-scrub://")
    out = scrub(spark, df).first()["text"]
    assert out == "mail me at [EMAIL] or [PHONE] ok"


def test_sessionize_transform_gap(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    df = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (1, 10000, "c"), (2, 100, "d")],
        ["user_id", "ts", "event_id"],
    )
    _, sess = resolve_transform("sessionize://?key=user_id&ts-col=ts&gap=600&order=event_id")
    out = {r["event_id"]: r["session_id"] for r in sess(spark, df).collect()}
    assert out["a"] == out["b"]          # within gap
    assert out["a"] != out["c"]          # beyond gap -> new session
    assert out["d"].startswith("2-")     # per-key sessions


def test_vocab_encode_order_unk_and_empty(spark):
    from pyspark.sql import Row

    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.encoding import vocab_encode

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="red blue red green"),
            Row(doc_id=2, text="   "),
            Row(doc_id=3, text="BLUE red"),
        ]
    )
    vocab = spark.createDataFrame(
        [Row(token="red", token_id=0), Row(token="blue", token_id=1)]
    )
    out = {r.doc_id: r for r in vocab_encode(docs, vocab).collect()}
    assert out[1].token_ids == [0, 1, 0, -1]   # green -> unk, order kept
    assert out[1].n_tokens == 4 and out[1].n_unk == 1
    assert out[2].token_ids == [] and out[2].n_tokens == 0
    assert out[3].token_ids == [1, 0]          # lower-cased before lookup


def test_resize_images_payload_roundtrip(spark):
    from spark_etl_cli_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"imgbytes")), (2, bytearray(b""))],
        "id long, raw binary",
    )
    media = attach_binary_payload(df, "id", "image", "raw")
    out = {r.media_id: r for r in resize_images(media, 224, 224, fake=True).collect()}
    assert bytes(out[1].payload) == b"RSZ0" + (224).to_bytes(4, "big") * 2 + b"imgbytes"
    assert out[1].width == 224 and out[2].height == 224
    assert bytes(out[2].payload).endswith((224).to_bytes(4, "big"))


def test_decode_audio_features_deterministic(spark):
    from spark_etl_cli_spark.operators.multimodal import (
        attach_binary_payload,
        decode_audio_features,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"clip-a")), (2, bytearray(b"clip-a")), (3, bytearray(b"clip-b"))],
        "id long, raw binary",
    )
    media = attach_binary_payload(df, "id", "audio", "raw")
    out = {r.media_id: r for r in decode_audio_features(media, fake=True).collect()}
    # identical payloads -> identical features; valid ranges
    assert (out[1].sample_rate, out[1].duration_s, out[1].rms) == (
        out[2].sample_rate, out[2].duration_s, out[2].rms,
    )
    assert out[3].n_bytes == 6
    assert out[1].sample_rate in (8000, 16000, 22050, 44100)
    assert 0.0 <= out[1].rms <= 1.0
