"""North-star operators exposed as URI transforms (dedup/asof/
text-metrics/similarity) and the kafka serde expressions."""

from pyspark.sql import Row

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.streaming.serde import deserialize_values, serialize_values


def test_dedup_transform_exact(spark):
    spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="A  b C"), Row(doc_id=3, text="x")]
    ).createOrReplaceTempView("nd_docs")
    run_pipeline(
        spark,
        sources=["nd_docs+view://nd_docs"],
        transforms=["nd_docs+nd_out+dedup://?mode=exact"],
        sinks=["nd_out+memory://nd_exact"],
    )
    assert sorted(r.doc_id for r in spark.table("nd_exact").collect()) == [1, 3]


def test_asof_transform(spark):
    spark.createDataFrame(
        [Row(k="a", ts=10, px=1.0), Row(k="a", ts=20, px=2.0)]
    ).createOrReplaceTempView("nd_quotes")
    spark.createDataFrame(
        [Row(k="a", ts=15, qty=5)]
    ).createOrReplaceTempView("nd_trades")
    run_pipeline(
        spark,
        sources=["nd_trades+view://nd_trades"],
        transforms=[
            "nd_trades+nd_joined+asof://nd_quotes?key=k&left-ts=ts&right-ts=ts&payload=px"
        ],
        sinks=["nd_joined+memory://nd_asof"],
    )
    assert spark.table("nd_asof").collect()[0].px == 1.0


def test_text_metrics_transform(spark):
    spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox and the dog")]
    ).createOrReplaceTempView("nd_tm_docs")
    run_pipeline(
        spark,
        sources=["nd_tm_docs+view://nd_tm_docs"],
        transforms=["nd_tm_docs+nd_tm+text-metrics://"],
        sinks=["nd_tm+memory://nd_metrics"],
    )
    r = spark.table("nd_metrics").collect()[0]
    assert r.token_count == 7 and r.lang_id == "en" and len(r.fingerprint) == 32
    assert 0.0 <= r.quality_score <= 1.0


def test_similarity_transform(spark):
    spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1]),
            Row(vec_id=3, embedding=[0.0, 1.0]),
        ]
    ).createOrReplaceTempView("nd_vecs")
    spark.sql("SELECT * FROM nd_vecs WHERE vec_id = 1").createOrReplaceTempView("nd_qs")
    run_pipeline(
        spark,
        sources=["nd_vecs+view://nd_vecs"],
        transforms=["nd_vecs+nd_nn+similarity://nd_qs?k=1"],
        sinks=["nd_nn+memory://nd_sim"],
    )
    rows = spark.table("nd_sim").collect()
    assert len(rows) == 1 and rows[0].neighbor_id == 2


def test_json_serde_round_trip(spark):
    df = spark.createDataFrame([Row(id=1, name="ann"), Row(id=2, name="bo")])
    wire = serialize_values(df, "json")
    assert wire.columns == ["value"]
    back = deserialize_values(
        spark, wire, "json:id BIGINT, name STRING"
    )
    got = sorted((r.id, r.name) for r in back.collect())
    assert got == [(1, "ann"), (2, "bo")]


def test_json_serde_schemaless_inference(spark):
    df = spark.createDataFrame([Row(id=1, name="ann")])
    wire = serialize_values(df, "json")
    back = deserialize_values(spark, wire, "json")
    assert sorted(back.columns) == ["id", "name"]
    assert back.collect()[0].name == "ann"


def test_none_serde_passthrough(spark):
    df = spark.createDataFrame([Row(value=bytearray(b"raw"))])
    assert serialize_values(df, "none") is df
    assert deserialize_values(spark, df, "none") is df


def test_chunk_and_pack_transforms(spark, tmp_path):
    from spark_etl_cli_spark.pipeline import run_pipeline

    run_pipeline(
        spark,
        sources=[
            "d+values://?header=doc_id:long,text,source"
            "&values=1,alpha beta gamma delta epsilon,s1;"
            "2,one two three,s1;3,single,s2"
        ],
        transforms=[
            "d+c+chunk://?chunk-tokens=3&stride=2",
            "d+p+pack://?seq-tokens=4",
        ],
        sinks=[],
    )
    chunks = {
        (r["doc_id"], r["chunk_idx"]): r["chunk_text"]
        for r in spark.table("c").collect()
    }
    # doc 1: 5 tokens, windows @0 and @2 (ceil((5-3)/2)=1 -> idx 0..1)
    assert chunks[(1, 0)] == "alpha beta gamma"
    assert chunks[(1, 1)] == "gamma delta epsilon"
    assert chunks[(3, 0)] == "single"

    packed = {r["doc_id"]: r["seq_id"] for r in spark.table("p").collect()}
    # s1: doc1 (5 tokens) fills seq 0 past capacity; doc2 starts at
    # cum-ntok=5 -> seq 1. s2 packs independently from zero.
    assert packed[1] == 0 and packed[2] == 1 and packed[3] == 0


def test_confluent_header_strip_expression(spark):
    """The 5-byte Confluent wire prefix (magic 0x00 + 4-byte schema id)
    is removed by the same substring expression avro-registry uses —
    testable without the spark-avro jar."""
    from pyspark.sql import functions as F

    payload = b"\x00\x00\x00\x00\x07avro-body"
    df = spark.createDataFrame([(payload,)], "value binary")
    out = df.select(
        F.expr("substring(value, 6, length(value) - 5)").alias("v")
    ).collect()
    assert bytes(out[0]["v"]) == b"avro-body"


def test_registry_fetch_latest_rest_contract():
    """_registry_fetch_latest speaks the Schema Registry REST protocol
    (GET /subjects/<topic>-value/versions/latest) — served locally."""
    import http.server
    import json as _json
    import threading

    from spark_etl_cli_spark.streaming.serde import _registry_fetch_latest

    schema = '{"type":"record","name":"r","fields":[{"name":"a","type":"long"}]}'

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            assert self.path == "/subjects/t1-value/versions/latest"
            body = _json.dumps({"id": 7, "version": 3, "schema": schema})
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sid, got = _registry_fetch_latest(
            f"http://127.0.0.1:{srv.server_port}", "t1-value"
        )
        assert sid == 7 and got == schema
    finally:
        srv.shutdown()


def test_funnel_transform(spark):
    from datetime import datetime as DT

    spark.createDataFrame(
        [
            Row(user_id=1, event_type="view", ts=DT(2024, 1, 1, 10)),
            Row(user_id=1, event_type="click", ts=DT(2024, 1, 1, 11)),
            Row(user_id=1, event_type="purchase", ts=DT(2024, 1, 1, 12)),
            # user 2 clicked BEFORE viewing: not an ordered conversion
            Row(user_id=2, event_type="click", ts=DT(2024, 1, 1, 9)),
            Row(user_id=2, event_type="view", ts=DT(2024, 1, 1, 10)),
        ]
    ).createOrReplaceTempView("nd_ev")
    run_pipeline(
        spark,
        sources=["nd_ev+view://nd_ev"],
        transforms=["nd_ev+nd_fn+funnel://?steps=view,click,purchase"],
        sinks=["nd_fn+memory://nd_funnel"],
    )
    out = {r.step: r.n_users for r in spark.table("nd_funnel").collect()}
    assert out == {"view": 2, "click": 1, "purchase": 1}


def test_retention_transform(spark):
    from datetime import datetime as DT

    spark.createDataFrame(
        [
            Row(user_id=1, ts=DT(2024, 1, 1)),   # Monday — cohort week
            Row(user_id=1, ts=DT(2024, 1, 10)),  # next week → offset 1
            Row(user_id=2, ts=DT(2024, 1, 3)),   # same cohort week
        ]
    ).createOrReplaceTempView("nd_ret_ev")
    run_pipeline(
        spark,
        sources=["nd_ret_ev+view://nd_ret_ev"],
        transforms=["nd_ret_ev+nd_rt+retention://"],
        sinks=["nd_rt+memory://nd_ret"],
    )
    rows = {
        (r.cohort_week.isoformat(), r.week_offset): r.n_active
        for r in spark.table("nd_ret").collect()
    }
    assert rows == {("2024-01-01", 0): 2, ("2024-01-01", 1): 1}


def test_dedup_transform_semdedup(spark):
    spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            Row(vec_id=2, embedding=[0.99, 0.01]),
        ]
    ).createOrReplaceTempView("nd_vecs")
    run_pipeline(
        spark,
        sources=["nd_vecs+view://nd_vecs"],
        transforms=["nd_vecs+nd_sd+dedup://?mode=semdedup&threshold=0.9&clusters=2"],
        sinks=["nd_sd+memory://nd_semdedup"],
    )
    out = {r.id: r.is_dup for r in spark.table("nd_semdedup").collect()}
    assert out == {0: False, 1: False, 2: True}


def test_transitions_transform(spark):
    spark.createDataFrame(
        [
            Row(user_id=1, event_type="a", ts=1),
            Row(user_id=1, event_type="b", ts=2),
            Row(user_id=1, event_type="a", ts=3),
            Row(user_id=2, event_type="a", ts=1),
            Row(user_id=2, event_type="a", ts=2),
        ]
    ).createOrReplaceTempView("nd_tr_ev")
    run_pipeline(
        spark,
        sources=["nd_tr_ev+view://nd_tr_ev"],
        transforms=["nd_tr_ev+nd_tm+transitions://"],
        sinks=["nd_tm+memory://nd_trans"],
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in spark.table("nd_trans").collect()
    }
    # from 'a': a->b once, a->a once (prob 0.5 each); from 'b': b->a once
    assert got[("a", "b")] == (1, 0.5)
    assert got[("a", "a")] == (1, 0.5)
    assert got[("b", "a")] == (1, 1.0)


def test_cap_transform(spark):
    spark.createDataFrame(
        [Row(g="a", id=i, q=i) for i in range(5)] + [Row(g="b", id=9, q=0)]
    ).createOrReplaceTempView("cur_docs")
    run_pipeline(
        spark,
        sources=["cur_docs+view://cur_docs"],
        transforms=["cur_docs+cur_out+cap://?by=g&n=2&order=q:desc,id"],
        sinks=["cur_out+memory://cur_capped"],
    )
    rows = {(r.g, r.id) for r in spark.table("cur_capped").collect()}
    assert rows == {("a", 4), ("a", 3), ("b", 9)}


def test_split_transform(spark):
    spark.createDataFrame(
        [Row(doc_id=i) for i in range(100)]
    ).createOrReplaceTempView("cur_split_in")
    run_pipeline(
        spark,
        sources=["cur_split_in+view://cur_split_in"],
        transforms=[
            "cur_split_in+cur_s+split://?id-col=doc_id&weights=train:9,test:1"
        ],
        sinks=["cur_s+memory://cur_split"],
    )
    counts = {r.split for r in spark.table("cur_split").collect()}
    assert counts == {"train", "test"}


def test_compact_plan_transform(spark):
    spark.createDataFrame(
        [Row(p="d", f=i, b=60) for i in range(4)]
    ).createOrReplaceTempView("cur_files")
    run_pipeline(
        spark,
        sources=["cur_files+view://cur_files"],
        transforms=[
            "cur_files+cur_c+compact-plan://?partition-col=p&file-col=f&size-col=b&target=100"
        ],
        sinks=["cur_c+memory://cur_compact"],
    )
    out = {r.bin: r.n_files for r in spark.table("cur_compact").collect()}
    assert out == {0: 2, 1: 2}


def test_skew_profile_transform(spark):
    spark.createDataFrame(
        [Row(k="hot")] * 8 + [Row(k="cold")] * 2
    ).createOrReplaceTempView("cur_keys")
    run_pipeline(
        spark,
        sources=["cur_keys+view://cur_keys"],
        transforms=["cur_keys+cur_k+skew-profile://?key=k&top=1"],
        sinks=["cur_k+memory://cur_skew"],
    )
    r = spark.table("cur_skew").collect()[0]
    assert r.k == "hot" and r.key_count == 8 and abs(r.skew_ratio - 1.6) < 1e-12


def test_pagerank_transform(spark):
    spark.createDataFrame(
        [Row(src=a, dst=b, w=1) for a, b in [(0, 1), (1, 2), (2, 0)]]
    ).createOrReplaceTempView("cur_edges")
    run_pipeline(
        spark,
        sources=["cur_edges+view://cur_edges"],
        transforms=["cur_edges+cur_pr+pagerank://?iters=2"],
        sinks=["cur_pr+memory://cur_rank"],
    )
    out = {r.vertex: r.pagerank for r in spark.table("cur_rank").collect()}
    assert len(out) == 3 and abs(sum(out.values()) - 1.0) < 1e-12


def test_triangles_transform(spark):
    spark.createDataFrame(
        [Row(u=a, v=b) for a in range(3) for b in range(a + 1, 3)]
    ).createOrReplaceTempView("cur_tri")
    run_pipeline(
        spark,
        sources=["cur_tri+view://cur_tri"],
        transforms=["cur_tri+cur_t+triangles://"],
        sinks=["cur_t+memory://cur_tric"],
    )
    assert spark.table("cur_tric").collect()[0].n_triangles == 1


def test_tfidf_topk_transform(spark):
    spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta gamma delta"),
            Row(doc_id=1, text="alpha beta gamma delta"),
            Row(doc_id=2, text="zeta eta theta iota"),
        ]
    ).createOrReplaceTempView("cur_tf_docs")
    run_pipeline(
        spark,
        sources=["cur_tf_docs+view://cur_tf_docs"],
        transforms=["cur_tf_docs+cur_tf+tfidf-topk://?k=1&query-ids=0&df-cap-frac=0.9"],
        sinks=["cur_tf+memory://cur_tfk"],
    )
    r = spark.table("cur_tfk").collect()[0]
    assert r.query_id == 0 and r.neighbor_id == 1


def test_attribution_transform(spark):
    import datetime as dt

    spark.createDataFrame(
        [
            Row(user_id=1, event_id=1, event_type="click",
                ts=dt.datetime(2024, 1, 1, 0, 1), value=0.0),
            Row(user_id=1, event_id=2, event_type="purchase",
                ts=dt.datetime(2024, 1, 1, 0, 2), value=3.0),
        ]
    ).createOrReplaceTempView("cur_att_ev")
    run_pipeline(
        spark,
        sources=["cur_att_ev+view://cur_att_ev"],
        transforms=["cur_att_ev+cur_a+attribution://?order=event_id"],
        sinks=["cur_a+memory://cur_attr"],
    )
    r = spark.table("cur_attr").collect()[0]
    assert r.touch_type == "click" and r.n_conversions == 1


def test_media_transforms_via_pipeline(spark, tmp_path):
    (tmp_path / "x.bin").write_bytes(b"payload-one")
    (tmp_path / "y.bin").write_bytes(b"payload-one")  # exact dup
    (tmp_path / "z.bin").write_bytes(b"payload-two")
    run_pipeline(
        spark,
        sources=[f"raw+binaryfile://{tmp_path}"],
        transforms=[
            "raw+media+media://?id-col=path&kind=image&payload-col=content",
            "media+feats+media-features://?op=image",
            "media+dups+payload-dedup://",
        ],
        sinks=["feats+memory://mm_feats", "dups+memory://mm_dups"],
    )
    feats = spark.table("mm_feats").collect()
    assert len(feats) == 3
    assert all(64 <= r.width <= 64 + 255 for r in feats)
    dups = spark.table("mm_dups").collect()
    assert len(dups) == 1 and dups[0].group_size == 2
