"""Round-10 operators: exact-substring (suffix-array-style) dedup.

Pins the semantic contracts the q203-q205 oracles can't see on their
own: maximality of spans, diagonal separation, key='hash' == key='text'
equivalence, the max_df cap trade, interval-union scrubbing, and the
dedup://?mode=substring URI surface."""

import pytest
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.substring import (
    substring_dedup,
    substring_dup_spans,
    substring_scrub,
    token_windows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_windows_short_doc_emits_nothing(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c d")])
    got = token_windows(df, k=4).collect()
    assert {(r.id, r.pos, r.win) for r in got} == {(2, 0, "a b c d")}


def test_spans_maximal_and_positioned(spark):
    # doc 2 embeds tokens 2..7 of doc 1 starting at its position 1
    df = _docs(
        spark,
        [
            (1, "x0 x1 s0 s1 s2 s3 s4 s5 y0 y1"),
            (2, "z0 s0 s1 s2 s3 s4 s5 w0"),
        ],
    )
    got = [tuple(r) for r in substring_dup_spans(df, k=3).collect()]
    assert got == [(1, 2, 2, 1, 6)]  # ONE maximal span, not 4 k-windows


def test_two_diagonals_stay_separate_spans(spark):
    # the shared trigram appears twice in doc 2 -> two alignments
    df = _docs(
        spark,
        [
            (1, "s0 s1 s2 a b c d e f"),
            (2, "s0 s1 s2 q q s0 s1 s2"),
        ],
    )
    got = sorted(tuple(r) for r in substring_dup_spans(df, k=3).collect())
    assert got == [(1, 2, 0, 0, 3), (1, 2, 0, 5, 3)]


def test_hash_key_matches_text_key(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(tuple(r) for r in substring_dup_spans(df, k=8).collect())
    b = sorted(
        tuple(r)
        for r in substring_dup_spans(df, k=8, key="hash").collect()
    )
    assert a == b and len(a) > 0


def test_bad_key_rejected(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="text|hash"):
        substring_dup_spans(df, key="md5")


def test_max_df_caps_hot_windows(spark):
    # the same 3-gram in 4 docs -> posting list of 4 -> capped at 3
    rows = [(i, f"pad{i} s0 s1 s2 tail{i}") for i in range(4)]
    df = _docs(spark, rows)
    assert substring_dup_spans(df, k=3).count() == 6  # C(4,2)
    assert substring_dup_spans(df, k=3, max_df=3).count() == 0


def test_dedup_decision_smallest_earlier_neighbor(spark):
    span = " ".join(f"s{i}" for i in range(12))
    df = _docs(
        spark,
        [
            (1, span + " u1 v1"),
            (2, span + " u2 v2"),
            (3, span + " u3 v3"),
            (4, "nothing shared here at all padpad padpad2 padpad3"),
        ],
    )
    got = {
        r.id: (r.dup_of, r.shared_span)
        for r in substring_dedup(df, k=3, min_span=12).collect()
    }
    assert got == {
        1: (None, None),
        2: (1, 12),
        3: (1, 12),
        4: (None, None),
    }


def test_scrub_removes_union_of_overlapping_spans(spark):
    # doc 3 shares [0, 10) with doc 1 and [5, 15) with doc 2 ->
    # the union [0, 15) is removed exactly once
    toks = [f"s{i}" for i in range(15)]
    df = _docs(
        spark,
        [
            (1, " ".join(toks[:10]) + " a1 a2 a3"),
            (2, "b1 b2 b3 " + " ".join(toks[5:15])),
            (3, " ".join(toks) + " keep1 keep2 keep3"),
        ],
    )
    got = {r.id: (r.text_clean, r.removed_tokens) for r in
           substring_scrub(df, k=5, min_span=10).collect()}
    assert got[3] == ("keep1 keep2 keep3", 15)
    # earliest occurrences survive untouched (whitespace-normalized)
    assert got[1] == (" ".join(toks[:10]) + " a1 a2 a3", 0)
    # doc 2 < doc 3, so its copy of s5..s14 survives; its only overlap
    # with doc 1 (s5..s9, 5 tokens) is below min_span -> untouched
    assert got[2] == ("b1 b2 b3 " + " ".join(toks[5:15]), 0)


def test_scrub_can_empty_a_doc(spark):
    span = " ".join(f"s{i}" for i in range(10))
    df = _docs(spark, [(1, span + " tail0"), (2, span)])
    got = {r.id: (r.text_clean, r.removed_tokens) for r in
           substring_scrub(df, k=5, min_span=10).collect()}
    assert got[2] == ("", 10)


def test_substring_uri_surface(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)
    _, spans_fn = resolve_transform("a+b+dedup://?tier=substring&k=8")
    spans = spans_fn(spark, df)
    assert set(spans.columns) == {
        "doc_a", "doc_b", "a_start", "b_start", "span_len",
    }
    _, scrub_fn = resolve_transform(
        "a+b+dedup://?mode=substring&emit=scrub&k=8&min-span=12&key=hash"
    )
    out = scrub_fn(spark, df)
    assert out.count() == 100
    assert set(out.columns) == {"id", "text_clean", "removed_tokens"}


def test_contamination_spans_cross_tables_only(spark):
    """Contamination spans pair TRAIN x BENCH only (no train-train or
    bench-bench pairs), with positions relative to each side."""
    from spark_etl_cli_spark.operators.substring import (
        substring_contamination_spans,
    )

    leak = " ".join(f"q{i}" for i in range(8))
    train = _docs(
        spark,
        [
            (1, "t1 t2 " + leak + " t3"),
            (2, "t4 t5 t6 " + leak),
            (3, "clean doc nothing shared here at all ok"),
        ],
    )
    bench = _docs(spark, [(100, leak + " b1 b2")])
    got = sorted(
        tuple(r)
        for r in substring_contamination_spans(
            train, bench, k=8
        ).collect()
    )
    assert got == [(1, 100, 2, 0, 8), (2, 100, 3, 0, 8)]
    # hash key (verified) agrees
    got_h = sorted(
        tuple(r)
        for r in substring_contamination_spans(
            train, bench, k=8, key="hash"
        ).collect()
    )
    assert got_h == got


def test_substring_decontaminate_drop_and_scrub(spark):
    from spark_etl_cli_spark.operators.substring import (
        substring_decontaminate,
    )

    leak = " ".join(f"q{i}" for i in range(12))
    train = _docs(
        spark,
        [
            (1, "t1 t2 " + leak),
            (2, "clean doc nothing shared here at all ok"),
        ],
    )
    bench = _docs(spark, [(100, leak)])
    kept = substring_decontaminate(
        train, bench, k=8, min_span=12, action="drop"
    )
    assert [r.doc_id for r in kept.collect()] == [2]
    scrubbed = {
        r.id: (r.text_clean, r.removed_tokens)
        for r in substring_decontaminate(
            train, bench, k=8, min_span=12, action="scrub"
        ).collect()
    }
    assert scrubbed[1] == ("t1 t2", 12)
    assert scrubbed[2][1] == 0


def test_contamination_probe_broadcasts_bench(spark):
    """The 100 TB shape: the benchmark side is broadcast, so the
    corpus-side postings stream map-side — no shuffle on the train
    posting path before the join."""
    from spark_etl_cli_spark.operators.substring import (
        substring_contamination_spans,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spans = substring_contamination_spans(
        d.filter("source <> 'src0'"), d.filter("source = 'src0'"), k=8
    )
    plan = spans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_substring_uri(spark):
    from spark_etl_cli_spark.registry import resolve_transform

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d.filter("source = 'src0'").createOrReplaceTempView("bench_docs")
    _, fn = resolve_transform(
        "a+b+decontaminate://bench_docs?mode=substring&n=8"
        "&min-span=12&action=scrub"
    )
    out = fn(spark, d.filter("source <> 'src0'"))
    assert set(out.columns) == {"id", "text_clean", "removed_tokens"}
    assert out.filter("removed_tokens > 0").count() >= 1
    _, fn2 = resolve_transform(
        "a+b+decontaminate://bench_docs?mode=substring&n=8&action=spans"
    )
    spans = fn2(spark, d.filter("source <> 'src0'"))
    assert spans.count() >= 1 and "train_doc_id" in spans.columns
