"""Text-analysis column functions: edge cases."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_cli_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)


def _one(spark, text, col):
    return spark.createDataFrame([Row(text=text)]).select(col.alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "a b  c", token_count(F.col("text"))) == 3
    assert _one(spark, "", token_count(F.col("text"))) == 0
    assert _one(spark, "   ", token_count(F.col("text"))) == 0
    assert _one(spark, "one", token_count(F.col("text"))) == 1


def test_word_shingles_short_doc_guard(spark):
    # fewer tokens than k must yield an empty array, not an error
    assert _one(spark, "a b", word_shingles(F.col("text"), 3)) == []
    assert _one(spark, "a b c", word_shingles(F.col("text"), 3)) == ["a b c"]
    assert _one(spark, "a b c d", word_shingles(F.col("text"), 3)) == [
        "a b c",
        "b c d",
    ]


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello  World", fingerprint(F.col("text")))
    b = _one(spark, "hello world ", fingerprint(F.col("text")))
    c = _one(spark, "hello worlds", fingerprint(F.col("text")))
    assert a == b != c


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog of to in", lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist nicht", lang_id(F.col("text"))) == "de"
    assert _one(spark, "zzz qqq www", lang_id(F.col("text"))) == "und"
    assert _one(spark, "", lang_id(F.col("text"))) == "und"


def test_quality_score_bounds(spark):
    v = _one(spark, "the quick brown fox is a good dog " * 5, quality_score(F.col("text")))
    assert 0.0 <= v <= 1.0
    junk = _one(spark, "!!!###$$$%%%", quality_score(F.col("text")))
    assert junk < v


def test_bpe_train_hand_verified(spark):
    # classic BPE walkthrough: corpus "low low low lower lowest".
    # Word freqs: low:3, lower:1, lowest:1. Every word starts l,o,w →
    # pair (l,o) count 5 ties (o,w) 5; lexicographic tie-break picks
    # (l,o) first, then (lo,w) 5 merges to "low".
    from pyspark.sql import Row

    from spark_etl_cli_spark.operators.encoding import bpe_train

    docs = spark.createDataFrame(
        [Row(text="low low low"), Row(text="lower lowest")]
    )
    out = bpe_train(docs, n_merges=3).collect()
    assert [(r.merge_rank, r.left, r.right, r.merged) for r in out[:2]] == [
        (0, "l", "o", "lo"),
        (1, "lo", "w", "low"),
    ]
    assert out[0].pair_count == 5 and out[1].pair_count == 5
    # merge 3: after "low", pairs are (low,</w>):3, (low,e):2, ... →
    # (low,</w>) wins
    assert (out[2].left, out[2].right) == ("low", "</w>")


def test_bpe_train_partition_invariance(spark):
    from spark_etl_cli_spark.operators.encoding import bpe_train

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(200)
    a = bpe_train(docs, n_merges=6).collect()
    b = bpe_train(docs.repartition(13), n_merges=6).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 6
    # merges must chain: later merges may only reference symbols that
    # exist (chars, </w>, or earlier merged symbols)
    known = set("abcdefghijklmnopqrstuvwxyz0123456789") | {"</w>"}
    import string

    known |= set(string.punctuation)
    for r in a:
        for side in (r.left, r.right):
            assert side in known or len(side) > 1
        known.add(r.merged)


def test_bpe_train_serial_equals_distributed(spark):
    """r10: the single-task Arrow trainer (vocab under the adaptive
    threshold) must emit EXACTLY the distributed per-round loop's
    merges — same argmax tie rules, same greedy non-overlapping merge
    scan."""
    from spark_etl_cli_spark.operators.encoding import bpe_train

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    serial = bpe_train(docs, n_merges=8).collect()
    dist = bpe_train(docs, n_merges=8, serial_symbols_max=0).collect()
    assert [tuple(r) for r in serial] == [tuple(r) for r in dist]
    assert len(serial) == 8


def test_bpe_train_greedy_nonoverlapping(spark):
    # "aaaa" with merge (a,a): greedy left-to-right gives aa|aa, so the
    # second round's top pair is (aa,aa)
    from pyspark.sql import Row

    from spark_etl_cli_spark.operators.encoding import bpe_train

    docs = spark.createDataFrame([Row(text="aaaa aaaa aaaa")])
    out = bpe_train(docs, n_merges=2).collect()
    assert (out[0].left, out[0].right, out[0].merged) == ("a", "a", "aa")
    # pair stats count ADJACENT OCCURRENCES (Sennrich get_stats):
    # 3 words x 3 adjacent (a,a) positions in "aaaa" = 9. Only the
    # APPLICATION is greedy non-overlapping.
    assert out[0].pair_count == 9
    # round 2: [aa, aa, </w>] per word -> (aa,aa) and (aa,</w>) tie at
    # 3; the deterministic lexicographic tie-break picks "</w>" < "aa"
    assert (out[1].left, out[1].right) == ("aa", "</w>")
    assert out[1].pair_count == 3


def test_bpe_train_self_adjacent_odd_length(spark):
    # "aaa" under merge (a,a): the middle symbol must not be consumed
    # twice — greedy non-overlap yields [aa, a, </w>], which holds
    # because the fold's accumulator tail becomes "aa" != "a" after a
    # merge (merged is strictly longer than left)
    from pyspark.sql import Row

    from spark_etl_cli_spark.operators.encoding import bpe_train

    docs = spark.createDataFrame([Row(text="aaa aaa")])
    out = bpe_train(docs, n_merges=2).collect()
    assert (out[0].left, out[0].right, out[0].merged) == ("a", "a", "aa")
    assert out[0].pair_count == 4  # 2 words x 2 adjacent positions
    # round 2 over [aa, a, </w>]: pairs (aa,a):2 and (a,</w>):2 tie;
    # lexicographic tie-break on left picks ("a","</w>"). Crucially
    # (aa,aa) must NOT exist — it would mean the overlap was consumed.
    pairs2 = (out[1].left, out[1].right)
    assert pairs2 == ("a", "</w>")
    assert out[1].pair_count == 2
