"""Byte-exact parity of the Arrow shingle stage with word_shingles.

The shingle STRINGS feed md5/xxhash oracles in every adopting query, so
the bar is byte equality, not similarity: for every row, the Arrow
stage's array must equal the built-in ``word_shingles`` array element
for element (same values, same order, same dedup behavior).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.arrowtext import (
    _py_shingles,
    with_word_shingles,
)
from spark_etl_cli_spark.functions.text import word_shingles

# Adversarial corpus: whitespace forms Java \s does/doesn't match,
# Unicode, dedup cases, short docs, NULL.
NASTY = [
    None,
    "",
    " ",
    "   \t \r\n ",
    "one",
    "one two",
    "one two three",
    "one two three four",
    "a b a b a b a b",  # heavy dedup
    "  leading and trailing   spaces  ",
    "tabs\tand\nnewlines\r\nand\x0bvertical\x0cfeeds",
    "nbsp stays inside one token   really",
    "ideographic　space is not java whitespace",
    "MiXeD CaSe ÉCLAIR Straße İstanbul ŉ",
    "emoji 🎉 in 🎉 the 🎉 middle 🎉 of 🎉 text",
    "punct, punct; punct! 3.14 --- () []",
    "dup dup dup dup dup dup dup",
    "x " * 500,  # long doc
]


@pytest.mark.parametrize("k", [1, 2, 3, 5])
@pytest.mark.parametrize("distinct", [True, False])
def test_arrow_shingles_byte_equal_nasty(spark, k, distinct):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "doc_id long, text string"
    )
    expected = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", word_shingles(F.col("text"), k, distinct=distinct).alias("sh")
        ).collect()
    }
    got = {
        r["doc_id"]: r["sh"]
        for r in with_word_shingles(
            df, "text", k, distinct=distinct, out_col="sh", keep=["doc_id"]
        ).collect()
    }
    assert got == expected


def test_arrow_shingles_byte_equal_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    joined = (
        with_word_shingles(docs, "text", 3, out_col="a_sh", keep=["doc_id"])
        .join(
            docs.select(
                "doc_id", word_shingles(F.col("text"), 3).alias("j_sh")
            ),
            "doc_id",
        )
        .filter(~(F.col("a_sh") == F.col("j_sh")))
    )
    assert joined.count() == 0


@pytest.mark.parametrize("hex_chars", [7, 15])
def test_arrow_shingle_md5_longs_byte_equal(spark, hex_chars):
    from spark_etl_cli_spark.functions.text import md5_long, md5_long28
    from spark_etl_cli_spark.operators.arrowtext import with_shingle_md5_longs

    fn = md5_long28 if hex_chars == 7 else md5_long
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "doc_id long, text string"
    )
    expected = {
        r["doc_id"]: r["hs"]
        for r in df.select(
            "doc_id",
            F.transform(
                word_shingles(F.col("text"), 3), lambda s: fn(s)
            ).alias("hs"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["hs"]
        for r in with_shingle_md5_longs(
            df, "text", 3, hex_chars=hex_chars, out_col="hs", keep=["doc_id"]
        ).collect()
    }
    assert got == expected


def test_arrow_shingle_md5_hexes_byte_equal(spark):
    from spark_etl_cli_spark.operators.arrowtext import with_shingle_md5_hexes

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "doc_id long, text string"
    )
    expected = {
        r["doc_id"]: r["hs"]
        for r in df.select(
            "doc_id",
            F.transform(
                word_shingles(F.col("text"), 8),
                lambda s: F.substring(F.md5(s), 1, 16),
            ).alias("hs"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["hs"]
        for r in with_shingle_md5_hexes(
            df, "text", 8, hex_chars=16, out_col="hs", keep=["doc_id"]
        ).collect()
    }
    assert got == expected


def test_arrow_tagged_ngrams_matches_three_passes(spark):
    from spark_etl_cli_spark.operators.arrowtext import with_tagged_ngrams

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "doc_id long, text string"
    )

    def _leg(n):
        return F.transform(
            word_shingles(F.col("text"), n, distinct=False),
            lambda g: F.struct(F.lit(n).cast("int").alias("n"), g.alias("g")),
        )

    expected = {
        r["doc_id"]: r["t"]
        for r in df.select(
            "doc_id",
            F.flatten(F.array(*[_leg(n) for n in (1, 2, 3)])).alias("t"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["t"]
        for r in with_tagged_ngrams(
            df, "text", (1, 2, 3), distinct=False, out_col="t", keep=["doc_id"]
        ).collect()
    }
    assert got == expected


def test_py_shingles_edge_semantics():
    # NULL -> [] (size(NULL) is NULL -> otherwise-branch empty array)
    assert _py_shingles(None, 3, True) == []
    # empty normalized string -> one empty token -> short-doc guard
    assert _py_shingles("", 3, True) == []
    assert _py_shingles("", 1, True) == [""]  # k=1 keeps the empty token
    # fewer than k tokens -> []
    assert _py_shingles("a b", 3, True) == []
    # substring arithmetic: multi-codepoint tokens
    assert _py_shingles("aa b🎉 cc dd", 2, False) == ["aa b🎉", "b🎉 cc", "cc dd"]
    # dedup keeps first occurrence order
    assert _py_shingles("a b a b a", 2, True) == ["a b", "b a"]
    assert _py_shingles("a b a b a", 2, False) == ["a b", "b a", "a b", "b a"]
