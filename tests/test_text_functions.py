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
