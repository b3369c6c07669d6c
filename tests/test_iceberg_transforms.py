"""Iceberg partition-transform unit pins — the verification vectors
come straight from the Iceberg spec's Appendix B (32-bit hash
requirements) and the transform definition table."""

import datetime as dt
from decimal import Decimal

import pytest

from spark_etl_cli_spark.sources.iceberg_transforms import (
    apply_transform,
    iceberg_hash,
    murmur3_32,
)


def test_spec_appendix_b_hash_vectors():
    assert iceberg_hash(34, "int") == 2017239379
    assert iceberg_hash(34, "long") == 2017239379
    assert iceberg_hash("2017-11-16", "date") == -653330422
    assert iceberg_hash("2017-11-16T22:31:08", "timestamp") == -2047944441
    assert iceberg_hash("iceberg", "string") == 1210000089
    assert iceberg_hash("14.20", "decimal(9, 2)") == -500754589
    # int and long of the same value hash identically (spec requirement
    # so bucket partitioning survives int->long type promotion)
    assert iceberg_hash(1, "int") == iceberg_hash(1, "long")


def test_murmur3_tail_lengths():
    # every tail length exercises a different switch arm
    for data, n in [(b"", 0), (b"a", 1), (b"ab", 2), (b"abc", 3),
                    (b"abcd", 4), (b"abcde", 5)]:
        assert isinstance(murmur3_32(data), int)
        assert -(2**31) <= murmur3_32(data) < 2**31
        assert len(data) == n


def test_bucket_and_truncate():
    assert apply_transform("bucket[16]", 34, "long") == 2017239379 % 16
    assert apply_transform("bucket[8]", "iceberg", "string") == (
        1210000089 & (2**31 - 1)
    ) % 8
    # truncate floors toward -inf for ints (spec: v - (v %% W))
    assert apply_transform("truncate[10]", 1, "int") == 0
    assert apply_transform("truncate[10]", -1, "int") == -10
    assert apply_transform("truncate[3]", "iceberg", "string") == "ice"
    assert apply_transform(
        "truncate[50]", "10.65", "decimal(9, 2)"
    ) == Decimal("10.50")


def test_temporal_transforms():
    assert apply_transform("day", "2017-11-16", "date") == 17486
    assert apply_transform("year", "2017-11-16", "date") == 47
    assert apply_transform("month", "2017-11-16", "date") == (
        (2017 - 1970) * 12 + 10
    )
    assert apply_transform(
        "hour", "2017-11-16T22:31:08", "timestamp"
    ) == 1510871468 // 3600
    assert apply_transform(
        "day", dt.date(1969, 12, 31), "date"
    ) == -1  # pre-epoch floors correctly


def test_null_and_void_and_unknown():
    assert apply_transform("bucket[4]", None, "long") is None
    assert apply_transform("void", 5, "long") is None
    with pytest.raises(NotImplementedError):
        apply_transform("zorder[2]", 5, "long")


def test_spark_transform_parity_with_literal_transforms(spark):
    """Property: spark_transform_column (the write path) agrees with
    apply_transform (the pruning path) on every transform/type combo —
    the invariant that makes write-side partition values prunable."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spark_etl_cli_spark.sources.iceberg_transforms import (
        spark_transform_column,
    )

    longs = [-(2**40), -17, -1, 0, 1, 34, 99, 2**40 + 7]
    strs = ["", "a", "iceberg", "ZZ top", "naïve-utf8 ✓"]
    dates = [dt.date(1969, 12, 31), dt.date(1970, 1, 1),
             dt.date(2017, 11, 16), dt.date(2031, 2, 28)]
    tss = [dt.datetime(2017, 11, 16, 22, 31, 8),
           dt.datetime(1970, 1, 1, 0, 0, 1),
           dt.datetime(1969, 12, 31, 23, 0, 0)]

    cases = [
        ("bucket[16]", longs, "long", T.LongType()),
        ("bucket[7]", longs, "long", T.LongType()),
        ("truncate[10]", longs, "long", T.LongType()),
        ("truncate[3]", longs, "long", T.LongType()),
        ("bucket[8]", strs, "string", T.StringType()),
        ("truncate[4]", strs, "string", T.StringType()),
        ("bucket[4]", dates, "date", T.DateType()),
        ("day", dates, "date", T.DateType()),
        ("month", dates, "date", T.DateType()),
        ("year", dates, "date", T.DateType()),
        ("bucket[4]", tss, "timestamp", T.TimestampType()),
        ("hour", tss, "timestamp", T.TimestampType()),
        ("day", tss, "timestamp", T.TimestampType()),
        ("month", tss, "timestamp", T.TimestampType()),
        ("year", tss, "timestamp", T.TimestampType()),
    ]
    for transform, values, ityp, sdt in cases:
        df = spark.createDataFrame(
            [(v,) for v in values], T.StructType([T.StructField("x", sdt)])
        )
        got = [
            r["t"]
            for r in df.select(
                spark_transform_column(transform, F.col("x"), sdt).alias("t")
            ).collect()
        ]
        want = [apply_transform(transform, v, ityp) for v in values]
        assert got == want, (transform, ityp, got, want)


def test_temporal_transforms_are_utc_in_non_utc_session(spark):
    """r6 ADVICE (medium): year/month on TIMESTAMPS must be computed
    from UTC epoch micros like day/hour — F.year/F.month render in the
    session timezone, so under a non-UTC session the write path's
    recorded partition values diverged from apply_transform's UTC
    ordinals and equality pruning could drop matching files. Pin parity
    under a non-UTC session at instants that cross UTC year/month
    boundaries when rendered in that zone."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from spark_etl_cli_spark.sources.iceberg_transforms import (
        spark_transform_column,
    )

    # instants that flip year/month when rendered in LA (-8h): just
    # after UTC midnight on year/month starts, plus pre-epoch ones
    micros = [
        30 * 60 * 1_000_000,                    # 1970-01-01 00:30 UTC
        1_512_086_400_000_000 + 60_000_000,     # 2017-12-01 00:01 UTC
        1_514_764_800_000_000 + 1,              # 2018-01-01 00:00 UTC
        -3_600_000_000,                         # 1969-12-31 23:00 UTC
    ]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.createDataFrame(
            [(m,) for m in micros], "m long"
        ).select(F.timestamp_micros(F.col("m")).alias("x"), "m")
        for transform in ("year", "month", "day", "hour", "bucket[4]"):
            got = [
                r["t"]
                for r in df.select(
                    spark_transform_column(
                        transform, F.col("x"), T.TimestampType()
                    ).alias("t")
                ).collect()
            ]
            want = [
                apply_transform(transform, m, "timestamp") for m in micros
            ]
            assert got == want, (transform, got, want)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
