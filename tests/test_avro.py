"""avro_lite codec + connector tests.

The container/binary codec is from-scratch (Avro 1.12 spec); these
tests pin it three ways:

1. golden bytes — hand-computed encodings from the spec's own examples
   (zigzag varints, string framing, container magic), so the wire
   format is pinned by bytes, not just by self-roundtrip;
2. self-roundtrip across the full supported type matrix;
3. the avro:// connector end-to-end through run_pipeline (the path the
   reference exercises in ETLTest.scala with spark-avro on the
   classpath — here via the fallback codec).
"""

import datetime as dt
import io
from decimal import Decimal

import pytest
from pyspark.sql import Row

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.sources.avro_lite import (
    MAGIC,
    Reader,
    make_decoder,
    make_encoder,
    read_container,
    spark_to_avro_schema,
    write_container,
    write_long,
)


def enc(schema, value) -> bytes:
    out = io.BytesIO()
    make_encoder(schema)(out, value)
    return out.getvalue()


def dec(schema, data: bytes):
    return make_decoder(schema)(Reader(data))


# --------------------------------------------------------------- golden bytes


def test_long_zigzag_golden():
    # Avro spec "Binary Encoding" table: 0->00, -1->01, 1->02, -2->03,
    # 2->04, -64->7f, 64->80 01
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
             2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for v, b in cases.items():
        out = io.BytesIO()
        write_long(out, v)
        assert out.getvalue() == b, v
        assert dec("long", b) == v


def test_string_golden():
    # spec example: "foo" -> 06 66 6f 6f
    assert enc("string", "foo") == b"\x06foo"
    assert dec("string", b"\x06foo") == "foo"


def test_record_golden():
    # spec example: {"a": 27, "b": "foo"} with schema
    # record{a: long, b: string} -> 36 06 66 6f 6f
    schema = {
        "type": "record",
        "name": "test",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": "string"}],
    }
    assert enc(schema, {"a": 27, "b": "foo"}) == b"\x36\x06foo"
    assert dec(schema, b"\x36\x06foo") == {"a": 27, "b": "foo"}


def test_array_golden():
    # spec example: array<long> [3, 27] -> 04 06 36 00
    assert enc({"type": "array", "items": "long"}, [3, 27]) == b"\x04\x06\x36\x00"
    assert dec({"type": "array", "items": "long"}, b"\x04\x06\x36\x00") == [3, 27]


def test_nullable_union_golden():
    # union ["null","string"]: null -> 00 ; "a" -> 02 02 61
    schema = ["null", "string"]
    assert enc(schema, None) == b"\x00"
    assert enc(schema, "a") == b"\x02\x02a"
    assert dec(schema, b"\x00") is None
    assert dec(schema, b"\x02\x02a") == "a"


def test_container_magic_and_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    path = str(tmp_path / "t.avro")
    n = write_container(path, schema, iter([{"x": i} for i in range(10_000)]))
    assert n == 10_000
    raw = open(path, "rb").read()
    assert raw[:4] == MAGIC
    got_schema, records = read_container(raw)
    assert got_schema == schema
    assert records == [{"x": i} for i in range(10_000)]


def test_container_null_codec_and_block_bounds(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "s", "type": "string"}]}
    path = str(tmp_path / "n.avro")
    write_container(path, schema, iter([{"s": "é" * 5}] * 7),
                    codec="null", block_records=3)  # forces 3 blocks
    _, records = read_container(open(path, "rb").read())
    assert records == [{"s": "é" * 5}] * 7


# ---------------------------------------------------------- type matrix


def test_type_matrix_roundtrip():
    cases = [
        ("boolean", True), ("boolean", False),
        ("int", -12345), ("long", 2**53),
        ("double", 3.5), ("bytes", b"\x00\xff"),
        ({"type": "int", "logicalType": "date"}, dt.date(2024, 2, 29)),
        ({"type": "long", "logicalType": "timestamp-micros"},
         dt.datetime(2024, 6, 1, 12, 34, 56, 789012)),
        ({"type": "bytes", "logicalType": "decimal",
          "precision": 10, "scale": 2}, Decimal("-12345.67")),
        ({"type": "fixed", "name": "f4", "size": 4}, b"abcd"),
        ({"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}, "B"),
        ({"type": "map", "values": "long"}, {"k1": 1, "k2": -2}),
        ({"type": "array", "items": ["null", "string"]}, ["x", None, "y"]),
    ]
    for schema, value in cases:
        assert dec(schema, enc(schema, value)) == value, schema
    # float roundtrips through 32-bit
    assert dec("float", enc("float", 1.5)) == 1.5


def test_timestamp_integer_exactness():
    """Every microsecond tick must round-trip bit-exactly.

    The old encoder used int(v.timestamp() * 1e6) — a float64 crossing that
    mis-encodes ~1.2% of microsecond-precision values by 1us. Sweep a dense
    grid of awkward values (large epochs, x.999999s, primes) and assert both
    the encoded long and the decoded datetime are exact.
    """
    us_schema = {"type": "long", "logicalType": "timestamp-micros"}
    ms_schema = {"type": "long", "logicalType": "timestamp-millis"}
    epoch = dt.datetime(1970, 1, 1)
    # micros values chosen to be unrepresentable as float64 seconds
    for us in [1, 999_999, 1_600_000_000_123_457, 1_719_792_896_789_011,
               2**53 + 1, 4_102_444_800_000_001,
               *range(1_700_000_000_000_000, 1_700_000_000_000_100, 7)]:
        v = epoch + dt.timedelta(microseconds=us)
        raw = enc(us_schema, v)
        # the wire long itself must equal the true microsecond count
        from spark_etl_cli_spark.sources.avro_lite import Reader
        assert Reader(raw).read_long() == us, us
        assert dec(us_schema, raw) == v, us
    for ms in [1, 999, 1_600_000_000_123, 2**41 + 1]:
        v = epoch + dt.timedelta(milliseconds=ms)
        raw = enc(ms_schema, v)
        assert dec(ms_schema, raw) == v, ms


def test_negative_block_count_form_decodes():
    # writers may emit the (-count, bytesize) block form for arrays;
    # [3, 27] as -2 items, 2 bytes: 03 04 06 36 00
    assert dec({"type": "array", "items": "long"},
               b"\x03\x04\x06\x36\x00") == [3, 27]


# ------------------------------------------------------------ connector e2e


def test_avro_pipeline_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orders_avro")
    run_pipeline(
        spark,
        sources=["o+parquet:///root/testdata/sf0.001/orders.parquet"],
        transforms=[
            "o+o2+sql://SELECT o_orderkey, o_custkey, o_totalprice, "
            "o_orderdate, o_orderpriority FROM input"
        ],
        sinks=[f"o2+avro://{path}"],
    )
    run_pipeline(
        spark,
        sources=[f"a+avro://{path}"],
        sinks=["a+memory://avro_back"],
    )
    back = spark.table("avro_back")
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert back.count() == src.count()
    exp = {
        (r.o_orderkey, r.o_custkey, float(r.o_totalprice), r.o_orderdate)
        for r in src.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        ).collect()
    }
    got = {
        (r.o_orderkey, r.o_custkey, float(r.o_totalprice), r.o_orderdate)
        for r in back.collect()
    }
    assert got == exp


def test_avro_nested_and_null_roundtrip(spark, tmp_path):
    path = str(tmp_path / "nested_avro")
    df = spark.createDataFrame(
        [
            Row(id=1, tags=["a", "b"], meta=Row(k="x", n=10), opt="v"),
            Row(id=2, tags=[], meta=Row(k="y", n=None), opt=None),
        ]
    )
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source

    _, sink = resolve_sink(f"n+avro://{path}")
    assert sink.write(df) is True
    _, source = resolve_source(f"n+avro://{path}")
    back = source.read(spark)
    rows = {r.id: r for r in back.collect()}
    assert rows[1].tags == ["a", "b"] and rows[1].meta.k == "x"
    assert rows[1].meta.n == 10 and rows[1].opt == "v"
    assert rows[2].tags == [] and rows[2].meta.n is None and rows[2].opt is None


def test_avro_write_modes(spark, tmp_path):
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source

    path = str(tmp_path / "modes_avro")
    df = spark.range(5)
    resolve_sink(f"m+avro://{path}")[1].write(df)
    # append doubles the rows
    resolve_sink(f"m+avro://{path}?mode=append")[1].write(df)
    assert resolve_source(f"m+avro://{path}")[1].read(spark).count() == 10
    # overwrite resets
    resolve_sink(f"m+avro://{path}?mode=overwrite")[1].write(df)
    assert resolve_source(f"m+avro://{path}")[1].read(spark).count() == 5
    with pytest.raises(FileExistsError):
        resolve_sink(f"m+avro://{path}?mode=error")[1].write(df)


def test_avro_stream_empty_dir_gives_clear_error(spark, tmp_path):
    # schema inference needs at least one file (or future ?schema=);
    # the error must say so, not NPE
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.files import _has_spark_avro

    if _has_spark_avro(spark):
        pytest.skip("spark-avro jar present: stream path is the real one")
    _, source = resolve_source(f"s+avro-stream://{tmp_path}/never")
    with pytest.raises(Exception, match="no .avro files|schema"):
        source.read(spark)


def test_spark_to_avro_schema_shape(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    s = spark_to_avro_schema(df.schema)
    assert s["type"] == "record"
    names = {f["name"]: f["type"] for f in s["fields"]}
    assert names["a"] == ["null", "long"] and names["b"] == ["null", "string"]


# ------------------------------------------------------- property tests

from hypothesis import given, settings
from hypothesis import strategies as st

_REC_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "boolean"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
    ],
}

_records = st.fixed_dictionaries(
    {
        "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | st.text(max_size=40),
        "d": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64),
        "b": st.none() | st.booleans(),
        "xs": st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8
        ),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10),
                             max_size=5),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_records, max_size=20))
def test_container_roundtrip_property(tmp_path_factory, recs):
    # any batch of records survives a container write/read bit-exactly
    path = str(tmp_path_factory.mktemp("avro") / "p.avro")
    n = write_container(path, _REC_SCHEMA, iter(recs), block_records=7)
    assert n == len(recs)
    _, back = read_container(open(path, "rb").read())
    assert back == recs


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_zigzag_roundtrip_property(v):
    out = io.BytesIO()
    write_long(out, v)
    assert dec("long", out.getvalue()) == v


def test_avro_stream_read_without_jar(spark, tmp_path):
    # jar-less avro-stream:// read: Python DataSource micro-batch
    # reader; write a file via the lite sink, stream it to a memory
    # sink, append a second file, stream again
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source
    from spark_etl_cli_spark.sources.files import _has_spark_avro

    if _has_spark_avro(spark):
        pytest.skip("spark-avro jar present: jvm stream path is the real one")

    src_dir = str(tmp_path / "stream_avro")
    resolve_sink(f"s+avro://{src_dir}")[1].write(
        spark.range(5).selectExpr("id", "concat('n-', id) AS name")
    )
    _, source = resolve_source(f"s+avro-stream://{src_dir}")
    stream = source.read(spark)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("avro_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.id, r.name) for r in spark.table("avro_stream_t").collect()}
    assert got == {(i, f"n-{i}") for i in range(5)}

    resolve_sink(f"s+avro://{src_dir}?mode=append")[1].write(
        spark.range(5, 8).selectExpr("id", "concat('n-', id) AS name")
    )
    q2 = (
        source.read(spark)
        .writeStream.format("memory")
        .queryName("avro_stream_t2")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(60)
    assert spark.table("avro_stream_t2").count() == 8


def test_avro_stream_reads_partitioned_subdirs(spark, tmp_path):
    # the recursive glob finds files in subdirectories (a partitioned
    # spark-avro layout); offsets must store root-RELATIVE paths so
    # those files are actually read — and same-named files in different
    # subdirs must not alias each other (old basename offsets lost both)
    from spark_etl_cli_spark.registry import resolve_source
    from spark_etl_cli_spark.sources.avro_lite import write_container
    from spark_etl_cli_spark.sources.files import _has_spark_avro

    if _has_spark_avro(spark):
        pytest.skip("spark-avro jar present: jvm stream path is the real one")

    root = tmp_path / "stream_sub"
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "id", "type": "long"}],
    }
    for part, ids in [("part=a", [1, 2]), ("part=b", [3])]:
        d = root / part
        d.mkdir(parents=True)
        # SAME basename in both subdirs — the aliasing trap
        write_container(str(d / "f.avro"), schema, iter([{"id": i} for i in ids]))
    _, source = resolve_source(f"s+avro-stream://{root}")
    q = (
        source.read(spark)
        .writeStream.format("memory")
        .queryName("avro_stream_sub")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(r.id for r in spark.table("avro_stream_sub").collect())
    assert got == [1, 2, 3]


def test_avro_stream_explicit_schema_on_empty_dir(spark, tmp_path):
    # ?schema= lets the stream start before any file exists; the first
    # micro-batch after a file lands uses the declared schema
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source
    from spark_etl_cli_spark.sources.files import _has_spark_avro

    if _has_spark_avro(spark):
        pytest.skip("spark-avro jar present")
    src_dir = str(tmp_path / "pre_avro")
    import os

    os.makedirs(src_dir)
    _, source = resolve_source(
        f"s+avro-stream://{src_dir}?schema=id bigint, name string"
    )
    stream = source.read(spark)
    assert stream.isStreaming and stream.columns == ["id", "name"]
    resolve_sink(f"s+avro://{src_dir}?mode=append")[1].write(
        spark.range(3).selectExpr("id", "concat('x', id) AS name")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("avro_pre_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.table("avro_pre_t").count() == 3


def test_avro_empty_frame_roundtrip(spark, tmp_path):
    # writing an empty frame leaves a schema-bearing container behind,
    # so a reader still gets the right columns with zero rows
    from spark_etl_cli_spark.registry import resolve_sink, resolve_source

    path = str(tmp_path / "empty_avro")
    df = spark.range(5).filter("id < 0").selectExpr("id", "'x' AS tag")
    resolve_sink(f"e+avro://{path}")[1].write(df)
    back = resolve_source(f"e+avro://{path}")[1].read(spark)
    assert back.columns == ["id", "tag"]
    assert back.count() == 0


def test_avro_unsupported_codec_raises():
    import zlib

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    buf = io.BytesIO()
    # hand-write a header claiming snappy
    buf.write(MAGIC)
    meta = {"avro.schema": __import__("json").dumps(schema).encode(),
            "avro.codec": b"bzip2"}
    write_long(buf, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        write_long(buf, len(kb)); buf.write(kb)
        write_long(buf, len(v)); buf.write(v)
    write_long(buf, 0)
    buf.write(b"S" * 16)
    write_long(buf, 1)  # one record
    body = b"\x02"
    comp = zlib.compress(body)
    write_long(buf, len(comp))
    buf.write(comp)
    buf.write(b"S" * 16)
    with pytest.raises(ValueError, match="bzip2"):
        read_container(buf.getvalue())


def test_avro_lite_optional_block_codecs(spark, tmp_path):
    """snappy (raw block + BE CRC32 suffix) and zstandard containers
    round-trip through the jar-less writer/reader; a corrupted snappy
    CRC fails loudly."""
    import glob
    import os

    from spark_etl_cli_spark.sources.avro_lite import (
        read_avro_lite,
        write_avro_lite,
    )

    df = spark.createDataFrame(
        [(i, "v" * (i % 7)) for i in range(100)], "id long, v string"
    )
    for codec in ("snappy", "zstandard"):
        path = str(tmp_path / f"avro_{codec}")
        write_avro_lite(df.repartition(2), path, codec=codec)
        got = read_avro_lite(spark, path)
        assert sorted((r.id, r.v) for r in got.collect()) == sorted(
            (r.id, r.v) for r in df.collect()
        )

    # flip a byte inside a snappy block: CRC check must scream
    part = sorted(glob.glob(str(tmp_path / "avro_snappy" / "*.avro")))[0]
    raw = bytearray(open(part, "rb").read())
    raw[-30] ^= 0xFF
    open(part, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(Exception, match="CRC|corrupt|snappy"):
        read_avro_lite(spark, str(tmp_path / "avro_snappy")).collect()
