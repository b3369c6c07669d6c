"""URI grammar: scheme/name splitting, params, stream variants.

Mirrors reference semantics at ``UriHelpers.scala:17-31``,
``ETL.scala:45-68``: ``name+scheme://`` binds a view name,
``in+out+scheme://`` names transform input/output, ``-`` normalizes to
``_``, ``-stream`` suffixed schemes mark streaming.
"""

from spark_etl_cli_spark.uri import (
    parse_uri,
    sink_view_name,
    source_view_name,
    transform_views,
)


def test_default_names():
    p = parse_uri("parquet:///tmp/x.parquet")
    assert p.scheme == "parquet"
    assert source_view_name(p) == "source"
    assert sink_view_name(p) == "sink"
    assert transform_views(p) == ("source", "sink")


def test_named_source():
    p = parse_uri("lineitem+parquet:///data/lineitem.parquet")
    assert source_view_name(p) == "lineitem"
    assert p.path == "/data/lineitem.parquet"


def test_transform_in_out_names():
    p = parse_uri("a+b+sql://SELECT 1")
    assert transform_views(p) == ("a", "b")


def test_dash_normalized_to_underscore():
    p = parse_uri("my-view+parquet:///x")
    assert source_view_name(p) == "my_view"


def test_stream_scheme():
    p = parse_uri("parquet-stream:///data/dir")
    assert p.is_stream
    assert p.base_scheme == "parquet"
    q = parse_uri("parquet:///data/dir")
    assert not q.is_stream


def test_query_params():
    p = parse_uri("csv:///tmp/f.csv?header=false&delimiter=%7C")
    assert p.params == {"header": "false", "delimiter": "|"}


def test_kafka_style_authority():
    p = parse_uri("kafka://localhost:9092/topic-a?startingOffsets=earliest")
    assert p.authority == "localhost:9092"
    assert p.first_path_part() == "topic-a"
