"""Scheme → connector/transform registries.

The reference discovers connectors through Java ``ServiceLoader``
(reference ``uri-parser/src/main/scala/dev/mauch/spark/dfio/DataFrameUrlParser.scala:23-50``).
The Python-idiomatic equivalent is a module-level registry dict plus a
decorator; third-party packages can extend it via normal imports or the
``register_*`` functions.

Each connector may also contribute SparkSession confs (e.g. Delta's SQL
extension), merged at session build time — mirroring reference
``ETL.scala:110-117``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

from spark_etl_cli_spark.uri import ParsedUri, parse_uri

if TYPE_CHECKING:
    from spark_etl_cli_spark.sources.base import DataFrameSink, DataFrameSource
    from spark_etl_cli_spark.pipeline import TransformFn

SourceFactory = Callable[[ParsedUri], "DataFrameSource"]
SinkFactory = Callable[[ParsedUri], "DataFrameSink"]
TransformFactory = Callable[[ParsedUri], "TransformFn"]

_SOURCES: dict[str, SourceFactory] = {}
_SINKS: dict[str, SinkFactory] = {}
_TRANSFORMS: dict[str, TransformFactory] = {}
_SPARK_CONFS: dict[str, str] = {}


class UnknownSchemeError(KeyError):
    pass


def register_source(*schemes: str) -> Callable[[SourceFactory], SourceFactory]:
    def deco(factory: SourceFactory) -> SourceFactory:
        for s in schemes:
            _SOURCES[s] = factory
        return factory

    return deco


def register_sink(*schemes: str) -> Callable[[SinkFactory], SinkFactory]:
    def deco(factory: SinkFactory) -> SinkFactory:
        for s in schemes:
            _SINKS[s] = factory
        return factory

    return deco


def register_transform(*schemes: str) -> Callable[[TransformFactory], TransformFactory]:
    def deco(factory: TransformFactory) -> TransformFactory:
        for s in schemes:
            _TRANSFORMS[s] = factory
        return factory

    return deco


def contribute_spark_confs(confs: dict[str, str]) -> None:
    _SPARK_CONFS.update(confs)


def registered_spark_confs() -> dict[str, str]:
    _ensure_builtins()
    return dict(_SPARK_CONFS)


def _ensure_builtins() -> None:
    """Import built-in connector/transform modules (idempotent)."""
    import spark_etl_cli_spark.sources  # noqa: F401
    import spark_etl_cli_spark.operators.transforms  # noqa: F401


def resolve_source(uri: str) -> tuple[ParsedUri, "DataFrameSource"]:
    _ensure_builtins()
    p = parse_uri(uri)
    try:
        return p, _SOURCES[p.scheme](p)
    except KeyError:
        raise UnknownSchemeError(
            f"no source registered for scheme {p.scheme!r} "
            f"(known: {sorted(_SOURCES)})"
        ) from None


def resolve_sink(uri: str) -> tuple[ParsedUri, "DataFrameSink"]:
    _ensure_builtins()
    p = parse_uri(uri)
    try:
        return p, _SINKS[p.scheme](p)
    except KeyError:
        raise UnknownSchemeError(
            f"no sink registered for scheme {p.scheme!r} (known: {sorted(_SINKS)})"
        ) from None


def resolve_transform(uri: str) -> tuple[ParsedUri, "TransformFn"]:
    _ensure_builtins()
    p = parse_uri(uri)
    try:
        return p, _TRANSFORMS[p.scheme](p)
    except KeyError:
        raise UnknownSchemeError(
            f"no transform registered for scheme {p.scheme!r} "
            f"(known: {sorted(_TRANSFORMS)})"
        ) from None


def known_schemes() -> dict[str, list[str]]:
    _ensure_builtins()
    return {
        "sources": sorted(_SOURCES),
        "sinks": sorted(_SINKS),
        "transforms": sorted(_TRANSFORMS),
    }
