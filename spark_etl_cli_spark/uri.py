"""URI helpers: scheme-prefixed view naming and query-param parsing.

The pipeline's addressing scheme follows the reference's URI grammar
(reference ``core/src/main/scala/dev/mauch/spark/dfio/UriHelpers.scala:17-31``,
``ETL.scala:45-68``):

- ``scheme://...``                → default view name ("source"/"sink")
- ``name+scheme://...``           → source/sink bound to view ``name``
- ``in+out+scheme://...``         → transform reading view ``in``,
                                     registering result as ``out``
- ``-`` in view names normalizes to ``_`` (valid SQL identifiers).

Streaming variants use a ``-stream`` scheme suffix (e.g.
``parquet-stream://``), mirroring reference
``core/.../DataFrameSource.scala:33-45``.
"""

from __future__ import annotations

import urllib.parse
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ParsedUri:
    """A decomposed pipeline URI."""

    scheme: str          # full scheme incl. any -stream suffix
    names: tuple[str, ...]  # leading +-separated view names (may be empty)
    path: str            # URI path (percent-decoded)
    raw_path: str        # URI path as written
    rest: str = ""       # everything after 'scheme://', percent-decoded
    params: dict[str, str] = field(default_factory=dict)
    raw: str = ""

    @property
    def is_stream(self) -> bool:
        return self.scheme.endswith("-stream")

    @property
    def base_scheme(self) -> str:
        return self.scheme[: -len("-stream")] if self.is_stream else self.scheme

    @property
    def authority(self) -> str:
        parsed = urllib.parse.urlparse(self.raw)
        return parsed.netloc

    def first_path_part(self) -> str:
        return self.path.lstrip("/").split("/", 1)[0]


def normalize_view_name(name: str) -> str:
    """``-`` → ``_`` so view names are valid SQL identifiers
    (reference ``ETL.scala:52,85-86``)."""
    return name.replace("-", "_")


def parse_uri(uri: str) -> ParsedUri:
    """Split ``[name+[name+]]scheme://rest`` into names, scheme, path, params."""
    head, sep, _rest = uri.partition("://")
    if not sep:
        raise ValueError(f"not a pipeline URI (missing '://'): {uri!r}")
    *names, scheme = head.split("+")
    canonical = scheme + "://" + _rest
    parsed = urllib.parse.urlparse(canonical)
    params = {
        k: v[-1]
        for k, v in urllib.parse.parse_qs(parsed.query, keep_blank_values=True).items()
    }
    # netloc-style URIs (kafka://host:port/topic) keep netloc out of path
    raw_path = parsed.path
    return ParsedUri(
        scheme=scheme,
        names=tuple(normalize_view_name(n) for n in names),
        path=urllib.parse.unquote(raw_path),
        raw_path=raw_path,
        rest=urllib.parse.unquote(_rest),
        params=params,
        raw=canonical,
    )


def source_view_name(p: ParsedUri) -> str:
    return p.names[0] if p.names else "source"


def sink_view_name(p: ParsedUri) -> str:
    return p.names[0] if p.names else "sink"


def transform_views(p: ParsedUri) -> tuple[str, str]:
    """(input_view, output_view) for a transform URI; defaults source→sink."""
    if len(p.names) >= 2:
        return p.names[0], p.names[1]
    if len(p.names) == 1:
        return p.names[0], p.names[0]
    return "source", "sink"
