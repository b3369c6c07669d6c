"""``delta-stream://…?readChangeFeed=true`` — a Change Data Feed
STREAM without delta-spark jars: a Python DataSource micro-batch
reader that delivers each commit's change records.

Same offset model as the plain deltalite stream (sources/
deltastream.py): the offset is the last fully-processed delta VERSION.
The difference is WHAT a commit yields — change records, not table
rows:

- commits carrying ``cdc`` actions (UPDATE / DELETE / MERGE wrote
  change files under ``_change_data/``) stream those files verbatim;
- other commits derive changes exactly like the batch
  ``read_delta_changes`` (sources/delta_lite.py): adds with
  dataChange=true are ``insert`` records, removes with dataChange=true
  are ``delete`` records read from the removed files (a vacuumed file
  raises loudly instead of silently dropping changes).

Output schema = table schema + ``_change_type`` / ``_commit_version``
/ ``_commit_timestamp`` — the same three columns real Delta's
``readChangeFeed`` streaming source appends, so a downstream
``?mode=merge`` / ``?mode=cdc`` delta sink can replicate the table.
Driver touches only the JSON log; parquet decoding runs executor-side
through Arrow. Exactly-once across restarts via the checkpointed
version offset (reference streaming surface: DeltaUriParser.scala
13-60; CDF itself is delta PROTOCOL.md "Add CDC File").
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from spark_etl_cli_spark.sources.deltastream import (
    _latest_meta,
    _log_dir,
    _versions,
    _with_partition_columns,
)

_FORMAT_NAME = "deltalite-cdf-stream"

_CDC_COL = "_change_type"
_VER_COL = "_commit_version"
_TS_COL = "_commit_timestamp"


@dataclass
class _CdfPart(InputPartition):
    file: str
    kind: str  # "cdc" | "insert" | "delete"
    version: int
    ts_ms: int
    part_json: str = ""  # partition values for derived files, "" = none
    schema_json: str = ""  # TABLE schema (without the CDF columns)


def _cdf_enabled(meta: dict | None) -> bool:
    cfg = (meta or {}).get("configuration") or {}
    return str(cfg.get("delta.enableChangeDataFeed", "")).lower() in (
        "true",
        "1",
    )


class _CdfStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("deltalite CDF stream reader requires a path")
        # Spark lowercases Python data source option keys
        sv = options.get("startingversion") or options.get(
            "startingVersion"
        )
        self.starting_version = int(sv) if sv is not None else 0
        # steady-state backlog control, same contract as deltastream:
        # ≤N commits per micro-batch while tailing; the first batch
        # after a (re)start is uncapped (see deltastream.py)
        self.max_commits = int(
            options.get("max-commits-per-batch")
            or options.get("maxcommitsperbatch")
            or 0
        )
        self._pos: int | None = None

    def initialOffset(self) -> dict:
        return {"version": self.starting_version - 1}

    def latestOffset(self) -> dict:
        vs = _versions(self.path)
        real = vs[-1] if vs else self.starting_version - 1
        if self.max_commits and self._pos is not None:
            real = min(real, self._pos + self.max_commits)
        return {"version": real}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from urllib.parse import unquote

        lo, hi = start.get("version", -1), end.get("version", -1)
        self._pos = max(lo, hi, self._pos if self._pos is not None else -1)
        meta = _latest_meta(self.path) or {}
        schema_json = meta.get("schemaString", "")
        parts: list[_CdfPart] = []
        for v in _versions(self.path):
            if not (lo < v <= hi):
                continue
            commit = os.path.join(_log_dir(self.path), f"{v:020d}.json")
            with open(commit) as fh:
                actions = [
                    json.loads(line) for line in fh if line.strip()
                ]
            ts_ms = next(
                (
                    a["commitInfo"].get("timestamp")
                    for a in actions
                    if "commitInfo" in a
                    and a["commitInfo"].get("timestamp") is not None
                ),
                None,
            )
            if ts_ms is None:
                ts_ms = int(os.path.getmtime(commit) * 1000)
            cdc = [a["cdc"] for a in actions if "cdc" in a]
            if cdc:
                # the cdc files ARE the commit's change set; add/remove
                # actions in the same commit describe the table rewrite,
                # not additional changes (PROTOCOL.md "Add CDC File")
                for c in cdc:
                    f = os.path.join(self.path, unquote(c["path"]))
                    if not os.path.exists(f):
                        raise FileNotFoundError(
                            f"change data file vacuumed away: {f}"
                        )
                    parts.append(
                        _CdfPart(f, "cdc", v, ts_ms, "", schema_json)
                    )
                continue
            for a in actions:
                add = a.get("add")
                rem = a.get("remove")
                if add and add.get("dataChange", True):
                    if add.get("deletionVector"):
                        raise ValueError(
                            "CDF stream: deletion-vector re-add without "
                            "cdc actions — was the table written with "
                            "enableChangeDataFeed set? Use batch "
                            "readChangeFeed or rewrite with CDF on"
                        )
                    pv = add.get("partitionValues") or {}
                    parts.append(
                        _CdfPart(
                            os.path.join(self.path, unquote(add["path"])),
                            "insert",
                            v,
                            ts_ms,
                            json.dumps(pv) if pv else "",
                            schema_json,
                        )
                    )
                elif rem and rem.get("dataChange", True):
                    f = os.path.join(self.path, unquote(rem["path"]))
                    if not os.path.exists(f):
                        raise FileNotFoundError(
                            "CDF stream: removed data file vacuumed "
                            f"away, cannot derive deletes: {f}"
                        )
                    pv = rem.get("partitionValues") or {}
                    parts.append(
                        _CdfPart(
                            f,
                            "delete",
                            v,
                            ts_ms,
                            json.dumps(pv) if pv else "",
                            schema_json,
                        )
                    )
        return parts or [_CdfPart("", "cdc", -1, 0)]

    def read(self, partition: _CdfPart) -> Iterator:
        if not partition.file:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file)
        if partition.kind == "cdc":
            # change file: table columns (possibly pre-widening) +
            # _change_type. Conform the data columns to the declared
            # schema, then re-attach the file's _change_type.
            change_type = table.column(_CDC_COL)
            base = table.drop_columns([_CDC_COL])
            base = _with_partition_columns(
                base, "{}", partition.schema_json
            )
            table = base.append_column(_CDC_COL, change_type)
        else:
            table = _with_partition_columns(
                table, partition.part_json or "{}", partition.schema_json
            )
            n = table.num_rows
            table = table.append_column(
                _CDC_COL, pa.array([partition.kind] * n, pa.string())
            )
        n = table.num_rows
        table = table.append_column(
            _VER_COL, pa.array([partition.version] * n, pa.int64())
        )
        table = table.append_column(
            _TS_COL,
            pa.array(
                [partition.ts_ms * 1000] * n, pa.timestamp("us")
            ),
        )
        for batch in table.to_batches():
            if batch.num_rows:
                yield batch

    def commit(self, end: dict) -> None:
        return None


class DeltaLiteCdfStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalite CDF stream requires a path")
        from pyspark.sql import types as T

        meta = _latest_meta(path)
        if meta is None:
            raise FileNotFoundError(
                f"no delta metaData found under {path!r}"
            )
        if not _cdf_enabled(meta):
            raise ValueError(
                f"table {path} does not have "
                "delta.enableChangeDataFeed=true; create it with "
                "?enableChangeDataFeed=true to stream changes"
            )
        base = T.StructType.fromJson(json.loads(meta["schemaString"]))
        return T.StructType(
            list(base.fields)
            + [
                T.StructField(_CDC_COL, T.StringType()),
                T.StructField(_VER_COL, T.LongType()),
                T.StructField(_TS_COL, T.TimestampType()),
            ]
        )

    def streamReader(self, schema: StructType) -> _CdfStreamReader:
        return _CdfStreamReader(dict(self.options))


_registered_sessions: set[str] = set()


def ensure_registered(spark: SparkSession) -> None:
    key = str(id(spark))
    if key not in _registered_sessions:
        spark.dataSource.register(DeltaLiteCdfStreamSource)
        _registered_sessions.add(key)
