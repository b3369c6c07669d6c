"""``hudi-stream://`` — incremental Hudi reads, engine-free.

Micro-batch streaming over a Hudi table's timeline (the shape of real
Hudi's incremental query): an offset is the last fully-processed
INSTANT timestamp; each batch reads the base files of newer
PURE-INSERT instants (commits/deltacommits whose write stats name only
brand-new file groups and no log files). Mirrors the deltastream /
icebergstream Python-DataSource pattern — the driver touches only
timeline JSON (instant ids, file names, one schema), rows flow through
Arrow batches on executors.

Row-changing instants are never streamed silently: a replacecommit
(clustering / insert_overwrite / COW DELETE), a log-file write (MOR
update/delete), or a commit re-listing an EXISTING file group (COW
upsert rewrite, MOR compaction) would double-count or drop rows. They
raise with guidance; ``?skip-change-commits=true`` skips such instants
whole — the same contract the delta-lite stream reader exposes as
``skipChangeCommits``.
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

_FORMAT_NAME = "hudilite-stream"


@dataclass
class _FilePart(InputPartition):
    file: str


def _table_schema(path: str) -> StructType:
    """Spark schema from the NEWEST base file's parquet footer, hoodie
    meta columns dropped (the payload the user wrote)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.parquet as pq

    from spark_etl_cli_spark.sources.hudi_lite import (
        _completed_instants,
        _live_file_slices,
    )

    instants = _completed_instants(path)
    groups = _live_file_slices(path, instants)
    bases = sorted(
        ent["base"] for ent in groups.values() if ent["base"]
    )
    if not bases:
        raise ValueError(
            f"hudi-stream: table {path} has no base files to derive a "
            "schema from"
        )
    arrow = pq.read_schema(bases[-1])
    keep = [n for n in arrow.names if not n.startswith("_hoodie_")]
    return StructType(
        [
            f
            for f in from_arrow_schema(arrow).fields
            if f.name in keep
        ]
    )


class _HudiStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hudi stream reader requires a path")
        # Python DataSource option keys arrive LOWERCASED
        self.skip_changes = str(
            options.get("skip-change-commits", "")
        ).lower() in ("1", "true", "yes")
        # steady-state backlog control: ≤N instants per micro-batch
        # while tailing (ordinal over the timeline — instants are
        # timestamps, not dense); the first batch after a (re)start is
        # uncapped (see deltastream.py for why)
        self.max_commits = int(
            options.get("max-commits-per-batch")
            or options.get("maxcommitsperbatch")
            or 0
        )
        self._pos: int | None = None

    def initialOffset(self) -> dict:
        return {"instant": 0}

    def latestOffset(self) -> dict:
        from spark_etl_cli_spark.sources.hudi_lite import (
            _completed_instants,
        )

        instants = _completed_instants(self.path)
        ts_list = sorted(int(i[0]) for i in instants)
        real = ts_list[-1] if ts_list else 0
        if self.max_commits and self._pos is not None:
            ahead = [t for t in ts_list if t > self._pos][
                : self.max_commits
            ]
            return {"instant": ahead[-1] if ahead else self._pos}
        return {"instant": real}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from spark_etl_cli_spark.sources.hudi_lite import (
            _completed_instants,
        )

        lo, hi = int(start.get("instant", 0)), int(end.get("instant", 0))
        self._pos = max(lo, hi, self._pos if self._pos is not None else 0)
        if hi <= lo:
            return [_FilePart("")]
        files: list[str] = []
        seen_fids: set[str] = set()
        for ts, action, ipath in _completed_instants(self.path):
            with open(ipath) as fh:
                commit = json.load(fh)
            stats = [
                (part, st)
                for part, sts in (
                    commit.get("partitionToWriteStats") or {}
                ).items()
                for st in sts
            ]
            fids = {st.get("fileId") or st["path"] for _p, st in stats}
            in_range = lo < int(ts) <= hi
            if in_range:
                has_logs = any(
                    ".log." in os.path.basename(st["path"])
                    for _p, st in stats
                )
                rewrites = fids & seen_fids
                if action == "replacecommit" or has_logs or rewrites:
                    if not self.skip_changes:
                        kind = (
                            "replacecommit"
                            if action == "replacecommit"
                            else "log-file write"
                            if has_logs
                            else f"rewrite of file groups {sorted(rewrites)[:3]}"
                        )
                        raise ValueError(
                            f"hudi-stream: instant {ts} of {self.path} is a "
                            f"{kind} (rows updated/deleted/re-listed); "
                            "streaming it would double-count or drop rows. "
                            "Pass ?skip-change-commits=true to skip such "
                            "instants whole, or use batch hudi:// reads"
                        )
                else:
                    files.extend(
                        os.path.join(self.path, st["path"])
                        for _p, st in stats
                        if st["path"]
                    )
            seen_fids |= fids
        parts = [_FilePart(f) for f in sorted(set(files))]
        return parts or [_FilePart("")]

    def read(self, partition: _FilePart) -> Iterator:
        if not partition.file:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file)
        drop = [n for n in table.schema.names if n.startswith("_hoodie_")]
        if drop:
            table = table.drop_columns(drop)
        for batch in table.to_batches():
            if batch.num_rows:
                yield batch

    def commit(self, end: dict) -> None:
        return None


class HudiLiteStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("hudi stream requires a path")
        return _table_schema(path)

    def streamReader(self, schema: StructType) -> _HudiStreamReader:
        return _HudiStreamReader(dict(self.options))


_registered_sessions: set[str] = set()


def ensure_registered(spark: SparkSession) -> None:
    key = str(id(spark))
    if key not in _registered_sessions:
        spark.dataSource.register(HudiLiteStreamSource)
        _registered_sessions.add(key)
