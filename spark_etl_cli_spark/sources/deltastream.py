"""``delta-stream://`` READS without delta-spark: a Python DataSource
micro-batch reader over the transaction log.

The offset is the last fully-processed delta VERSION; each batch reads
the parquet files ADDED by commits in (last, latest] — the same
additions-only contract as Spark's own file sources and the
iceberg-stream twin (sources/icebergstream.py). Removes/rewrites in a
commit are not retracted (stream additions, not CDC); deletion-vector
re-adds are rejected loudly rather than silently double-counting.

Driver touches only the JSON log (file names); parquet decoding runs
executor-side through Arrow batches. Checkpoint files are irrelevant
here — offsets advance commit-by-commit from the JSON tail, which is
exactly the part of the log checkpoints compact away for BATCH readers.
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

_FORMAT_NAME = "deltalite-stream"


def _log_dir(path: str) -> str:
    return os.path.join(path, "_delta_log")


def _versions(path: str) -> list[int]:
    try:
        names = os.listdir(_log_dir(path))
    except FileNotFoundError:
        return []
    return sorted(
        int(f[:20])
        for f in names
        if f.endswith(".json") and f[:20].isdigit()
    )


@dataclass
class _FilePart(InputPartition):
    file: str


class _DeltaLiteStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("deltalite stream reader requires a path")

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        vs = _versions(self.path)
        return {"version": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = start.get("version", -1), end.get("version", -1)
        files: list[str] = []
        for v in _versions(self.path):
            if not (lo < v <= hi):
                continue
            commit = os.path.join(_log_dir(self.path), f"{v:020d}.json")
            with open(commit) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    add = action.get("add")
                    if not add:
                        continue
                    if add.get("dataChange") is False:
                        # compaction/optimize re-adds carry no new rows
                        # (protocol dataChange=false); delivering them
                        # would double-count — same skip real Delta
                        # streaming applies
                        continue
                    if add.get("deletionVector"):
                        raise ValueError(
                            "delta-stream (jar-less) cannot stream a "
                            "deletion-vector re-add without double-counting; "
                            "use batch delta:// reads for DV tables"
                        )
                    from urllib.parse import unquote

                    files.append(
                        os.path.join(self.path, unquote(add["path"]))
                    )
        parts = [_FilePart(f) for f in sorted(set(files))]
        return parts or [_FilePart("")]

    def read(self, partition: _FilePart) -> Iterator:
        if not partition.file:
            return
        import pyarrow.parquet as pq

        for batch in pq.read_table(partition.file).to_batches():
            if batch.num_rows:
                yield batch

    def commit(self, end: dict) -> None:
        return None


class DeltaLiteStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> StructType:
        # runs in a session-less Python worker: parse schemaString
        # (pure-python StructType.fromJson) from the latest metaData
        path = self.options.get("path")
        if not path:
            raise ValueError("deltalite stream requires a path")
        from pyspark.sql.types import StructType as _St

        meta = None
        for v in _versions(path):
            commit = os.path.join(_log_dir(path), f"{v:020d}.json")
            with open(commit) as fh:
                for line in fh:
                    if line.strip():
                        action = json.loads(line)
                        if "metaData" in action:
                            meta = action["metaData"]
        if meta is None:
            raise FileNotFoundError(
                f"no delta metaData found under {path!r} (checkpoint-only "
                "logs need the delta-spark jars for streaming)"
            )
        if meta.get("partitionColumns"):
            # partition values live in the log, not the data files; the
            # batch reader restores them but this streaming fast path
            # does not — refuse rather than emit a wrong-shaped frame
            raise NotImplementedError(
                "jar-less delta-stream reads support unpartitioned tables; "
                "partitioned tables need delta-spark (or batch delta:// "
                "reads, which restore partition columns)"
            )
        return _St.fromJson(json.loads(meta["schemaString"]))

    def streamReader(self, schema: StructType) -> _DeltaLiteStreamReader:
        return _DeltaLiteStreamReader(dict(self.options))


_registered_sessions: set[str] = set()


def ensure_registered(spark: SparkSession) -> None:
    key = str(id(spark))
    if key not in _registered_sessions:
        spark.dataSource.register(DeltaLiteStreamSource)
        _registered_sessions.add(key)
