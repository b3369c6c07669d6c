"""``iceberg-stream://`` — incremental Iceberg reads, engine-free.

Micro-batch streaming over an Iceberg table's snapshot history (the
shape of real Iceberg's incremental/CDC read): an offset is the last
fully-processed SNAPSHOT ID; each batch reads the data files ADDED by
newer snapshots (manifest entries with status=1), decoded from the
avro manifests by avro_lite and parsed executor-side. Mirrors the
arrowipc/avrostream Python-DataSource pattern: the driver touches only
metadata (snapshot ids, file names + one schema), rows flow through
Arrow batches on executors.

Bounded-state by construction: the offset is one integer; per-batch
work is proportional to the files the producer actually added.
Snapshots that change existing rows (operation=overwrite/delete, e.g.
a copy-on-write DELETE) are refused loudly — their ADDED files re-list
surviving rows, so streaming them would double-count; pass
``?skip-overwrite-snapshots=true`` to drop such snapshots whole (the
same knob real Iceberg's incremental read exposes). ``replace``
snapshots (compaction) are always skipped: the row set is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_FORMAT_NAME = "iceberglite-stream"


@dataclass
class _FilePart(InputPartition):
    file: str
    schema_json: str


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("iceberg stream reader requires a path")
        self.skip_overwrites = str(
            options.get("skip-overwrite-snapshots", "")
        ).lower() in ("1", "true", "yes")
        # steady-state backlog control: ≤N snapshots per micro-batch
        # while tailing (ordinal over the snapshot list — ids are only
        # monotone, not dense); the first batch after a (re)start is
        # uncapped (see deltastream.py for why)
        self.max_commits = int(
            options.get("max-commits-per-batch")
            or options.get("maxcommitsperbatch")
            or 0
        )
        self._pos: int | None = None

    def _meta(self):
        from spark_etl_cli_spark.sources.iceberg_lite import _load_metadata

        return _load_metadata(self.path)

    def initialOffset(self) -> dict:
        return {"snapshot": -1}

    def latestOffset(self) -> dict:
        try:
            meta = self._meta()
        except FileNotFoundError:
            return {"snapshot": -1}
        snaps = meta.get("snapshots") or []
        ids = sorted(s["snapshot-id"] for s in snaps)
        real = ids[-1] if ids else -1
        if self.max_commits and self._pos is not None:
            ahead = [i for i in ids if i > self._pos][: self.max_commits]
            return {"snapshot": ahead[-1] if ahead else self._pos}
        return {"snapshot": real}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._pos = max(
            start.get("snapshot", -1),
            end.get("snapshot", -1),
            self._pos if self._pos is not None else -1,
        )
        from spark_etl_cli_spark.sources.iceberg_lite import (
            _load_metadata,
            _localize,
            _manifest_entries,
            _schema_to_spark,
        )

        lo, hi = start.get("snapshot", -1), end.get("snapshot", -1)
        if hi <= lo:
            return [_FilePart("", "")]
        meta = _load_metadata(self.path)
        schema_json = _schema_to_spark(meta).json()
        files: list[str] = []
        for snap in meta.get("snapshots") or []:
            sid = snap["snapshot-id"]
            if not (lo < sid <= hi):
                continue
            op = (snap.get("summary") or {}).get("operation")
            if op == "replace":
                # compaction/rewrite snapshots (compact_iceberg_lite,
                # real Iceberg's rewrite_data_files) re-add existing
                # rows in new files — streaming them would double-count.
                # Same skip real Iceberg's incremental read applies.
                continue
            if op in ("overwrite", "delete"):
                # row set CHANGED: the added files re-list surviving
                # rows of rewritten files. Never stream them silently.
                if self.skip_overwrites:
                    continue
                raise ValueError(
                    f"iceberg-stream: snapshot {sid} of {self.path} is an "
                    f"{op} (rows updated/deleted); streaming its re-added "
                    "files would double-count surviving rows. Pass "
                    "?skip-overwrite-snapshots=true to skip such snapshots "
                    "(their inserts are skipped too), or use batch "
                    "iceberg:// reads"
                )
            for e in _manifest_entries(self.path, snap):
                if e.get("status") != 1:  # only files ADDED by this snap
                    continue
                dfile = e.get("data_file") or {}
                if (dfile.get("content") or 0) != 0:
                    continue  # delete files are not streamed
                if e.get("snapshot_id") not in (None, sid):
                    continue  # carried entry re-listed by a later manifest
                files.append(_localize(dfile["file_path"], self.path))
        parts = [_FilePart(f, schema_json) for f in sorted(set(files))]
        return parts or [_FilePart("", "")]

    def read(self, partition: _FilePart) -> Iterator:
        if not partition.file:
            return
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file)
        for batch in table.to_batches():
            if batch.num_rows:
                yield batch

    def commit(self, end: dict) -> None:
        return None


class IcebergLiteStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> StructType:
        from spark_etl_cli_spark.sources.iceberg_lite import (
            _load_metadata,
            _schema_to_spark,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg stream requires a path")
        return _schema_to_spark(_load_metadata(path))

    def streamReader(self, schema: StructType) -> _IcebergStreamReader:
        return _IcebergStreamReader(dict(self.options))


_registered_sessions: set[str] = set()


def ensure_registered(spark: SparkSession) -> None:
    key = str(id(spark))
    if key not in _registered_sessions:
        spark.dataSource.register(IcebergLiteStreamSource)
        _registered_sessions.add(key)
