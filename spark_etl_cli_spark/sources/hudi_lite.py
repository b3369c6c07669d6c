"""Engine-free Apache Hudi COPY-ON-WRITE reader: replay the timeline.

The Hudi spec (https://hudi.apache.org/tech-specs/) is public: a table
is parquet base files under partition paths plus a ``.hoodie/``
timeline of instants — ``<ts>.commit`` / ``<ts>.replacecommit`` JSON
files whose ``partitionToWriteStats`` lists the files each commit
wrote. COW semantics: an updated file group gets a NEW base file under
the same ``fileId``; the newest base file per file group IS the
snapshot. Replaying completed commits and keeping the latest slice per
fileId therefore yields the current table — plain
``spark.read.parquet`` scans it. Same replay-the-public-protocol
pattern as ``delta_lite``/``iceberg_lite``.

Supported: COW tables, multi-commit updates (latest file slice wins),
``replacecommit`` (clustering/insert-overwrite: replaced file groups
dropped via ``partitionToReplaceFileIds``), ``as-of=<ts>`` time travel
(instants up to ts). Raises clearly on MERGE-ON-READ tables (log files
need the Hudi runtime's merge machinery).
"""

from __future__ import annotations

import glob as _glob
import json
import os

from pyspark.sql import DataFrame, SparkSession


def is_hudi_table(table_path: str) -> bool:
    return os.path.isdir(os.path.join(table_path, ".hoodie"))


def _table_type(table_path: str) -> str:
    props = os.path.join(table_path, ".hoodie", "hoodie.properties")
    if os.path.exists(props):
        with open(props) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("hoodie.table.type="):
                    return line.split("=", 1)[1]
    return "COPY_ON_WRITE"


def _completed_instants(table_path: str) -> list[tuple[str, str, str]]:
    """[(timestamp, action, path)] for completed commits, sorted by ts.

    Hudi 0.x names completed instants ``<ts>.commit``; 1.x uses
    ``<ts>_<completion-ts>.commit``. Both parse here. ``.inflight`` /
    ``.requested`` markers are in-progress and skipped; timeline may
    live in ``.hoodie/`` (0.x) or ``.hoodie/timeline/`` (1.x).
    """
    out = []
    for sub in ("", "timeline"):
        tdir = os.path.join(table_path, ".hoodie", sub)
        for action in ("commit", "replacecommit"):
            for p in _glob.glob(os.path.join(tdir, f"*.{action}")):
                name = os.path.basename(p)[: -(len(action) + 1)]
                ts = name.split("_")[0]
                if ts.isdigit():
                    out.append((ts, action, p))
    return sorted(out)


def read_hudi_lite(
    spark: SparkSession, table_path: str, as_of: str | None = None
) -> DataFrame:
    ttype = _table_type(table_path)
    if ttype != "COPY_ON_WRITE":
        raise NotImplementedError(
            f"hudi_lite reads COPY_ON_WRITE tables; {ttype} (merge-on-read) "
            "log-file merging needs the Hudi runtime"
        )
    instants = _completed_instants(table_path)
    if as_of is not None:
        instants = [i for i in instants if i[0] <= str(as_of)]
    if not instants:
        raise ValueError(
            f"no completed Hudi commits under {table_path}/.hoodie"
            + (f" at or before {as_of}" if as_of else "")
        )
    # latest file slice per (partition, fileId); replacecommits drop
    # whole file groups (clustering / insert_overwrite)
    slices: dict[tuple[str, str], str] = {}
    for ts, action, path in instants:
        with open(path) as fh:
            commit = json.load(fh)
        if action == "replacecommit":
            for part, fids in (
                commit.get("partitionToReplaceFileIds") or {}
            ).items():
                for fid in fids:
                    slices.pop((part, fid), None)
        for part, stats in (commit.get("partitionToWriteStats") or {}).items():
            for st in stats:
                fid = st.get("fileId") or st["path"]
                rel = st["path"]
                slices[(part, fid)] = os.path.join(table_path, rel)
    files = sorted(set(slices.values()))
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"hudi commit references missing base files: {missing[:3]}"
        )
    if not files:
        raise ValueError(f"hudi table {table_path} has no live base files")
    df = spark.read.parquet(*files)
    # drop Hudi's bookkeeping meta columns if present (the payload the
    # user wrote is everything after them)
    meta_cols = [c for c in df.columns if c.startswith("_hoodie_")]
    return df.drop(*meta_cols) if meta_cols else df
