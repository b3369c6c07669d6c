"""Engine-free Delta Lake BATCH READER: replay the transaction log.

The Delta protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md)
is public: a table is a directory of parquet data files plus a
``_delta_log/`` of ordered JSON commits (and periodic parquet
checkpoints), where each commit carries ``add``/``remove`` file actions
and ``metaData`` (schema + partition columns). Replaying the log yields
the current snapshot's file list — which plain ``spark.read.parquet``
can then scan. That makes ``delta://`` READS work without the
delta-spark jars (mirroring the stdlib SpreadsheetML fallback of the
excel connector, sources/xlsx_lite.py); writes still need the real
commit protocol and stay gated.

Supported: JSON commits, ``_last_checkpoint`` + single-file parquet
checkpoints, partition columns (restored from ``partitionValues`` with
schema-typed casts), schema from ``metaData.schemaString``.
Unsupported (raises): multi-part checkpoints, deletion vectors,
column mapping.
"""

from __future__ import annotations

import json
import os
from typing import Any
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def is_delta_table(table_path: str) -> bool:
    return os.path.isdir(_log_dir(table_path))


def _read_checkpoint(spark: SparkSession, log_dir: str) -> tuple[int, list[dict], dict | None]:
    """Returns (checkpoint_version, active add actions, metaData or None)."""
    lc = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(lc):
        return -1, [], None
    with open(lc) as fh:
        info = json.load(fh)
    version = int(info["version"])
    if info.get("parts"):
        raise NotImplementedError(
            "multi-part Delta checkpoints need the delta-spark jars"
        )
    cp_path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    rows = spark.read.parquet(cp_path).collect()
    adds, meta = [], None
    for r in rows:
        d = r.asDict(recursive=True)
        if d.get("add"):
            adds.append(d["add"])
        if d.get("metaData") and d["metaData"].get("id"):
            meta = d["metaData"]
    return version, adds, meta


def _replay(
    spark: SparkSession, table_path: str, version_as_of: int | None = None
) -> tuple[list[dict], dict]:
    log_dir = _log_dir(table_path)
    if version_as_of is None:
        cp_version, adds, meta = _read_checkpoint(spark, log_dir)
    else:
        # time travel: replay from scratch up to the requested version
        # (checkpoints may postdate it, so they can't be used)
        cp_version, adds, meta = -1, [], None
    active: dict[str, dict] = {a["path"]: a for a in adds}
    commits = sorted(
        f for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:20].isdigit() and int(f[:20]) > cp_version
        and (version_as_of is None or int(f[:20]) <= version_as_of)
    )
    if version_as_of is not None and (
        not commits or int(commits[-1][:20]) < version_as_of
    ):
        raise ValueError(
            f"versionAsOf={version_as_of} not found in {log_dir}"
        )
    for fname in commits:
        with open(os.path.join(log_dir, fname)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action: dict[str, Any] = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    # the log stores paths RFC 2396 URL-encoded
                    # (spaces, '=' in partition dirs, ...); decode so
                    # add/remove keys agree and filesystem joins work
                    add = dict(action["add"])
                    add["path"] = unquote(add["path"])
                    active[add["path"]] = add
                elif "remove" in action:
                    active.pop(unquote(action["remove"]["path"]), None)
                elif "protocol" in action:
                    pr = action["protocol"]
                    if int(pr.get("minReaderVersion", 1)) > 2:
                        raise NotImplementedError(
                            f"Delta reader protocol {pr} needs delta-spark"
                        )
    if meta is None:
        raise ValueError(f"no Delta metaData action found under {log_dir}")
    for a in active.values():
        if a.get("deletionVector"):
            raise NotImplementedError("deletion vectors need delta-spark")
    return list(active.values()), meta


def read_delta_lite(
    spark: SparkSession, table_path: str, version_as_of: int | None = None
) -> DataFrame:
    """Batch read of a Delta table snapshot via log replay; pass
    ``version_as_of`` for time travel to an earlier version."""
    adds, meta = _replay(spark, table_path, version_as_of)
    full_schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    part_cols = meta.get("partitionColumns") or []
    data_schema = T.StructType(
        [f for f in full_schema.fields if f.name not in part_cols]
    )
    if not adds:
        return spark.createDataFrame([], full_schema)

    # group files by partition tuple; restore partition columns as typed
    # literals (they are NOT stored in the data files)
    groups: dict[tuple, list[str]] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in part_cols)
        groups.setdefault(key, []).append(
            os.path.join(table_path, a["path"])
        )
    parts: list[DataFrame] = []
    for key, paths in sorted(groups.items()):
        df = spark.read.schema(data_schema).parquet(*paths)
        for col, raw in zip(part_cols, key):
            typ = full_schema[col].dataType
            df = df.withColumn(
                col,
                F.lit(raw).cast(typ) if raw is not None
                else F.lit(None).cast(typ),
            )
        parts.append(df.select(*[f.name for f in full_schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
