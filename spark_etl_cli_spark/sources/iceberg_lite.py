"""Engine-free Apache Iceberg BATCH READER: walk the table metadata.

The Iceberg spec (https://iceberg.apache.org/spec/) is public: a table
is a directory of parquet data files plus ``metadata/`` holding
``vN.metadata.json`` (schema, snapshots), an Avro *manifest list* per
snapshot, and Avro *manifest files* enumerating data/delete files.
Walking metadata → manifest list → manifests yields the snapshot's
file set, which plain ``spark.read.parquet`` scans — the same
replay-the-public-protocol pattern as ``delta_lite``, now possible
because ``sources/avro_lite.py`` decodes the Avro manifests without
any jar.

Supported: format v1 and v2 tables; ``snapshot-id`` time travel;
v2 POSITION deletes (parquet ``(file_path, pos)`` applied as a
positional anti-join over ``_metadata``) and EQUALITY deletes
(anti-join on the delete file's columns); schema from the
current-schema-id entry (nested struct/list/map, decimal, temporal
types).

Simplifications (documented, fail-safe): deletes are applied to the
WHOLE snapshot rather than per-sequence-number (correct for the
overwhelmingly common append+delete flow; a file re-added *after* a
delete targeting it would be over-deleted), and partition pruning is
left to parquet row-group stats.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def is_iceberg_table(table_path: str) -> bool:
    return bool(
        _glob.glob(os.path.join(table_path, "metadata", "*.metadata.json"))
    )


def _load_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            v = fh.read().strip()
        cand = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(cand):
            with open(cand) as fh:
                return json.load(fh)
    files = _glob.glob(os.path.join(meta_dir, "*.metadata.json"))
    if not files:
        raise FileNotFoundError(f"no Iceberg metadata under {meta_dir}")

    def version_of(p: str) -> int:
        m = re.match(r"v?(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    with open(max(files, key=version_of)) as fh:
        return json.load(fh)


def _localize(path: str, table_path: str) -> str:
    """Manifest/data paths are absolute URIs as written by the original
    engine; strip the scheme and, if the absolute path does not exist
    (table was MOVED), re-root it under ``table_path``."""
    p = re.sub(r"^file:/+", "/", path)
    if os.path.exists(p):
        return p
    # re-root: keep everything from the last path component matching
    # the table dir name onward
    base = os.path.basename(os.path.normpath(table_path))
    idx = p.find(f"/{base}/")
    if idx >= 0:
        cand = os.path.join(table_path, p[idx + len(base) + 2 :])
        if os.path.exists(cand):
            return cand
    return p


def _schema_to_spark(meta: dict) -> T.StructType:
    schemas = meta.get("schemas")
    if schemas:
        cur = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in schemas if s.get("schema-id") == cur), schemas[-1]
        )
    else:
        schema = meta["schema"]  # v1 single-schema form

    def conv(t) -> T.DataType:
        if isinstance(t, dict):
            kind = t["type"]
            if kind == "struct":
                return T.StructType(
                    [
                        T.StructField(
                            f["name"], conv(f["type"]), not f.get("required")
                        )
                        for f in t["fields"]
                    ]
                )
            if kind == "list":
                return T.ArrayType(
                    conv(t["element"]), not t.get("element-required")
                )
            if kind == "map":
                return T.MapType(
                    conv(t["key"]), conv(t["value"]),
                    not t.get("value-required"),
                )
            raise ValueError(f"iceberg_lite: unknown nested type {t!r}")
        if t.startswith("decimal"):
            m = re.match(r"decimal\((\d+),\s*(\d+)\)", t)
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if t.startswith("fixed"):
            return T.BinaryType()
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "date": T.DateType(),
            "time": T.LongType(),
            "timestamp": T.TimestampNTZType(),
            "timestamptz": T.TimestampType(),
            "string": T.StringType(),
            "uuid": T.StringType(),
            "binary": T.BinaryType(),
        }
        if t not in prim:
            raise ValueError(f"iceberg_lite: unknown type {t!r}")
        return prim[t]

    return conv(schema)


def _snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("iceberg table has no snapshots (empty table?)")
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
    for s in snaps:
        if s.get("snapshot-id") == snapshot_id:
            return s
    raise ValueError(f"snapshot-id {snapshot_id} not found")


def _manifest_entries(table_path: str, snap: dict) -> list[dict]:
    from spark_etl_cli_spark.sources.avro_lite import read_container

    ml_path = _localize(snap["manifest-list"], table_path)
    with open(ml_path, "rb") as fh:
        _, manifests = read_container(fh.read())
    entries: list[dict] = []
    for m in manifests:
        mp = _localize(m["manifest_path"], table_path)
        with open(mp, "rb") as fh:
            _, recs = read_container(fh.read())
        entries.extend(recs)
    return entries


def read_iceberg_lite(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    meta = _load_metadata(table_path)
    fv = int(meta.get("format-version", 1))
    if fv > 2:
        raise NotImplementedError(
            f"iceberg_lite reads format v1/v2 tables, got v{fv}"
        )
    spark_schema = _schema_to_spark(meta)
    snap = _snapshot(meta, snapshot_id)
    data_files: list[str] = []
    pos_deletes: list[str] = []
    eq_deletes: list[str] = []
    for e in _manifest_entries(table_path, snap):
        if e.get("status") == 2:  # DELETED entry
            continue
        dfile = e.get("data_file") or {}
        path = _localize(dfile["file_path"], table_path)
        content = dfile.get("content") or 0
        if content == 0:
            data_files.append(path)
        elif content == 1:
            pos_deletes.append(path)
        elif content == 2:
            eq_deletes.append(path)
    if not data_files:
        return spark.createDataFrame([], spark_schema)
    df = spark.read.schema(spark_schema).parquet(*data_files)
    norm = lambda c: F.regexp_replace(c, "^file:/+", "/")  # noqa: E731
    if pos_deletes:
        # position-delete files: (file_path, pos[, row]) — drop the
        # (file, row ordinal) pairs they name, matching on normalized
        # paths since writers disagree about the file:// prefix
        dels = (
            spark.read.parquet(*pos_deletes)
            .select(
                norm(F.col("file_path")).alias("__dfile"),
                F.col("pos").cast("long").alias("__dpos"),
            )
            .distinct()
        )
        df = (
            df.select(
                "*",
                norm(F.col("_metadata.file_path")).alias("__dfile"),
                F.col("_metadata.row_index").alias("__dpos"),
            )
            .join(F.broadcast(dels), ["__dfile", "__dpos"], "left_anti")
            .drop("__dfile", "__dpos")
        )
    for path in eq_deletes:
        eq = spark.read.parquet(path)
        df = df.join(F.broadcast(eq.distinct()), eq.columns, "left_anti")
    return df
