#!/usr/bin/env python
"""Two-scale growth measurement for lakehouse ROW OPS (MERGE / CDC
apply / iceberg upsert) — the row-ops mirror of scale_growth.py.

The 100 TB claim for copy-on-write row ops is that work scales with the
AFFECTED partition/file count, not table size: a MERGE touching 2 of P
partitions rewrites ~the same bytes whether the table holds N or 10N
rows, because location is one distributed key probe (broadcast on the
small source side) and only matched files re-read/rewrite.

This script builds a hive-partitioned target at 1x (N rows, P parts)
and 10x (10N rows, 10P parts), applies the SAME change batch (keys in
the same 2 partitions) at both scales, and reports files_rewritten,
files_added, shuffle bytes written across every execution the op
spawned, and wall seconds. Flat (~1x) rewritten-file/shuffle growth at
10x the table = the evidence; a table-scan rewrite would grow ~10x.

Usage:
  python scripts/scale_rowops.py [--rows 200000] [--parts 20]
Prints a markdown table (paste into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_UNIT = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4}


def _parse_bytes(value: str) -> int:
    line = value.strip().splitlines()[-1]
    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", line)
    return int(float(m.group(1)) * _UNIT[m.group(2)]) if m else 0


def run_op_measured(spark, fn):
    """(result, shuffle_bytes_written, wall_sec) for one row op —
    shuffle bytes summed over EVERY SQL execution the op spawned
    (row ops run several internal jobs: probe, rewrite, stats)."""
    store = spark._jsparkSession.sharedState().statusStore()
    n0 = store.executionsList().size()
    t0 = time.time()
    result = fn()
    wall = time.time() - t0
    time.sleep(1.5)  # listener-bus drain before reading the store
    execs = store.executionsList()
    sb = 0
    for idx in range(n0, execs.size()):
        e = execs.apply(idx)
        mv = e.metricValues()
        if mv is None:
            continue
        g = store.planGraph(e.executionId())
        nit = g.allNodes().iterator()
        while nit.hasNext():
            node = nit.next()
            mit = node.metrics().iterator()
            while mit.hasNext():
                m = mit.next()
                if str(m.name()) == "shuffle bytes written" and mv.contains(
                    m.accumulatorId()
                ):
                    sb += _parse_bytes(str(mv.apply(m.accumulatorId())))
    return result, sb, round(wall, 2)


def build_delta(spark, path: str, rows: int, parts: int) -> None:
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.sources.delta_lite import write_delta_lite

    if os.path.isdir(path):
        shutil.rmtree(path)
    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            F.concat(F.lit("p"), (F.col("id") % parts).cast("string")).alias(
                "part"
            ),
            (F.col("id") * 2).cast("double").alias("v"),
        )
        # one file per partition directory: file count scales with P
        .repartition("part")
    )
    write_delta_lite(df, path, partition_by=["part"])


def build_iceberg(spark, path: str, rows: int, parts: int) -> None:
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.sources.iceberg_lite import write_iceberg_lite

    if os.path.isdir(path):
        shutil.rmtree(path)
    df = (
        spark.range(rows)
        .select(
            F.col("id"),
            F.concat(F.lit("p"), (F.col("id") % parts).cast("string")).alias(
                "part"
            ),
            (F.col("id") * 2).cast("double").alias("v"),
        )
        .repartition("part")
    )
    write_iceberg_lite(df, path, partition_by=["part"])


def change_batch(spark, parts: int, n_update: int = 50, n_insert: int = 10):
    """Update keys living in partitions p0/p1 only + fresh inserts into
    those same partitions — IDENTICAL at both scales: keys are i*10P +
    (i%2), which is ≡ i%2 both mod P (1x layout) and mod 10P (10x
    layout), so the batch touches exactly partitions p0/p1 everywhere."""
    from pyspark.sql import functions as F

    upd = (
        spark.range(n_update)
        .select(
            (F.col("id") * (10 * parts) + (F.col("id") % 2)).alias("id"),
            F.concat(
                F.lit("p"), (F.col("id") % 2).cast("string")
            ).alias("part"),
            F.lit(-1.0).alias("v"),
        )
    )
    ins = spark.range(n_insert).select(
        (F.col("id") + 1_000_000_000).alias("id"),
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("part"),
        F.lit(-2.0).alias("v"),
    )
    return upd.unionByName(ins)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--parts", type=int, default=20)
    ap.add_argument("--out", default="/tmp/scale_rowops")
    args = ap.parse_args()

    from spark_etl_cli_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="scale-rowops")

    from spark_etl_cli_spark.sources.delta_lite import (
        apply_changes_delta_lite,
        merge_delta_lite,
    )
    from spark_etl_cli_spark.sources.iceberg_lite import upsert_iceberg_lite

    scales = {"1x": (args.rows, args.parts), "10x": (args.rows * 10, args.parts * 10)}
    results: dict[str, dict] = {}

    for label, (rows, parts) in scales.items():
        batch = change_batch(spark, args.parts)  # SAME batch both scales

        d_path = os.path.join(args.out, f"delta_{label}")
        build_delta(spark, d_path, rows, parts)
        stats, sb, sec = run_op_measured(
            spark,
            lambda: merge_delta_lite(
                batch, d_path, on="id", update_set={"v": "source.v"}
            ),
        )
        results.setdefault("delta_merge", {})[label] = {
            "files_rewritten": stats["files_rewritten"],
            "files_added": stats["files_added"],
            "shuffle_mb": round(sb / 1024**2, 2),
            "sec": sec,
        }

        d2_path = os.path.join(args.out, f"delta_cdc_{label}")
        build_delta(spark, d2_path, rows, parts)
        changes = batch.withColumn(
            "_change_type",
            F.when(F.col("v") == -2.0, F.lit("insert")).otherwise(
                F.lit("update_postimage")
            ),
        ).withColumn("_commit_version", F.lit(1).cast("long"))
        stats, sb, sec = run_op_measured(
            spark,
            lambda: apply_changes_delta_lite(changes, d2_path, on="id"),
        )
        results.setdefault("delta_cdc_apply", {})[label] = {
            "files_rewritten": stats["files_rewritten"],
            "files_added": stats["files_added"],
            "shuffle_mb": round(sb / 1024**2, 2),
            "sec": sec,
        }

        i_path = os.path.join(args.out, f"iceberg_{label}")
        build_iceberg(spark, i_path, rows, parts)
        stats, sb, sec = run_op_measured(
            spark, lambda: upsert_iceberg_lite(batch, i_path, on="id")
        )
        results.setdefault("iceberg_upsert", {})[label] = {
            "files_rewritten": stats["files_rewritten"],
            "files_added": stats["files_added"],
            "shuffle_mb": round(sb / 1024**2, 2),
            "sec": sec,
        }

    print("| op | rewritten 1x | rewritten 10x | shuffle 1x (MB) | "
          "shuffle 10x (MB) | growth | sec 1x | sec 10x |")
    print("|---|---|---|---|---|---|---|---|")
    for op, r in results.items():
        g = (
            round(r["10x"]["shuffle_mb"] / r["1x"]["shuffle_mb"], 2)
            if r["1x"]["shuffle_mb"]
            else None
        )
        print(
            f"| {op} | {r['1x']['files_rewritten']} | "
            f"{r['10x']['files_rewritten']} | {r['1x']['shuffle_mb']} | "
            f"{r['10x']['shuffle_mb']} | {g}x | {r['1x']['sec']} | "
            f"{r['10x']['sec']} |"
        )
    spark.stop()
    print(json.dumps(
        {"rows": args.rows, "parts": args.parts, "results": results},
        separators=(",", ":"),
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
