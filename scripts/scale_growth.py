#!/usr/bin/env python
"""Two-scale growth measurement for the dedup/ANN family (q35/q36/q41).

SCALE.md argues the banded/inverted-index mechanisms are subquadratic;
this script MEASURES it: it synthesizes a 10x corpus at runtime (union
of 10 salted copies — copy i>0 suffixes every token with `x{i}` so
cross-copy shingles are disjoint, and sign-flips embeddings with a
copy-seeded deterministic pattern so cross-copy vectors land in other
hyperplane buckets; within-copy duplicate DENSITY is exactly the
original corpus's), runs the same registered plans at 1x and 10x, and
reports rows out, candidate pairs, total shuffle bytes written, and
wall seconds. Linear (~10x) candidate/shuffle growth at 10x the docs =
the subquadratic evidence; an all-pairs plan would grow ~100x.

Shuffle bytes come from the SQL status store ("shuffle bytes written"
per plan node, summed over the executions the measured action ran) —
the same numbers the Spark UI shows.

Usage:
  python scripts/scale_growth.py [--sf /root/testdata/sf0.1]
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


def run_measured(spark, build_df):
    """(rows, shuffle_bytes_written, wall_sec) for one count() action,
    shuffle bytes summed over the executions it spawned."""
    store = spark._jsparkSession.sharedState().statusStore()
    n0 = store.executionsList().size()
    df = build_df()
    t0 = time.time()
    rows = df.count()
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
    return rows, sb, round(wall, 2)


def synth_10x(spark, sf_dir: str, out_dir: str, copies: int = 10) -> str:
    """documents/embeddings at ``copies``x the input scale, same
    within-copy duplicate density, disjoint across copies."""
    import numpy as np
    from pyspark.sql import functions as F

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = []
    for i in range(copies):
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)
        )
        if i:
            c = c.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w, _i=i: F.concat(w, F.lit(f"x{_i}")),
                    ),
                ),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.parquet(f"{out_dir}/documents.parquet")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head()[0])
    eparts = []
    for i in range(copies):
        c = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000)
        )
        if i:
            signs = (
                np.where(
                    np.random.RandomState(i).rand(dim) < 0.5, -1.0, 1.0
                )
                .astype("float32")
                .tolist()
            )
            c = c.withColumn(
                "embedding",
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(s) for s in signs]).cast(
                        "array<float>"
                    ),
                    lambda x, s: x * s,
                ),
            )
        eparts.append(c)
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.write.parquet(f"{out_dir}/embeddings.parquet")
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default="/tmp/scale_growth_10x")
    args = ap.parse_args()

    from spark_etl_cli_spark.session import get_spark
    from spark_etl_cli_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_pairs_jaccard,
    )
    from spark_etl_cli_spark.functions.text import md5_long28
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="scale-growth")
    queries = entrymod.queries()
    big = synth_10x(spark, args.sf, args.out, args.copies)

    def docs_at(d):
        return spark.read.parquet(f"{d}/documents.parquet")

    cases = {
        # registered plans (rows out) + their candidate-pair stages
        # (thresholds off: the full banded/inverted-index pair set)
        "q35_jaccard_pairs": lambda d: queries["q35_jaccard_pairs"](
            spark, d
        ),
        "q35_candidates": lambda d: shingle_pairs_jaccard(
            docs_at(d), k=3, threshold=0.0, max_shingle_freq=1000
        ),
        "q36_minhash_lsh_pairs": lambda d: queries[
            "q36_minhash_lsh_pairs"
        ](spark, d),
        "q36_candidates": lambda d: minhash_lsh_pairs(
            docs_at(d),
            num_hashes=32,
            bands=8,
            shingle_k=3,
            base_hash=md5_long28,
        ),
        "q41_ann_lsh": lambda d: queries["q41_ann_lsh"](spark, d),
        # the LOSSLESS exact-Jaccard path: prefix postings + ppjoin
        # length/positional filters — growth here is the evidence the
        # theorem-backed pruning stays subquadratic without a cap knob
        "q168_prefix_filter_pairs": lambda d: queries[
            "q168_prefix_filter_pairs"
        ](spark, d),
    }
    results = {}
    for name, fn in cases.items():
        r1, b1, t1 = run_measured(spark, lambda f=fn: f(args.sf))
        r10, b10, t10 = run_measured(spark, lambda f=fn: f(big))
        results[name] = {
            "rows_1x": r1, "rows_10x": r10,
            "shuffle_mb_1x": round(b1 / 1024**2, 2),
            "shuffle_mb_10x": round(b10 / 1024**2, 2),
            "sec_1x": t1, "sec_10x": t10,
            "rows_growth": round(r10 / r1, 2) if r1 else None,
            "shuffle_growth": round(b10 / b1, 2) if b1 else None,
        }
        print(f"# {name}: {results[name]}", file=sys.stderr)

    print("| query | rows 1x | rows 10x | growth | shuffle 1x (MB) | "
          "shuffle 10x (MB) | growth | sec 1x | sec 10x |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['rows_1x']} | {r['rows_10x']} | "
            f"{r['rows_growth']}x | {r['shuffle_mb_1x']} | "
            f"{r['shuffle_mb_10x']} | {r['shuffle_growth']}x | "
            f"{r['sec_1x']} | {r['sec_10x']} |"
        )
    spark.stop()
    print(json.dumps({"sf": args.sf, "copies": args.copies,
                      "results": results}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    sys.exit(main())
