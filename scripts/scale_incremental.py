#!/usr/bin/env python
"""Two-scale growth measurement for the round-9 incremental dedup
family (q200 minhash / q201 exact / q202 cosine tiers).

The claim these operators make is the INVERSE of the usual linearity
table: as the persisted corpus state grows 10x, a fixed-size batch's
dedup probe should keep its SHUFFLE BYTES ~FLAT — the state is only
scanned (band/fingerprint keys derive map-side from the stored rows),
the batch side broadcasts, and every exchange in the plan carries
batch-sized data (signature agg, per-batch-doc min, decision join).
Wall clock may grow with the scan; shuffle must not.

Method: batch = the 250 lowest-id docs of sf0.1 (fixed). State =
the next ~500 docs (1x) vs all remaining ~4750 (10x), PERSISTED to
parquet first (the production loop reads a stored signature /
fingerprint table, it never recomputes the corpus — persisting keeps
the state-side compute out of the probe measurement). The cosine tier
probes raw stored vectors (its band keys are map-side arithmetic).

Usage:
  python scripts/scale_incremental.py [--sf /root/testdata/sf0.1]
Prints a markdown table (paste into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.scale_growth import run_measured  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_etl_cli_spark.functions.text import fingerprint, md5_long28
    from spark_etl_cli_spark.operators.dedup import (
        incremental_exact_dedup,
        incremental_minhash_dedup,
        minhash_signatures,
    )
    from spark_etl_cli_spark.operators.similarity import (
        incremental_cosine_dedup,
    )
    from spark_etl_cli_spark.session import get_spark

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="scale_incremental_")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    b_hi, s1_hi = ids[249], ids[749]  # batch 250 docs; 1x state ~500
    batch = docs.filter(F.col("doc_id") <= b_hi)
    state_small = docs.filter(
        (F.col("doc_id") > b_hi) & (F.col("doc_id") <= s1_hi)
    )
    state_big = docs.filter(F.col("doc_id") > b_hi)

    # persist the state tables the way the production loop would
    paths = {}
    for label, st in (("small", state_small), ("big", state_big)):
        sig_p = os.path.join(work, f"sigs_{label}")
        minhash_signatures(st, base_hash=md5_long28).write.parquet(sig_p)
        fp_p = os.path.join(work, f"fps_{label}")
        st.select(
            F.col("doc_id").alias("id"),
            fingerprint(F.col("text")).alias("fp"),
        ).write.parquet(fp_p)
        paths[label] = (sig_p, fp_p)

    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    eids = sorted(r[0] for r in emb.select("vec_id").collect())
    eb_hi = eids[149]  # batch: 150 vectors (fixed)
    es1_hi = eids[min(299, len(eids) - 1)]  # 1x state: next ~150
    # big state: everything after the batch (~12x the small state)
    ebatch = emb.filter(F.col("vec_id") <= eb_hi)
    estate_small = emb.filter(
        (F.col("vec_id") > eb_hi) & (F.col("vec_id") <= es1_hi)
    )
    estate_big = emb.filter(F.col("vec_id") > eb_hi)

    def probe_minhash(state_path):
        return incremental_minhash_dedup(
            minhash_signatures(batch, base_hash=md5_long28),
            spark.read.parquet(state_path),
        )

    def probe_exact(state_path):
        return incremental_exact_dedup(
            batch.select(
                F.col("doc_id").alias("id"),
                fingerprint(F.col("text")).alias("fp"),
            ),
            spark.read.parquet(state_path),
        )

    def probe_cosine(state_df):
        return incremental_cosine_dedup(ebatch, state_df, dim=64)

    cases = [
        (
            "q200 minhash probe",
            lambda: probe_minhash(paths["small"][0]),
            lambda: probe_minhash(paths["big"][0]),
        ),
        (
            "q201 exact probe",
            lambda: probe_exact(paths["small"][1]),
            lambda: probe_exact(paths["big"][1]),
        ),
        (
            "q202 cosine probe",
            lambda: probe_cosine(estate_small),
            lambda: probe_cosine(estate_big),
        ),
    ]

    rows = []
    for name, small_fn, big_fn in cases:
        # warm pass amortizes codegen/scan-cache so the two measured
        # passes compare like-for-like
        small_fn().count()
        r1, sb1, w1 = run_measured(spark, small_fn)
        r2, sb2, w2 = run_measured(spark, big_fn)
        growth = (sb2 / sb1) if sb1 else float("nan")
        rows.append(
            {
                "probe": name,
                "rows_1x": r1,
                "rows_10x": r2,
                "shuffle_1x_mb": round(sb1 / 1e6, 3),
                "shuffle_10x_mb": round(sb2 / 1e6, 3),
                "shuffle_growth": round(growth, 2),
                "wall_1x_s": w1,
                "wall_10x_s": w2,
            }
        )

    shutil.rmtree(work, ignore_errors=True)
    print(
        "| probe | rows 1x | rows 10x-state | shuffle 1x MB | "
        "shuffle 10x MB | growth | wall 1x s | wall 10x s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['probe']} | {r['rows_1x']} | {r['rows_10x']} | "
            f"{r['shuffle_1x_mb']} | {r['shuffle_10x_mb']} | "
            f"{r['shuffle_growth']}x | {r['wall_1x_s']} | "
            f"{r['wall_10x_s']} |"
        )
    print(json.dumps({"rows": rows}, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
