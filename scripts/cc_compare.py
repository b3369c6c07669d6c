#!/usr/bin/env python
"""Time min-label propagation vs alternating large-star/small-star
connected components on q47's ACTUAL edge set (r10 VERDICT item 5
asks for the star switch; this measures whether it wins on the shape
q47 really has — a shallow dup graph — before changing the query).

Usage: python scripts/cc_compare.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        shingle_pairs_jaccard,
    )
    from spark_etl_cli_spark.plans.registry import pin_session
    from spark_etl_cli_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="cc_compare")
    pin_session(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 2000
    )
    pairs = shingle_pairs_jaccard(
        docs, k=3, threshold=0.5, max_shingle_freq=1000
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()  # isolate CC cost from the pair build
    n = edges.count()
    print(f"edges: {n}")

    for label, fn in (
        ("minlabel", connected_components),
        ("star", connected_components_star),
    ):
        best = float("inf")
        res = None
        for _ in range(3):
            t0 = time.time()
            out = fn(edges, "src", "dst")
            rows = sorted(
                (r["id"], r["component"]) for r in out.collect()
            )
            best = min(best, time.time() - t0)
            if res is None:
                res = rows
            else:
                assert res == rows, f"{label}: result changed across runs"
        print(f"{label}: {best:.3f} s  components rows={len(res)}")
        if label == "minlabel":
            base = res
    assert base == res, "minlabel and star disagree!"
    print("identical components: OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
