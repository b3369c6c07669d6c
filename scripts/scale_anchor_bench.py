#!/usr/bin/env python
"""8-vs-32-core scaling anchor over the replicated corpus (r10 VERDICT
item 7): run the heavy queries at a data size where computation
dominates fixed cost, at two core counts, and record the ratio.

Relies on scripts/gen_scale_anchor.py having produced the corpus
(self-similarity-free sf0.1 x N replication). Invoke once per core
count; the driver-contract env vars are honored exactly like bench.py:

  SPARK_GRAFT_CPUS=32 python scripts/scale_anchor_bench.py
  SPARK_GRAFT_CPUS=8  python scripts/scale_anchor_bench.py

Prints one JSON line {"cpus": N, "queries": {...}} per run; min-of-2
per query in one warm session, noop-sink materialization (same
methodology as bench.py, no steal retry — run in a quiet window and
check the stamped steal yourself).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVY = [
    "q136_triangle_count",
    "q168_prefix_filter_pairs",
    "q202_incremental_cosine_dedup",
    "q200_incremental_dedup",
    "q184_lsh_calibration",
    "q137_tfidf_cosine_topk",
    "q134_pagerank",
    "q35_jaccard_pairs",
    "q171_label_propagation",
    "q47_dup_components",
    "q37_simhash_pairs",
    "q53_stream_interval_join",  # expected ~flat: documented fixed cost
]


def _cpu_ticks():
    with open("/proc/stat") as f:
        p = f.readline().split()
    busy = int(p[1]) + int(p[2]) + int(p[3]) + int(p[6]) + int(p[7])
    return busy, int(p[8])


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/scale_anchor_sf1")
    subset = os.environ.get("ANCHOR_QUERIES")
    if subset:
        HEAVY[:] = [n for n in subset.split(",") if n]
    import __spark_entry__ as entrymod
    from spark_etl_cli_spark.session import get_spark

    queries = entrymod.queries()
    spark = get_spark(app_name="scale_anchor")
    cpus = spark.sparkContext.defaultParallelism
    for tbl in ("lineitem", "orders", "documents", "embeddings", "events"):
        p = Path(sf_dir) / f"{tbl}.parquet"
        if p.exists():
            spark.read.parquet(str(p)).count()  # warm scan, untimed
    t0_ticks = _cpu_ticks()
    out: dict[str, float] = {}
    for name in HEAVY:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            try:
                df.write.mode("overwrite").format("noop").save()
            except Exception:
                df.count()
            best = min(best, time.time() - t0)
            df = None
        out[name] = round(best, 3)
        print(f"  {name}: {out[name]}", file=sys.stderr)
    t1 = _cpu_ticks()
    db, ds = t1[0] - t0_ticks[0], t1[1] - t0_ticks[1]
    payload = json.dumps(
        {
            "cpus": cpus,
            "sf_dir": sf_dir,
            "steal_pct": round(100 * ds / max(db + ds, 1), 2),
            "total": round(sum(out.values()), 3),
            "queries": out,
        }
    )
    spark.stop()
    print(payload, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
