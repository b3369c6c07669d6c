#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs every registered query once (warm session), times each end-to-end
(plan + execute + collect-to-count), and prints ONE JSON line:

  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {"q01_pricing_summary": sec, ...}, "sf": "..."}

Env:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default: all cores)
  BENCH_QUERIES       comma-separated subset of query names
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _sf_number(sf_dir: str) -> float | str:
    name = Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return sf_dir


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from spark_etl_cli_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()
    subset = os.environ.get("BENCH_QUERIES")
    names = [n for n in subset.split(",") if n] if subset else list(queries)

    # Warm up the JVM/codegen path once so q1 isn't charged session-start
    # costs; the driver measures steady-state throughput.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    # Warm the Python/Arrow worker pool too (workers are reused across
    # queries, so spawn cost is session setup, not query throughput):
    # one tiny mapInPandas task per core.
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 4, 1, n_workers).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            # count() forces full execution without driver-side row
            # transfer dominating the measurement for wide results.
            df.count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # one bad query must not lose the run
            timings[name] = round(time.time() - t0, 3)
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]

    total = round(sum(timings.values()), 3)
    payload = json.dumps(
        {
            "metric": "total_query_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            # numeric scale factor parsed from the dir name ("sf0.1"),
            # with the dir itself alongside for traceability
            "sf": _sf_number(sf_dir),
            "sf_dir": sf_dir,
            # q29 deliberately forgoes the broadcast plan to exercise
            # the salted-join rewrite; it is expected to be slow here.
            "notes": {"q29_salted_join": "salting demo, not the optimal local plan"},
            **({"errors": errors} if errors else {}),
        },
        separators=(",", ":"),
    )
    # The JSON line must be the LAST thing on stdout with no Spark log
    # interleaving (the round-1 driver failed to parse it): stop the
    # session first so the JVM can't emit anything afterwards, then
    # print exactly one line and flush.
    spark.stop()
    out_file = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_file:
        Path(out_file).write_text(payload + "\n")
    sys.stdout.flush()
    print(payload, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
