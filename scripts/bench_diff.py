#!/usr/bin/env python
"""Compare two bench.py JSON outputs per query.

Usage:
  python scripts/bench_diff.py OLD.json NEW.json [--top N] [--thresh PCT]

Prints the total delta and every query whose time moved more than
``--thresh`` percent (default 30) and 0.2s absolute, slowest-regression
first — the round-over-round feedback loop for BENCH_r{N} artifacts.
Single-run timings carry GC/page-cache noise of ±1-2s on the heavy
queries; treat sub-second moves as noise unless they repeat.
"""

from __future__ import annotations

import argparse
import json
import math


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--thresh", type=float, default=30.0)
    args = ap.parse_args()

    old = json.load(open(args.old))
    new = json.load(open(args.new))
    oq, nq = old["queries"], new["queries"]

    print(
        f"total: {old['value']}s ({len(oq)} queries) -> "
        f"{new['value']}s ({len(nq)} queries)"
    )
    # The canonical round-over-round numbers (quote THESE in NOTES, not
    # side-run figures): sum-ratio and geomean over the common query set.
    common = sorted(set(oq) & set(nq))
    if common:
        so, sn = sum(oq[n] for n in common), sum(nq[n] for n in common)
        lg = sum(
            math.log(max(nq[n], 1e-3) / max(oq[n], 1e-3)) for n in common
        )
        print(
            f"common-{len(common)} sum: {so:.1f}s -> {sn:.1f}s "
            f"(ratio {sn / so:.3f}x), geomean {math.exp(lg / len(common)):.3f}x"
        )
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{n} {nq[n]}s" for n in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    moves = []
    for name in set(oq) & set(nq):
        a, b = oq[name], nq[name]
        if abs(b - a) < 0.2:
            continue
        pct = (b - a) / a * 100 if a else float("inf")
        if abs(pct) >= args.thresh:
            moves.append((b - a, pct, name, a, b))
    moves.sort(reverse=True)
    for delta, pct, name, a, b in moves[: args.top]:
        print(f"{delta:+7.2f}s {pct:+7.1f}%  {name}: {a} -> {b}")
    if not moves:
        print("no per-query moves beyond threshold")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
