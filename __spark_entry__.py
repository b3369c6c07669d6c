"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full named-query library (see
``spark_etl_cli_spark/plans/``) for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _registry():
    # import registers all named queries
    from spark_etl_cli_spark.plans import all_queries  # noqa: F401
    from spark_etl_cli_spark.plans.registry import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    queries, _ = _registry()
    return queries["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


# The driver checks a bounded prefix of queries() (~50 in round 1),
# so ordering decides which queries get CORRECTNESS rows each round.
# Priority is derived at call time from every CORRECTNESS_r*.json the
# driver has left in the repo root, so it adapts round over round with
# no code change:
#   1. queries whose MOST RECENT row was red (err non-null, excluding
#      the sanctioned ``no_oracle`` rows-only kind) — fix verification
#      first;
#   2. queries REWRITTEN SINCE their last driver verification
#      (RECHECK.json: {query: round_touched}; a query stays here until
#      a LATER round's green row supersedes the marker) — a rewrite
#      invalidates the old proof, so it outranks never-verified;
#   3. queries with no row in any round, ordered by number (q01–q29
#      relational core leads);
#   4. queries already proven green (hash_match true in any round) —
#      re-checked next, only if the budget allows;
#   5. permanently rows-only queries (latest row says ``no_oracle``) —
#      LAST: they can never turn hash-green, so they must not burn
#      oracle-paired budget slots or absorb first-position bench cost.
def _correctness_history() -> tuple[frozenset, frozenset, frozenset, dict]:
    """(green, red, rows_only, green_round) by LATEST recorded state
    per query: a later round's result supersedes an earlier one in any
    direction, so a query that regressed after being green sorts back
    into the re-check-first bucket, and one that gains an oracle leaves
    the rows-only bucket. ``green_round`` maps each green query to the
    latest round whose row proved it (for the rewrite-staleness check)."""
    import json
    import re

    here = Path(__file__).resolve().parent
    rounds = sorted(
        here.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.sub(r"\D", "", p.stem) or 0),
    )
    green: set[str] = set()
    red: set[str] = set()
    rows_only: set[str] = set()
    green_round: dict[str, int] = {}
    for path in rounds:
        rnd = int(re.sub(r"\D", "", path.stem) or 0)
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue  # differently-shaped driver artifact: skip, don't crash
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match") is True:
                green.add(name)
                green_round[name] = max(green_round.get(name, 0), rnd)
                red.discard(name)
                rows_only.discard(name)
            elif row.get("err") == "no_oracle":
                rows_only.add(name)
                red.discard(name)
                green.discard(name)
            else:
                red.add(name)
                green.discard(name)
                rows_only.discard(name)
    return frozenset(green), frozenset(red), frozenset(rows_only), green_round


def _stale_verified(green_round: dict[str, int]) -> frozenset:
    """Queries whose plan was rewritten in a round >= their latest
    driver-green round (RECHECK.json, maintained by the builder when a
    query's computation is restructured): the old proof no longer
    covers the current plan, so the driver should re-verify them ahead
    of already-proven-green queries. Self-aging: once the driver
    records a green row in a LATER round, the marker stops matching."""
    import json

    path = Path(__file__).resolve().parent / "RECHECK.json"
    try:
        marks = json.loads(path.read_text())
    except (OSError, ValueError):
        return frozenset()
    if not isinstance(marks, dict):
        return frozenset()
    return frozenset(
        name
        for name, touched in marks.items()
        if isinstance(touched, int)
        and green_round.get(name, -1) <= touched
    )


def _qnum(name: str) -> int:
    digits = "".join(c for c in name[1:] if c.isdigit() or c == "_").split("_")[0]
    try:
        return int(digits)
    except ValueError:
        return 999


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _registry()
    green, red, rows_only, green_round = _correctness_history()
    stale = _stale_verified(green_round)
    ordered = sorted(
        q,
        key=lambda n: (
            n in rows_only,
            n not in red,
            n not in stale,
            n in green,
            _qnum(n),
            n,
        ),
    )
    return {n: q[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    return dict(o)
