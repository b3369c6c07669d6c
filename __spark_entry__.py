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
#   2. queries with no row in any round, ordered by number (q01–q29
#      relational core leads);
#   3. queries already proven green (hash_match true in any round) —
#      re-checked next, only if the budget allows;
#   4. permanently rows-only queries (latest row says ``no_oracle``) —
#      LAST: they can never turn hash-green, so they must not burn
#      oracle-paired budget slots or absorb first-position bench cost.
def _correctness_history() -> tuple[frozenset, frozenset, frozenset]:
    """(green, red, rows_only) by LATEST recorded state per query: a
    later round's result supersedes an earlier one in any direction, so
    a query that regressed after being green sorts back into the
    re-check-first bucket, and one that gains an oracle leaves the
    rows-only bucket."""
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
    for path in rounds:
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
    return frozenset(green), frozenset(red), frozenset(rows_only)


def _qnum(name: str) -> int:
    digits = "".join(c for c in name[1:] if c.isdigit() or c == "_").split("_")[0]
    try:
        return int(digits)
    except ValueError:
        return 999


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _registry()
    green, red, rows_only = _correctness_history()
    ordered = sorted(
        q,
        key=lambda n: (
            n in rows_only,
            n not in red,
            n in green,
            _qnum(n),
            n,
        ),
    )
    return {n: q[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    return dict(o)
