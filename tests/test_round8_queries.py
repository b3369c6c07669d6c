"""Algebraic pins for the round-8 query additions.

The DuckDB oracles prove cross-engine EQUALITY; these tests prove the
answers satisfy the operators' own invariants — the guard against both
engines computing the same wrong thing (the q158 lesson generalized):

- waterfilling: feasibility (Σalloc ≤ B), per-source caps, floor-div
  tightness (B − m < Σalloc when the budget binds), monotonicity
  (bigger sources never allocate less);
- temperature mixture: weights are a probability vector that ORDERS
  like the sizes but is strictly flatter than proportional;
- audience overlap: Jaccard bounds and intersection ≤ min(|A|, |B|);
- ntile via distributed rank: bucket sizes differ by ≤1 and earlier
  buckets take the remainder (the ntile contract, engine-independent).
"""

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_waterfill_invariants(spark, queries):
    rows = queries["q190_waterfill_budget"](spark, SF_DIR).collect()
    assert rows
    budget = rows[0]["budget"]
    assert all(r["budget"] == budget for r in rows)
    total = sum(r["n_tokens"] for r in rows)
    alloc = sum(r["alloc"] for r in rows)
    m = len(rows)
    assert all(0 <= r["alloc"] <= r["n_tokens"] for r in rows)
    if total <= budget:
        assert alloc == total  # nothing to cap
    else:
        # feasible and floor-div tight: each of the capped sources
        # loses < 1 token to the floor
        assert budget - m < alloc <= budget, (alloc, budget, m)
    by_size = sorted(rows, key=lambda r: (r["n_tokens"], r["source"]))
    for a, b in zip(by_size, by_size[1:]):
        assert a["alloc"] <= b["alloc"]  # monotone in source size


def test_mixture_temperature_invariants(spark, queries):
    rows = queries["q189_mixture_temperature"](spark, SF_DIR).collect()
    ws = [r["weight"] for r in rows]
    assert all(w > 0 for w in ws)
    assert abs(sum(ws) - 1.0) < 1e-9
    # alpha=0.5 flattens: the largest source's weight is BELOW its
    # proportional share, the smallest source's is ABOVE it
    total = sum(r["n_tokens"] for r in rows)
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    if big["n_tokens"] > small["n_tokens"]:
        assert big["weight"] < big["n_tokens"] / total
        assert small["weight"] > small["n_tokens"] / total
    # ordering preserved
    by_n = sorted(rows, key=lambda r: r["n_tokens"])
    for a, b in zip(by_n, by_n[1:]):
        assert a["weight"] <= b["weight"]


def test_audience_overlap_bounds(spark, queries):
    rows = queries["q194_event_audience_overlap"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]  # ordered pairs, no dupes
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_both"]
        assert 0 < r["jaccard"] <= 1
        assert abs(r["jaccard"] - r["n_both"] / union) < 1e-12


def test_ntile_bucket_sizes(spark, queries):
    rows = queries["q162_ntile_deciles"](spark, SF_DIR).collect()
    sizes = {r["decile"]: r["n"] for r in rows}
    assert set(sizes) == set(range(1, 11))
    lo, hi = min(sizes.values()), max(sizes.values())
    assert hi - lo <= 1  # equal buckets, remainder spread
    n = sum(sizes.values())
    r = n % 10
    # earlier buckets take the remainder (ntile contract)
    fat = [d for d, s in sizes.items() if s == hi]
    if r:
        assert fat == list(range(1, r + 1)), sizes


def test_weekday_chi2_nonnegative(spark, queries):
    rows = queries["q195_weekday_seasonality"](spark, SF_DIR).collect()
    for r in rows:
        assert r["chi2"] >= 0
        assert 1 <= r["weekdays_active"] <= 7
        assert r["n_events"] > 0


def test_new_vs_returning_conservation(spark, queries):
    rows = queries["q196_new_vs_returning"](spark, SF_DIR).collect()
    assert rows
    total_new = 0
    for r in rows:
        assert r["new_users"] + r["returning_users"] == r["active_users"]
        total_new += r["new_users"]
    # every user is new exactly once: Σnew == |distinct users|
    from spark_etl_cli_spark.plans.registry import events

    n_users = events(spark, SF_DIR).select("user_id").distinct().count()
    assert total_new == n_users
