"""Library-wide physical-plan invariants.

tests/test_plans.py spot-checks ~20 queries deeply; this gate sweeps
EVERY batch query in the registry and enforces the two properties that
must hold for the 100 TB story regardless of operator:

- no ``CartesianProduct`` anywhere — an unbroadcast cross join is a
  scale-killer in every case;
- ``BroadcastNestedLoopJoin`` only where the operator deliberately
  broadcasts a provably tiny side (scalar aggregates, ANN query
  vectors, a distinct-names set for an edit-distance join). The
  whitelist is explicit so a NEW query degrading to a nested loop
  fails this test instead of shipping.

Streaming queries are skipped: their ``queries()`` entry drains the
stream and returns a memory-sink table, so the interesting plan is
gone by the time it returns (they carry their own gates in
tests/test_streaming.py).

Round 8 adds two more library-wide rules, both born from judged
scale defects that were CORRECT at sf0.1:

- **no unpartitioned WindowExec** outside an explicit whitelist of
  provably bounded collapses (vocab tables, calendar-day offsets,
  value-domain coarse buckets) — an ``OVER (ORDER BY …)`` with no
  PARTITION BY drags its entire input through ONE task (r7's q162/
  q165 regression shape);
- **no FULL OUTER join carrying a broadcast hint** — Spark cannot
  broadcast either side of a full outer join; the hint is silently
  dropped and the join sort-merge-shuffles BOTH sides, so code that
  "broadcasts the small side" of a full-outer is lying to its reader
  (r7's q178 MV-maintenance defect).
"""

import pytest

import __spark_entry__ as entry

from tests.conftest import SF_DIR

# BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side is
# O(1)-ish rows by construction:
BNLJ_OK = {
    "q40_ann_bruteforce",       # broadcast query vectors (k rows)
    "q43_knn_label_vote",       # broadcast query vectors
    "q46_ann_ivf",              # broadcast probe centroids
    "q127_semantic_dedup",      # broadcast cluster centroids
    "q67_important_parts",      # scalar subquery (1-row crossJoin)
    "q81_global_sales_opportunity",  # scalar subquery
    "q78_term_rarity",          # broadcast n_docs scalar
    "q112_bm25_topk",           # broadcast corpus stats scalar
    "q135_key_skew_profile",    # broadcast table-total scalar
    "q103_bloom_prune_join",    # broadcast bloom-filter scalar
    "q91_fuzzy_name_pairs",     # edit-distance NL over broadcast distinct names
    "q170_event_paths",         # broadcast mean-support scalar (1 row)
    "q176_event_cooccurrence",  # broadcast user-base scalar (1 row)
    "q183_ks_drift",            # broadcast source-dim grid + N scalar
}


# Unpartitioned windows are acceptable ONLY over a provably BOUNDED
# collapse — input whose row count is fixed by a value domain or
# vocabulary, not by the corpus. Each whitelisted query pins the
# MAXIMUM number of unpartitioned window nodes its bounded shape
# needs (measured from the shipped plan); growing MORE global windows
# than that — e.g. an edit that adds an OVER (ORDER BY …) on the
# un-collapsed corpus — fails the sweep instead of shipping:
GLOBAL_WINDOW_MAX = {
    "q110_vocab_encode": 1,      # BPE vocab cumsum (|vocab| rows)
    "q141_vocab_coverage": 2,    # vocab coverage cumsums (|vocab| rows)
    "q135_key_skew_profile": 1,  # skew-bucket cumsum (fixed bucket grid)
    "q167_dod_change": 1,        # calendar-day table (time-domain bounded)
    "q183_ks_drift": 2,          # |lengths|x|sources| grid (domain bounded)
    "q162_ntile_deciles": 1,     # floor(acctbal) coarse buckets (<=11k, domain)
    "q165_peak_concurrency": 1,  # per-day sweep offsets (calendar bounded)
    "q189_mixture_temperature": 1,  # normalizer over the |sources| grid
    "q190_waterfill_budget": 4,     # waterfill level over the |sources| grid
}


def _walk_exec(node):
    """Physical-plan walker that descends through the AQE wrapper and
    query-stage shells (their ``children()`` hide the real tree)."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk_exec(node.initialPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk_exec(node.plan())
        return
    yield cls, node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk_exec(ch.apply(i))


_WINDOW_NODES = ("WindowExec", "WindowGroupLimitExec", "WindowInPandasExec")


@pytest.mark.slow
def test_no_cartesian_and_bnlj_only_whitelisted(spark):
    queries = entry.queries()
    offenders = {}
    for name, fn in queries.items():
        if "stream" in name:
            continue
        df = fn(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "unwhitelisted BroadcastNestedLoopJoin"
        # single-task global windows: every WindowExec must carry a
        # partitionSpec unless the query is a whitelisted bounded
        # collapse — and a whitelisted query STILL fails if it grows
        # more global windows than its pinned bounded shape allows
        n_global = sum(
            1
            for cls, n in _walk_exec(qe.executedPlan())
            if cls in _WINDOW_NODES and n.partitionSpec().isEmpty()
        )
        allowed = GLOBAL_WINDOW_MAX.get(name, 0)
        if n_global > allowed:
            offenders[name] = (
                f"{n_global} unpartitioned (single-task) window(s), "
                f"max allowed {allowed}"
            )
        # a broadcast hint on a FULL OUTER join is silently dropped by
        # Spark — the join SMJ-shuffles both sides; flag the lie at
        # plan level so the q178 defect class cannot land again
        opt = qe.optimizedPlan().toString()
        for line in opt.splitlines():
            if "Join FullOuter" in line and "strategy=broadcast" in line:
                offenders[name] = "broadcast hint on FULL OUTER join"
                break
    assert not offenders, f"scale-killer plans: {offenders}"
