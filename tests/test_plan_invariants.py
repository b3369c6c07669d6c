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


@pytest.mark.slow
def test_no_cartesian_and_bnlj_only_whitelisted(spark):
    queries = entry.queries()
    offenders = {}
    for name, fn in queries.items():
        if "stream" in name:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "unwhitelisted BroadcastNestedLoopJoin"
    assert not offenders, f"scale-killer plans: {offenders}"
