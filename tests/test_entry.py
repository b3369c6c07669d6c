"""Driver-contract smoke tests for __spark_entry__.py."""

import __spark_entry__ as entry

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_query_and_oracle_keys_consistent():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) >= 40
    # every oracle belongs to a declared query
    assert set(o) <= set(q)
    # every registered query has a DuckDB oracle, with two sanctioned
    # exceptions: q152_bpe_train is genuinely iterative (per-round
    # argmax feeds the next round; pytest pins its semantics) and
    # q153_simhash_pairs_fast runs the production xxhash64 family,
    # which has no DuckDB twin (pytest pins structural equivalence to
    # the oracle-paired q37 instead)
    assert set(q) - set(o) == {"q152_bpe_train", "q153_simhash_pairs_fast"}


def test_each_query_is_callable_signature():
    q = entry.queries()
    sample = q["q06_forecast_revenue"]
    assert callable(sample)


def test_flagship_query_plan_is_aggregated(spark):
    # the flagship must stay a partial-agg plan (no naked shuffle of
    # raw lineitem rows)
    df = entry.queries()["q01_pricing_summary"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
