"""Property-based tests (hypothesis).

The as-of join is checked against pandas ``merge_asof`` — an
independent reference implementation — on randomized keyed time series;
diff is checked against set-algebra invariants on randomized frames.
Example counts are kept low: each example is a Spark job.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.asof import asof_join
from spark_etl_cli_spark.operators.diff import DIFF_COL, diff

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts) pairs: few keys, small int timestamps, duplicates likely
left_rows = st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 30)),
    min_size=1,
    max_size=12,
)
right_rows = st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 30)),
    min_size=1,
    max_size=12,
)


@pytest.mark.slow
@given(lrows=left_rows, rrows=right_rows, direction=st.sampled_from(["backward", "forward"]))
@SET
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows, direction):
    # dedupe right on (key, ts): at equal timestamps the winning payload
    # is implementation-defined in both engines, so make it unique
    rrows = list({(k, ts): None for k, ts in rrows})
    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lrows)], "k string, ts long, lid long"
    )
    rdf = spark.createDataFrame(
        [(k, ts, 1000 + i) for i, (k, ts) in enumerate(rrows)],
        "k string, ts long, rid long",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, ["k"], "ts", "ts", ["rid"], direction=direction
        ).collect()
    }

    lpd = pd.DataFrame([(k, ts, i) for i, (k, ts) in enumerate(lrows)],
                       columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame([(k, ts, 1000 + i) for i, (k, ts) in enumerate(rrows)],
                       columns=["k", "ts", "rid"]).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="k", direction=direction, allow_exact_matches=True
    )
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want


keyed_frames = st.lists(
    st.tuples(st.integers(0, 6), st.sampled_from("xyz")), min_size=0, max_size=8
)


@pytest.mark.slow
@given(lrows=keyed_frames, rrows=keyed_frames)
@SET
def test_diff_set_algebra_invariants(spark, lrows, rrows):
    # unique keys per side (diff semantics assume id uniqueness)
    l = dict(lrows)
    r = dict(rrows)
    ldf = spark.createDataFrame(list(l.items()) or [(None, None)], "k int, v string").filter(
        F.col("k").isNotNull()
    )
    rdf = spark.createDataFrame(list(r.items()) or [(None, None)], "k int, v string").filter(
        F.col("k").isNotNull()
    )
    out = {row.k: row for row in diff(ldf, rdf, ["k"]).collect()}
    assert set(out) == set(l) | set(r)
    for k, row in out.items():
        if k in l and k not in r:
            assert row[DIFF_COL] == "D"
        elif k in r and k not in l:
            assert row[DIFF_COL] == "I"
        elif l[k] == r[k]:
            assert row[DIFF_COL] == "N"
        else:
            assert row[DIFF_COL] == "C"
