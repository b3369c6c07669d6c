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


# --- bloom filter: no false negatives, ever -------------------------------
bloom_keys = st.lists(st.integers(-(10**9), 10**9), min_size=1, max_size=40)


@pytest.mark.slow
@given(dim=bloom_keys, extra=bloom_keys, fpp=st.sampled_from([0.01, 0.1]))
@SET
def test_bloom_prune_never_drops_true_matches(spark, dim, extra, fpp):
    from spark_etl_cli_spark.operators.joins import bloom_semi_prune

    dim_df = spark.createDataFrame([(k,) for k in dim], ["dk"])
    fact_df = spark.createDataFrame([(k,) for k in dim + extra], ["k"])
    pruned = bloom_semi_prune(
        fact_df, dim_df, "k", "dk", expected_items=len(dim), fpp=fpp
    )
    kept = {r.k for r in pruned.collect()}
    assert set(dim) <= kept  # every true key survives


# --- checksum: multiset semantics ----------------------------------------
rows_strat = st.lists(
    st.tuples(st.integers(0, 50), st.sampled_from(["x", "y", ""])),
    min_size=1,
    max_size=25,
)


@pytest.mark.slow
@given(rows=rows_strat, seed=st.integers(0, 5))
@SET
def test_checksum_is_permutation_invariant_and_injective_ish(spark, rows, seed):
    import random

    from spark_etl_cli_spark.operators.checksum import table_checksum

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    a = spark.createDataFrame(rows, ["k", "s"])
    b = spark.createDataFrame(shuffled, ["k", "s"])
    ca = table_checksum(a, ["k", "s"]).head()
    cb = table_checksum(b, ["k", "s"]).head()
    assert (ca.n_rows, ca.checksum) == (cb.n_rows, cb.checksum)
    # dropping one row must change the digest (n_rows catches it too,
    # but the checksum alone must differ: hashes are nonzero w.h.p.)
    if len(rows) > 1:
        cc = table_checksum(
            spark.createDataFrame(rows[1:], ["k", "s"]), ["k", "s"]
        ).head()
        assert (cc.n_rows, cc.checksum) != (ca.n_rows, ca.checksum)


# --- z-value: injective on the scaled domain ------------------------------
zpoints = st.lists(
    st.tuples(st.integers(0, 255), st.integers(0, 255)),
    min_size=1,
    max_size=30,
    unique=True,
)


@pytest.mark.slow
@given(pts=zpoints)
@SET
def test_z_value_bijective_on_domain(spark, pts):
    from spark_etl_cli_spark.operators.zorder import z_value

    df = spark.createDataFrame(pts, ["x", "y"])
    out = df.select("x", "y", z_value([F.col("x"), F.col("y")], 8).alias("z"))
    rows = out.collect()
    assert len({r.z for r in rows}) == len(pts)  # distinct in -> distinct out
    # reconstructible: deinterleave equals the inputs
    for r in rows:
        x = sum(((r.z >> (2 * i)) & 1) << i for i in range(8))
        y = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (x, y) == (r.x, r.y)


# --- q115-style rank-arithmetic quantiles vs numpy ------------------------
values_strategy = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=1, max_size=40
)


@pytest.mark.slow
@given(vals=values_strategy)
@SET
def test_rank_quantiles_match_numpy_linear(spark, vals):
    import numpy as np

    from spark_etl_cli_spark.plans.retrieval import _QUANTILES

    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).withColumn("g", F.lit("all"))
    from pyspark.sql.window import Window

    wr = Window.partitionBy("g").orderBy("x")
    r = df.select(
        "g", "x",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).cast("bigint").alias("n"),
    )
    aggs = []
    for name, q in _QUANTILES:
        p = F.lit(q) * (F.col("n") - 1).cast("double")
        lo = F.max(F.when(F.col("rn") - 1 == F.floor(p), F.col("x")))
        hi = F.max(F.when(F.col("rn") - 1 == F.ceil(p), F.col("x")))
        frac = p - F.floor(p).cast("double")
        aggs.append((lo + ((hi - lo) * F.max(frac))).alias(name))
    got = r.groupBy("g").agg(*aggs).first()
    arr = np.array([float(v) for v in vals], dtype="float64")
    for name, q in _QUANTILES:
        expected = float(np.percentile(arr, q * 100, method="linear"))
        assert got[name] == pytest.approx(expected, rel=1e-12, abs=1e-9)


# --- mixture upsampling: copy counts are exactly the bucket-gated ones ----
weight_strategy = st.floats(0, 4).map(lambda w: round(w, 2))


@pytest.mark.slow
@given(w=weight_strategy)
@SET
def test_epoch_upsample_total_copies(spark, w):
    from spark_etl_cli_spark.operators.mixture import (
        _split_weight,
        epoch_upsample,
        id_bucket,
    )

    df = spark.createDataFrame(
        [(i, "s") for i in range(40)], "doc_id long, source string"
    )
    base, pct = _split_weight(w)
    buckets = {
        r["doc_id"]: r["b"]
        for r in df.select("doc_id", id_bucket(F.col("doc_id")).alias("b")).collect()
    }
    expected = sum(base + (1 if buckets[i] < pct else 0) for i in range(40))
    assert epoch_upsample(df, {"s": w}).count() == expected


# --- funnel / retention vs pure-Python references ------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(0, 3),                      # user
        st.sampled_from(["view", "click", "purchase", "noise"]),
        st.integers(0, 20),                     # ts
    ),
    min_size=1,
    max_size=25,
)


def _ref_funnel(rows, steps):
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, et, ts in rows:
        by_user[u].append((et, ts))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev = None
        for i, s in enumerate(steps):
            cand = [
                ts
                for (et, ts) in evs
                if et == s and (prev is None or ts > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    return counts


@pytest.mark.slow
@given(rows=funnel_events)
@SET
def test_funnel_matches_python_reference(spark, rows):
    from spark_etl_cli_spark.operators.events import funnel_steps

    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, et, ts) for u, et, ts in rows],
        "user_id long, event_type string, ts long",
    )
    out = {
        r.step: r.n_users for r in funnel_steps(df, steps).collect()
    }
    expected = _ref_funnel(rows, steps)
    assert [out[s] for s in steps] == expected


retention_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 27)),  # user, day offset
    min_size=1,
    max_size=20,
)


@pytest.mark.slow
@given(rows=retention_events)
@SET
def test_retention_matches_python_reference(spark, rows):
    import datetime as dt
    from collections import defaultdict

    from spark_etl_cli_spark.operators.events import retention_cohorts

    base = dt.date(2024, 1, 1)
    data = [(u, base + dt.timedelta(days=d)) for u, d in rows]
    df = spark.createDataFrame(data, "user_id long, ts date")

    first = {}
    for u, d in data:
        first[u] = min(first.get(u, d), d)
    epoch_monday = dt.date(1970, 1, 5)
    expected = defaultdict(set)
    for u, d in data:
        cd = first[u]
        cw = cd - dt.timedelta(days=(cd - epoch_monday).days % 7)
        expected[(cw, (d - cw).days // 7)].add(u)
    got = {
        (r.cohort_week, r.week_offset): r.n_active
        for r in retention_cohorts(df).collect()
    }
    assert got == {k: len(v) for k, v in expected.items()}


# --- curation operators --------------------------------------------------

cap_rows = st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 1000)),
    min_size=1,
    max_size=30,
    unique=True,
)


@pytest.mark.slow
@given(rows=cap_rows, cap=st.integers(1, 5))
@SET
def test_cap_per_group_properties(spark, rows, cap):
    from spark_etl_cli_spark.operators.curation import cap_per_group

    df = spark.createDataFrame(
        [(g, v) for g, v in rows], "g string, v long"
    )
    out = cap_per_group(
        df, "g", cap, order_by=[F.col("v").desc(), F.col("g")]
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.g, []).append(r.v)
    want = {}
    for g, v in rows:
        want.setdefault(g, []).append(v)
    for g, vs in want.items():
        # exactly min(cap, |group|) survivors, and they are the top-v rows
        assert sorted(got.get(g, []), reverse=True) == sorted(vs, reverse=True)[:cap]


@pytest.mark.slow
@given(
    ids=st.lists(st.integers(0, 10**9), min_size=1, max_size=40, unique=True),
    w=st.tuples(st.integers(1, 9), st.integers(1, 9)),
)
@SET
def test_dataset_split_partition_function(spark, ids, w):
    from spark_etl_cli_spark.operators.curation import dataset_split

    weights = {"a": w[0], "b": w[1]}
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    out = dataset_split(df, "id", weights).collect()
    # total preservation + per-row determinism under re-run and subset
    assert sorted(r.id for r in out) == sorted(ids)
    again = {
        r.id: r.split
        for r in dataset_split(
            df.limit(len(ids)).repartition(5), "id", weights
        ).collect()
    }
    assert {r.id: r.split for r in out} == again


@pytest.mark.slow
@given(
    sizes=st.lists(st.integers(1, 500), min_size=1, max_size=25),
    target=st.integers(100, 600),
)
@SET
def test_compaction_plan_conservation_and_bounds(spark, sizes, target):
    from spark_etl_cli_spark.operators.curation import compaction_plan

    df = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate(sizes)], "p string, f long, sz long"
    )
    out = compaction_plan(df, "p", "f", "sz", target).collect()
    # conservation: every file lands in exactly one bin
    assert sum(r.n_files for r in out) == len(sizes)
    assert sum(r.bytes for r in out) == sum(sizes)
    # a bin other than the last can only stay under target if the next
    # file opened a new bin because cum >= target, i.e. every non-final
    # bin's cumulative start is target-aligned: bins are contiguous ints
    bins = sorted(r.bin for r in out)
    assert bins[0] == 0 and all(b >= 0 for b in bins)


@pytest.mark.slow
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@SET
def test_pagerank_matches_python_reference(spark, edges):
    from spark_etl_cli_spark.operators.graph import pagerank

    df = spark.createDataFrame([(a, b, 1) for a, b in edges], "src long, dst long, w long")
    got = {r.vertex: r.pagerank for r in pagerank(df, iterations=3).collect()}
    # independent python reference with the same (sorted-fold) op order
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    outw = {}
    for a, b in edges:
        outw[a] = outw.get(a, 0.0) + 1.0
    r = {v: 1.0 / n for v in verts}
    for _ in range(3):
        contrib = {}
        for a, b in sorted(edges):
            contrib.setdefault(b, []).append((a, (1.0 / outw[a]) * r[a]))
        nxt = {}
        for v in verts:
            s = 0.0
            for _, c in sorted(contrib.get(v, [])):
                s += c
            nxt[v] = (1.0 - 0.85) / n + 0.85 * s
        r = nxt
    assert set(got) == set(r)
    for v in verts:
        assert got[v] == pytest.approx(r[v], abs=1e-12)


# --- profiling operators vs independent references on random inputs -----

vals = st.lists(st.integers(0, 10_000), min_size=2, max_size=40)


@pytest.mark.slow
@given(ys=vals)
@SET
def test_regression_matches_numpy_on_random_groups(spark, ys):
    import numpy as np

    from spark_etl_cli_spark.operators.profiling import group_regression

    rows = [("g", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    (got,) = group_regression(df, "x", "y", ["g"]).collect()
    xs = np.arange(len(ys), dtype=float)
    yarr = np.array(ys, dtype=float)
    if np.ptp(yarr) == 0 or len(ys) < 2:
        return  # zero variance: slope/r2 undefined (div by zero -> nan/inf)
    slope, intercept = np.polyfit(xs, yarr, 1)
    assert got["slope"] == pytest.approx(slope, rel=1e-9, abs=1e-9)
    assert got["intercept"] == pytest.approx(intercept, rel=1e-9, abs=1e-6)
    r = np.corrcoef(xs, yarr)[0, 1]
    assert got["r2"] == pytest.approx(r * r, rel=1e-6, abs=1e-9)


@pytest.mark.slow
@given(ys=st.lists(st.one_of(st.none(), st.integers(-50, 150)), min_size=1, max_size=30))
@SET
def test_histogram_partitions_non_nulls(spark, ys):
    from spark_etl_cli_spark.operators.profiling import equi_width_histogram

    df = spark.createDataFrame([(y,) for y in ys], "v long")
    rows = equi_width_histogram(df, "v", lo=0, width=10, n_buckets=10).collect()
    non_null = [y for y in ys if y is not None]
    assert sum(r["n_rows"] for r in rows) == len(non_null)
    ref = {}
    for y in non_null:
        b = min(max(y // 10, 0), 9)
        ref[b] = ref.get(b, 0) + 1
    assert {r["bucket"]: r["n_rows"] for r in rows} == ref


@pytest.mark.slow
@given(terms=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=50))
@SET
def test_cms_random_streams_never_underestimate(spark, terms):
    from collections import Counter

    from spark_etl_cli_spark.operators.profiling import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sketch = count_min_sketch(df, "term", depth=3, width=4)  # force collisions
    exact = Counter(terms)
    cand = spark.createDataFrame(
        [(t,) for t in "abcdef"], "term string"
    )
    est = {r["term"]: r["est_cnt"] for r in cms_estimate(
        sketch, cand, "term", depth=3, width=4).collect()}
    for t in "abcdef":
        assert est[t] >= exact.get(t, 0)


@pytest.mark.slow
@given(series=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=30))
@SET
def test_ewma_matches_python_fold(spark, series):
    import __spark_entry__  # noqa: F401  (registers queries; not used directly)
    from pyspark.sql import functions as F  # noqa: F401

    rows = [(1, i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    from pyspark.sql import functions as FF

    ordered = df.groupBy("user_id").agg(
        FF.transform(
            FF.array_sort(
                FF.collect_list(
                    FF.struct(
                        FF.col("event_id"),
                        FF.col("value").cast("double").alias("value"),
                    )
                )
            ),
            lambda s: s["value"],
        ).alias("vs")
    )
    (got,) = ordered.select(
        FF.aggregate(
            FF.slice(FF.col("vs"), 2, FF.greatest(FF.size("vs") - 1, FF.lit(0))),
            FF.element_at(FF.col("vs"), 1),
            lambda s, x: (s + x) / FF.lit(2.0),
        ).alias("ewma")
    ).collect()
    ref = series[0]
    for v in series[1:]:
        ref = (ref + v) / 2.0
    assert got["ewma"] == ref  # bit-exact: add + exponent shift only


# --- CDC apply-changes: sequential-fold reference ---------------------------
# apply_changes_snapshot must equal the naive per-key sequential fold
# of the change log: replay changes in sequence order, keep a dict,
# delete on tombstones. Randomized logs cover insert/update/delete
# interleavings, preimage noise, and multi-key collisions.

change_logs = st.lists(
    st.tuples(
        st.integers(0, 3),                       # key
        st.sampled_from(
            ["insert", "update_postimage", "update_preimage", "delete"]
        ),
        st.integers(0, 99),                      # payload
    ),
    min_size=1,
    max_size=16,
)


@pytest.mark.slow
@given(log=change_logs)
@SET
def test_cdc_apply_matches_sequential_fold(spark, log):
    from spark_etl_cli_spark.operators.cdc import apply_changes_snapshot

    rows = [
        (k, t, float(p), i) for i, (k, t, p) in enumerate(log)
    ]
    df = spark.createDataFrame(
        rows, "id long, _change_type string, v double, _commit_version long"
    )
    got = {
        (r["id"], r["v"])
        for r in apply_changes_snapshot(
            df,
            keys=["id"],
            sequence_cols=["_commit_version"],
            change_type_col="_change_type",
        ).collect()
    }
    # reference: sequential fold, preimages are descriptive only
    state: dict[int, float] = {}
    for k, t, p in log:
        if t == "update_preimage":
            continue
        if t == "delete":
            state.pop(k, None)
        else:
            state[k] = float(p)
    assert got == set(state.items())


# --- puffin / deletion-vector codec ------------------------------------


@given(
    idx=st.lists(
        st.integers(min_value=0, max_value=2**40),
        max_size=300,
    ),
    split=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=60, deadline=None)
def test_dv_blob_roundtrip_and_merge(tmp_path_factory, idx, split):
    """deletion-vector-v1 blobs round-trip arbitrary position sets
    (array + run + bitmap container shapes), and merging two blobs'
    position sets equals the union — the v3 DELETE merge invariant."""
    import os

    from spark_etl_cli_spark.sources.puffin_lite import (
        DV_BLOB_TYPE,
        dv_blob_bytes,
        parse_dv_blob,
        read_dv,
        write_puffin,
    )

    want = sorted(set(idx))
    blob = dv_blob_bytes(want)
    assert parse_dv_blob(blob) == want
    a, b = sorted(set(idx[:split])), sorted(set(idx[split:]))
    merged = sorted(set(a) | set(b))
    assert parse_dv_blob(dv_blob_bytes(merged)) == merged
    # through the file framing too
    d = tmp_path_factory.mktemp("dvprop")
    path = os.path.join(str(d), "t.puffin")
    metas = write_puffin(
        path,
        [
            {"type": DV_BLOB_TYPE, "data": dv_blob_bytes(want)},
            {"type": DV_BLOB_TYPE, "data": dv_blob_bytes(merged)},
        ],
    )
    assert read_dv(path, metas[0]["offset"], metas[0]["length"]) == want
    assert read_dv(path, metas[1]["offset"], metas[1]["length"]) == merged


@given(
    vals=st.lists(
        # small domain: 5000 draws over 70k values force >4096-card
        # containers, crossing the array->bitmap container switch
        st.integers(min_value=0, max_value=70_000),
        max_size=5000,
    ),
    offset=st.sampled_from([0, 2**16, 2**31]),
)
@settings(max_examples=30, deadline=None)
def test_roaring32_dense_container_roundtrip(vals, offset):
    """serialize_roaring32 -> parse_roaring32 is identity on sorted
    sets across array and bitmap container encodings and container
    key offsets."""
    from spark_etl_cli_spark.sources.dv_lite import (
        parse_roaring32,
        serialize_roaring32,
    )

    want = sorted({v + offset for v in vals})
    got, _pos = parse_roaring32(serialize_roaring32(want))
    assert got == want


# --- v3 default-value single-value serialization round-trip -------------
# _normalize_default canonicalizes a user default into the spec JSON
# form; _sv_to_column turns the stored form into a typed literal. The
# composition must reproduce the original value for ANY composite the
# writer accepts — checked on randomized struct/list/map/decimal
# defaults against an independent Python evaluation.

_ICE_LEAF = st.sampled_from(
    [("long", st.integers(-10**9, 10**9)),
     ("double", st.floats(allow_nan=False, allow_infinity=False,
                          width=32)),
     ("string", st.text(min_size=0, max_size=8)),
     ("boolean", st.booleans())]
)


@st.composite
def _ice_default(draw, depth=2):
    kinds = ["leaf"]
    if depth > 0:
        kinds += ["struct", "list", "map"]
    kind = draw(st.sampled_from(kinds))
    if kind == "leaf":
        t, strat = draw(_ICE_LEAF)
        return t, draw(strat)
    if kind == "list":
        # list elements share one type; repeat a drawn value n times
        et, ev = draw(_ice_default(depth=depth - 1))
        n = draw(st.integers(0, 3))
        return (
            {"type": "list", "element-id": 991, "element": et,
             "element-required": False},
            [ev] * n,
        )
    if kind == "map":
        vt, vv = draw(_ice_default(depth=0))
        keys = draw(st.lists(st.text(min_size=1, max_size=5),
                             min_size=0, max_size=3, unique=True))
        return (
            {"type": "map", "key-id": 992, "key": "string",
             "value-id": 993, "value": vt,
             "value-required": False},
            {"keys": list(keys), "values": [vv] * len(keys)},
        )
    # struct
    n = draw(st.integers(1, 3))
    fields, val = [], {}
    for i in range(n):
        ft, fv = draw(_ice_default(depth=depth - 1))
        fields.append(
            {"id": 900 + i, "name": f"f{i}", "required": False,
             "type": ft}
        )
        if draw(st.booleans()):
            val[f"f{i}"] = fv  # name-keyed (the ergonomic form)
    return {"type": "struct", "fields": fields}, val


def _expected(ice_type, norm):
    """Independent Python evaluation of the stored spec form."""
    if norm is None:
        return None
    if isinstance(ice_type, dict):
        k = ice_type["type"]
        if k == "struct":
            return {
                f["name"]: _expected(
                    f["type"], norm.get(str(f["id"]))
                )
                for f in ice_type["fields"]
            }
        if k == "list":
            return [_expected(ice_type["element"], e) for e in norm]
        if k == "map":
            return dict(
                zip(
                    norm["keys"],
                    [
                        _expected(ice_type["value"], v)
                        for v in norm["values"]
                    ],
                )
            )
    return norm


@pytest.mark.slow
@given(tv=_ice_default())
@SET
def test_v3_default_serialization_roundtrip(spark, tv):
    import math

    from pyspark.sql import Row

    from spark_etl_cli_spark.sources.iceberg_lite import (
        _iceberg_type_to_spark,
        _normalize_default,
        _sv_to_column,
    )

    ice_type, value = tv
    if isinstance(ice_type, dict) and ice_type["type"] == "struct":
        if not value:
            return  # all-fields-omitted struct: nothing to check
    norm = _normalize_default(value, ice_type)
    col = _sv_to_column(norm, ice_type)
    got = spark.range(1).select(col.alias("v")).first()["v"]

    def unrow(x):
        if isinstance(x, Row):
            return {k: unrow(v) for k, v in x.asDict().items()}
        if isinstance(x, list):
            return [unrow(e) for e in x]
        if isinstance(x, dict):
            return {k: unrow(v) for k, v in x.items()}
        return x

    def close(a, b):
        if isinstance(a, float) or isinstance(b, float):
            return (
                a is not None
                and b is not None
                and math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
            )
        if isinstance(a, dict) and isinstance(b, dict):
            return set(a) == set(b) and all(
                close(a[k], b[k]) for k in a
            )
        if isinstance(a, list) and isinstance(b, list):
            return len(a) == len(b) and all(
                close(x, y) for x, y in zip(a, b)
            )
        return a == b

    assert close(unrow(got), _expected(ice_type, norm))
