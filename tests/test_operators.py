"""Operator semantics: as-of join, dedup family, similarity."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.asof import asof_join
from spark_etl_cli_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_pairs_jaccard,
    simhash,
)
from spark_etl_cli_spark.operators.similarity import brute_force_topk


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=ts("2024-01-01T10:00:00"), px=100.0),
            Row(sym="A", qts=ts("2024-01-01T10:05:00"), px=101.0),
            Row(sym="B", qts=ts("2024-01-01T10:01:00"), px=50.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=ts("2024-01-01T10:04:59"), qty=1),  # -> 100
            Row(sym="A", tts=ts("2024-01-01T10:05:00"), qty=2),  # -> 101 (inclusive)
            Row(sym="B", tts=ts("2024-01-01T10:00:00"), qty=3),  # -> no match
        ]
    )
    out = asof_join(
        trades, quotes, key_cols=["sym"], left_ts="tts", right_ts="qts",
        right_payload=["px"],
    )
    got = {(r.sym, r.qty): r.px for r in out.collect()}
    assert got == {("A", 1): 100.0, ("A", 2): 101.0, ("B", 3): None}
    assert out.count() == trades.count()  # never explodes rows


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="THE  Quick  Brown fox jumps over the lazy dog"),
            Row(doc_id=3, text="completely different content about spark engines"),
            Row(doc_id=4, text="the quick brown fox jumps over the lazy cat"),
        ]
    )


def test_dedup_exact_normalizes(spark, docs):
    # 1 and 2 differ only in case/whitespace -> one survivor (min id)
    out = dedup_exact(docs)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4]
    groups = {r.keep_id: r.group_size for r in exact_dup_groups(docs).collect()}
    assert groups[1] == 2


def test_jaccard_pairs(spark, docs):
    pairs = shingle_pairs_jaccard(docs, k=3, threshold=0.5).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(1, 2)] == 1.0  # identical after normalization
    assert (1, 4) in got  # near-dup shares most shingles
    assert (1, 3) not in got


def test_minhash_identical_docs_same_signature(spark, docs):
    sigs = {r.id: r.signature for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b): r.est_jaccard
             for r in minhash_lsh_pairs(docs).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) not in pairs


def test_shingles_col_equals_inline_shingling(spark, docs):
    """r10: passing a pre-shingled array column (shingles_col=) must
    give EXACTLY the inline tokenize path's results for both the
    posting operator and the LSH operator — it's how q184 shares one
    shingle pass between its two legs."""
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.functions.text import word_shingles

    sh = docs.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("__sh")
    )
    a = shingle_pairs_jaccard(docs, k=3, threshold=0.5).collect()
    b = shingle_pairs_jaccard(
        sh, k=3, threshold=0.5, shingles_col="__sh"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = minhash_lsh_pairs(docs).collect()
    d = minhash_lsh_pairs(sh, shingles_col="__sh").collect()
    assert sorted(map(tuple, c)) == sorted(map(tuple, d))


def test_simhash_properties(spark, docs):
    fps = {r.id: r.simhash for r in simhash(docs).collect()}
    assert fps[1] == fps[2]  # same token set -> same fingerprint
    h14 = bin(fps[1] ^ fps[4]).count("1")
    h13 = bin(fps[1] ^ fps[3]).count("1")
    assert h14 < h13  # near-dup closer in hamming space than unrelated


def test_hash_family_structural_equivalence(spark, docs):
    """hash_family='oracle'|'fast' must detect the SAME structure on a
    fixture with planted dups — exact hash values differ by design (md5
    vs xxhash64), so the pin is pair-set / grouping equality, per
    family. This is what makes the one-line production swap safe."""
    from spark_etl_cli_spark.operators.profiling import (
        cms_estimate,
        count_min_sketch,
    )

    for fam in ("oracle", "fast"):
        sigs = {
            r.id: r.signature
            for r in minhash_signatures(docs, hash_family=fam).collect()
        }
        assert sigs[1] == sigs[2], fam      # identical docs collide
        assert sigs[1] != sigs[3], fam      # unrelated don't
        pairs = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(docs, hash_family=fam).collect()
        }
        assert (1, 2) in pairs and (1, 3) not in pairs, fam
        fps = {r.id: r.simhash for r in simhash(docs, hash_family=fam).collect()}
        assert fps[1] == fps[2], fam
        h14 = bin(fps[1] ^ fps[4]).count("1")
        h13 = bin(fps[1] ^ fps[3]).count("1")
        assert h14 < h13, fam               # near-dup closer than unrelated
        # CMS: build+probe under one family never underestimates and is
        # exact on a collision-free width
        terms = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 2, "term string"
        )
        sketch = count_min_sketch(terms, "term", depth=3, width=64,
                                  hash_family=fam)
        est = {
            r.term: r.est_cnt
            for r in cms_estimate(
                sketch, terms.distinct(), "term", depth=3, width=64,
                hash_family=fam,
            ).collect()
        }
        assert est == {"a": 5, "b": 2}, fam
    # mixed families (sketch 'oracle', probe 'fast') is a layout
    # violation the shared-cell helper exists to prevent — estimates
    # would silently corrupt; assert they actually diverge on this
    # fixture to prove the families really are different layouts
    sk_o = count_min_sketch(
        spark.createDataFrame([("a",)] * 5, "term string"), "term",
        depth=3, width=64, hash_family="oracle",
    )
    cells_f = count_min_sketch(
        spark.createDataFrame([("a",)] * 5, "term string"), "term",
        depth=3, width=64, hash_family="fast",
    )
    assert {tuple(r) for r in sk_o.collect()} != {
        tuple(r) for r in cells_f.collect()
    }


def test_brute_force_topk(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.9, 0.1]),
            Row(vec_id=3, embedding=[0.0, 1.0]),
        ]
    )
    out = brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=2)
    rows = sorted((r.rank, r.neighbor_id) for r in out.collect())
    assert rows == [(1, 2), (2, 3)]  # 2 is most similar to 1


def test_asof_join_forward(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=ts("2024-01-01T10:00:00"), px=100.0),
            Row(sym="A", qts=ts("2024-01-01T10:05:00"), px=101.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=ts("2024-01-01T09:59:00"), qty=1),  # -> 100
            Row(sym="A", tts=ts("2024-01-01T10:00:00"), qty=2),  # -> 100 (inclusive)
            Row(sym="A", tts=ts("2024-01-01T10:06:00"), qty=3),  # -> no later quote
        ]
    )
    out = asof_join(
        trades, quotes, ["sym"], "tts", "qts", ["px"], direction="forward"
    )
    got = {r.qty: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: 100.0, 3: None}


def test_asof_join_tolerance(spark):
    quotes = spark.createDataFrame(
        [Row(sym="A", qts=ts("2024-01-01T10:00:00"), px=100.0)]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=ts("2024-01-01T10:04:00"), qty=1),  # within 5 min
            Row(sym="A", tts=ts("2024-01-01T10:30:00"), qty=2),  # too far
        ]
    )
    out = asof_join(
        trades, quotes, ["sym"], "tts", "qts", ["px"], tolerance="5 minutes"
    )
    got = {r.qty: r.px for r in out.collect()}
    assert got == {1: 100.0, 2: None}


def test_asof_join_numeric_tolerance(spark):
    right = spark.createDataFrame([Row(k="a", ts=100, v="x")])
    left = spark.createDataFrame(
        [Row(k="a", ts=105, q=1), Row(k="a", ts=300, q=2)]
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"], tolerance=50)
    got = {r.q: r.v for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_winnow_fingerprints_guarantee(spark):
    # shared substring of length >= k+w-1 (=8) must share a fingerprint
    from spark_etl_cli_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="abcdefghij unique tail one"),
            Row(doc_id=2, text="prefix two abcdefghij"),
            Row(doc_id=3, text="zzzzzzzzzzzzzzz"),
        ]
    )
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text")).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2]  # share 'abcdefghij'
    assert not (fps[1] & fps[3])


def test_ivf_topk_matches_brute_force_with_full_probe(spark):
    # probing every cell makes IVF exact -> must equal brute force
    from spark_etl_cli_spark.operators.similarity import ivf_topk

    vecs = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float((i * 7) % 13), float((i * 3) % 5), 1.0])
         for i in range(40)]
    )
    qs = vecs.filter(F.col("vec_id") < 3)
    bf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(vecs, qs, k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(vecs, qs, k=3, n_centroids=4, nprobe=4).collect()
    }
    assert ivf == bf


def _cc_dict(df):
    return {r.id: r.component for r in df.collect()}


def test_star_components_match_min_label_on_random_graph(spark):
    import random

    from spark_etl_cli_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert _cc_dict(connected_components_star(df)) == _cc_dict(
        connected_components(df)
    )


def test_star_components_deep_chain_converges(spark):
    from spark_etl_cli_spark.operators.dedup import connected_components_star

    n = 64  # diameter 64 — min-label would need ~64 rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    out = _cc_dict(connected_components_star(chain, max_iter=12))
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_star_components_disjoint_cliques(spark):
    from spark_etl_cli_spark.operators.dedup import connected_components_star

    edges = [(a, b) for base in (0, 100, 200)
             for a in range(base, base + 5) for b in range(a + 1, base + 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = _cc_dict(connected_components_star(df))
    assert set(out.values()) == {0, 100, 200}
    for node, comp in out.items():
        assert comp == (node // 100) * 100


def test_semantic_dedup_marks_lower_id_survivor(spark):
    from spark_etl_cli_spark.operators.similarity import semantic_dedup

    # centroids = ids 0,1 (x-axis, y-axis); ids 2,3 near x, id 4 near y
    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            Row(vec_id=2, embedding=[0.99, 0.01]),
            Row(vec_id=3, embedding=[0.98, 0.02]),
            Row(vec_id=4, embedding=[0.01, 0.99]),
        ]
    )
    out = {
        r.id: (r.cluster_id, r.is_dup)
        for r in semantic_dedup(vecs, threshold=0.9, n_clusters=2).collect()
    }
    # cluster 0 holds {0, 2, 3}: 0 survives, 2 and 3 are dups of it
    assert out[0] == (0, False)
    assert out[2] == (0, True) and out[3] == (0, True)
    # cluster 1 holds {1, 4}: 1 survives, 4 dups
    assert out[1] == (1, False) and out[4] == (1, True)
    # cross-cluster near-orthogonal vectors never compared
    assert len(out) == 5


def test_semantic_dedup_threshold_gates_pairs(spark):
    from spark_etl_cli_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            Row(vec_id=5, embedding=[0.8, 0.6]),  # cos 0.8 to centroid 0
        ]
    )
    out = {
        r.id: r.is_dup
        for r in semantic_dedup(vecs, threshold=0.99, n_clusters=2).collect()
    }
    assert out[5] is False  # within cluster but below threshold


def test_semantic_dedup_skewed_cluster_spills_identical_verdicts(
    spark, monkeypatch
):
    """One cluster ≫ the others must complete with BOUNDED resident
    memory (the unit-vector buffer spills to disk past the cap) and
    emit exactly the verdicts the unbounded pass would: every vector
    here lands in cluster 0 and is within threshold of id 0, so all
    but the minimum id are dups."""
    import numpy as np

    from spark_etl_cli_spark.operators import similarity as S

    # force the spill path: cap the RAM buffer far below the cluster
    # (the operator reads the env at plan-build time)
    monkeypatch.setenv("SEMANTIC_DEDUP_BUFFER_BYTES", "1")
    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        v = np.array([1.0, 0.0, 0.0]) + rng.normal(0, 1e-3, 3)
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    # one lonely far-away vector seeds centroid 1 so n_clusters=2 has
    # two real cells (id 1 re-pointed toward y)
    rows[1] = Row(vec_id=1, embedding=[0.0, 1.0, 0.0])
    vecs = spark.createDataFrame(rows)
    out = {
        r.id: (r.cluster_id, r.is_dup)
        for r in S.semantic_dedup(vecs, threshold=0.99, n_clusters=2).collect()
    }
    assert len(out) == 400
    assert out[0] == (0, False)  # lowest id in the hot cluster survives
    assert out[1] == (1, False)  # alone in its cluster
    hot = [i for i in out if i not in (0, 1)]
    assert all(out[i] == (0, True) for i in hot)


def test_semantic_dedup_equal_ids_never_compared(spark):
    """Duplicate ids within a cluster: the original pair join compared
    a.id < b.id STRICTLY, so two rows with the same id must not flag
    each other (ADVICE r10: positional order after sort was a silent
    divergence)."""
    from spark_etl_cli_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            # two rows with the SAME id, nearly identical vectors, and
            # no smaller-id neighbor in their cluster within threshold
            Row(vec_id=7, embedding=[0.99, 0.141]),
            Row(vec_id=7, embedding=[0.99, 0.141]),
        ]
    )
    out = semantic_dedup(vecs, threshold=0.999, n_clusters=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.is_dup)
    # neither id-7 row may be flagged by the other (id 0 is below the
    # 0.999 threshold: cos([1,0],[0.99,0.141]) ≈ 0.99)
    assert by_id[7] == [False, False]


def test_semantic_dedup_zero_norm_raises(spark):
    """Pinned input contract (r10 ADVICE): zero-norm vectors raise
    loudly — at plan-build time when the offender is a centroid row."""
    from spark_etl_cli_spark.operators.similarity import semantic_dedup

    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
        ]
    )
    with pytest.raises(ValueError, match="zero-norm"):
        semantic_dedup(vecs, threshold=0.5, n_clusters=2)


def test_star_components_thousand_link_chain_olog_rounds(spark):
    # the adversarial-depth gate from the round-2 review: a 1000-edge
    # chain has diameter 1000 (min-label would need ~1000 rounds); the
    # star alternation must contract it within O(log n) rounds.
    from spark_etl_cli_spark.operators.dedup import connected_components_star

    n = 1000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    out = _cc_dict(connected_components_star(chain, max_iter=15))
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_arrow_unit_sig_bit_identical_to_hof_folds(spark):
    # the Arrow path must reproduce unit() + rp_signature() BIT FOR BIT
    # (the LSH DuckDB oracles replay the HOF arithmetic): float32 widens
    # exactly, and each accumulation is one IEEE multiply + add per
    # dimension in the same order. Compare raw double bytes, not ==.
    import math
    import struct

    from pyspark.sql import functions as F

    from spark_etl_cli_spark.functions.vectors import unit
    from spark_etl_cli_spark.operators.similarity import (
        arrow_unit_sig,
        rp_signature,
    )

    dim, planes = 8, 8
    rows = [
        (i, [math.sin(i * dim + d) * 10 ** ((i + d) % 5 - 2) for d in range(dim)])
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "id long, v array<float>")

    hof = (
        rp_signature(
            df.select("id", F.col("v").alias("vec")), "vec", planes, dim
        )
        .select("id", unit(F.col("vec")).alias("u"), "__sig")
        .collect()
    )
    arw = arrow_unit_sig(df, "id", "v", planes, dim).collect()
    h = {r["id"]: (r["u"], r["__sig"]) for r in hof}
    a = {r["id"]: (r["vec"], r["__sig"]) for r in arw}
    assert set(h) == set(a)
    for i in h:
        assert h[i][1] == a[i][1], f"signature mismatch for id {i}"
        hb = b"".join(struct.pack("d", x) for x in h[i][0])
        ab = b"".join(struct.pack("d", x) for x in a[i][0])
        assert hb == ab, f"unit-vector byte mismatch for id {i}"


def test_arrow_unit_sig_rejects_ragged_null_and_zero(spark):
    # exact-or-loud: the Arrow path must REFUSE inputs the HOF path
    # would error on (ANSI divide-by-zero) or silently mis-shape
    import pytest

    from spark_etl_cli_spark.operators.similarity import arrow_unit_sig

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "id long, v array<float>"
    )
    with pytest.raises(Exception, match="ragged"):
        arrow_unit_sig(ragged, "id", "v", 4, 2).collect()
    nulls = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "id long, v array<float>"
    )
    with pytest.raises(Exception, match="NULL vectors"):
        arrow_unit_sig(nulls, "id", "v", 4, 2).collect()
    zero = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.0, 0.0])], "id long, v array<float>"
    )
    with pytest.raises(Exception, match="zero-norm"):
        arrow_unit_sig(zero, "id", "v", 4, 2).collect()
