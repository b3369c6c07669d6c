"""Algebraic pins for the round-9 additions.

q200's DuckDB oracle proves the per-batch DECISION rule cross-engine;
these tests prove the claims the oracle can't see:

- **incremental ≡ full recompute**: processing an id-ordered corpus in
  batches through :func:`incremental_minhash_dedup` — appending every
  batch's signatures to the state — produces decisions IDENTICAL to
  one recompute over the whole corpus (the operator's raison d'être);
- **batch-sized shuffles**: the probe plan broadcasts the batch side
  and never shuffles, nested-loops, or cartesians the state side.
"""

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def doc_sigs(spark):
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.functions.text import md5_long28
    from spark_etl_cli_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mid = docs.agg(
        F.expr("percentile_approx(doc_id, 0.5)")
    ).first()[0]
    sigs = minhash_signatures(docs, base_hash=md5_long28).cache()
    return sigs, mid


def test_incremental_dedup_equals_full_recompute(spark, doc_sigs):
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    sigs, mid = doc_sigs
    sig1 = sigs.filter(F.col("id") <= mid)
    sig2 = sigs.filter(F.col("id") > mid)
    d1 = incremental_minhash_dedup(sig1, None)
    d2 = incremental_minhash_dedup(sig2, sig1)
    inc = {r.id: (r.dup_of, r.est_jaccard) for r in d1.collect()}
    inc.update({r.id: (r.dup_of, r.est_jaccard) for r in d2.collect()})

    full = {
        r.id: (r.dup_of, r.est_jaccard)
        for r in incremental_minhash_dedup(sigs, None).collect()
    }
    assert inc == full
    # the fixture corpus actually contains near-dups — the equality
    # above must not be vacuous
    assert any(v[0] is not None for v in inc.values())


def test_incremental_dedup_three_batches(spark, doc_sigs):
    """Associativity across >2 batches: state grows by appending each
    batch's signatures (survivors AND duplicates), decisions stay
    identical to the full recompute."""
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    sigs, _mid = doc_sigs
    q1, q3 = (
        sigs.agg(
            F.expr("percentile_approx(id, 0.33)"),
            F.expr("percentile_approx(id, 0.66)"),
        ).first()
    )
    parts = [
        sigs.filter(F.col("id") <= q1),
        sigs.filter((F.col("id") > q1) & (F.col("id") <= q3)),
        sigs.filter(F.col("id") > q3),
    ]
    inc = {}
    state = None
    for p in parts:
        dec = incremental_minhash_dedup(p, state)
        inc.update(
            {r.id: (r.dup_of, r.est_jaccard) for r in dec.collect()}
        )
        state = p if state is None else state.unionByName(p)
    full = {
        r.id: (r.dup_of, r.est_jaccard)
        for r in incremental_minhash_dedup(sigs, None).collect()
    }
    assert inc == full


def test_incremental_dedup_probe_plan_is_broadcast(spark, doc_sigs):
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    sigs, mid = doc_sigs
    dec = incremental_minhash_dedup(
        sigs.filter(F.col("id") > mid), sigs.filter(F.col("id") <= mid)
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the state side must reach its probe join WITHOUT an exchange:
    # every shuffle in the plan serves batch-sized data (signature
    # agg, per-batch-doc min, decision left join) — walk each
    # BroadcastHashJoin and assert its STREAMED subtree (everything
    # outside the broadcast build side) is exchange-free
    from tests.test_plan_invariants import _walk_exec

    def streamed_has_exchange(node) -> bool:
        cls = node.getClass().getSimpleName()
        if cls.startswith("BroadcastExchange") or cls.endswith(
            "BroadcastQueryStageExec"
        ):
            return False  # build side: broadcast by design
        if cls.startswith("ShuffleExchange") or cls == "ShuffleQueryStageExec":
            return True
        ch = node.children()
        return any(
            streamed_has_exchange(ch.apply(i))
            for i in range(ch.length())
        )

    bhjs = [
        n
        for cls, n in _walk_exec(dec._jdf.queryExecution().executedPlan())
        if cls == "BroadcastHashJoinExec"
    ]
    assert bhjs
    for j in bhjs:
        ch = j.children()
        for i in range(ch.length()):
            assert not streamed_has_exchange(ch.apply(i)), (
                "probe join shuffles its streamed (state) side"
            )


def test_incremental_exact_and_cosine_tiers_equal_full(spark):
    """The q201 (exact) and q202 (embedding) tiers obey the same
    batch-composition contract as the minhash tier: id-ordered batches
    against accumulated state == one full recompute."""
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.functions.text import fingerprint
    from spark_etl_cli_spark.operators.dedup import (
        incremental_exact_dedup,
    )
    from spark_etl_cli_spark.operators.similarity import (
        incremental_cosine_dedup,
    )
    from spark_etl_cli_spark.plans.textops import docs_with_dups

    fps = docs_with_dups(spark, SF_DIR).select(
        F.col("doc_id").alias("id"),
        fingerprint(F.col("text")).alias("fp"),
    ).cache()
    mid = fps.agg(F.expr("percentile_approx(id, 0.5)")).first()[0]
    f1, f2 = fps.filter(F.col("id") <= mid), fps.filter(F.col("id") > mid)
    inc = {r.id: r.dup_of for r in incremental_exact_dedup(f1, None).collect()}
    inc.update(
        {r.id: r.dup_of for r in incremental_exact_dedup(f2, f1).collect()}
    )
    full = {
        r.id: r.dup_of
        for r in incremental_exact_dedup(fps, None).collect()
    }
    assert inc == full
    assert any(v is not None for v in full.values())

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emid = emb.agg(F.expr("percentile_approx(vec_id, 0.5)")).first()[0]
    e1 = emb.filter(F.col("vec_id") <= emid)
    e2 = emb.filter(F.col("vec_id") > emid)
    cinc = {
        r.id: (r.dup_of, r.cosine_sim)
        for r in incremental_cosine_dedup(e1, None).collect()
    }
    cinc.update(
        {
            r.id: (r.dup_of, r.cosine_sim)
            for r in incremental_cosine_dedup(e2, e1).collect()
        }
    )
    cfull = {
        r.id: (r.dup_of, r.cosine_sim)
        for r in incremental_cosine_dedup(emb, None).collect()
    }
    assert cinc == cfull
    assert any(v[0] is not None for v in cfull.values())
