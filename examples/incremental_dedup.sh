#!/usr/bin/env bash
# INCREMENTAL corpus dedup — the 100 TB loop, self-checked:
#
#   each round appends a NEW batch of documents; its MinHash
#   signatures probe a PERSISTED delta signature table (state) so the
#   existing corpus is never recomputed and never shuffled — the
#   probe broadcasts the batch's band keys against a plain scan of
#   the state (band keys re-derive map-side from the stored 32-long
#   signatures). Survivors land in the corpus table; the WHOLE
#   batch's signatures (survivors and duplicates — transitive chains
#   must stay probeable) append to the state.
#
# Checks (any failure exits non-zero):
#   1. batch-by-batch decisions == one full recompute over all docs
#   2. corpus table holds exactly the full-recompute survivors
#   3. the probe plan broadcasts the batch side; the state side
#      reaches the join with NO exchange (no shuffle, no BNLJ, no
#      cartesian)
#   4. state table accumulates every signature appended
#
# Usage: bash examples/incremental_dedup.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_incremental_dedup}"
rm -rf "$WORK"
mkdir -p "$WORK"

python - <<PYEOF
import os
import sys

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.functions.text import md5_long28
from spark_etl_cli_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_signatures,
)
from spark_etl_cli_spark.sources.delta_lite import (
    read_delta_lite,
    write_delta_lite,
)

spark = get_spark(app_name="incremental-dedup-example")
W = "$WORK"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

docs = spark.read.parquet(f"{SF}/documents.parquet")
mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
batches = [
    docs.filter(F.col("doc_id") <= mid),
    docs.filter(F.col("doc_id") > mid),
]

state_path = os.path.join(W, "sig_state")   # (id, signature) delta table
corpus_path = os.path.join(W, "corpus")     # surviving documents
incremental = {}
appended = 0
for rnd, batch in enumerate(batches):
    sigs = minhash_signatures(batch, base_hash=md5_long28)
    state = (
        read_delta_lite(spark, state_path)
        if os.path.isdir(os.path.join(state_path, "_delta_log"))
        else None
    )
    dec = incremental_minhash_dedup(sigs, state)

    if rnd == 1:  # state exists: audit the probe plan (check 3)
        plan = dec._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

        def walk(node):
            cls = node.getClass().getSimpleName()
            if cls == "AdaptiveSparkPlanExec":
                yield from walk(node.initialPlan()); return
            if cls.endswith("QueryStageExec"):
                yield from walk(node.plan()); return
            yield cls, node
            ch = node.children()
            for i in range(ch.length()):
                yield from walk(ch.apply(i))

        def subtree(node):
            cls = node.getClass().getSimpleName()
            if cls.startswith("BroadcastExchange"):
                return  # build side: broadcast by design
            yield cls, node
            ch = node.children()
            for i in range(ch.length()):
                yield from subtree(ch.apply(i))

        # batch-sized shuffles (signature agg on THIS batch) are the
        # design; what must never happen is a shuffle on the path that
        # scans the persisted STATE table
        bhjs = [
            n
            for cls, n in walk(dec._jdf.queryExecution().executedPlan())
            if cls == "BroadcastHashJoinExec"
        ]
        assert bhjs
        state_probe_seen = False
        for j in bhjs:
            ch = j.children()
            for i in range(ch.length()):
                nodes = list(subtree(ch.apply(i)))
                scans_state = any(
                    cls == "FileSourceScanExec"
                    and "sig_state" in n.toString()
                    for cls, n in nodes
                )
                if scans_state:
                    state_probe_seen = True
                    assert not any(
                        cls.startswith("ShuffleExchange")
                        for cls, _n in nodes
                    ), "state side of the probe join shuffles"
        assert state_probe_seen, "no probe join streams the state scan"
        print("check 3 OK: probe broadcasts batch, state scan shuffle-free")

    dec_rows = dec.collect()
    incremental.update(
        {r.id: (r.dup_of, r.est_jaccard) for r in dec_rows}
    )
    survivors = {r.id for r in dec_rows if r.dup_of is None}
    write_delta_lite(
        batch.filter(F.col("doc_id").isin(list(survivors))),
        corpus_path, mode="append",
    )
    # append EVERY signature (dups included) so later batches see
    # transitive chains
    write_delta_lite(sigs, state_path, mode="append")
    appended += sigs.count()
    print(f"round {rnd}: {len(dec_rows)} decisions, "
          f"{len(dec_rows) - len(survivors)} duplicates")

# check 1: batch-by-batch == full recompute
all_sigs = minhash_signatures(docs, base_hash=md5_long28)
full = {
    r.id: (r.dup_of, r.est_jaccard)
    for r in incremental_minhash_dedup(all_sigs, None).collect()
}
assert incremental == full, (
    sorted(set(incremental.items()) ^ set(full.items()))[:5]
)
assert any(v[0] is not None for v in full.values()), "vacuous: no dups"
print(f"check 1 OK: {len(full)} incremental decisions == full recompute "
      f"({sum(1 for v in full.values() if v[0] is not None)} dups)")

# check 2: corpus table == full-recompute survivors
corpus_ids = {
    r.doc_id for r in read_delta_lite(spark, corpus_path).collect()
}
full_survivors = {i for i, v in full.items() if v[0] is None}
assert corpus_ids == full_survivors, (
    sorted(corpus_ids ^ full_survivors)[:5]
)
print(f"check 2 OK: corpus table holds exactly the "
      f"{len(corpus_ids)} survivors")

# check 4: state accumulated every signature
state_n = read_delta_lite(spark, state_path).count()
assert state_n == appended == len(full)
print(f"check 4 OK: state table holds all {state_n} signatures")

spark.stop()
print("ALL CHECKS PASSED")
PYEOF
