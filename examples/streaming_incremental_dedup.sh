#!/usr/bin/env bash
# STREAMING incremental dedup — round 9's two features composed into
# the production loop, end-to-end and self-checked:
#
#   inbox delta table (CDF on) <--append commits of new documents--
#     CDF STREAM (deltalite-cdf-stream, one micro-batch per commit)
#       --foreachBatch--> minhash signatures of THIS batch
#         --> incremental_minhash_dedup probe vs the PERSISTED
#             signature state (state scanned, never shuffled; the
#             batch side broadcasts)
#           --> survivors append to the corpus delta table
#           --> ALL batch signatures (dups included: transitive
#               chains) append to the state delta table
#
# Checks (any failure exits non-zero):
#   1. after three checkpoint-resumed availableNow drains, streamed
#      decisions == ONE full recompute over everything fed (and the
#      corpus holds exactly the recompute's survivors)
#   2. the loop ran as MULTIPLE micro-batches RESUMING from one shared
#      checkpoint across drains, and a 4th drain with no new commits
#      processes NOTHING (exactly-once across restarts: no state row
#      or corpus row is ever double-appended)
#   3. the state accumulated EVERY document's signature exactly once
#   4. a steady-state batch's probe plan broadcasts the batch side and
#      the persisted-state scan path is exchange-free
#
# Usage: bash examples/streaming_incremental_dedup.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_streaming_incr_dedup}"
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
from spark_etl_cli_spark.sources.cdfstream import ensure_registered
from spark_etl_cli_spark.sources.delta_lite import (
    read_delta_lite,
    write_delta_lite,
)

spark = get_spark(app_name="streaming-incremental-dedup")
W = "$WORK"
INBOX = os.path.join(W, "inbox")        # documents arrive here
STATE = os.path.join(W, "sig_state")    # (id, signature) probe state
CORPUS = os.path.join(W, "corpus")      # deduped survivors

docs = (
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text", "source")
)
doc_schema = "doc_id long, text string, source string"

# inbox starts EMPTY (version 0 = creation); each append commit later
# becomes one micro-batch of the CDF stream
write_delta_lite(
    spark.createDataFrame([], doc_schema),
    INBOX, properties={"delta.enableChangeDataFeed": "true"},
)

ensure_registered(spark)
batches = []
decisions = {}
plan_checked = []


def dedup_batch(batch_df, batch_id):
    batch = (
        batch_df.filter(F.col("_change_type") == "insert")
        .select("doc_id", "text", "source")
    )
    if batch.isEmpty():
        return
    spark2 = batch_df.sparkSession
    sigs = minhash_signatures(batch, base_hash=md5_long28)
    state = (
        read_delta_lite(spark2, STATE)
        if os.path.isdir(os.path.join(STATE, "_delta_log"))
        else None
    )
    dec = incremental_minhash_dedup(sigs, state)

    if state is not None and not plan_checked:  # check 4 (once)
        plan = dec._jdf.queryExecution().executedPlan()
        assert "BroadcastHashJoin" in plan.toString()
        assert "CartesianProduct" not in plan.toString()

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

        state_probe_seen = False
        for cls, j in walk(plan):
            if cls != "BroadcastHashJoinExec":
                continue
            ch = j.children()
            for i in range(ch.length()):
                nodes = list(subtree(ch.apply(i)))
                scans_state = any(
                    c == "FileSourceScanExec"
                    and "sig_state" in n.toString()
                    for c, n in nodes
                )
                if scans_state:
                    state_probe_seen = True
                    assert not any(
                        c.startswith("ShuffleExchange")
                        for c, _n in nodes
                    ), "state side of the probe join shuffles"
        assert state_probe_seen, "no probe join streams the state scan"
        plan_checked.append(batch_id)

    dec_rows = dec.collect()
    decisions.update({r.id: r.dup_of for r in dec_rows})
    survivors = [r.id for r in dec_rows if r.dup_of is None]
    write_delta_lite(
        batch.filter(F.col("doc_id").isin(survivors)),
        CORPUS, mode="append",
    )
    # EVERY signature appends (dups included: transitive chains must
    # stay probeable by later batches)
    write_delta_lite(sigs, STATE, mode="append")
    batches.append(batch_id)


def drain():
    """One availableNow pass over un-consumed inbox commits; the shared
    checkpoint RESUMES where the previous pass stopped — restart
    semantics, exercised four times (the last with nothing to do)."""
    q = (
        spark.readStream.format("deltalite-cdf-stream")
        .option("path", INBOX)
        .option("startingVersion", "1")
        .load()
        .writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", os.path.join(W, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# documents arrive in THREE id-ordered waves (the incremental loop's
# monotone-id contract), draining between waves so each wave's commits
# stream against the state the previous waves persisted
for lo, hi in ((0, 170), (170, 340), (340, 10_000)):
    wave = docs.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    write_delta_lite(wave, INBOX, mode="append")
    drain()

n_batches_after_waves = len(batches)
state_rows_after_waves = read_delta_lite(spark, STATE).count()
drain()  # 4th drain: nothing new — must process zero batches

# --- checks ------------------------------------------------------------
full = {
    r.id: r.dup_of
    for r in incremental_minhash_dedup(
        minhash_signatures(docs, base_hash=md5_long28), None
    ).collect()
}
assert decisions == full, (
    f"streamed decisions diverge from full recompute: "
    f"{dict(sorted(set(decisions.items()) ^ set(full.items())))}"
)
corpus_ids = sorted(
    r.doc_id for r in read_delta_lite(spark, CORPUS).collect()
)
full_survivors = sorted(i for i, d in full.items() if d is None)
assert corpus_ids == full_survivors, (len(corpus_ids), len(full_survivors))
print(
    f"check 1 OK: streamed decisions == full recompute "
    f"({len(full)} docs, {len(full_survivors)} survivors in corpus)"
)

assert len(batches) >= 3, f"expected >=3 micro-batches, got {batches}"
assert len(batches) == n_batches_after_waves, (
    "the no-new-data drain reprocessed commits"
)
assert read_delta_lite(spark, STATE).count() == state_rows_after_waves, (
    "the no-new-data drain re-appended state rows"
)
print(
    f"check 2 OK: {len(batches)} micro-batches across 3 checkpoint-"
    "resumed drains; 4th drain processed nothing (exactly-once)"
)

sig_ids = [r.id for r in read_delta_lite(spark, STATE).select("id").collect()]
assert sorted(sig_ids) == sorted(full) and len(sig_ids) == len(set(sig_ids)), (
    len(sig_ids), len(full)
)
print(f"check 3 OK: state holds every doc's signature exactly once "
      f"({len(sig_ids)} rows)")

assert plan_checked, "steady-state probe plan was never audited"
print("check 4 OK: probe broadcasts batch side, state scan exchange-free "
      f"(audited at micro-batch {plan_checked[0]})")

spark.stop()
PYEOF
echo "streaming_incremental_dedup: ALL CHECKS PASSED"
