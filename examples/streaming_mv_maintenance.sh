#!/usr/bin/env bash
# STREAMING materialized-view maintenance — the loop q178's operator
# exists for, end-to-end and self-checked:
#
#   base delta table (CDF on) --upsert/update/delete commits-->
#     CDF STREAM (deltalite-cdf-stream, one micro-batch per commit)
#       --foreachBatch--> signed per-key deltas
#         --> apply_agg_deltas (three broadcast joins; the MV side
#             never shuffles)
#           --> delta MERGE write-back (only TOUCHED keys rewrite;
#               groups whose count hits zero are DELETEd)
#
# Checks (any failure exits non-zero):
#   1. after the stream drains, the maintained MV row-for-row equals a
#      full re-aggregation of the final base table
#   2. the loop ran as MULTIPLE micro-batches across three
#      availableNow drains RESUMING from one shared checkpoint (the
#      production restart semantics — nothing reprocessed twice)
#   3. a group deleted down to count 0 disappeared from the MV
#   4. write-back is delta-sized: each round MERGEs at most the
#      touched keys, never the whole view
#
# Usage: bash examples/streaming_mv_maintenance.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_streaming_mv}"
rm -rf "$WORK"
mkdir -p "$WORK"

python - <<PYEOF
import os
import sys

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.operators.maintenance import apply_agg_deltas
from spark_etl_cli_spark.sources.delta_lite import (
    _upsert_delta_lite,
    delete_delta_lite,
    read_delta_lite,
    update_delta_lite,
    write_delta_lite,
)

spark = get_spark(app_name="streaming-mv-example")
W = "$WORK"
BASE = os.path.join(W, "base")
MV = os.path.join(W, "mv")
KEYS = ["user"]

# --- base table (CDF on) + initial MV ----------------------------------
rows0 = [(i, f"u{i % 7}", (i * 13) % 50) for i in range(60)]
write_delta_lite(
    spark.createDataFrame(rows0, "id long, user string, v long"),
    BASE, properties={"delta.enableChangeDataFeed": "true"},
)
mv0 = (
    read_delta_lite(spark, BASE)
    .groupBy(*KEYS)
    .agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("v_sum"),
    )
)
write_delta_lite(mv0, MV)

# --- the maintenance loop: CDF stream -> deltas -> merge-back ----------
from spark_etl_cli_spark.sources.cdfstream import ensure_registered

ensure_registered(spark)
batches = []
merge_sizes = []


def maintain(batch_df, batch_id):
    sign = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        )
        .when(
            F.col("_change_type").isin("delete", "update_preimage"),
            F.lit(-1),
        )
        .otherwise(F.lit(0))
    )
    deltas = (
        batch_df.withColumn("__s", sign)
        .groupBy(*KEYS)
        .agg(
            F.sum("__s").cast("long").alias("cnt"),
            F.sum(F.col("__s") * F.col("v")).cast("long").alias("v_sum"),
        )
        .filter((F.col("cnt") != 0) | (F.col("v_sum") != 0))
    )
    spark2 = batch_df.sparkSession
    mv = read_delta_lite(spark2, MV)
    new_view = apply_agg_deltas(mv, deltas, KEYS, "cnt", ["v_sum"])
    # MERGE write-back is DELTA-sized: only keys this batch touched
    touched = deltas.select(*KEYS)
    changed = new_view.join(F.broadcast(touched), KEYS, "left_semi")
    changed_rows = changed.collect()
    merge_sizes.append(len(changed_rows))
    if changed_rows:
        _upsert_delta_lite(
            spark2.createDataFrame(changed_rows, changed.schema),
            MV, merge_key="user",
        )
    # groups whose count hit zero leave the view
    dead = [
        r["user"]
        for r in touched.join(changed, KEYS, "left_anti").collect()
    ]
    if dead:
        quoted = ", ".join(f"'{k}'" for k in dead)
        delete_delta_lite(spark2, MV, f"user IN ({quoted})")
    batches.append(batch_id)


def drain():
    """One availableNow pass over the un-consumed CDF commits; the
    shared checkpoint makes each pass RESUME where the last stopped —
    the production loop's restart semantics, exercised three times."""
    q = (
        spark.readStream.format("deltalite-cdf-stream")
        .option("path", BASE)
        .option("startingVersion", "1")
        .load()
        .writeStream.foreachBatch(maintain)
        .option("checkpointLocation", os.path.join(W, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# round 1: keyed MERGE — 5 updates + 5 inserts (incl. a NEW group u7)
_upsert_delta_lite(
    spark.createDataFrame(
        [(i, f"u{i % 7}", 99) for i in range(5)]
        + [(100 + i, "u7", 7) for i in range(5)],
        "id long, user string, v long",
    ),
    BASE, merge_key="id",
)
drain()

# round 2: UPDATE (group migration: preimage -u1, postimage +u0), then
# DELETE the whole u7 group — its MV row must disappear
update_delta_lite(
    spark, BASE, where="user = 'u1' AND id < 10",
    set_exprs={"user": "'u0'", "v": "v + 1"},
)
delete_delta_lite(spark, BASE, "user = 'u7'")
drain()

# round 3: plain append
write_delta_lite(
    spark.createDataFrame(
        [(200 + i, f"u{i % 3}", 5) for i in range(6)],
        "id long, user string, v long",
    ),
    BASE, mode="append",
)
drain()

# --- checks ------------------------------------------------------------
maintained = sorted(
    (r["user"], r["cnt"], r["v_sum"])
    for r in read_delta_lite(spark, MV).collect()
)
recomputed = sorted(
    (r["user"], r["cnt"], r["v_sum"])
    for r in read_delta_lite(spark, BASE)
    .groupBy(*KEYS)
    .agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("v").cast("long").alias("v_sum"),
    )
    .collect()
)
assert maintained == recomputed, (
    f"maintained != recomputed:\n{maintained}\n{recomputed}"
)
print(f"check 1 OK: maintained MV == full recompute ({len(maintained)} groups)")

assert len(batches) >= 3, f"expected >=3 micro-batches, got {batches}"
print(f"check 2 OK: {len(batches)} micro-batches across 3 checkpoint-"
      "resumed drains")

assert all(u != "u7" for u, _c, _s in maintained), "u7 should be gone"
print("check 3 OK: count-0 group u7 removed from the MV")

n_groups = len(maintained)
assert all(m <= 8 for m in merge_sizes), merge_sizes
print(f"check 4 OK: per-round MERGE sizes {merge_sizes} "
      f"(touched keys only, view has {n_groups} groups)")

spark.stop()
print("ALL CHECKS PASSED")
PYEOF
