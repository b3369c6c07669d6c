#!/usr/bin/env bash
# Round-8 surfaces, self-checked with in-pipeline asserts (any mismatch
# fails the run):
#
#   1. delta ROW TRACKING through the full maintenance gauntlet: DV
#      delete -> COW delete -> UPDATE -> keyed MERGE -> OPTIMIZE, with
#      _row_id stable for every surviving row (rewrites materialize
#      ids; updates and replaced keys KEEP theirs, inserts mint fresh)
#   2. UniForm v3 export of that table WITH live deletion vectors:
#      DVs re-wrap as PUFFIN deletion-vector-v1 blobs, the delta
#      materialized row-id column maps onto iceberg's reserved _row_id
#      field, and _row_id parity holds across both readers
#   3. iceberg-NATIVE v3 row lineage through compaction + keyed upsert
#      (rewrites materialize _row_id; ids stable, inserts fresh)
#   4. iceberg v3 DEFAULT COLUMN VALUES: per-file-vintage reads (old
#      files serve the initial-default, stored NULLs stay NULL) and
#      writer-filled omitted columns (write-default)
#   5. delta DESCENDING identity columns (hwm follows the step
#      direction — no collisions) on a COLUMN-MAPPED table
#
# Usage: bash examples/row_lineage_maintenance.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_row_lineage}"
rm -rf "$WORK"
mkdir -p "$WORK"

python - <<PYEOF
import os
import sys

sys.path.insert(0, ".")
from spark_etl_cli_spark.session import get_spark

spark = get_spark(app_name="row-lineage-example")
W = "$WORK"

# --- 1: delta row tracking through maintenance --------------------------
from spark_etl_cli_spark.sources.delta_lite import (
    _upsert_delta_lite,
    delete_delta_lite,
    optimize_delta_lite,
    read_delta_lite,
    update_delta_lite,
    write_delta_lite,
)

t1 = os.path.join(W, "delta_rt")
write_delta_lite(
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "id long, v string"
    ).repartition(3),
    t1, properties={"delta.enableRowTracking": "true"},
)


def ids(path):
    return {
        r.id: r._row_id
        for r in read_delta_lite(spark, path, with_row_id=True).collect()
    }


base = ids(t1)
assert sorted(base.values()) == list(range(12)), base

delete_delta_lite(spark, t1, "id = 2", deletion_vectors=True)   # DV
delete_delta_lite(spark, t1, "id = 5", deletion_vectors=False)  # COW
update_delta_lite(spark, t1, "id = 7", {"v": "'patched'"})
_upsert_delta_lite(
    spark.createDataFrame([(9, "nine2"), (100, "new")], "id long, v string"),
    t1, "id",
)
optimize_delta_lite(spark, t1, target_file_bytes=1 << 30, min_files=2)

final = ids(t1)
survivors = {k: v for k, v in final.items() if k != 100}
assert survivors == {k: v for k, v in base.items() if k not in (2, 5)}, (
    "survivor ids drifted through maintenance"
)
assert final[100] not in base.values(), "insert must mint a fresh id"
rows = {
    r.id: r.v for r in read_delta_lite(spark, t1).collect()
}
assert rows[7] == "patched" and rows[9] == "nine2"
print("check 1 OK: delta row ids stable through DV/COW/UPDATE/MERGE/OPTIMIZE")

# --- 2: UniForm v3 export with live DVs (Puffin) + parity ----------------
import glob as _glob

from spark_etl_cli_spark.sources.iceberg_lite import read_iceberg_lite
from spark_etl_cli_spark.sources.uniform import export_delta_as_iceberg

delete_delta_lite(spark, t1, "id = 3", deletion_vectors=True)  # live DV
export_delta_as_iceberg(spark, t1)
assert _glob.glob(os.path.join(t1, "data", "uniform-dv-*.puffin")), (
    "v3 export should emit a Puffin DV file"
)
ice = sorted(
    (r.id, r._row_id)
    for r in read_iceberg_lite(spark, t1, with_row_id=True).collect()
)
dl = sorted((r.id, r._row_id) for r in
            read_delta_lite(spark, t1, with_row_id=True).collect())
assert ice == dl and all(i != 3 for i, _ in ice), (ice, dl)
print("check 2 OK: Puffin DV export, _row_id parity across both readers")

# --- 3: iceberg-native v3 lineage through compaction + upsert ------------
from spark_etl_cli_spark.sources.iceberg_lite import (
    compact_iceberg_lite,
    upsert_iceberg_lite,
    write_iceberg_lite,
)

t3 = os.path.join(W, "ice_rt")
for lo in (0, 10):
    write_iceberg_lite(
        spark.createDataFrame(
            [(i, i * 10) for i in range(lo, lo + 5)], "id long, x long"
        ).coalesce(1),
        t3,
        **({"format_version": 3} if lo == 0 else {"mode": "append"}),
    )
ibase = {
    r.id: r._row_id
    for r in read_iceberg_lite(spark, t3, with_row_id=True).collect()
}
compact_iceberg_lite(spark, t3, target_file_bytes=1 << 30)
upsert_iceberg_lite(
    spark.createDataFrame([(4, 999), (77, 770)], "id long, x long"),
    t3, on="id",
)
ifinal = {
    r.id: r._row_id
    for r in read_iceberg_lite(spark, t3, with_row_id=True).collect()
}
assert {k: v for k, v in ifinal.items() if k != 77} == ibase, (
    "iceberg lineage drifted through compaction+upsert"
)
assert ifinal[77] not in ibase.values()
print("check 3 OK: iceberg-native row lineage stable through maintenance")

# --- 4: iceberg v3 default column values ---------------------------------
t4 = os.path.join(W, "ice_dflt")
write_iceberg_lite(
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
    t4, format_version=3,
)
write_iceberg_lite(
    spark.createDataFrame(
        [(3, "c", 99), (4, "d", None)], "id long, v string, score long"
    ),
    t4, merge_schema=True, column_defaults={"score": 7},
)
write_iceberg_lite(  # omitted column -> write-default fills it
    spark.createDataFrame([(5, "e")], "id long, v string"),
    t4, mode="append",
)
got = {r.id: r.score for r in read_iceberg_lite(spark, t4).collect()}
assert got == {1: 7, 2: 7, 3: 99, 4: None, 5: 7}, got
print("check 4 OK: initial-default by file vintage, write-default fill")

# --- 3b: iceberg _last_updated_sequence_number through the same ops -------
seqs = {
    r.id: r._last_updated_sequence_number
    for r in read_iceberg_lite(
        spark, t3, with_last_updated_seq=True
    ).collect()
}
# the upserted key and the insert carry the upsert commit's sequence;
# every other row kept its ORIGINAL append sequence through the
# compaction + upsert rewrites (materialized column)
assert seqs[4] == seqs[77], seqs
assert len({v for k, v in seqs.items() if k not in (4, 77)}) == 2, seqs
assert all(v < seqs[4] for k, v in seqs.items() if k not in (4, 77)), seqs
print("check 3b OK: last-updated sequences preserved through maintenance")

# --- 4b: delta _row_commit_version through the same gauntlet ---------------
rcv = {
    r.id: r._row_commit_version
    for r in read_delta_lite(
        spark, t1, with_row_commit_version=True
    ).collect()
}
assert rcv[7] > rcv[0], rcv      # UPDATEd row bumped
assert rcv[9] == rcv[100], rcv   # replaced key and insert share the MERGE commit
assert rcv[0] == rcv[1] == 0, rcv  # untouched rows keep their insert commit
print("check 4b OK: delta row commit versions track last modification")

# --- 5: descending identity on a column-mapped delta table ----------------
from spark_etl_cli_spark.sources.delta_lite import alter_delta_lite

t5 = os.path.join(W, "delta_idy")
write_delta_lite(
    spark.createDataFrame([("a",), ("b",)], "v string"),
    t5, identity={"id": (0, -5)},
)
alter_delta_lite(spark, t5, rename={"v": "val"})  # -> column mapping
write_delta_lite(
    spark.createDataFrame([("c",), ("d",)], "val string"),
    t5, mode="append",
)
got5 = sorted(r.id for r in read_delta_lite(spark, t5).collect())
assert len(set(got5)) == 4 and all(i <= 0 and i % 5 == 0 for i in got5), got5
print("check 5 OK: descending identity on a column-mapped table")

spark.stop()
PYEOF

echo "row_lineage_maintenance: ALL CHECKS PASSED"
