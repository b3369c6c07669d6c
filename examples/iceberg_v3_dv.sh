#!/usr/bin/env bash
# Iceberg format-version 3, self-checked with in-pipeline asserts:
#
#   1. v2 -> v3 UPGRADE converts live position-delete parquet files to
#      deletion vectors (Puffin, deletion-vector-v1 blobs) — same rows
#      back, zero position-delete entries left
#   2. v3 merge-on-read DELETE writes a MERGED DV per affected file
#      (one live DV per file — the spec's replacement rule) and no data
#      byte rewrites
#   3. row lineage on a v3-created table: _row_id = first_row_id +
#      position, STABLE across appends and DV deletes
#   4. UniForm export of the DV-bearing table to delta: the roaring
#      bitmap re-frames into a delta DV file — delta readers see the
#      same live rows
#   5. delete-applying compaction materializes the DVs; expire removes
#      the orphaned Puffin
#
# Usage: bash examples/iceberg_v3_dv.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_iceberg_v3_dv}"
rm -rf "$WORK"
mkdir -p "$WORK"

python - <<PYEOF
import glob
import os
import sys

sys.path.insert(0, ".")
from spark_etl_cli_spark.session import get_spark

spark = get_spark(app_name="iceberg-v3-dv-example")
W = "$WORK"

from spark_etl_cli_spark.sources.iceberg_lite import (
    _load_metadata,
    compact_iceberg_lite,
    delete_iceberg_lite,
    expire_iceberg_snapshots,
    read_iceberg_lite,
    upgrade_iceberg_format,
    write_iceberg_lite,
)

# --- 1: v2 table with position deletes, upgraded ----------------------
t = os.path.join(W, "events_v2")
write_iceberg_lite(spark.range(10).selectExpr("id"), t)
delete_iceberg_lite(spark, t, "id in (3, 4)", mode="merge-on-read")
assert glob.glob(os.path.join(t, "data", "pdelete-*")), "no pos-delete file?"
up = upgrade_iceberg_format(spark, t)
assert up["upgraded"] and up["dvs_written"] >= 1, up
assert up["pos_delete_files_converted"] >= 1, up
assert int(_load_metadata(t)["format-version"]) == 3
rows = sorted(r.id for r in read_iceberg_lite(spark, t).collect())
assert rows == [0, 1, 2, 5, 6, 7, 8, 9], rows
print("1. upgrade converted position deletes to DVs  OK")

# --- 2: v3 MOR DELETE merges DVs, never writes pdelete files ----------
sizes = {p: os.path.getsize(p)
         for p in glob.glob(os.path.join(t, "data", "**", "*.parquet"),
                            recursive=True)}
delete_iceberg_lite(spark, t, "id in (5, 9)", mode="merge-on-read")
for p, sz in sizes.items():
    assert os.path.getsize(p) == sz, f"data file rewritten: {p}"
assert len(glob.glob(os.path.join(t, "data", "pdelete-*"))) == 1  # old v2 dir
rows = sorted(r.id for r in read_iceberg_lite(spark, t).collect())
assert rows == [0, 1, 2, 6, 7, 8], rows
print("2. v3 MOR DELETE wrote merged DVs, zero data rewrites  OK")

# --- 3: row lineage on a v3-created table ------------------------------
lt = os.path.join(W, "lineage")
write_iceberg_lite(spark.range(4).selectExpr("id"), lt, format_version=3)
write_iceberg_lite(spark.range(50, 53).selectExpr("id"), lt, mode="append")
base = {r.id: r._row_id
        for r in read_iceberg_lite(spark, lt, with_row_id=True).collect()}
assert sorted(base.values()) == list(range(7)), base
delete_iceberg_lite(spark, lt, "id = 51", mode="merge-on-read")
after = {r.id: r._row_id
         for r in read_iceberg_lite(spark, lt, with_row_id=True).collect()}
assert 51 not in after and all(base[k] == v for k, v in after.items())
print("3. _row_id stable across append + DV delete  OK")

# --- 4: UniForm export of the DV-bearing table to delta ----------------
from spark_etl_cli_spark.sources.delta_lite import read_delta_lite
from spark_etl_cli_spark.sources.uniform import export_iceberg_as_delta

export_iceberg_as_delta(spark, t)
drows = sorted(r.id for r in read_delta_lite(spark, t).collect())
assert drows == [0, 1, 2, 6, 7, 8], drows
print("4. UniForm delta export re-framed the DVs  OK")

# --- 5: compaction materializes DVs; expire removes the Puffin ---------
puffins = glob.glob(os.path.join(t, "data", "dv-*.puffin"))
assert puffins
compact_iceberg_lite(spark, t)
expire_iceberg_snapshots(t, keep_last=1, delete_orphaned_files=True)
assert not any(os.path.exists(p) for p in puffins), "puffin not cleaned"
rows = sorted(r.id for r in read_iceberg_lite(spark, t).collect())
assert rows == [0, 1, 2, 6, 7, 8], rows
print("5. compaction + expire cleaned the DVs  OK")

print("ALL CHECKS PASSED")
PYEOF
