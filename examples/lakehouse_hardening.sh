#!/usr/bin/env bash
# Round-7 surfaces, self-checked with in-pipeline asserts (any mismatch
# fails the run):
#
#   1. hudi MOR partition-MOVING upsert: the key tombstones in its old
#      group (DELETE log block) and re-inserts under the new partition,
#      one deltacommit; snapshot, ?where= pruning, and the incremental
#      pull all serve the key under the new partition only
#   2. hudi MOR incremental pull across a compaction INSIDE the range:
#      pre-compaction log changes still report (timeline-stats log
#      discovery, not live-slice)
#   3. iceberg keyed UPSERT on a bucket[4]-partitioned table carrying
#      LIVE position-delete files: delete-applying reader + transformed
#      split writer compose; bucket pruning proven by kept-file count
#   4. UniForm export of a column-mapped delta table with NESTED types
#      (struct/array/map): stable field ids + recursive name mapping;
#      the lite iceberg reader round-trips values post-rename
#
# Usage: bash examples/lakehouse_hardening.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_lakehouse_hardening}"
rm -rf "$WORK"
mkdir -p "$WORK"

python - <<PYEOF
import json
import os
import sys

sys.path.insert(0, ".")
from spark_etl_cli_spark.session import get_spark

spark = get_spark(app_name="lakehouse-hardening-example")
W = "$WORK"

# --- 1+2: hudi MOR partition move + compaction-in-range incremental ----
from spark_etl_cli_spark.sources.hudi_lite import (
    compact_hudi_mor_lite,
    read_hudi_incremental,
    read_hudi_lite,
    write_hudi_lite,
)

mor = os.path.join(W, "hudi_mor")
ts0 = write_hudi_lite(
    spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, v string, part string"
    ),
    mor, record_key="id", table_type="MERGE_ON_READ",
    partition_by=["part"],
)
# move key 1 from p1 to p2 (update + partition change in one upsert)
write_hudi_lite(
    spark.createDataFrame([(1, "A", "p2")], "id long, v string, part string"),
    mor, mode="upsert", record_key="id",
)
snap = {(r.id, r.v, r.part) for r in read_hudi_lite(spark, mor).collect()}
assert snap == {(1, "A", "p2"), (2, "b", "p2")}, snap
p1 = {r.id for r in read_hudi_lite(spark, mor, where="part = 'p1'").collect()}
assert p1 == set(), p1
inc = [(r.id, r.v, r.part)
       for r in read_hudi_incremental(spark, mor, begin_instant=ts0).collect()]
assert inc == [(1, "A", "p2")], inc
print("1. MOR partition-moving upsert OK:", sorted(snap))

# compaction INSIDE the pull range must not hide the move
compact_hudi_mor_lite(spark, mor)
write_hudi_lite(
    spark.createDataFrame([(2, "B", "p2")], "id long, v string, part string"),
    mor, mode="upsert", record_key="id",
)
inc2 = {(r.id, r.v) for r in read_hudi_incremental(spark, mor, begin_instant=ts0).collect()}
assert inc2 == {(1, "A"), (2, "B")}, inc2
print("2. MOR incremental across in-range compaction OK:", sorted(inc2))

# --- 3: iceberg bucketed upsert under live position deletes -------------
from spark_etl_cli_spark.sources.iceberg_lite import (
    delete_iceberg_lite,
    read_iceberg_lite,
    resolve_iceberg_files,
    upsert_iceberg_lite,
    write_iceberg_lite,
)

ice = os.path.join(W, "ice_bucketed")
meta_dir = os.path.join(ice, "metadata")
os.makedirs(meta_dir)
with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as fh:
    json.dump({
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-0000000000e7",
        "location": ice, "current-snapshot-id": -1,
        "last-sequence-number": 0,
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "id_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1000},
        ]}],
        "default-spec-id": 0, "snapshots": [],
    }, fh)
write_iceberg_lite(
    spark.createDataFrame([(i, float(i)) for i in range(8)],
                          "id long, v double"),
    ice, mode="append",
)
delete_iceberg_lite(spark, ice, "id = 1", mode="merge-on-read")  # live delete
stats = upsert_iceberg_lite(
    spark.createDataFrame([(3, 300.0), (42, 42.0)], "id long, v double"),
    ice, on="id",
)
assert stats["rows_updated"] == 1 and stats["rows_inserted"] == 1, stats
got = {r.id: r.v for r in read_iceberg_lite(spark, ice).collect()}
assert got == {0: 0.0, 2: 2.0, 3: 300.0, 4: 4.0, 5: 5.0, 6: 6.0,
               7: 7.0, 42: 42.0}, got
kept, _, _, _ = resolve_iceberg_files(spark, ice, where="id = 42")
allf, _, _, _ = resolve_iceberg_files(spark, ice)
assert len(kept) < len(allf), (len(kept), len(allf))
print(f"3. iceberg bucketed upsert under live deletes OK "
      f"(pruned {len(allf) - len(kept)}/{len(allf)} files)")

# --- 4: UniForm nested column-mapped export ------------------------------
from pyspark.sql import Row

from spark_etl_cli_spark.sources.delta_lite import (
    alter_delta_lite,
    write_delta_lite,
)
from spark_etl_cli_spark.sources.uniform import export_delta_as_iceberg

uni = os.path.join(W, "uniform_nested")
write_delta_lite(
    spark.createDataFrame(
        [Row(id=1, v=1.0, tags=["a"], info=Row(city="ber", zip=10115))],
        "id long, v double, tags array<string>, "
        "info struct<city string, zip int>",
    ),
    uni,
)
alter_delta_lite(spark, uni, rename={"v": "amount"})  # upgrades to mapping
export_delta_as_iceberg(spark, uni)
out = read_iceberg_lite(spark, uni).collect()[0]
assert out["amount"] == 1.0 and out["info"]["city"] == "ber", out
assert out["tags"] == ["a"] and out["info"]["zip"] == 10115, out
print("4. UniForm nested column-mapped export OK:", out.asDict())

spark.stop()
PYEOF

echo "lakehouse_hardening: ALL CHECKS PASSED"
