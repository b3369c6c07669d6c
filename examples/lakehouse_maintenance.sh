#!/usr/bin/env bash
# Lakehouse maintenance through the URI pipeline: build a delta table
# from many small streaming-style appends, OPTIMIZE it (bin-packing
# compaction), verify the snapshot is unchanged with an in-pipeline
# diff, then VACUUM the compacted-away files and land both maintenance
# reports. Same flow for iceberg: append → compact → expire snapshots.
#
# Usage: bash examples/lakehouse_maintenance.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_maint}"
rm -rf "$WORK"
DTBL="$WORK/delta_tbl"
ITBL="$WORK/ice_tbl"

# 1. several small appends -> many small files
for i in 1 2 3 4; do
  python -m spark_etl_cli_spark \
    --source "v+values://?header=k:long,batch:long&values=$((i*10)),$i;$((i*10+1)),$i" \
    --sink "v+delta://$DTBL?mode=append"
done

# 2. OPTIMIZE, then prove the snapshot is row-identical to the
# expected union (diff fails the pipeline on ANY difference)
python -m spark_etl_cli_spark \
  --source "rep+delta-optimize://$DTBL" \
  --source "now+delta://$DTBL" \
  --source "expected+values://?header=k:long,batch:long&values=10,1;11,1;20,2;21,2;30,3;31,3;40,4;41,4" \
  --transform "now+checked+diff://expected?id=k&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

# 3. VACUUM report (dry run): the compacted-away files are listed but
# kept — they are inside the retention window
python -m spark_etl_cli_spark \
  --source "rep+delta-vacuum://$DTBL?retention-hours=0.0000001" \
  --sink "rep+console://" \
  --sink "rep+csv://$WORK/vacuum_report.csv?single-file=true"

# 4. iceberg: append x3 -> compact -> expire old snapshots
for i in 1 2 3; do
  python -m spark_etl_cli_spark \
    --source "v+values://?header=id:long&values=$i" \
    --sink "v+iceberg://$ITBL?mode=append"
done
python -m spark_etl_cli_spark \
  --source "rep+iceberg-compact://$ITBL" \
  --source "now+iceberg://$ITBL" \
  --source "expected+values://?header=id:long&values=1;2;3" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"
python -m spark_etl_cli_spark \
  --source "rep+iceberg-expire://$ITBL?keep-last=1&delete-orphans=true" \
  --sink "rep+console://"

# 5. hudi: upsert x3 -> savepoint the audited state -> clean ->
# restore back to the savepoint (the cleaner kept its files)
HTBL="$WORK/hudi_tbl"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=1,a;2,b" \
  --sink "v+hudi://$HTBL?record-key=id"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=1,a2" \
  --sink "v+hudi://$HTBL?mode=upsert&record-key=id"
python -m spark_etl_cli_spark \
  --source "sp+hudi-savepoint://$HTBL?name=audited" \
  --sink "sp+console://"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=1,a3" \
  --sink "v+hudi://$HTBL?mode=upsert&record-key=id"
python -m spark_etl_cli_spark \
  --source "rep+hudi-clean://$HTBL?retain-commits=1" \
  --sink "rep+console://"
SP=$(python - "$HTBL" <<'PY'
import sys
from spark_etl_cli_spark.sources.hudi_lite import _savepointed_instants
print(sorted(_savepointed_instants(sys.argv[1]))[0])
PY
)
python -m spark_etl_cli_spark \
  --source "rep+hudi-restore://$HTBL?instant=$SP" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "now+hudi://$HTBL" \
  --source "expected+values://?header=id:long,v&values=1,a2;2,b" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 6. iceberg rollback: undo the last append, metadata-only
RTBL="$WORK/ice_rb"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long&values=1" \
  --sink "v+iceberg://$RTBL"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long&values=2" \
  --sink "v+iceberg://$RTBL?mode=append"
python -m spark_etl_cli_spark \
  --source "rb+iceberg-rollback://$RTBL?snapshot-id=1" \
  --sink "rb+console://"
python -m spark_etl_cli_spark \
  --source "now+iceberg://$RTBL" \
  --source "expected+values://?header=id:long&values=1" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 7. metadata tables: the engines' tbl.snapshots / DESCRIBE HISTORY
# surface, jar-less — inspect what the maintenance above actually did
python -m spark_etl_cli_spark \
  --source "m+iceberg://$ITBL?meta=snapshots" \
  --sink "m+console://"
python -m spark_etl_cli_spark \
  --source "m+delta://$DTBL?meta=history" \
  --sink "m+console://"
python -m spark_etl_cli_spark \
  --source "m+hudi://$HTBL?meta=timeline" \
  --sink "m+console://"

echo "lakehouse maintenance pipeline OK"
