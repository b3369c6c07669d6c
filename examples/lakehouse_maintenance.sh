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

echo "lakehouse maintenance pipeline OK"
