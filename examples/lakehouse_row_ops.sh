#!/usr/bin/env bash
# Row-level lakehouse operations through the URI pipeline, self-checked
# with in-pipeline diffs (any mismatch fails the run):
#
#   delta:   upsert (MERGE by key) -> UPDATE -> DELETE with deletion
#            vectors (no data file rewritten) -> OPTIMIZE ZORDER BY
#            -> conditional MERGE (SET reads both sides)
#   iceberg: copy-on-write DELETE committed as an overwrite snapshot,
#            then a merge-on-read DELETE (position-delete file)
#   hudi:    copy-on-write DELETE committed as a replacecommit, plus a
#            full MERGE_ON_READ round-trip (log-appending upsert+delete)
#
# Usage: bash examples/lakehouse_row_ops.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_row_ops}"
rm -rf "$WORK"
DTBL="$WORK/delta_tbl"
ITBL="$WORK/ice_tbl"
HTBL="$WORK/hudi_tbl"
MTBL="$WORK/hudi_mor_tbl"

# 1. delta: seed, then MERGE — id=2 is replaced, id=9 inserted
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=1,1.0;2,2.0;3,3.0" \
  --sink "v+delta://$DTBL?mode=append"
python -m spark_etl_cli_spark \
  --source "up+values://?header=id:long,v:double&values=2,20.0;9,90.0" \
  --sink "up+delta://$DTBL?mode=upsert&merge-key=id"

# 2. UPDATE id=1, then DELETE id=3 via deletion vectors (the data
# files stay byte-identical; only a DV descriptor lands in the log)
python -m spark_etl_cli_spark \
  --source "rep+delta-update://$DTBL?where=id%3D1&set.v=v%2B0.5" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "rep+delta-delete://$DTBL?where=id%3D3&deletion-vectors=true" \
  --sink "rep+console://"

# 3. prove the final snapshot row-for-row, then ZORDER the layout and
# prove the row set is STILL identical (dataChange=false rewrite)
python -m spark_etl_cli_spark \
  --source "now+delta://$DTBL" \
  --source "expected+values://?header=id:long,v:double&values=1,1.5;2,20.0;9,90.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
python -m spark_etl_cli_spark \
  --source "rep+delta-optimize://$DTBL?zorder-by=id,v&target-file-bytes=1048576&min-files=1" \
  --source "now+delta://$DTBL" \
  --source "expected+values://?header=id:long,v:double&values=1,1.5;2,20.0;9,90.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

# 3b. conditional MERGE: bump v by the source's v where matched AND
# source.v > 0, insert new keys; verify row-for-row
python -m spark_etl_cli_spark \
  --source "up+values://?header=id:long,v:double&values=2,5.0;7,70.0" \
  --sink "up+delta://$DTBL?mode=merge&on=id&set.v=target.v%20%2B%20source.v&matched-condition=source.v%20%3E%200"
python -m spark_etl_cli_spark \
  --source "now+delta://$DTBL" \
  --source "expected+values://?header=id:long,v:double&values=1,1.5;2,25.0;7,70.0;9,90.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 4. iceberg: seed, DELETE, verify
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long&values=1;2;3;4" \
  --sink "v+iceberg://$ITBL?mode=append"
python -m spark_etl_cli_spark \
  --source "rep+iceberg-delete://$ITBL?where=id%20%3E%3D%203" \
  --source "now+iceberg://$ITBL" \
  --source "expected+values://?header=id:long&values=1;2" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

# 4b. iceberg merge-on-read DELETE: a position-delete file, nothing
# rewritten; stacks on the COW delete above
python -m spark_etl_cli_spark \
  --source "rep+iceberg-delete://$ITBL?where=id%3D1&mode=merge-on-read" \
  --source "now+iceberg://$ITBL" \
  --source "expected+values://?header=id:long&values=2" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

# 5. hudi: seed, DELETE, verify
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long&values=1;2;3;4" \
  --sink "v+hudi://$HTBL"
python -m spark_etl_cli_spark \
  --source "rep+hudi-delete://$HTBL?where=id%20%3C%3D%202" \
  --source "now+hudi://$HTBL" \
  --source "expected+values://?header=id:long&values=3;4" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

# 6. hudi MERGE_ON_READ round-trip: create -> log-appending upsert ->
# log-appending DELETE -> merged snapshot verified row-for-row
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=1,a;2,b;3,c" \
  --sink "v+hudi://$MTBL?record-key=id&table-type=MERGE_ON_READ"
python -m spark_etl_cli_spark \
  --source "up+values://?header=id:long,v&values=2,B;9,new" \
  --sink "up+hudi://$MTBL?mode=upsert&record-key=id"
python -m spark_etl_cli_spark \
  --source "rep+hudi-delete://$MTBL?where=id%3D3" \
  --source "now+hudi://$MTBL" \
  --source "expected+values://?header=id:long,v&values=1,a;2,B;9,new" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "rep+console://" \
  --sink "checked+console://"

echo "lakehouse row-ops pipeline OK"
