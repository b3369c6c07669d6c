#!/usr/bin/env bash
# Schema & metadata management across the lakehouse formats, self-
# checked with in-pipeline diffs (any mismatch fails the run):
#
#   delta:   ALTER rename + add column (column mapping) -> append
#            against the evolved schema -> ADD CONSTRAINT (validates
#            existing rows) -> constraint blocks a bad write ->
#            SHALLOW CLONE pinned to the pre-alter version
#   iceberg: mergeSchema add-column append -> tag a snapshot ->
#            evolve further -> read the tag (pre-evolution rows)
#
# Usage: bash examples/schema_evolution.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_schema_evolution}"
rm -rf "$WORK"
DT="$WORK/delta_tbl"
CLONE="$WORK/delta_clone"
IT="$WORK/ice_tbl"

# --- delta ------------------------------------------------------------
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=1,1.0;2,2.0" \
  --sink "v+delta://$DT"
# rename v -> amount, add a note column (metadata-only)
python -m spark_etl_cli_spark \
  --source "a+delta-alter://$DT?rename.v=amount&add.note=string" \
  --sink "a+console://"
# append AGAINST the evolved schema (physical names under the hood)
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,amount:double,note&values=3,3.0,ok" \
  --sink "v+delta://$DT?mode=append"
python -m spark_etl_cli_spark \
  --source "now+delta://$DT" \
  --transform "now+flat+sql://SELECT id, amount FROM now" \
  --source "expected+values://?header=id:long,amount:double&values=1,1.0;2,2.0;3,3.0" \
  --transform "flat+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
# ADD CONSTRAINT validates the whole table, then gates writes
python -m spark_etl_cli_spark \
  --source "a+delta-alter://$DT?add-check.amount_pos=amount %3E 0" \
  --sink "a+console://"
if python -m spark_etl_cli_spark \
  --source "bad+values://?header=id:long,amount:double,note&values=9,-9.0,x" \
  --sink "bad+delta://$DT?mode=append" 2>/dev/null; then
  echo "constraint should have blocked the negative amount" >&2; exit 1
fi
# SHALLOW CLONE pinned to version 0 (pre-alter): zero-copy, old schema
python -m spark_etl_cli_spark \
  --source "c+delta-clone://$CLONE?source=$DT&version=0" \
  --sink "c+console://"
python -m spark_etl_cli_spark \
  --source "now+delta://$CLONE" \
  --source "expected+values://?header=id:long,v:double&values=1,1.0;2,2.0" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# --- iceberg ----------------------------------------------------------
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,k&values=1,a" \
  --sink "v+iceberg://$IT"
python -m spark_etl_cli_spark \
  --source "t+iceberg-tag://$IT?name=v1" \
  --sink "t+console://"
# evolve: add a score column on append
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,k,score:double&values=2,b,2.5" \
  --sink "v+iceberg://$IT?mode=append&mergeSchema=true"
python -m spark_etl_cli_spark \
  --source "now+iceberg://$IT" \
  --source "expected+values://?header=id:long,k,score:double&values=1,a,;2,b,2.5" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
# the tag still reads the pre-evolution snapshot's rows
python -m spark_etl_cli_spark \
  --source "old+iceberg://$IT?ref=v1" \
  --transform "old+flat+sql://SELECT id, k FROM old" \
  --source "expected+values://?header=id:long,k&values=1,a" \
  --transform "flat+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# --- iceberg PARTITION evolution --------------------------------------
# a region-partitioned table evolves to day-partitioning (metadata
# only); the post-evolution append lands under the new spec, and BOTH
# generations read back with every column intact — old files restore
# region from their own spec while new files carry it physically
PT="$WORK/ice_partevo"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,region,day&values=1,eu,d1;2,us,d1" \
  --sink "v+iceberg://$PT?partitionCols=region"
python -m spark_etl_cli_spark \
  --source "e+iceberg-evolve://$PT?fields=day" \
  --sink "e+console://"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,region,day&values=3,ap,d2" \
  --sink "v+iceberg://$PT?mode=append"
python -m spark_etl_cli_spark \
  --source "now+iceberg://$PT" \
  --source "expected+values://?header=id:long,region,day&values=1,eu,d1;2,us,d1;3,ap,d2" \
  --transform "now+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
# pruning binds on the NEW spec's field for the new generation
python -m spark_etl_cli_spark \
  --source "new+iceberg://$PT?where=day = 'd2'" \
  --source "expected+values://?header=id:long,region,day&values=3,ap,d2" \
  --transform "new+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# --- iceberg WRITE-AUDIT-PUBLISH ---------------------------------------
# stage an append onto a named branch: main readers see nothing until
# the audited stage is published with a strict fast-forward
WT="$WORK/ice_wap"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=1,a;2,b" \
  --sink "v+iceberg://$WT"
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v&values=3,c" \
  --sink "v+iceberg://$WT?branch=audit"
# main is still the pre-stage table...
python -m spark_etl_cli_spark \
  --source "main+iceberg://$WT" \
  --source "expected+values://?header=id:long,v&values=1,a;2,b" \
  --transform "main+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
# ...the audit read sees the staged rows...
python -m spark_etl_cli_spark \
  --source "stage+iceberg://$WT?ref=audit" \
  --source "expected+values://?header=id:long,v&values=1,a;2,b;3,c" \
  --transform "stage+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
# ...publish fast-forwards main onto the branch head
python -m spark_etl_cli_spark \
  --source "pub+iceberg-publish://$WT?branch=audit" \
  --sink "pub+console://"
python -m spark_etl_cli_spark \
  --source "main+iceberg://$WT" \
  --source "expected+values://?header=id:long,v&values=1,a;2,b;3,c" \
  --transform "main+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

echo "schema_evolution: ALL CHECKS PASSED"
