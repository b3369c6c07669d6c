#!/usr/bin/env bash
# The UniForm interop matrix, self-checked with in-pipeline diffs:
# one physical copy of the data, readable through every format's
# reader.
#
#   delta table   --delta-uniform-->  readable as iceberg
#   iceberg table --iceberg-uniform-> readable as delta
#   hudi table    --hudi-uniform-->   readable as delta AND iceberg
#
# Every exposure is metadata-only (absolute-path file references);
# each is diffed against its source format's own reader.
#
# Usage: bash examples/format_interop.sh [WORK_DIR]
set -euo pipefail
WORK="${1:-/tmp/dfio_format_interop}"
rm -rf "$WORK"
DT="$WORK/delta_tbl"
IT="$WORK/ice_tbl"
HT="$WORK/hudi_tbl"

# delta -> iceberg
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=1,1.0;2,2.0;3,3.0" \
  --sink "v+delta://$DT"
python -m spark_etl_cli_spark \
  --source "u+delta-uniform://$DT" \
  --sink "u+console://"
python -m spark_etl_cli_spark \
  --source "ice+iceberg://$DT" \
  --source "expected+delta://$DT" \
  --transform "ice+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# iceberg -> delta (and the export refreshes after an update)
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=10,10.0;20,20.0" \
  --sink "v+iceberg://$IT"
python -m spark_etl_cli_spark \
  --source "u+iceberg-uniform://$IT" \
  --sink "u+console://"
python -m spark_etl_cli_spark \
  --source "up+values://?header=id:long,v:double&values=20,200.0;30,30.0" \
  --sink "up+iceberg://$IT?mode=upsert&merge-key=id"
python -m spark_etl_cli_spark \
  --source "u+iceberg-uniform://$IT" \
  --sink "u+console://"
python -m spark_etl_cli_spark \
  --source "d+delta://$IT" \
  --source "expected+iceberg://$IT" \
  --transform "d+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# hudi -> delta + iceberg
python -m spark_etl_cli_spark \
  --source "v+values://?header=id:long,v:double&values=7,7.0;8,8.0" \
  --sink "v+hudi://$HT?record-key=id"
python -m spark_etl_cli_spark \
  --source "u+hudi-uniform://$HT?as=both" \
  --sink "u+console://"
python -m spark_etl_cli_spark \
  --source "d+delta://$HT" \
  --source "expected+hudi://$HT" \
  --transform "d+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"
python -m spark_etl_cli_spark \
  --source "i+iceberg://$HT" \
  --source "expected+hudi://$HT" \
  --transform "i+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

echo "format_interop: ALL CHECKS PASSED"
