#!/usr/bin/env bash
# Reference-style self-checking analytics: run a pricing-summary
# aggregation, compare it against an expected inline table with the
# native diff transform (N/I/D/C), and fail the pipeline if any row
# differs — correctness expressed *inside* the pipeline, exactly the
# reference's ETLTest pattern.
#
# Usage: bash examples/analytics_selfcheck.sh [SF_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"

python -m spark_etl_cli_spark \
  --source "li+parquet://$SF_DIR/lineitem.parquet" \
  --transform "li+agg+sql://SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY 1, 2" \
  --transform "agg+checked+diff://expected?id=l_returnflag,l_linestatus&handleDifferences=filter" \
  --source "expected+values://?header=l_returnflag,l_linestatus,n:long&values=A,F,977;A,O,985;N,F,1066;N,O,1004;R,F,967;R,O,1001" \
  --sink "checked+console://" \
  --observe
