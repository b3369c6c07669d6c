#!/usr/bin/env bash
# Structured-streaming sessionization through the URI pipeline: replay
# the events table as a file stream, aggregate per session_window with
# an event-time watermark, and land the session aggregates in parquet
# via an availableNow trigger. --await-termination makes stream
# completion explicit (the reference returns right after .start()).
#
# Usage: bash examples/streaming_sessionize.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/dfio_sessions}"
rm -rf "$OUT" "$OUT-ckpt"

SCHEMA="event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

python -m spark_etl_cli_spark \
  --source "ev+parquet-stream://$SF_DIR?pathGlobFilter=events.parquet&schema=$SCHEMA" \
  --transform "ev+evts+sql://SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM ev" \
  --transform "evts+evwm+watermark://ts:30 minutes" \
  --transform "evwm+sess+sql://SELECT user_id, session_window(ts, '10 minutes') AS w, COUNT(*) AS n_events FROM evwm GROUP BY 1, 2" \
  --transform "sess+flat+sql://SELECT user_id, w.start AS session_start, w.end AS session_end, n_events FROM sess" \
  --sink "flat+parquet-stream://$OUT?checkpointLocation=$OUT-ckpt&trigger-interval=availableNow" \
  --await-termination 180

echo "--- sessions written:"
python -c "import duckdb; print(duckdb.sql(\"SELECT count(*) AS sessions, sum(n_events) AS events FROM read_parquet('$OUT/*.parquet')\"))"
