#!/usr/bin/env bash
# The reference's kafka integration test shape (ETLTest "Test 1":
# produce people to a topic, read them back, diff against the expected
# values, empty diff = pass) — run broker-free over kafka-lite://, the
# file-backed topic emulation that shares the real connector's serde
# module. Self-checking: diff://?handleDifferences=fail raises on ANY
# difference, so exit 0 proves produce→serde→consume equality.
#
# Usage: bash examples/kafka_lite_pipeline.sh [TOPIC_DIR]
set -euo pipefail
TOPIC="${1:-/tmp/dfio_kafka_lite}/person_topic"
rm -rf "$(dirname "$TOPIC")"

EXPECTED="header=id:long,name&values=1,alice;2,bob;3,carol;4,dora;5,eve"

# produce: 5 people serialized as JSON into the topic's segment log
python -m spark_etl_cli_spark \
  --source "people+values://?$EXPECTED" \
  --sink "people+kafka-lite://$TOPIC"

# consume + verify: deserialize with an explicit schema, diff against
# the same inline expectation, fail on any difference
python -m spark_etl_cli_spark \
  --source "people+kafka-lite://$TOPIC?serde=json:id long, name string" \
  --source "expected+values://?$EXPECTED" \
  --transform "people+checked+diff://expected?id=id&handleDifferences=fail" \
  --sink "checked+console://"

# stream path: same topic consumed as a micro-batch stream into parquet
OUT="$(dirname "$TOPIC")/consumed"
python -m spark_etl_cli_spark \
  --source "people+kafka-lite-stream://$TOPIC?serde=json:id long, name string" \
  --sink "people+parquet://$OUT?checkpointLocation=$(dirname "$TOPIC")/ckpt&trigger-interval=availableNow" \
  --await-termination 180

python - "$OUT" <<'PY'
import sys

import duckdb

n = duckdb.sql(f"SELECT count(*) FROM '{sys.argv[1]}/*.parquet'").fetchone()[0]
assert n == 5, f"expected 5 streamed rows, got {n}"
print(f"kafka-lite pipeline OK: {n} rows produced, verified, and streamed")
PY
