#!/usr/bin/env bash
# Engine-free Delta Lake round trip — no delta-spark jars anywhere:
# write two versions of a table (append, then overwrite) through the
# protocol writer, read the current snapshot back, and time-travel to
# version 0 — all via the transaction-log replay reader/writer
# (sources/delta_lite.py).
#
# Usage: bash examples/delta_roundtrip.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/dfio_delta}"
rm -rf "$OUT"

# v0: five smallest nations; v1: append five more
python -m spark_etl_cli_spark \
  --source "n+parquet://$SF_DIR/nation.parquet" \
  --transform "n+small+sql://SELECT n_nationkey, n_name FROM n WHERE n_nationkey < 5" \
  --transform "n+more+sql://SELECT n_nationkey, n_name FROM n WHERE n_nationkey >= 5 AND n_nationkey < 10" \
  --sink "small+delta://$OUT/nations" \
  --sink "more+delta://$OUT/nations"

# current snapshot (10 rows) and time travel back to v0 (5 rows)
python - "$OUT" <<'PY'
import sys

sys.path.insert(0, ".")
from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

out = sys.argv[1]
spark = get_spark(app_name="delta_roundtrip")
now = read_delta_lite(spark, f"{out}/nations").count()
v0 = read_delta_lite(spark, f"{out}/nations", version_as_of=0).count()
assert (now, v0) == (10, 5), (now, v0)
print(f"current snapshot: {now} rows; versionAsOf=0: {v0} rows")
PY
echo "delta round trip OK"
