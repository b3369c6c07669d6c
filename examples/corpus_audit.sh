#!/usr/bin/env bash
# Pre-training corpus audit, declared entirely as URIs: document
# novelty (first-occurrence 3-gram share), tokenizer vocabulary
# sizing, a length histogram, per-source length outliers, and a
# k-anonymity check on the joined customer dimension — the profiling
# pass a data platform runs before a corpus ships.
#
# Usage: bash examples/corpus_audit.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/dfio_audit}"
rm -rf "$OUT"

python -m spark_etl_cli_spark \
  --source "docs+parquet://$SF_DIR/documents.parquet" \
  --source "cust+parquet://$SF_DIR/customer.parquet" \
  --transform "docs+nov+novelty://?id-col=doc_id&text-col=text&k=3" \
  --transform "docs+vocab+vocab-coverage://?text-col=text&pct=95" \
  --transform "docs+hist+histogram://?col=n_chars&lo=0&width=500&buckets=10" \
  --transform "docs+odd+outliers://?col=n_chars&by=source&z=1.5" \
  --transform "cust+kanon+k-anon://?by=c_nationkey,c_mktsegment&k=8" \
  --sink "nov+parquet://$OUT/novelty" \
  --sink "vocab+console://" \
  --sink "hist+csv://$OUT/length_histogram.csv?single-file=true" \
  --sink "odd+parquet://$OUT/length_outliers" \
  --sink "kanon+csv://$OUT/k_anonymity.csv?single-file=true" \
  --observe

echo "--- length histogram:"
cat "$OUT"/length_histogram.csv/part*.csv | head -12
echo "--- k-anonymity risk groups:"
cat "$OUT"/k_anonymity.csv/part*.csv | head -8
echo "--- novelty rows written:"
python - "$OUT" <<'PY'
import sys
import duckdb
print(duckdb.sql(f"SELECT COUNT(*) AS docs, MIN(novelty) AS min_nov, MAX(novelty) AS max_nov FROM '{sys.argv[1]}/novelty/*.parquet'"))
PY
