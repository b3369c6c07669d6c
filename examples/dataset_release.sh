#!/usr/bin/env bash
# Dataset-release hygiene, declared entirely as URIs: per-domain cap ->
# deterministic train/val/test split -> per-split shards, plus the two
# ops a data platform runs before shipping: a join-key skew profile of
# the corpus and an OPTIMIZE-style compaction plan for the shard dirs.
#
# Usage: bash examples/dataset_release.sh [SF_DIR] [OUT_DIR]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.001}"
OUT="${2:-/tmp/dfio_release}"
rm -rf "$OUT"

python -m spark_etl_cli_spark \
  --source "docs+parquet://$SF_DIR/documents.parquet" \
  --transform "docs+capped+cap://?by=source&n=200&order=n_chars:desc,doc_id" \
  --transform "capped+labeled+split://?id-col=doc_id&weights=train:90,val:5,test:5&salt=release1" \
  --transform "labeled+skew+skew-profile://?key=source&top=5" \
  --transform "labeled+plan+compact-plan://?partition-col=source&file-col=doc_id&size-col=n_chars&target=100000" \
  --sink "labeled+parquet://$OUT/shards?partition-by=split" \
  --sink "skew+console://" \
  --sink "plan+csv://$OUT/compaction_plan.csv?single-file=true" \
  --observe

echo "--- split shards:"
find "$OUT/shards" -maxdepth 1 -type d | sort
echo "--- compaction plan:"
cat "$OUT"/compaction_plan.csv/part*.csv | head -8
