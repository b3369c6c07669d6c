#!/usr/bin/env bash
# Multimodal ingestion, declared entirely as URIs: raw files in a
# directory -> binaryfile:// (one row per file, BINARY content) ->
# media schema -> Arrow-batched feature extraction (deterministic
# digest stub; the container has no codecs) + content-addressable
# payload dedup + chunk-level dedup savings estimate.
#
# Usage: bash examples/multimodal_ingest.sh [OUT_DIR]
set -euo pipefail
OUT="${1:-/tmp/dfio_media}"
rm -rf "$OUT"
mkdir -p "$OUT/raw"

# synthesize a small "media" directory with one duplicated payload
python - "$OUT/raw" <<'PY'
import sys, pathlib
raw = pathlib.Path(sys.argv[1])
(raw / "a.img").write_bytes(b"\x89IMG" + b"alpha" * 100)
(raw / "b.img").write_bytes(b"\x89IMG" + b"beta" * 200)
(raw / "c.img").write_bytes(b"\x89IMG" + b"alpha" * 100)  # exact dup of a
PY

python -m spark_etl_cli_spark \
  --source "raw+binaryfile://$OUT/raw" \
  --transform "raw+media+media://?id-col=path&kind=image&payload-col=content" \
  --transform "media+feats+media-features://?op=image" \
  --transform "media+dups+payload-dedup://" \
  --transform "media+savings+chunk-dedup://?chunk-bytes=64" \
  --sink "feats+parquet://$OUT/features" \
  --sink "dups+console://" \
  --sink "savings+csv://$OUT/savings.csv?single-file=true" \
  --observe

echo "--- chunk dedup savings:"
cat "$OUT"/savings.csv/part*.csv
echo "--- features written:"
python - "$OUT" <<'PY'
import sys
import duckdb
print(duckdb.sql(f"SELECT COUNT(*) AS media, MIN(width) AS min_w, MAX(height) AS max_h FROM '{sys.argv[1]}/features/*.parquet'"))
PY
