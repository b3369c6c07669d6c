#!/usr/bin/env bash
# Engine-free Avro + Solr demo: parquet -> avro:// (no spark-avro jar
# needed) -> read back -> aggregate -> POST to a stub Solr -> read the
# collection back via the cursorMark-paging solr:// source.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${TMPDIR:-/tmp}/spark_etl_cli_avro_solr
rm -rf "$OUT"; mkdir -p "$OUT"

# in-process stub Solr (stdlib http.server) on a random port
python - "$OUT" <<'PY' &
import http.server, json, socketserver, sys, threading, os
from urllib.parse import parse_qs, urlsplit
docs = []
class H(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a): pass
    def _json(self, p):
        b = json.dumps(p).encode()
        self.send_response(200); self.send_header("Content-Length", str(len(b)))
        self.end_headers(); self.wfile.write(b)
    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        docs.extend(json.loads(self.rfile.read(n)))
        self._json({"responseHeader": {"status": 0}})
    def do_GET(self):
        q = parse_qs(urlsplit(self.path).query)
        rows = int(q.get("rows", ["10"])[0]); cur = q.get("cursorMark", ["*"])[0]
        start = 0 if cur == "*" else int(cur[1:])
        page = docs[start:start+rows]
        nxt = cur if not page else "c%d" % (start + len(page))
        self._json({"response": {"numFound": len(docs), "start": start,
                                 "docs": page}, "nextCursorMark": nxt})
srv = socketserver.TCPServer(("127.0.0.1", 0), H)
open(os.path.join(sys.argv[1], "port"), "w").write(str(srv.server_address[1]))
srv.serve_forever()
PY
STUB_PID=$!
trap 'kill $STUB_PID 2>/dev/null || true' EXIT
until [ -s "$OUT/port" ]; do sleep 0.1; done
PORT=$(cat "$OUT/port")

# 1) parquet -> avro (jar-less container writer)
python -m spark_etl_cli_spark \
  --source "n+parquet:///root/testdata/sf0.001/nation.parquet" \
  --sink "n+avro://$OUT/nation_avro"

# 2) avro -> aggregate -> solr sink (batched POSTs) + console
python -m spark_etl_cli_spark \
  --source "a+avro://$OUT/nation_avro" \
  --transform "a+c+sql://SELECT cast(n_regionkey AS string) AS id, count(*) AS n FROM input GROUP BY 1" \
  --sink "c+solr://regions?endpoint=http://127.0.0.1:$PORT/solr&batchSize=3" \
  --sink "c+console://"

# 3) solr source (cursorMark paging) -> csv
python -m spark_etl_cli_spark \
  --source "s+solr://regions?endpoint=http://127.0.0.1:$PORT/solr&rows=2" \
  --sink "s+csv://$OUT/from_solr.csv?single-file=true"

ROWS=$(tail -n +2 "$OUT"/from_solr.csv/part*.csv | wc -l)
[ "$ROWS" -eq 5 ] || { echo "expected 5 region rows, got $ROWS"; exit 1; }
echo "avro+solr round-trip OK: $ROWS regions"
