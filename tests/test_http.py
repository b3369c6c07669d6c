"""Generic http(s):// connector tests against an in-process stub."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlsplit

import pytest

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.registry import resolve_sink, resolve_source


class _HttpStub:
    def __init__(self, routes):
        stub = self
        self.posts = []  # (path, headers-subset, parsed body)
        self.gets = []  # (path, query, headers-subset)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, body, ctype):
                if isinstance(body, (dict, list)):
                    body = json.dumps(body)
                data = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                u = urlsplit(self.path)
                stub.gets.append(
                    (u.path, parse_qs(u.query),
                     {"Authorization": self.headers.get("Authorization")})
                )
                body, ctype = routes[u.path]
                self._send(body, ctype)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", "0"))
                stub.posts.append(
                    (urlsplit(self.path).path,
                     {"Content-Type": self.headers.get("Content-Type"),
                      "X-Token": self.headers.get("X-Token")},
                     json.loads(self.rfile.read(n)))
                )
                self._send({"ok": True}, "application/json")

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.base = f"http://127.0.0.1:{self.server.server_port}"
        threading.Thread(target=self.server.serve_forever, daemon=True).start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_http_source_json_array(spark):
    stub = _HttpStub({"/v1/items": ([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}],
                                    "application/json")})
    try:
        _, src = resolve_source(f"s+{stub.base}/v1/items?format=json")
        rows = {(r.id, r.v) for r in src.read(spark).collect()}
        assert rows == {(1, "a"), (2, "b")}
    finally:
        stub.close()


def test_http_source_envelope_datakey_query_and_headers(spark):
    stub = _HttpStub({
        "/api": ({"meta": {"n": 2},
                  "data": {"rows": [{"id": 7}, {"id": 8}]}},
                 "application/json")
    })
    try:
        _, src = resolve_source(
            f"s+{stub.base}/api?format=json&data-key=data.rows"
            "&q-since=2024-01-01&header-Authorization=Bearer tok"
        )
        assert {r.id for r in src.read(spark).collect()} == {7, 8}
        path, query, headers = stub.gets[0]
        assert path == "/api"
        assert query == {"since": ["2024-01-01"]}  # q- params forwarded
        assert headers["Authorization"] == "Bearer tok"
    finally:
        stub.close()


def test_http_source_jsonl_and_csv(spark):
    stub = _HttpStub({
        "/l": ('{"a": 1}\n{"a": 2}\n{"a": 3}\n', "application/x-ndjson"),
        "/c": ("a,b\n1,x\n2,y\n", "text/csv"),
    })
    try:
        _, src = resolve_source(f"s+{stub.base}/l?format=jsonl")
        assert {r.a for r in src.read(spark).collect()} == {1, 2, 3}
        _, src = resolve_source(f"s+{stub.base}/c?format=csv")
        assert {(r.a, r.b) for r in src.read(spark).collect()} == {
            (1, "x"), (2, "y")
        }
    finally:
        stub.close()


def test_http_source_max_bytes_guard(spark):
    stub = _HttpStub({"/big": ([{"x": "y" * 100}] * 50, "application/json")})
    try:
        _, src = resolve_source(f"s+{stub.base}/big?format=json&max-bytes=100")
        with pytest.raises(ValueError, match="max-bytes"):
            src.read(spark)
    finally:
        stub.close()


def test_http_sink_batched_posts(spark):
    stub = _HttpStub({})
    try:
        run_pipeline(
            spark,
            sources=["v+range://?end=25&partitions=2"],
            transforms=["v+v2+sql://SELECT id, id * 2 AS dbl FROM input"],
            sinks=[
                f"v2+{stub.base}/ingest?batch-size=10&header-X-Token=abc"
            ],
        )
        assert stub.posts
        sent = [d for _, _, body in stub.posts for d in body]
        assert {(d["id"], d["dbl"]) for d in sent} == {
            (i, i * 2) for i in range(25)
        }
        for path, headers, body in stub.posts:
            assert path == "/ingest"
            assert headers["Content-Type"] == "application/json"
            assert headers["X-Token"] == "abc"
            assert len(body) <= 10
        assert any(len(b) == 10 for _, _, b in stub.posts)
    finally:
        stub.close()


def test_http_roundtrip_sink_then_source(spark):
    stub = _HttpStub({})
    try:
        run_pipeline(
            spark,
            sources=["v+range://?end=6"],
            sinks=[f"v+{stub.base}/store"],
        )
        docs = [d for _, _, body in stub.posts for d in body]
        stub.server.RequestHandlerClass  # routes are fixed at init; add now
        # re-create a stub serving what was posted
        stub2 = _HttpStub({"/fetch": (docs, "application/json")})
        try:
            _, src = resolve_source(f"s+{stub2.base}/fetch")
            assert {r.id for r in src.read(spark).collect()} == set(range(6))
        finally:
            stub2.close()
    finally:
        stub.close()
