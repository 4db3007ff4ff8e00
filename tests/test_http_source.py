"""SRC4 HTTP-source tests: live localhost GETs through the distributed
fetcher, HTTP error codes and dead-socket failures degrading to rows, and
the file:// scheme the offline catalog round-trip uses."""

from __future__ import annotations

import http.server
import threading

import pytest

from nba_data_pipeline_spark.sources.http_source import http_get_corpus


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
        if self.path == "/ok":
            body = b"n_nationkey,n_name\n7,GERMANY\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404, "nope")

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_get_live_and_failures(spark, http_server):
    urls = spark.createDataFrame(
        [
            (f"{http_server}/ok",),
            (f"{http_server}/missing",),
            ("http://127.0.0.1:9/refused",),  # discard port: connection refused
        ],
        "url string",
    )
    rows = {r.url: r for r in http_get_corpus(urls, timeout=5.0).collect()}
    ok = rows[f"{http_server}/ok"]
    assert (ok.status, ok.error) == (200, "")
    assert "GERMANY" in ok.body
    missing = rows[f"{http_server}/missing"]
    assert missing.status == 404
    assert missing.body == ""
    dead = rows["http://127.0.0.1:9/refused"]
    assert dead.status == -1
    assert dead.error  # a reason, not an exception


def test_http_get_file_scheme(spark, tmp_path):
    p = tmp_path / "page.csv"
    p.write_text("a,b\n1,2\n")
    out = http_get_corpus(
        spark.createDataFrame([(f"file://{p}",)], "url string")
    ).collect()
    assert out[0].status == 200
    assert out[0].body == "a,b\n1,2\n"
