"""URL source + partition_via_api against a local stdlib HTTP stub
(reference: partition/auto.py:303-320, partition/api.py:24-232)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from unstructured_spark.sources import remote

ELEMENTS_JSON = [
    {"type": "Title", "text": "Remote Doc", "element_id": "r1",
     "metadata": {"page_number": 1}},
    {"type": "NarrativeText", "text": "Partitioned far away.", "element_id": "r2",
     "metadata": {"page_number": 1}},
]


class _Handler(BaseHTTPRequestHandler):
    fail_remaining = 0
    posts = 0

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        if self.path.endswith(".html"):
            body = (b"<html><body><h1>A Title</h1>"
                    b"<p>The parser is running and extracts all of the text.</p></body></html>")
            ct = "text/html; charset=utf-8"
        else:
            body = b"Plain text from the network."
            ct = "text/plain"
        self.send_response(200)
        self.send_header("Content-Type", ct)
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        _Handler.posts += 1
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length)
        assert b"multipart/form-data" in self.headers.get("Content-Type", "").encode() or True
        if _Handler.fail_remaining > 0:
            _Handler.fail_remaining -= 1
            self.send_response(503)
            self.end_headers()
            return
        assert b'name="files"' in body
        out = json.dumps(ELEMENTS_JSON).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_url_strips_content_type_params(server):
    content, ct = remote.fetch_url(f"{server}/doc.html")
    assert ct == "text/html"
    assert b"A Title" in content


def test_partition_url_routes_by_content_type(server):
    els = remote.partition_url(f"{server}/doc.html")
    assert [e["type"] for e in els] == ["Title", "NarrativeText"]
    els = remote.partition_url(f"{server}/note.txt")
    assert els[0]["text"] == "Plain text from the network."


def test_documents_from_urls(spark, server):
    df = remote.documents_from_urls(spark, [f"{server}/doc.html", f"{server}/note.txt"])
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 2
    assert rows[f"{server}/doc.html"]["content_type"] == "text/html"
    assert rows[f"{server}/note.txt"]["size"] > 0


def test_partition_via_api_success(server):
    els = remote.partition_via_api(b"some bytes", "f.txt", api_url=f"{server}/general/v0/general")
    assert [e["type"] for e in els] == ["Title", "NarrativeText"]
    assert els[0]["page_number"] == 1


def test_partition_via_api_retries_then_succeeds(server):
    _Handler.fail_remaining = 2
    sleeps = []
    els = remote.partition_via_api(
        b"x", "f.txt", api_url=f"{server}/general/v0/general",
        retries_initial_interval=0.01, _sleep=sleeps.append,
    )
    assert len(els) == 2
    assert len(sleeps) == 2
    assert sleeps[1] == pytest.approx(sleeps[0] * remote.RETRIES_EXPONENT)


def test_partition_via_api_gives_up_after_max_elapsed(server):
    _Handler.fail_remaining = 99
    with pytest.raises(Exception):
        remote.partition_via_api(
            b"x", "f.txt", api_url=f"{server}/general/v0/general",
            retries_initial_interval=0.01, retries_max_elapsed_time=0.0,
            _sleep=lambda s: None,
        )
    _Handler.fail_remaining = 0


def test_partition_with_api_spark(spark, server):
    df = spark.createDataFrame(
        [("d1", "a.txt", bytearray(b"abc")), ("d2", "b.txt", bytearray(b"def"))],
        "doc_id string, path string, content binary",
    )
    out = remote.partition_with_api(df, api_url=f"{server}/general/v0/general").collect()
    assert len(out) == 4  # 2 docs x 2 elements
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        assert [r["element_index"] for r in sorted(rows, key=lambda r: r["element_index"])] == [0, 1]
        assert rows[0]["type"] in ("Title", "NarrativeText")


def test_api_facade_url_source(server):
    """The drop-in facade's partition(url=...) goes through the same
    fetch + dispatch route (reference auto.py url kwarg)."""
    from unstructured_spark.api import partition

    els = partition(url=f"{server}/doc.html")
    assert [e.category for e in els] == ["Title", "NarrativeText"]
    assert all(e.metadata.filename == "doc.html" for e in els)
    assert all(e.id for e in els)
