"""In-process Elasticsearch ``_bulk`` stub for wire-path tests.

Implements just enough of the bulk protocol to exercise
``sinks.es_wire``: NDJSON action/doc pairs, keyed ``_id`` upsert
semantics, ES-shaped item responses, plus fault injection (transport
errors for retry tests, per-doc rejection for partial-failure tests).
Runs a ThreadingHTTPServer on an ephemeral localhost port; local-mode
executors are threads in this process, so they reach it directly.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence request logging
        pass

    def do_GET(self):
        """Sliced keyset read: ``GET /<index>/_docs?slice=i&nslices=N&
        after=<id>&size=k`` → sorted page of docs whose md5(_id) lands
        in slice i — the stub twin of ES sliced-scroll + search_after
        (what the parallel DataSource reads)."""
        import hashlib
        from urllib.parse import parse_qs, urlparse
        u = urlparse(self.path)
        parts = [p for p in u.path.split("/") if p]
        if len(parts) != 2 or parts[1] != "_docs":
            self.send_response(404)
            self.end_headers()
            return
        index = parts[0]
        q = parse_qs(u.query)
        sl = int(q.get("slice", ["0"])[0])
        nsl = int(q.get("nslices", ["1"])[0])
        after = q.get("after", [None])[0]
        size = int(q.get("size", ["100"])[0])
        with self.server.lock:
            store = dict(self.server.store.get(index, {}))
        ids = sorted(
            k for k in store
            if int(hashlib.md5(k.encode()).hexdigest(), 16) % nsl == sl
            and (after is None or k > after))
        page = ids[:size]
        docs = [dict(store[k], _id=k) for k in page]
        nxt = page[-1] if len(page) == size else None
        resp = json.dumps({"docs": docs, "next_after": nxt}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def do_POST(self):
        srv = self.server
        with srv.lock:
            srv.requests_seen += 1
            if srv.fail_next_n > 0:
                srv.fail_next_n -= 1
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b'{"error":"injected unavailable"}')
                return
        if not self.path.endswith("/_bulk"):
            self.send_response(404)
            self.end_headers()
            return
        body = self.rfile.read(int(self.headers["Content-Length"]))
        lines = [ln for ln in body.decode("utf-8").split("\n") if ln]
        items, had_error = [], False
        for i in range(0, len(lines) - 1, 2):
            action = json.loads(lines[i])["index"]
            doc = json.loads(lines[i + 1])
            index = action["_index"]
            reason = srv.reject(doc) if srv.reject else None
            if reason is not None:
                had_error = True
                items.append({"index": {
                    "_index": index, "status": 400,
                    "error": {"type": "mapper_parsing_exception",
                              "reason": reason}}})
                continue
            with srv.lock:
                doc_id = action.get("_id")
                if doc_id is None:
                    srv.auto_id += 1
                    doc_id = f"auto-{srv.auto_id}"
                srv.store.setdefault(index, {})[doc_id] = doc
            items.append({"index": {"_index": index, "_id": doc_id,
                                    "status": 200}})
        resp = json.dumps({"errors": had_error, "items": items}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)


class ESStub:
    """``with ESStub() as stub: ... stub.url ... stub.store``"""

    def __init__(self, fail_next_n: int = 0, reject=None):
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.server.lock = threading.Lock()
        self.server.store = {}          # index -> {_id: doc}
        self.server.auto_id = 0
        self.server.requests_seen = 0
        self.server.fail_next_n = fail_next_n
        self.server.reject = reject     # callable(doc) -> reason | None
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True)

    def __enter__(self):
        self.thread.start()
        return self

    def __exit__(self, *exc):
        self.server.shutdown()
        self.server.server_close()
        self.thread.join(timeout=5)

    @property
    def url(self) -> str:
        host, port = self.server.server_address
        return f"http://{host}:{port}"

    @property
    def store(self) -> dict:
        return self.server.store

    @property
    def requests_seen(self) -> int:
        return self.server.requests_seen
