"""In-process Elasticsearch stub for wire-path tests.

Implements just enough of the real wire protocols to exercise the
repo's ES surface end-to-end:

* ``POST /{index}/_bulk`` — NDJSON action/doc pairs, keyed ``_id``
  upsert semantics, ES-shaped item responses, plus fault injection
  (transport errors for retry tests, per-doc rejection for
  partial-failure tests) — what ``sinks.es_wire`` writes;
* ``POST /{index}/_search`` and PIT-style ``POST /_search`` —
  match_all + single-field ascending ``sort`` + ``search_after`` +
  ``slice:{id,max}`` bodies, answered with ES-shaped ``hits.hits[]``
  (``_id``/``_source``/``sort``) — what ``sources.es_http`` reads.
  Slicing hashes ``_id`` server-side like ES's doc-based slicing
  (hash-mod here vs murmur3 there — same disjoint-cover contract).
  Like a real cluster, a ``slice`` body WITHOUT a ``pit`` is rejected
  with 400 (slicing is only valid inside a PIT/scroll context), and
  ``POST /{index}/_pit`` mints point-in-time ids that pin the index
  for subsequent ``/_search`` bodies carrying ``pit.id``. The sort
  field is assumed unique (the reference sorts on its unique ``id``;
  real deployments get the implicit ``_shard_doc`` tiebreaker);
* ``GET``/``PUT /{index}/_settings`` — dynamic index settings with
  real merge semantics (null clears back to default), recording every
  PUT body — what ``sinks.es_wire.setup_index_for_bulk`` tunes.

Runs a ThreadingHTTPServer on an ephemeral localhost port; local-mode
executors are threads in this process, so they reach it directly.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _matches(query: dict, _id: str, doc: dict) -> bool:
    """Evaluate the query-DSL subset the es_http reader pushes down:
    match_all, bool.filter / bool.must_not, term, terms, range
    (gt/gte/lt/lte), exists, prefix — real filter-context semantics
    (a clause on a null/absent field matches nothing)."""
    (kind, spec), = query.items()
    if kind == "match_all":
        return True
    if kind == "bool":
        must = all(_matches(c, _id, doc)
                   for c in spec.get("filter", []))
        blocked = any(_matches(c, _id, doc)
                      for c in spec.get("must_not", []))
        return must and not blocked
    if kind == "term":
        (col, val), = spec.items()
        return doc.get(col) == val
    if kind == "terms":
        (col, vals), = spec.items()
        return doc.get(col) in set(vals)
    if kind == "range":
        (col, bounds), = spec.items()
        v = doc.get(col)
        if v is None:
            return False
        ops = {"gt": lambda a, b: a > b, "gte": lambda a, b: a >= b,
               "lt": lambda a, b: a < b, "lte": lambda a, b: a <= b}
        return all(ops[op](v, bound) for op, bound in bounds.items())
    if kind == "exists":
        return doc.get(spec["field"]) is not None
    if kind == "prefix":
        v = doc.get(next(iter(spec)))
        want = next(iter(spec.values()))
        want = want["value"] if isinstance(want, dict) else want
        return isinstance(v, str) and v.startswith(want)
    raise ValueError(f"stub: unsupported query kind {kind!r}")


def _java_date_to_strptime(fmt: str) -> str:
    """The Java date-pattern subset the stub's date support understands
    (yyyy/MM/dd/HH/mm/ss plus literal separators and quoted 'T'),
    translated to a strptime/strftime pattern. Case distinguishes
    month from minute, so sequential replacement is unambiguous."""
    out = fmt.replace("'T'", "T")
    for java, py in (("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
                     ("HH", "%H"), ("mm", "%M"), ("ss", "%S")):
        out = out.replace(java, py)
    return out


def _date_to_millis(value, fmt: str | None):
    """A stored date value → epoch millis, the doc-values form a real
    cluster buckets on. Numbers are epoch millis already; strings
    parse via the mapping's explicit format when present, else the
    common ISO spellings the default mapping accepts."""
    import datetime as _dt
    if isinstance(value, bool):
        raise ValueError("boolean is not a date")
    if isinstance(value, (int, float)):
        return int(value)
    patterns = ([_java_date_to_strptime(fmt)] if fmt else
                ["%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S",
                 "%Y-%m-%d", "%Y-%m", "%Y"])
    for pat in patterns:
        try:
            parsed = _dt.datetime.strptime(str(value), pat)
            return int(parsed.replace(
                tzinfo=_dt.timezone.utc).timestamp() * 1000)
        except ValueError:
            continue
    raise ValueError(f"unparseable date {value!r}")


def _millis_to_formatted(millis: int, fmt: str) -> str:
    import datetime as _dt
    return _dt.datetime.fromtimestamp(
        millis / 1000.0, tz=_dt.timezone.utc).strftime(
        _java_date_to_strptime(fmt))


def _stub_field_spec(srv, index: str, field: str) -> dict | None:
    """The full mapping spec (type + format + …) for ``field`` when the
    index was created with an explicit mapping, else None."""
    mappings = srv.index_mappings.get(index)
    if mappings is None:
        return None
    spec = (mappings.get("properties") or {}).get(field)
    return spec if isinstance(spec, dict) else None


def _stub_field_type(srv, index: str, field: str) -> str | None:
    """The mapping type a real cluster would report for ``field`` —
    explicit mapping if the index was created with one, else the same
    dynamic inference ``GET /_mapping`` models (strings → analyzed
    text)."""
    mappings = srv.index_mappings.get(index)
    if mappings is not None:
        spec = (mappings.get("properties") or {}).get(field)
        return spec.get("type") if isinstance(spec, dict) else None
    for doc in srv.store.get(index, {}).values():
        v = doc.get(field)
        if v is None:
            continue
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "text"
    return None


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # silence request logging
        pass

    def _error(self, status: int, etype: str, reason: str):
        resp = json.dumps({"error": {"type": etype, "reason": reason},
                           "status": status}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def _handle_pit_open(self, index: str):
        with self.server.lock:
            self.server.pit_seq += 1
            pit_id = f"pit-{self.server.pit_seq}"
            # a real PIT pins the index STATE, not just the name:
            # searches through it see the docs as of open time even if
            # _bulk writes land mid-scan — snapshot the store here
            self.server.pits[pit_id] = (
                index, dict(self.server.store.get(index, {})))
        resp = json.dumps({"id": pit_id}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def _handle_search(self, index: str):
        """Real ``_search`` semantics over the immutable store: sort by
        the (unique) requested field ascending, keep only this slice's
        docs (hash of ``_id`` mod ``slice.max``), resume strictly after
        the ``search_after`` sort values, return ``size`` ES-shaped
        hits. An unknown index is an empty result (like a fresh ES
        index pattern), not an error — the source must yield an empty
        frame there."""
        import hashlib
        with self.server.lock:
            if self.server.fail_search_next_n > 0:
                self.server.fail_search_next_n -= 1
                self.send_response(self.server.fail_search_status)
                self.end_headers()
                self.wfile.write(b'{"error":"injected unavailable"}')
                return
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])) or b"{}")
        snapshot = None
        if index is None and "pit" not in body:
            # bare /_search with no pit: real ES would search ALL
            # indices — this stub has no cross-index concept, and a
            # reader that lost its pit body should fail loudly in
            # tests, not read an accidental empty result
            self._error(400, "illegal_argument_exception",
                        "stub: /_search without an index requires a "
                        "[pit] body")
            return
        if "pit" in body:
            pit_id = (body["pit"] or {}).get("id")
            with self.server.lock:
                pit = self.server.pits.get(pit_id)
            if pit is None:
                self._error(404, "search_context_missing_exception",
                            f"No point in time found for id [{pit_id}]")
                return
            if index is not None:
                self._error(400, "action_request_validation_exception",
                            "[indices] cannot be used with point in time")
                return
            index, snapshot = pit
        elif body.get("slice") is not None:
            # real ES: slicing is only supported inside a PIT or scroll
            self._error(400, "action_request_validation_exception",
                        "[slice] can only be used with [scroll] or "
                        "[point-in-time] requests")
            return
        with self.server.lock:
            self.server.search_bodies.append((index, body))
        size = int(body.get("size", 10))
        sort = body.get("sort") or [{"_id": "asc"}]
        spec = sort[0]
        sort_field = next(iter(spec)) if isinstance(spec, dict) else spec
        sl = body.get("slice")
        after = body.get("search_after")
        with self.server.lock:
            store = (dict(snapshot) if snapshot is not None
                     else dict(self.server.store.get(index, {})))

        def key(kv):
            k, doc = kv
            return k if sort_field == "_id" else doc.get(sort_field)

        query = body.get("query") or {"match_all": {}}
        if body.get("aggs") or body.get("aggregations"):
            self._handle_composite_agg(index, body, store, query)
            return
        rows = sorted(((k, d) for k, d in store.items()
                       if _matches(query, k, d)), key=key)
        if sl is not None:
            nsl, si = int(sl["max"]), int(sl["id"])
            rows = [(k, d) for k, d in rows
                    if int(hashlib.md5(k.encode()).hexdigest(), 16)
                    % nsl == si]
        if after is not None:
            rows = [(k, d) for k, d in rows if key((k, d)) > after[0]]
        hits = [{"_index": index, "_id": k, "_source": d,
                 "sort": [key((k, d))]}
                for k, d in rows[:size]]
        resp = json.dumps({"took": 1, "timed_out": False,
                           "hits": {"hits": hits}}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def _handle_composite_agg(self, index: str, body: dict, store: dict,
                              query: dict):
        """``composite`` aggregation over a single ``terms`` source —
        the bucket-paging protocol real ES uses past the terms-agg size
        cap: buckets sorted ascending by key, ``after`` resumes
        strictly past a key, ``after_key`` echoes the last returned
        bucket. Like a real cluster, aggregating an analyzed ``text``
        field is rejected with 400 (fielddata is disabled), and docs
        missing the field are skipped (missing_bucket defaults off)."""
        aggs = body.get("aggs") or body.get("aggregations")
        try:
            (name, spec), = aggs.items()
            comp = spec["composite"]
            (src_spec,) = comp["sources"]
            (src_name, src_def), = src_spec.items()
            field = src_def["terms"]["field"]
        except (KeyError, ValueError, TypeError):
            self._error(400, "parsing_exception",
                        "stub: only a single composite terms-source "
                        "aggregation is supported")
            return
        with self.server.lock:
            ftype = _stub_field_type(self.server, index, field)
            fspec = _stub_field_spec(self.server, index, field)
        if ftype == "text":
            self._error(400, "illegal_argument_exception",
                        f"Text fields are not optimised for operations "
                        f"that require per-document field data like "
                        f"aggregations and sorting, so these operations "
                        f"are disabled by default. [{field}]")
            return
        # real-API date semantics: a date field buckets on its
        # DOC-VALUES form (epoch millis, parsed from the stored value
        # via the mapping's format); a ``format`` on the terms source
        # renders bucket keys — and parses ``after`` keys — through
        # that pattern instead (elastic composite value sources docs)
        out_format = src_def["terms"].get("format")
        is_date = ftype == "date"
        if out_format is not None and not is_date:
            self._error(400, "illegal_argument_exception",
                        f"Invalid format: [{out_format}] is only "
                        f"supported on date fields. [{field}]")
            return
        map_fmt = (fspec or {}).get("format")
        counts: dict = {}
        for k, d in store.items():
            if not _matches(query, k, d):
                continue
            v = d.get(field)
            if v is None:
                continue
            if is_date:
                v = _date_to_millis(v, map_fmt)
            counts[v] = counts.get(v, 0) + 1
        keys = sorted(counts)
        after = comp.get("after")
        if after is not None:
            a = after[src_name]
            if is_date and out_format is not None:
                a = _date_to_millis(a, out_format)
            keys = [k for k in keys if k > a]
        page = keys[:int(comp.get("size", 10))]

        def render(k):
            return (_millis_to_formatted(k, out_format)
                    if is_date and out_format is not None else k)

        buckets = [{"key": {src_name: render(k)}, "doc_count": counts[k]}
                   for k in page]
        agg_resp = {"buckets": buckets}
        if buckets:
            agg_resp["after_key"] = buckets[-1]["key"]
        self._send_json({"took": 1, "timed_out": False,
                         "hits": {"hits": []},
                         "aggregations": {name: agg_resp}})

    def _send_json(self, obj, status: int = 200):
        resp = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def do_GET(self):
        """``GET /{index}/_settings`` — ES-shaped settings document;
        unset dynamic settings are omitted, like a real index that
        never had them PUT (cluster defaults are not echoed back)."""
        srv = self.server
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        if len(parts) == 2 and parts[1] == "_settings":
            index = parts[0]
            with srv.lock:
                current = dict(srv.index_settings.get(index, {}))
            self._send_json(
                {index: {"settings": {"index": current}}})
            return
        if len(parts) == 2 and parts[1] == "_mapping":
            index = parts[0]
            with srv.lock:
                mappings = srv.index_mappings.get(index)
                docs = list(srv.store.get(index, {}).values())
            if mappings is None and docs:
                # implicitly created by a bulk write → DYNAMIC mapping,
                # with real ES's hazard modeled: strings become
                # analyzed TEXT (not keyword), numbers become
                # long/float, bools boolean
                props = {}
                for doc in docs:
                    for k, v in doc.items():
                        if k in props or v is None:
                            continue
                        if isinstance(v, bool):
                            props[k] = {"type": "boolean"}
                        elif isinstance(v, int):
                            props[k] = {"type": "long"}
                        elif isinstance(v, float):
                            props[k] = {"type": "float"}
                        elif isinstance(v, str):
                            props[k] = {"type": "text"}
                mappings = {"properties": props}
            if mappings is None:
                self._error(404, "index_not_found_exception",
                            f"no such index [{index}]")
                return
            self._send_json({index: {"mappings": mappings}})
            return
        self.send_response(404)
        self.end_headers()

    def do_DELETE(self):
        """``DELETE /_pit`` — close a point-in-time context (frees the
        snapshot), mirroring the real API's ``{"id": ...}`` body and
        ``{"succeeded": ..., "num_freed": ...}`` response."""
        srv = self.server
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        if parts != ["_pit"]:
            self.send_response(404)
            self.end_headers()
            return
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])) or b"{}")
        with srv.lock:
            freed = srv.pits.pop(body.get("id"), None)
        self._send_json({"succeeded": freed is not None,
                         "num_freed": 1 if freed is not None else 0})

    def do_HEAD(self):
        """``HEAD /{index}`` — 200 iff the index exists (explicitly
        created OR implicitly by a bulk write, like a real cluster's
        auto-create)."""
        srv = self.server
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        with srv.lock:
            known = (len(parts) == 1
                     and (parts[0] in srv.index_mappings
                          or parts[0] in srv.store))
        self.send_response(200 if known else 404)
        self.end_headers()

    def do_PUT(self):
        """``PUT /{index}/_settings`` — merge dynamic settings like a
        real cluster (accepts both ``{"index": {...}}`` and flat
        bodies; a null value clears the setting back to default).
        ``PUT /{index}`` — create the index with mappings; 400
        resource_already_exists_exception on a second create, matching
        the real API's mapping-immutability contract."""
        srv = self.server
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        if len(parts) == 1:  # index create with mappings
            index = parts[0]
            if index != index.lower():  # real ES name validation
                self._error(400, "invalid_index_name_exception",
                            f"Invalid index name [{index}], must be "
                            "lowercase")
                return
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
                or b"{}")
            with srv.lock:
                if index in srv.index_mappings or index in srv.store:
                    exists = True
                else:
                    exists = False
                    srv.index_mappings[index] = body.get("mappings", {})
            if exists:
                self._error(400, "resource_already_exists_exception",
                            f"index [{index}] already exists")
                return
            self._send_json({"acknowledged": True,
                             "shards_acknowledged": True, "index": index})
            return
        if len(parts) != 2 or parts[1] != "_settings":
            self.send_response(404)
            self.end_headers()
            return
        index = parts[0]
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])) or b"{}")
        settings = body.get("index", body)
        with srv.lock:
            srv.settings_calls.append((index, dict(settings)))
            current = srv.index_settings.setdefault(index, {})
            for key, value in settings.items():
                if value is None:
                    current.pop(key, None)
                else:
                    current[key] = value
        self._send_json({"acknowledged": True})

    def do_POST(self):
        srv = self.server
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        if len(parts) == 2 and parts[1] == "_search":
            self._handle_search(parts[0])
            return
        if len(parts) == 1 and parts[0] == "_search":  # PIT-style
            self._handle_search(None)
            return
        if len(parts) == 2 and parts[1] == "_pit":
            self._handle_pit_open(parts[0])
            return
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
        with srv.lock:
            srv.bulk_bytes += len(body)
        lines = [ln for ln in body.decode("utf-8").split("\n") if ln]
        items, had_error = [], False
        i = 0
        while i < len(lines):
            (verb, action), = json.loads(lines[i]).items()
            index = action["_index"]
            if verb == "delete":
                # real bulk delete: no source line; absent id → item
                # status 404 / result not_found with NO error field
                # (errors flag untouched — idempotent replays succeed)
                i += 1
                with srv.lock:
                    existed = (srv.store.get(index, {})
                               .pop(action.get("_id"), None) is not None)
                items.append({"delete": {
                    "_index": index, "_id": action.get("_id"),
                    "status": 200 if existed else 404,
                    "result": "deleted" if existed else "not_found"}})
                continue
            doc = json.loads(lines[i + 1])
            i += 2
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

    def __init__(self, fail_next_n: int = 0, reject=None,
                 fail_search_next_n: int = 0,
                 fail_search_status: int = 503):
        self.server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        self.server.lock = threading.Lock()
        self.server.store = {}          # index -> {_id: doc}
        self.server.auto_id = 0
        self.server.requests_seen = 0
        self.server.fail_next_n = fail_next_n
        self.server.fail_search_next_n = fail_search_next_n
        self.server.fail_search_status = fail_search_status
        self.server.search_bodies = []  # [(index, parsed _search body)]
        self.server.pits = {}      # pit_id -> (index, snapshot)
        self.server.pit_seq = 0
        self.server.index_settings = {}  # index -> {setting: value}
        self.server.settings_calls = []  # [(index, PUT body)]
        self.server.index_mappings = {}  # index -> mappings body
        self.server.bulk_bytes = 0       # total /_bulk payload bytes
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

    @property
    def index_settings(self) -> dict:
        return self.server.index_settings

    @property
    def settings_calls(self) -> list:
        return self.server.settings_calls

    @property
    def bulk_bytes(self) -> int:
        return self.server.bulk_bytes
