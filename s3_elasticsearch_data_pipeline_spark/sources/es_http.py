"""Elasticsearch ``_search`` keyset pagination as a first-class
PARALLEL Spark source (Spark 4 Python DataSource API) — the read side
of the wire story (SURVEY.md S6/S7).

The reference scans its ES index from the DRIVER: one ``_search`` loop
with ``sort`` + ``search_after`` pages every document through a single
Python process (``ID-based-transfer.py:111-157``; the request body
shape — ``{"size": N, "sort": [{"id": "asc"}], "search_after": [...]}``
— is ``ID-based-transfer.py:119-127,149-151``). Here the same protocol
is an executor-parallel ``DataSource``:

* each InputPartition owns one **slice** of the index (the documented
  ES slicing body ``{"slice": {"id": i, "max": n}}``, which hashes the
  ``_id`` server-side) and pages it independently;
* within a slice the cursor is genuine ``search_after``: the request
  carries the previous page's last hit's ``sort`` values verbatim, and
  the page is exhausted when fewer than ``size`` hits return;
* rows come from ``hits.hits[]._source`` (with ``_id`` backfilling a
  missing ``id`` field), so any index the reference job reads works
  unchanged.

No driver funnel, restartable per partition, linear in executors.
Transient HTTP failures retry with exponential backoff — the read twin
of the ``_bulk`` writer's policy (``sinks/es_wire.py``).

**Point-in-time (PIT)**: real Elasticsearch REJECTS ``slice`` in a
plain ``_search`` — slicing is only valid inside a scroll or PIT
context — so whenever the scan is sliced (``nslices > 1``) the source
opens ONE PIT for the whole scan (``POST /{index}/_pit?keep_alive=``)
at planning time and every slice's ``_search`` carries
``pit: {id, keep_alive}`` (and, per the PIT API, posts to ``/_search``
with no index in the path). One shared PIT also means all slices read
the SAME index snapshot — the consistency a reconcile diff needs on a
mutating cluster. The PIT is released by ``keep_alive`` expiry (there
is no per-partition close hook; expiry is the documented cleanup).
Single-slice scans skip the PIT (plain ``search_after`` is valid
without one); ``use_pit`` overrides either way. The stub
(``tests/es_stub.py``) enforces the same slice-requires-PIT rule a
live cluster does. Stdlib urllib only.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

DEFAULT_SCHEMA = "id string, month string, value double"


class _Slice(InputPartition):
    def __init__(self, index: int, n: int, pit_id: str | None = None):
        self.index, self.n, self.pit_id = index, n, pit_id


def _post_json(full_url: str, body: dict | None, timeout_s: float,
               max_retries: int, backoff_s: float) -> dict:
    """POST with the shared retry policy: 5xx and 429 (ES's standard
    backpressure signal) retry with exponential backoff — same policy
    as the ``_bulk`` writer; other 4xx raises immediately (a malformed
    request never heals)."""
    req = urllib.request.Request(
        full_url,
        data=None if body is None else json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST")
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if (e.code < 500 and e.code != 429) or attempt >= max_retries:
                raise
        except (urllib.error.URLError, OSError, TimeoutError):
            if attempt >= max_retries:
                raise
        time.sleep(backoff_s * (2 ** attempt))
        attempt += 1


#: ES field types whose stored values compare exactly the way Spark
#: compares the corresponding literals — safe targets for pushed
#: term/terms/range clauses. ``text`` is deliberately ABSENT: analyzed
#: fields compare per-token (a pushed ``term`` on a text field silently
#: matches nothing), which would be wrong-results, not slow-results.
_NUMERIC_ES_TYPES = frozenset(
    {"long", "integer", "short", "byte", "double", "float"})


def _fetch_field_types(url: str, index: str,
                       timeout_s: float) -> dict | None:
    """Top-level field→type map from ``GET /{index}/_mapping``, or None
    when the mapping can't be read (unreachable cluster, missing
    index) — callers then push only type-agnostic clauses."""
    props = _fetch_field_props(url, index, timeout_s)
    if props is None:
        return None
    return {name: spec.get("type", "object")
            for name, spec in props.items()}


def _fetch_field_props(url: str, index: str,
                       timeout_s: float) -> dict | None:
    """Top-level field→mapping-spec map (the full per-field dict, so
    callers can read ``format`` alongside ``type`` — the date-keyed
    terms-agg fast path needs both) from ``GET /{index}/_mapping``,
    or None when the mapping can't be read."""
    req = urllib.request.Request(
        f"{url.rstrip('/')}/{index}/_mapping", method="GET")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = json.loads(resp.read().decode("utf-8"))
    except (urllib.error.URLError, OSError, ValueError):
        return None
    entry = body.get(index) or next(iter(body.values()), None)
    if not isinstance(entry, dict):
        return None
    props = (entry.get("mappings") or {}).get("properties") or {}
    return {name: spec
            for name, spec in props.items() if isinstance(spec, dict)}


def _value_type_ok(value, es_type: str | None) -> bool:
    """A pushed comparison is exact only when the literal's kind and
    the field's ES type agree: strings need ``keyword`` (text fields
    are analyzed — see _NUMERIC_ES_TYPES note), bools need boolean,
    numbers need a numeric field. Unknown field/type → not pushable."""
    if es_type is None:
        return False
    if isinstance(value, bool):
        return es_type == "boolean"
    if isinstance(value, str):
        return es_type == "keyword"
    if isinstance(value, (int, float)):
        return es_type in _NUMERIC_ES_TYPES
    return False


def _es_clause(f, field_types: dict | None):
    """One pushed-down Spark Filter → an ES query-DSL clause, or None
    when the filter can't be translated EXACTLY (nested column paths,
    exotic value types, fields whose mapping is analyzed/unknown —
    those stay Spark-side). Term/terms/range/exists/prefix cover the
    reference's access patterns (id lookups, month terms, windows)."""
    from pyspark.sql.datasource import (EqualTo, GreaterThan,
                                        GreaterThanOrEqual, In, IsNotNull,
                                        IsNull, LessThan, LessThanOrEqual,
                                        Not, StringStartsWith)

    if isinstance(f, Not):
        child = f.child
        inner = _es_clause(child, field_types)
        if inner is None:
            return None
        if isinstance(child, (IsNull, IsNotNull)):
            return {"bool": {"must_not": [inner]}}
        # SQL negation of a value comparison is NULL-REJECTING; ES
        # must_not alone would match missing-field docs, so AND an
        # exists guard on the child's column. A child without a
        # single-column .attribute (e.g. Not(Not(x)) that Catalyst
        # left un-normalized) stays Spark-side rather than erroring.
        child_attr = getattr(child, "attribute", None)
        if child_attr is None or len(child_attr) != 1:
            return None
        return {"bool": {"must_not": [inner],
                         "filter": [{"exists":
                                     {"field": child_attr[0]}}]}}
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None  # nested paths → Spark-side
    col = attr[0]
    # null checks are type-agnostic (exists semantics match Spark's
    # null semantics for any mapping, including absent fields)
    if isinstance(f, IsNotNull):
        return {"exists": {"field": col}}
    if isinstance(f, IsNull):
        return {"bool": {"must_not": [{"exists": {"field": col}}]}}
    ftype = (field_types or {}).get(col)
    if isinstance(f, EqualTo):
        return ({"term": {col: f.value}}
                if _value_type_ok(f.value, ftype) else None)
    if isinstance(f, In):
        vals = list(f.value)
        return ({"terms": {col: vals}}
                if vals and all(_value_type_ok(v, ftype) for v in vals)
                else None)
    rng = {GreaterThan: "gt", GreaterThanOrEqual: "gte",
           LessThan: "lt", LessThanOrEqual: "lte"}.get(type(f))
    if rng is not None:
        return ({"range": {col: {rng: f.value}}}
                if _value_type_ok(f.value, ftype) else None)
    if isinstance(f, StringStartsWith):
        return ({"prefix": {col: {"value": f.value}}}
                if isinstance(f.value, str) and ftype == "keyword"
                else None)
    return None


def _search_page(url: str, index: str, sl: int, nsl: int,
                 after: list | None, size: int, sort_field: str,
                 timeout_s: float, max_retries: int,
                 backoff_s: float, pit_id: str | None = None,
                 keep_alive: str = "2m", query: dict | None = None) -> dict:
    """One ``_search`` page: query (pushed-down filters, else
    match_all) + single-field ascending sort + optional slice +
    optional search_after — the reference's exact body shape, sliced.
    With a PIT the request targets ``/_search`` (no index in the path —
    the PIT pins the index) and carries ``pit: {id, keep_alive}``, per
    the real API."""
    body: dict = {
        "size": size,
        "sort": [{sort_field: "asc"}],
        "query": query if query is not None else {"match_all": {}},
        "track_total_hits": False,
    }
    if nsl > 1:
        body["slice"] = {"id": sl, "max": nsl}
    if after is not None:
        body["search_after"] = after
    if pit_id is not None:
        body["pit"] = {"id": pit_id, "keep_alive": keep_alive}
        full = f"{url.rstrip('/')}/_search"
    else:
        full = f"{url.rstrip('/')}/{index}/_search"
    return _post_json(full, body, timeout_s, max_retries, backoff_s)


_KEEP_ALIVE_UNITS = {"d": 86400.0, "h": 3600.0, "m": 60.0, "s": 1.0,
                     "ms": 0.001}


def _keep_alive_seconds(value: str, default: float = 1800.0) -> float:
    """ES time-value string ('30m', '90s', '1h', '500ms') → seconds."""
    try:
        s = str(value).strip().lower()
        for unit in ("ms", "d", "h", "m", "s"):
            if s.endswith(unit):
                return float(s[:-len(unit)]) * _KEEP_ALIVE_UNITS[unit]
        return float(s)
    except (ValueError, TypeError):
        return default


def delete_pit(url: str, pit_id: str, timeout_s: float = 10.0) -> bool:
    """Best-effort ``DELETE /_pit`` — frees the search context's pinned
    segments on a live cluster instead of waiting out ``keep_alive``.
    Never raises: the PIT expires on its own eventually, so a failed
    close is a missed optimization, not an error."""
    req = urllib.request.Request(
        f"{url.rstrip('/')}/_pit",
        data=json.dumps({"id": pit_id}).encode("utf-8"),
        headers={"Content-Type": "application/json"}, method="DELETE")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            body = json.loads(resp.read().decode("utf-8"))
            return bool(body.get("succeeded"))
    except (urllib.error.URLError, OSError, ValueError):
        return False


#: ES field types a terms aggregation can group on exactly — doc-values
#: types whose stored value IS the grouping key. ``text`` is absent for
#: the same reason it can't take pushed terms (analyzed per-token; real
#: ES additionally rejects the agg outright with fielddata disabled).
#: ``date`` is absent because it needs an extra condition: composite
#: terms buckets on a date field return EPOCH-MILLIS longs by default,
#: not the stored representation — but when the mapping declares an
#: EXPLICIT single format (no ``||`` alternatives), passing that format
#: in the composite terms source makes ES render bucket keys (and
#: accept ``after`` keys) in the stored representation, restoring the
#: round-trip (see :func:`date_agg_format`). Mapping-default date
#: fields (``strict_date_optional_time||epoch_millis``) admit
#: heterogeneous stored spellings that a single rendering can't
#: reproduce, so they keep the scan path.
_AGGREGATABLE_ES_TYPES = _NUMERIC_ES_TYPES | frozenset(
    {"keyword", "boolean", "ip"})


def date_agg_format(field_spec: dict | None) -> str | None:
    """The composite-agg ``format`` that makes a date field's bucket
    keys round-trip to the stored representation, or None when no such
    format exists (mapping unreadable, not a date field, or a
    multi-format ``a||b`` mapping whose stored spellings a single
    rendering can't reproduce). A mapping with one explicit format
    guarantees every indexed value PARSED with that format, so
    re-rendering with it reproduces the source key exactly."""
    if not isinstance(field_spec, dict):
        return None
    if field_spec.get("type") != "date":
        return None
    fmt = field_spec.get("format")
    if not fmt or "||" in fmt:
        return None
    return fmt


def es_terms_counts(url: str, index: str, field: str,
                    page_size: int = 1000, timeout_s: float = 30.0,
                    max_retries: int = 4, backoff_s: float = 0.5,
                    value_format: str | None = None) -> list[tuple]:
    """Per-value doc counts for ``field`` computed INSIDE Elasticsearch
    — the reference's sink-state terms aggregation
    (``data-s3-elastic-transfer.py:51-68``, ``ID-based-transfer.py:
    65-88``) done right: a ``composite`` aggregation with ``after_key``
    paging instead of a capped ``terms`` agg, so >10k distinct values
    work and only the buckets ever cross the wire (~bytes per distinct
    value, vs the full index for a scan-side aggregate).

    Driver-side by design: the result is bucket-sized (one row per
    distinct value), not corpus-sized — this is the one wire read that
    is CHEAPER as an HTTP loop than as a distributed scan. Returns
    ``[(value, count), ...]`` sorted ascending by value. Retries follow
    the shared 5xx/429 policy; a 400 (e.g. aggregating an analyzed
    text field) raises immediately — callers gate on the mapping via
    :func:`_fetch_field_props` / ``_AGGREGATABLE_ES_TYPES`` /
    :func:`date_agg_format` and fall back to the scan path.

    ``value_format``: for date fields — the composite terms source's
    ``format`` parameter (real-API: composite value sources render
    date keys, and parse ``after`` keys, through it), so buckets come
    back in the stored representation instead of epoch millis; the
    ``after_key`` echoes back verbatim, already formatted."""
    out: list[tuple] = []
    after = None
    terms: dict = {"field": field}
    if value_format is not None:
        terms["format"] = value_format
    while True:
        comp: dict = {"size": page_size,
                      "sources": [{"k": {"terms": dict(terms)}}]}
        if after is not None:
            comp["after"] = after
        resp = _post_json(
            f"{url.rstrip('/')}/{index}/_search",
            {"size": 0, "aggs": {"counts": {"composite": comp}}},
            timeout_s, max_retries, backoff_s)
        agg = (resp.get("aggregations") or {}).get("counts") or {}
        buckets = agg.get("buckets") or []
        out.extend((b["key"]["k"], b["doc_count"]) for b in buckets)
        after = agg.get("after_key")
        if after is None or len(buckets) < page_size:
            return out


class ESHttpReader(DataSourceReader):
    def __init__(self, options, schema_fields, default_nslices: int):
        self.url = options["url"]
        self.es_index = options["index"]
        self.nslices = int(options.get("nslices", default_nslices))
        self.pagesize = int(options.get("pagesize", 500))
        self.sort_field = options.get("sort_field", "id")
        self.timeout_s = float(options.get("timeout", 30))
        self.max_retries = int(options.get("max_retries", 3))
        self.backoff_s = float(options.get("backoff", 0.5))
        # keep_alive must outlive the LONGEST wait between PIT open and
        # a slice's first request — with more slices than task slots,
        # queued slices start minutes after planning, and an expired
        # PIT is a non-retryable 404 baked into every retry of the
        # task. Default generously; size it to the expected scan
        # duration on busy clusters. In-flight requests extend it.
        self.keep_alive = options.get("pit_keep_alive", "30m")
        # slicing is only valid inside a PIT (or scroll) on a real
        # cluster, so sliced scans default PIT ON; a single-slice scan
        # is plain search_after and skips it. "true"/"false" overrides.
        use_pit = options.get("use_pit")
        self.use_pit = (self.nslices > 1 if use_pit is None
                        else str(use_pit).lower() == "true")
        # pit_reuse=false → mint a fresh PIT per action so every
        # re-scan sees the live index (poll loops / incremental
        # drivers); the default reuses one snapshot for keep_alive/2.
        self.pit_reuse = (str(options.get("pit_reuse", "true")).lower()
                          == "true")
        self.fields = schema_fields
        self.es_query: dict | None = None  # set by pushFilters
        self._pit_id: str | None = None   # cached per reader instance
        self._pit_born = 0.0
        self._pit_lock = threading.Lock()

    def pushFilters(self, filters):
        """Wire-level predicate pushdown (requires
        ``spark.sql.python.filterPushdown.enabled=true``, set by
        ``session.get_spark``): translatable filters become ES
        query-DSL clauses ANDed in a ``bool.filter`` context — the
        cluster prunes the scan server-side, so a selective predicate
        reads its matches, not the whole index. Untranslatable filters
        are returned for Spark to apply post-scan (exactness is never
        up to the translation).

        Exactness gate: the index MAPPING is fetched once here and
        value comparisons are pushed only onto fields whose type
        compares exactly (keyword for strings, numeric/boolean for
        numbers — a ``term`` on an ANALYZED text field silently
        matches nothing, which would be wrong results). With the
        mapping unreachable (or a dynamic-mapped index whose strings
        are text), only type-agnostic null checks are pushed; Spark
        evaluates the rest post-scan."""
        field_types = _fetch_field_types(self.url, self.es_index,
                                         self.timeout_s)
        clauses, leftover = [], []
        for f in filters:
            clause = _es_clause(f, field_types)
            if clause is None:
                leftover.append(f)
            else:
                clauses.append(clause)
        if clauses:
            self.es_query = {"bool": {"filter": clauses}}
        return leftover

    # The reader pickles to executors for read(); locks don't pickle.
    # Only the planner-side instance ever uses the PIT cache, so the
    # executor copy just gets a fresh (unused) lock.
    def __getstate__(self):
        state = self.__dict__.copy()
        del state["_pit_lock"]
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._pit_lock = threading.Lock()

    def partitions(self):
        """ONE PIT for the whole scan: every slice pages the same index
        snapshot. The PIT is CACHED on this reader instance, so
        repeated actions on one DataFrame re-scan the same snapshot
        instead of minting (and leaking) a fresh search context per
        action; a cached PIT past half its ``keep_alive`` is dropped
        and re-minted rather than risking a non-retryable expiry
        mid-scan. The stale PIT is NOT deleted here — an in-flight
        scan launched from an earlier ``partitions()`` call may still
        be paging it, and a server-side close would 404 its remaining
        tasks; it expires on its own ``keep_alive``. The cache is
        lock-protected so concurrent actions share one PIT instead of
        minting and leaking a racing extra. Readers have no close
        hook, so the final PIT is freed by keep_alive expiry (or by
        the caller via :func:`delete_pit`) — size ``pit_keep_alive``
        accordingly in tight re-scan loops."""
        pit_id = None
        if self.use_pit:
            with self._pit_lock:
                now = time.time()
                if not self.pit_reuse:
                    # freshness opt-out: CLOSE the superseded snapshot
                    # before minting — a poll loop would otherwise pile
                    # up ~keep_alive/poll_interval open contexts on the
                    # cluster (each pinning segments until expiry). The
                    # opt-out's contract is sequential re-plans; unlike
                    # the half-keep-alive remint below, there is no
                    # still-paging earlier scan to protect (a caller
                    # overlapping concurrent actions on one
                    # pit_reuse=false reader wants pit_reuse=true).
                    if self._pit_id is not None:
                        delete_pit(self.url, self._pit_id, self.timeout_s)
                    self._pit_id = None
                elif (self._pit_id is not None
                        and now - self._pit_born
                        > 0.5 * _keep_alive_seconds(self.keep_alive)):
                    self._pit_id = None  # stale: expires server-side
                if self._pit_id is None:
                    resp = _post_json(
                        f"{self.url.rstrip('/')}/{self.es_index}/_pit"
                        f"?keep_alive={self.keep_alive}",
                        None, self.timeout_s, self.max_retries,
                        self.backoff_s)
                    self._pit_id, self._pit_born = resp["id"], now
                pit_id = self._pit_id
        return [_Slice(i, self.nslices, pit_id)
                for i in range(self.nslices)]

    def read(self, partition):
        # executor-side search_after pagination over this slice
        after: list | None = None
        while True:
            page = _search_page(self.url, self.es_index, partition.index,
                                partition.n, after, self.pagesize,
                                self.sort_field, self.timeout_s,
                                self.max_retries, self.backoff_s,
                                pit_id=partition.pit_id,
                                keep_alive=self.keep_alive,
                                query=self.es_query)
            hits = page["hits"]["hits"]
            for h in hits:
                src = dict(h.get("_source") or {})
                src.setdefault("id", h.get("_id"))
                yield tuple(src.get(f) for f in self.fields)
            if len(hits) < self.pagesize:
                return
            after = hits[-1]["sort"]


#: Fallback read parallelism when the caller passes no ``nslices``
#: option. The DataSource machinery instantiates this class in a
#: separate Python planner worker (the class pickles BY REFERENCE, so
#: no driver-side state survives into it) — which is why the
#: cluster-parallelism default CANNOT live here: use
#: :func:`read_es_index`, which resolves ``defaultParallelism``
#: driver-side and passes it as an explicit option.
DEFAULT_NSLICES = 8


class ESHttpSource(DataSource):
    """``spark.read.format("es_http").option("url", ...).option("index",
    ...).schema("id string, ...")`` — omit the schema for the serving
    default (id/month/value).

    Options: ``nslices`` (read parallelism — prefer
    :func:`read_es_index`, which defaults it to the session's
    ``defaultParallelism``; a fixed small default would cap a
    1000-executor scan at a handful of tasks), ``pagesize``,
    ``sort_field`` (unique keyset column, default ``id`` like the
    reference), ``timeout``, ``max_retries``, ``backoff``,
    ``use_pit`` (default: on when sliced — required by the real API),
    ``pit_keep_alive`` (default ``30m`` — must
    outlive the longest queue-delay before a slice's first request).
    """

    @classmethod
    def name(cls) -> str:
        return "es_http"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema) -> DataSourceReader:
        return ESHttpReader(self.options, [f.name for f in schema.fields],
                            DEFAULT_NSLICES)


def register(spark) -> None:
    spark.dataSource.register(ESHttpSource)


def read_es_index(spark, url: str, index: str,
                  nslices: int | None = None, **options):
    """Driver-side entry point for scanning an index: registers the
    source and returns the DataFrame with read parallelism defaulted to
    the session's ``defaultParallelism`` (resolved HERE, in the driver,
    because option values are the only state that reaches the
    DataSource planner worker). Extra ``options`` pass through
    (``pagesize``, ``sort_field``, ``schema``, ...).

    Read semantics (sliced scans): the DataFrame reads through ONE
    point-in-time snapshot that is REUSED across re-plans for up to
    ``pit_keep_alive``/2 (default 15 min) — repeated actions on the
    same DataFrame see a consistent, possibly stale, snapshot instead
    of minting (and leaking) a search context per action. Callers that
    re-scan expecting fresh data (poll loops, incremental drivers) must
    build a NEW DataFrame per poll (Spark caches the partition list per
    scan, so no reader option can force per-action freshness) and may
    pass ``pit_reuse="false"`` to additionally disable the reader-side
    snapshot cache across planner re-invocations."""
    register(spark)
    if nslices is None:
        nslices = max(2, spark.sparkContext.defaultParallelism)
    reader = (spark.read.format("es_http")
              .option("url", url).option("index", index)
              .option("nslices", nslices))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
