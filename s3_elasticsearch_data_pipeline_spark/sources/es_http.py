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

Production note: on a live cluster, sliced ``search_after`` over a
mutating index should run inside a point-in-time (PIT) context for a
consistent snapshot; the request/cursor shape is identical (the PIT id
rides in the body). The stub (``tests/es_stub.py``) serves the same
``_search`` API against an immutable store, so no PIT is needed there.
Stdlib urllib only.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

DEFAULT_SCHEMA = "id string, month string, value double"


class _Slice(InputPartition):
    def __init__(self, index: int, n: int):
        self.index, self.n = index, n


def _search_page(url: str, index: str, sl: int, nsl: int,
                 after: list | None, size: int, sort_field: str,
                 timeout_s: float, max_retries: int,
                 backoff_s: float) -> dict:
    """One ``POST /{index}/_search`` page: match_all + single-field
    ascending sort + optional slice + optional search_after — the
    reference's exact body shape, sliced. Retries 5xx/transport errors
    with exponential backoff; 4xx raises immediately (a malformed
    request never heals)."""
    body: dict = {
        "size": size,
        "sort": [{sort_field: "asc"}],
        "query": {"match_all": {}},
        "track_total_hits": False,
    }
    if nsl > 1:
        body["slice"] = {"id": sl, "max": nsl}
    if after is not None:
        body["search_after"] = after
    req = urllib.request.Request(
        f"{url.rstrip('/')}/{index}/_search",
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST")
    attempt = 0
    while True:
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            # 5xx and 429 (ES's standard backpressure signal) are
            # transient — same policy as the _bulk writer; other 4xx
            # means a malformed request that never heals
            if (e.code < 500 and e.code != 429) or attempt >= max_retries:
                raise
        except (urllib.error.URLError, OSError, TimeoutError):
            if attempt >= max_retries:
                raise
        time.sleep(backoff_s * (2 ** attempt))
        attempt += 1


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
        self.fields = schema_fields

    def partitions(self):
        return [_Slice(i, self.nslices) for i in range(self.nslices)]

    def read(self, partition):
        # executor-side search_after pagination over this slice
        after: list | None = None
        while True:
            page = _search_page(self.url, self.es_index, partition.index,
                                partition.n, after, self.pagesize,
                                self.sort_field, self.timeout_s,
                                self.max_retries, self.backoff_s)
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
    reference), ``timeout``, ``max_retries``, ``backoff``.
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
    (``pagesize``, ``sort_field``, ``schema``, ...)."""
    register(spark)
    if nslices is None:
        nslices = max(2, spark.sparkContext.defaultParallelism)
    reader = (spark.read.format("es_http")
              .option("url", url).option("index", index)
              .option("nslices", nslices))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
