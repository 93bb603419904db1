"""HTTP-paged Elasticsearch index as a first-class PARALLEL Spark
source (Spark 4 Python DataSource API) — the read side of the wire
story (SURVEY.md S6/S7).

The reference scans its ES index from the DRIVER: one search_after
loop pages every document through a single Python process
(``ID-based-transfer.py:111-157``). Here the same keyset pagination is
an executor-parallel ``DataSource``: the index is split into N hash
slices (the shape of ES sliced scroll), each InputPartition owns one
slice and pages it independently with ``search_after``-style cursors —
no driver funnel, restartable per partition, linear in executors.

Speaks the test stub's ``/_docs`` endpoint (``tests/es_stub.py``),
which mirrors sliced-scroll + search_after semantics; pointing the
read loop at a real cluster means swapping the URL template for the
``_search`` body — the partitioning and cursor logic are unchanged.
Stdlib urllib only.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

DEFAULT_SCHEMA = "id string, month string, value double"


class _Slice(InputPartition):
    def __init__(self, index: int, n: int):
        self.index, self.n = index, n


def _fetch_page(url: str, index: str, sl: int, nsl: int,
                after: str | None, size: int, timeout_s: float) -> dict:
    params = {"slice": sl, "nslices": nsl, "size": size}
    if after is not None:
        params["after"] = after
    full = (f"{url.rstrip('/')}/{index}/_docs?"
            + urllib.parse.urlencode(params))
    with urllib.request.urlopen(full, timeout=timeout_s) as resp:
        return json.loads(resp.read().decode("utf-8"))


class ESHttpReader(DataSourceReader):
    def __init__(self, options, schema_fields):
        self.url = options["url"]
        self.es_index = options["index"]
        self.nslices = int(options.get("nslices", 4))
        self.pagesize = int(options.get("pagesize", 500))
        self.timeout_s = float(options.get("timeout", 30))
        self.fields = schema_fields

    def partitions(self):
        return [_Slice(i, self.nslices) for i in range(self.nslices)]

    def read(self, partition):
        # executor-side keyset pagination over this partition's slice
        after = None
        while True:
            page = _fetch_page(self.url, self.es_index, partition.index,
                               partition.n, after, self.pagesize,
                               self.timeout_s)
            for doc in page["docs"]:
                yield tuple(doc.get(f) for f in self.fields)
            after = page["next_after"]
            if after is None:
                return


class ESHttpSource(DataSource):
    """``spark.read.format("es_http").option("url", ...).option("index",
    ...).schema("id string, ...")`` — omit the schema for the serving
    default (id/month/value)."""

    @classmethod
    def name(cls) -> str:
        return "es_http"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema) -> DataSourceReader:
        return ESHttpReader(self.options, [f.name for f in schema.fields])


def register(spark) -> None:
    spark.dataSource.register(ESHttpSource)
