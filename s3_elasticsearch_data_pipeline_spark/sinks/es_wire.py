"""Executor-side Elasticsearch ``_bulk`` wire-protocol writer (SURVEY.md
S9/S10 — the live-wire path).

The reference hand-rolls the ES bulk protocol **driver-side**: collect
everything into pandas, slice into 50k-doc batches, serialize NDJSON,
``requests.post`` to ``/_bulk`` with linear-backoff retries and per-item
error accounting (``data-s3-elastic-transfer.py:188-256``), keyed
``_id = doc["id"]`` for idempotent re-index (``ID-based-transfer.py:
198-223``). That design caps throughput at one driver's NIC.

Here the same wire protocol runs **executor-parallel**: a ``mapInPandas``
stage serializes each Arrow batch to NDJSON and POSTs it from the task,
so N partitions stream to the cluster concurrently and the driver never
materializes a row. Stdlib-only (``urllib.request``) — no connector jar.

Delivery semantics: at-least-once per batch (Spark can re-run a task);
with ``id_col`` set every write is idempotent by key (``_id`` =
``doc[id_col]``) — exactly the reference's re-index-as-upsert model — so
at-least-once collapses to effectively-once observable state. Without
``id_col`` the ES server auto-assigns ids (``data-s3-elastic-transfer
.py:192-196`` behavior) and re-runs can duplicate, which the reference
shares.

Retry semantics mirror the reference exactly:
  * transport error / non-200 → linear backoff ``(attempt+1) * base``
    then retry, up to ``max_retries`` attempts;
  * HTTP 200 with some item errors → *partial success*, failed items are
    counted but NOT retried;
  * HTTP 200 with every item failed → the batch is reported failed
    immediately (no retry) — a complete failure is a data problem, not a
    transport blip.

At 100 TB: the unit of parallelism is the input partition; back-pressure
is the ES cluster itself. Throughput scales with executors until ES
saturates; batch size (rows per POST) is decoupled from partition size
via Arrow batch slicing, so a 1 GB partition still POSTs in bounded
memory. The stats frame is one row per HTTP batch — KB-sized even for
petabyte loads — so the final accounting agg is driver-safe.
"""

from __future__ import annotations

import contextlib
import json
import logging
import math
import time
import urllib.error
import urllib.request
from dataclasses import dataclass
from datetime import date, datetime
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# Reference constants (data-s3-elastic-transfer.py:19-21,249-253).
DEFAULT_BATCH_SIZE = 50_000
DEFAULT_MAX_RETRIES = 3
DEFAULT_BACKOFF_BASE_S = 20.0
DEFAULT_TIMEOUT_S = 120.0
DEFAULT_SETTINGS_TIMEOUT_S = 10.0

#: Bulk-load index tuning (data-s3-elastic-transfer.py:26-31): replica
#: writes off, refresh batched to 30 s — the reference's single biggest
#: ingest-throughput lever on a live cluster.
BULK_LOAD_SETTINGS = {"number_of_replicas": 0, "refresh_interval": "30s"}

STATS_SCHEMA = ("batch_rows long, attempts int, ok boolean, "
                "failed_items long, error_sample string, "
                "payload_bytes long")


def _json_safe(v):
    """Pandas/numpy cell → JSON-serializable value (the executor-side
    twin of the reference's ``safe_get`` shaping loop,
    ``data-s3-elastic-transfer.py:160-186``)."""
    if v is None:
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [_json_safe(x) for x in v]
    if isinstance(v, float) and math.isnan(v):
        return None
    if pd.isna(v):  # NaT / pandas NA scalars → null
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def build_ndjson(docs: list[dict], index: str, id_col: str | None,
                 action: str = "index") -> bytes:
    """NDJSON payload: action line + doc line per document
    (``ID-based-transfer.py:201-205``). ``action="delete"`` emits
    action lines only (the bulk API's delete shape carries no source
    document) — ``id_col`` is required there, a delete without an id
    is meaningless."""
    lines: list[str] = []
    for doc in docs:
        meta: dict = {"_index": index}
        if id_col is not None:
            meta["_id"] = str(doc[id_col])
        lines.append(json.dumps({action: meta}, separators=(",", ":")))
        if action != "delete":
            lines.append(json.dumps(doc, separators=(",", ":"),
                                    default=str))
    return ("\n".join(lines) + "\n").encode("utf-8")


def _post(url: str, payload: bytes, timeout_s: float):
    """One POST to /_bulk → (status_code, parsed_body | None)."""
    req = urllib.request.Request(
        url.rstrip("/") + "/_bulk", data=payload,
        headers={"Content-Type": "application/x-ndjson"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as exc:
        return exc.code, None
    except (urllib.error.URLError, OSError, ValueError):
        return 0, None


def send_batch(docs: list[dict], url: str, index: str, id_col: str | None,
               max_retries: int, backoff_base_s: float,
               timeout_s: float, action: str = "index"
               ) -> tuple[bool, int, int, str, int]:
    """Send one batch with the reference's retry policy. Returns
    ``(ok, attempts, failed_items, error_sample, payload_bytes)`` —
    the byte count is the serialized NDJSON size, the reference's
    per-request ingest telemetry (``data-s3-elastic-transfer.py:
    198-199`` logs MB per ``_bulk`` POST); counted once per batch,
    not per retry attempt. Delete batches count per-item failures off
    the ``delete`` item key; a delete of an absent id returns 404 with
    NO ``error`` field (real bulk semantics) and is therefore a
    success — exactly what an idempotent prune replay needs."""
    payload = build_ndjson(docs, index, id_col, action)
    n_bytes = len(payload)
    error_sample = ""
    for attempt in range(max_retries):
        status, body = _post(url, payload, timeout_s)
        if status == 200 and body is not None:
            if not body.get("errors"):
                return True, attempt + 1, 0, "", n_bytes
            failed, samples = 0, []
            for item in body.get("items", []):
                info = item.get(action, {})
                if info.get("error"):
                    failed += 1
                    if len(samples) < 2:
                        samples.append(str(info["error"])[:200])
            error_sample = "; ".join(samples)
            if failed == len(docs):
                # complete failure: data problem, don't retry
                return False, attempt + 1, failed, error_sample, n_bytes
            return True, attempt + 1, failed, error_sample, n_bytes
        error_sample = f"http_{status}"
        if attempt < max_retries - 1 and backoff_base_s > 0:
            time.sleep((attempt + 1) * backoff_base_s)
    return False, max_retries, len(docs), error_sample, n_bytes


def _settings_request(method: str, url: str, index: str,
                      body: dict | None, timeout_s: float):
    """One ``/{index}/_settings`` request → parsed JSON body or None
    (best-effort, like the reference's try/warn wrapper)."""
    data = None if body is None else json.dumps(body).encode("utf-8")
    req = urllib.request.Request(
        f"{url.rstrip('/')}/{index}/_settings", data=data,
        headers={"Content-Type": "application/json"}, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            if resp.status != 200:
                return None
            return json.loads(resp.read().decode("utf-8"))
    except (urllib.error.URLError, OSError, ValueError):
        return None


def _index_request(method: str, url: str, index: str, body: dict | None,
                   timeout_s: float):
    """One ``/{index}`` request → (HTTP status, parsed JSON body|None);
    status 0 on transport failure. Separate from ``_settings_request``
    because index creation must DISTINGUISH 'already exists' (400) from
    'created' (200) — settings tuning never needs the status code."""
    data = None if body is None else json.dumps(body).encode("utf-8")
    req = urllib.request.Request(
        f"{url.rstrip('/')}/{index}", data=data,
        headers={"Content-Type": "application/json"}, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            payload = resp.read().decode("utf-8")
            return resp.status, (json.loads(payload) if payload else None)
    except urllib.error.HTTPError as exc:
        # keep the ES error body: a 400 carries error.type, which is
        # how callers tell resource_already_exists (benign) from
        # invalid_index_name / mapper_parsing (a real failure)
        try:
            err_body = json.loads(exc.read().decode("utf-8"))
        except (ValueError, OSError):
            err_body = None
        return exc.code, err_body
    except (urllib.error.URLError, OSError, ValueError):
        return 0, None


#: Spark simpleString prefixes → Elasticsearch field types. Strings map
#: to ``keyword`` (the reference's fields are structured record values
#: queried with term/terms — ``ID-based-transfer.py``'s id lookups and
#: ``Debug.py``'s month terms agg both require keyword semantics; a
#: free-text corpus field should be overridden to ``text`` by the
#: caller). Decimals map to double: ES has no arbitrary-precision
#: numeric, and scaled_float needs a per-field factor the schema does
#: not carry. Dates/timestamps map to ES ``date`` (its default parser
#: accepts both date-only and date-time renderings that ``_json_safe``
#: emits).
_ES_TYPES = {
    "bigint": "long", "int": "integer", "smallint": "short",
    "tinyint": "byte", "double": "double", "float": "float",
    "string": "keyword", "boolean": "boolean", "date": "date",
    "timestamp": "date", "timestamp_ntz": "date", "binary": "binary",
}


def _es_field_mapping(dtype) -> dict:
    """One Spark DataType → ES field mapping. Arrays map to their
    element type (ES fields are multi-valued natively — there is no
    array type on the wire); structs map to ``object`` with recursive
    properties; anything unmapped raises rather than guessing (a wrong
    mapping silently corrupts every later query on the field)."""
    from pyspark.sql import types as T
    if isinstance(dtype, T.ArrayType):
        return _es_field_mapping(dtype.elementType)
    if isinstance(dtype, T.StructType):
        return {"properties": {
            f.name: _es_field_mapping(f.dataType) for f in dtype.fields}}
    if isinstance(dtype, T.DecimalType):
        return {"type": "double"}
    simple = dtype.simpleString()
    if simple not in _ES_TYPES:
        raise ValueError(
            f"no Elasticsearch mapping for Spark type {simple!r} — "
            "pass an explicit mapping or drop the column before "
            "create_index")
    return {"type": _ES_TYPES[simple]}


def es_mapping_for(schema) -> dict:
    """Derive the ``PUT /{index}`` mappings body from a Spark schema
    (``df.schema``): ``{"mappings": {"properties": {...}}}``."""
    return {"mappings": {"properties": {
        f.name: _es_field_mapping(f.dataType) for f in schema.fields}}}


def index_exists(url: str, index: str,
                 timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S) -> bool:
    """``HEAD /{index}`` — True iff the index exists (200)."""
    status, _ = _index_request("HEAD", url, index, None, timeout_s)
    return status == 200


def create_index(url: str, index: str, schema,
                 timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S) -> bool:
    """Create ``index`` with field mappings derived from a Spark schema
    (``PUT /{index}``) — the one piece of the reference's ES lifecycle
    a FRESH cluster needs before the first load (the reference assumes
    pre-created indices; without an explicit mapping the first bulk
    write dynamic-maps strings to text+keyword multifields and ids to
    whatever the first document suggests). Returns True when the index
    was created; False when it already exists (the mapping is NOT
    overwritten — ES rejects mapping changes on a live index, and this
    helper inherits that contract) and on transport failure (logged,
    best-effort like the settings tuning: the load itself still
    proceeds against dynamic mappings)."""
    status, body = _index_request("PUT", url, index,
                                  es_mapping_for(schema), timeout_s)
    if status == 200 and body and body.get("acknowledged"):
        return True
    # Only already-exists is the benign False: ES also 400s on
    # invalid_index_name_exception (e.g. uppercase names) and
    # mapper_parsing_exception (bad derived mapping) — those must not
    # read as "the index is already there with correct mappings"
    err_type = ""
    if isinstance(body, dict):
        err = body.get("error")
        if isinstance(err, dict):
            err_type = err.get("type", "")
    if status == 400 and err_type == "resource_already_exists_exception":
        return False
    _LOG.warning("create_index %s/%s failed (HTTP %s, %s) — proceeding "
                 "with dynamic mappings", url, index, status,
                 err_type or "no error body")
    return False


def get_index_settings(url: str, index: str,
                       timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S
                       ) -> dict | None:
    """Current ``index.*`` settings dict for ``index`` (GET
    ``/{index}/_settings``), or None when unreachable."""
    body = _settings_request("GET", url, index, None, timeout_s)
    if not isinstance(body, dict) or not body:
        return None
    entry = body.get(index) or next(iter(body.values()), None)
    if not isinstance(entry, dict):
        return None
    return (entry.get("settings") or {}).get("index", {})


def put_index_settings(url: str, index: str, settings: dict,
                       timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S
                       ) -> bool:
    """PUT ``/{index}/_settings`` with an ``index.*`` settings dict —
    the wire twin of the reference's
    ``setup_elasticsearch_for_bulk_operations``
    (``data-s3-elastic-transfer.py:23-43``). Best-effort: False on any
    transport/HTTP failure, never raises (tuning is an optimization,
    not a correctness requirement — matching the reference's
    log-and-continue)."""
    body = _settings_request("PUT", url, index, {"index": settings},
                             timeout_s)
    return bool(body and body.get("acknowledged"))


@dataclass
class BulkTuningWindow:
    """Yielded by :func:`setup_index_for_bulk`. ``applied`` says the
    bulk tuning PUT was acknowledged; ``restored`` is None inside the
    window and records the restore PUT's outcome after exit (True when
    no restore was needed). Truthiness == ``applied`` so existing
    ``with ... as applied: if applied:`` call sites keep working."""
    applied: bool
    restored: bool | None = None

    def __bool__(self) -> bool:
        return self.applied


@contextlib.contextmanager
def setup_index_for_bulk(url: str, index: str,
                         timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S):
    """Bulk-load window: apply :data:`BULK_LOAD_SETTINGS` on entry and
    restore the index's prior replica/refresh settings on exit (the
    reference only ever sets them — restoring is the documented
    SURVEY §4 improvement; a crashed loader otherwise leaves the index
    unreplicated). Yields a :class:`BulkTuningWindow` (truthy when the
    tuning was acknowledged). Settings that did not exist before revert
    to cluster defaults by PUTting null. All best-effort: an
    unreachable settings endpoint degrades to an untuned (but correct)
    load — and when the PRIOR settings cannot be read, the tuning is
    NOT applied at all: a restore that cannot know the previous values
    would null an explicitly-set replica count back to the cluster
    default, so a successful load would silently downgrade the index's
    durability. A FAILED restore (transient settings-endpoint outage
    after a successful load would otherwise leave the index at
    replicas=0/refresh=30s forever with no signal) is logged as a
    warning and surfaced on ``window.restored`` so callers can re-PUT
    manually; :func:`write_df` carries it into
    ``BulkReport.settings_restored``."""
    prior = get_index_settings(url, index, timeout_s)
    applied = (prior is not None
               and put_index_settings(url, index, BULK_LOAD_SETTINGS,
                                      timeout_s))
    window = BulkTuningWindow(applied=applied)
    try:
        yield window
    finally:
        if applied:
            restore = {
                key: prior.get(key)  # absent before → reset to default
                for key in BULK_LOAD_SETTINGS
            }
            window.restored = put_index_settings(url, index, restore,
                                                 timeout_s)
            if not window.restored:
                _LOG.warning(
                    "failed to restore index settings on %s/%s after "
                    "bulk load — index left at %s; re-PUT %s manually",
                    url, index, BULK_LOAD_SETTINGS, restore)
        else:
            window.restored = True  # nothing was changed


def bulk_index(df: DataFrame, url: str, index: str,
               id_col: str | None = "id",
               batch_size: int = DEFAULT_BATCH_SIZE,
               max_retries: int = DEFAULT_MAX_RETRIES,
               backoff_base_s: float = DEFAULT_BACKOFF_BASE_S,
               timeout_s: float = DEFAULT_TIMEOUT_S,
               action: str = "index") -> DataFrame:
    """Lazy executor-parallel bulk-index plan.

    Returns a *stats DataFrame* (one row per HTTP batch:
    ``batch_rows, attempts, ok, failed_items, error_sample``); nothing is
    sent until the caller runs an action on it — use :func:`write_df`
    for trigger + aggregate accounting in one call.
    ``action="delete"`` turns the plan into an executor-parallel bulk
    DELETE keyed on ``id_col`` (see :func:`delete_df`).
    """
    if action == "delete" and id_col is None:
        raise ValueError("bulk delete requires id_col")
    cols = df.columns

    def _send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo:lo + batch_size]
                docs = [
                    {c: _json_safe(v) for c, v in zip(cols, row)}
                    for row in chunk.itertuples(index=False, name=None)
                ]
                # a null key would stringify to _id="None" and collapse
                # every such row into ONE server-side doc — count them
                # as per-item failures instead of silently losing them
                null_keyed = 0
                if id_col is not None:
                    null_keyed = sum(1 for d in docs if d[id_col] is None)
                    docs = [d for d in docs if d[id_col] is not None]
                n_rows = len(docs) + null_keyed
                if docs:
                    ok, attempts, failed, sample, n_bytes = send_batch(
                        docs, url, index, id_col,
                        max_retries, backoff_base_s, timeout_s, action)
                else:
                    ok, attempts, failed, sample, n_bytes = (
                        True, 0, 0, "", 0)
                if null_keyed:
                    failed += null_keyed
                    sample = "; ".join(
                        x for x in (sample, f"null_{id_col}×{null_keyed}")
                        if x)
                yield pd.DataFrame({
                    "batch_rows": [n_rows], "attempts": [attempts],
                    "ok": [ok], "failed_items": [failed],
                    "error_sample": [sample],
                    "payload_bytes": [n_bytes]})

    return df.mapInPandas(_send, schema=STATS_SCHEMA)


@dataclass
class BulkReport:
    """Aggregate accounting, mirroring the reference's end-of-run log
    (``data-s3-elastic-transfer.py:430-446``); ``bytes_sent`` is the
    total serialized NDJSON payload — the distributed sum of the
    reference's per-request MB log line
    (``data-s3-elastic-transfer.py:198-199``), one count per batch
    regardless of retry attempts."""
    batches: int = 0
    batches_failed: int = 0
    rows_sent: int = 0
    rows_failed: int = 0
    max_attempts: int = 0
    bytes_sent: int = 0
    error_samples: list[str] = None  # type: ignore[assignment]
    #: False when optimize_for_bulk tuned the index but the post-load
    #: restore PUT failed — the index is still at bulk settings and an
    #: operator must re-PUT (also logged as a warning at restore time).
    settings_restored: bool = True


def write_df(df: DataFrame, url: str, index: str,
             optimize_for_bulk: bool = False,
             settings_timeout_s: float = DEFAULT_SETTINGS_TIMEOUT_S,
             **kwargs) -> BulkReport:
    """Trigger the bulk write and return aggregate accounting.

    ``optimize_for_bulk=True`` wraps the load in
    :func:`setup_index_for_bulk` — replicas off / refresh batched for
    the duration, prior settings restored after — the reference's
    pre-load tuning on the wire path that actually runs here."""
    if optimize_for_bulk:
        with setup_index_for_bulk(url, index, settings_timeout_s) as win:
            report = write_df(df, url, index, **kwargs)
        report.settings_restored = bool(win.restored)
        return report
    return _aggregate_bulk_stats(bulk_index(df, url, index, **kwargs))


def delete_df(df: DataFrame, url: str, index: str,
              id_col: str = "id", **kwargs) -> BulkReport:
    """Executor-parallel bulk DELETE of every ``id_col`` in ``df`` —
    the write twin reconcile's orphan pruning needs: same batching,
    retry, and per-item accounting as :func:`write_df`, but the NDJSON
    carries delete actions (no source docs). Idempotent: deleting an
    already-absent id is a per-item 404 WITHOUT an error field, which
    bulk semantics (and this accounting) treat as success."""
    stats = bulk_index(df.select(id_col), url, index, id_col=id_col,
                       action="delete", **kwargs)
    return _aggregate_bulk_stats(stats)


def _aggregate_bulk_stats(stats: DataFrame) -> BulkReport:
    agg = (stats.agg(
        F.count(F.lit(1)).alias("batches"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("batches_failed"),
        F.sum(F.when(F.col("ok"),
                     F.col("batch_rows") - F.col("failed_items"))
              .otherwise(0)).alias("rows_sent"),
        F.sum(F.when(F.col("ok"), F.col("failed_items"))
              .otherwise(F.col("batch_rows"))).alias("rows_failed"),
        F.max("attempts").alias("max_attempts"),
        F.sum("payload_bytes").alias("bytes_sent"),
        F.array_sort(F.collect_set(
            F.when(F.col("error_sample") != "", F.col("error_sample"))
        )).alias("error_samples"),
    ).collect()[0])
    return BulkReport(
        batches=agg["batches"] or 0,
        batches_failed=agg["batches_failed"] or 0,
        rows_sent=agg["rows_sent"] or 0,
        rows_failed=agg["rows_failed"] or 0,
        max_attempts=agg["max_attempts"] or 0,
        bytes_sent=agg["bytes_sent"] or 0,
        error_samples=list(agg["error_samples"] or []),
    )
