"""Elasticsearch connector sink (SURVEY.md S9–S11) — config builder.

The reference hand-rolls the ES ``_bulk`` protocol driver-side: NDJSON
batches of 50k docs, linear-backoff retries, per-item error accounting
(``data-s3-elastic-transfer.py:188-256``). The Spark-native equivalent
is the public elasticsearch-hadoop connector
(``org.elasticsearch.spark.sql``): executor-parallel bulk writes,
connector-managed batching/retry, keyed upsert via ``es.mapping.id``.

The connector jar and a live cluster are not present in this
environment, so ``write_to_es`` is gated: it builds the exact writer and
raises a clear error if the format is unavailable. ``tests`` exercise
the option-building logic; the keyed-parquet sink (``sinks.keyed``)
stands in for observable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Connector equivalents of the reference's hand-rolled constants
# (data-s3-elastic-transfer.py:19-21,249-253; ID-based-transfer.py:15).
DEFAULT_ES_OPTIONS = {
    "es.batch.size.entries": "50000",     # BATCH_SIZE
    "es.batch.write.retry.count": "3",    # MAX_RETRIES
    "es.batch.write.retry.wait": "20s",   # linear backoff base
    "es.http.timeout": "2m",              # REQUEST_TIMEOUT=120s
    "es.batch.write.refresh": "false",    # refresh_interval tuning analogue
}


def es_write_options(index: str, nodes: str = "localhost", port: int = 9200,
                     id_col: str | None = "id",
                     overrides: dict[str, str] | None = None) -> dict[str, str]:
    """Build the full option map for an ES bulk write.

    ``id_col`` set → keyed upsert semantics (``es.mapping.id``), the
    connector twin of ``_id = doc["id"]`` (``ID-based-transfer.py:202``);
    None → auto-assigned ids (``data-s3-elastic-transfer.py:192-196``).
    """
    opts = dict(DEFAULT_ES_OPTIONS)
    opts.update({
        "es.nodes": nodes,
        "es.port": str(port),
        "es.resource": index,
    })
    if id_col is not None:
        opts["es.mapping.id"] = id_col
        opts["es.write.operation"] = "index"  # idempotent re-index by key
    if overrides:
        opts.update(overrides)
    return opts


def _is_connector_missing(exc: BaseException) -> bool:
    """True only for the connector-jar-not-on-classpath failure shapes
    (Spark's data-source lookup error / JVM ClassNotFound) — a genuine
    write failure on a cluster that HAS the connector must surface
    as-is, not be mislabeled as an environment problem."""
    msg = str(exc)
    return ("Failed to find data source" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "ClassNotFoundException" in msg)


def write_to_es(df: DataFrame, index: str, **kwargs) -> None:
    """Executor-parallel bulk write through the connector. Raises a
    clear error when the connector jar is absent (this environment);
    any other failure (connection refused, mapping conflict, rejected
    docs) propagates unchanged."""
    opts = es_write_options(index, **kwargs)
    try:
        (df.write.format("org.elasticsearch.spark.sql")
         .options(**opts).mode("append").save())
    except Exception as exc:
        if _is_connector_missing(exc):
            raise RuntimeError(
                "elasticsearch-hadoop connector not available in this "
                "environment; use sinks.keyed.upsert_by_key as the "
                "offline stand-in (same observable semantics)") from exc
        raise
