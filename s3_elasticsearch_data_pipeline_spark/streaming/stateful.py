"""Custom stateful streaming operators (M4 extension surface — the
escape hatch for operators Structured Streaming's built-in
aggregations can't express), on BOTH stateful APIs:
``applyInPandasWithState`` (the battle-tested one, used by default)
and Spark 4's ``transformWithStateInPandas`` successor (typed
ValueState + timers; gated on protobuf availability).

``running_user_totals`` maintains per-user counters across micro-
batches: event count, value sum, last-seen timestamp. Each batch emits
the UPDATED cumulative row per user touched in that batch — the
streaming twin of a running ``groupBy(user).agg(...)`` that never
re-reads history (state is O(users), not O(events)).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from s3_elasticsearch_data_pipeline_spark.streaming.windowed import (  # noqa: E501
    _nanos_scoped)

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n_events long, total_value double, last_ts timestamp"


def _update_user(key: tuple[Any, ...],
                 batches: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, round(total, 2), last_ts))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [round(total, 2)],
                        "last_ts": [last_ts]})


@_nanos_scoped
def running_user_totals(spark: SparkSession, events_path: str) -> DataFrame:
    """Drain the bounded events table through the stateful operator and
    return the final per-user cumulative totals.

    At scale this runs unbounded with a real trigger; state lives in
    the checkpoint's state store, partitioned by user hash — the same
    shuffle key as a batch groupBy, so skew/AQE reasoning carries over.
    """
    import os
    static = spark.read.parquet(events_path)
    stream_path = (events_path if os.path.isdir(events_path)
                   else events_path + "*")
    stream = (spark.readStream.schema(static.schema)
              .format("parquet").load(stream_path))
    from .windowed import _with_utc_ts
    stream = _with_utc_ts(stream, static.schema)
    updated = (stream
               .select("user_id", "ts", "value")
               .groupBy("user_id")
               .applyInPandasWithState(
                   _update_user, OUTPUT_SCHEMA, STATE_SCHEMA,
                   "update", GroupStateTimeout.NoTimeout))
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (updated.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update-mode memory sink appends one row per (batch, user); the
    # cumulative row with the highest n_events per user is the final one
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (spark.table(name)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


@_nanos_scoped
def running_user_totals_tws(spark: SparkSession,
                            events_path: str) -> DataFrame:
    """The same per-user running totals on Spark 4's NEW stateful API
    (``transformWithStateInPandas`` — the successor to
    ``applyInPandasWithState``): typed per-key ValueState managed by a
    StatefulProcessor, checkpoint-backed, with timers/TTL available
    when eviction policies are needed. Kept alongside the legacy-API
    twin so the two are equivalence-tested — a migration template.
    """
    import os

    # The new API's Python runner speaks protobuf to the JVM; gate on
    # the dependency so environments without it get a clear pointer to
    # the equivalent legacy-API operator instead of a worker crash.
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package, "
            "absent in this environment; running_user_totals "
            "(applyInPandasWithState) provides identical semantics"
        ) from exc

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            if self._totals.exists():
                n, total, last_ts = self._totals.get()
            else:
                n, total, last_ts = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                batch_max = pdf["ts"].max()
                last_ts = (batch_max if last_ts is None
                           else max(last_ts, batch_max))
            self._totals.update((n, round(total, 2), last_ts))
            yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                                "total_value": [round(total, 2)],
                                "last_ts": [last_ts]})

        def close(self) -> None:
            pass

    static = spark.read.parquet(events_path)
    stream_path = (events_path if os.path.isdir(events_path)
                   else events_path + "*")
    stream = (spark.readStream.schema(static.schema)
              .format("parquet").load(stream_path))
    from .windowed import _with_utc_ts
    stream = _with_utc_ts(stream, static.schema)
    updated = (stream
               .select("user_id", "ts", "value")
               .groupBy("user_id")
               .transformWithStateInPandas(
                   statefulProcessor=RunningTotals(),
                   outputStructType=OUTPUT_SCHEMA,
                   outputMode="Update", timeMode="None"))
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (updated.writeStream.outputMode("update")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (spark.table(name)
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
