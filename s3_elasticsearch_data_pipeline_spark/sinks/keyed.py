"""Keyed idempotent serving-table sink (SURVEY.md S10).

The reference's serving store is an Elasticsearch index written with
``_id = doc["id"]`` so re-indexing a document is an upsert
(``ID-based-transfer.py:198-223``). Without a live ES, the observable
semantics — "writes are idempotent by key; last write wins" — are
reproduced by a partitioned parquet table plus a merge-on-write:
union incoming rows with existing, keep one row per key (incoming
preferred), rewrite only the touched partitions.

This is the MERGE INTO emulation pattern (anti-join + union); with a
Delta/Iceberg jar on the classpath the same call maps to a real
``MERGE``. At scale the dynamic partition overwrite keeps the rewrite
proportional to the touched partitions, not the table.

Note on read-overwrite: the merge plan reads the serving table while
dynamically overwriting its touched partitions. Locally this is safe
(reads complete before the commit swaps files); on an object store a
production deployment should route through a table format (Delta/
Iceberg MERGE) or a staging-dir + rename for snapshot isolation —
callers must also not re-execute plans derived from the pre-upsert
sink afterwards.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def upsert_by_key(spark: SparkSession, incoming: DataFrame, path: str,
                  key_col: str = "id", partition_col: str = "month") -> None:
    """Idempotent keyed write: one row per key survives, incoming wins.

    Only partitions present in ``incoming`` are rewritten (dynamic
    partition overwrite), so cost scales with the delta, not the table.
    The overwrite-mode override is scoped to this call (a session-
    global leak would silently flip unrelated writers from whole-table
    to matched-partition overwrite semantics).
    """
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        incoming = incoming.withColumn("_prio", F.lit(0))
        if os.path.exists(path):
            existing = spark.read.parquet(path).withColumn("_prio", F.lit(1))
            # Restrict existing rows to the touched partitions:
            # everything else is untouched on disk by dynamic
            # overwrite anyway.
            touched = incoming.select(partition_col).distinct()
            existing = existing.join(F.broadcast(touched), partition_col,
                                     "left_semi")
            merged = incoming.unionByName(existing)
        else:
            merged = incoming
        w = Window.partitionBy(key_col).orderBy("_prio")
        deduped = (merged
                   .withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") == 1)
                   .drop("_rn", "_prio"))
        # one shuffle keyed on the partition column before the
        # partitioned write: the dedup window left the frame
        # hash-partitioned on key_col, so every task would otherwise
        # open a writer per month it sees (tasks × months tiny files —
        # the classic partitioned-write small-files bug)
        (deduped.repartition(partition_col).write.mode("overwrite")
         .partitionBy(partition_col).format("parquet").save(path))
    finally:
        spark.conf.set(mode_key, prior)


def read_serving(spark: SparkSession, path: str) -> DataFrame:
    """Sink-state scan (S6/S7 stand-in): read the serving table; callers
    filter/aggregate it like any DataFrame — no pagination concept."""
    return spark.read.parquet(path)
