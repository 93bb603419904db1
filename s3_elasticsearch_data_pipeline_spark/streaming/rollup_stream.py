"""Streaming continuous aggregate: the rollup (plans/rollup.py) fed by
Structured Streaming's file source.

The batch maintainer diffs PARTITIONS, so a late file landing in an
already-rolled-up partition is invisible until a reconcile pass. Here
the checkpoint's file log is the state: every new FILE contributes its
partial aggregates exactly once, late or not — the same
partial-batches-then-merge contract (decimal-exact, order-free), with
file-granular exactly-once instead of partition-granular.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def rollup_stream(spark: SparkSession, source_path: str, rollup_path: str,
                  checkpoint_path: str, partition_key: str = "month",
                  dim: str = "event_type", value_col: str = "value") -> None:
    """Drain all unseen source files into rollup partial batches
    (Trigger.AvailableNow — run-to-completion semantics), then return.
    Finalize with plans.rollup.read_rollup."""
    static = spark.read.parquet(source_path)
    stream = (spark.readStream
              .schema(static.schema)
              .option("basePath", source_path)
              .parquet(source_path))

    def add_partials(batch_df, _batch_id):
        (batch_df
         .groupBy(partition_key, dim)
         .agg(F.count(F.lit(1)).alias("n_rows"),
              F.sum(F.col(value_col).cast("decimal(28,6)"))
               .alias("sum_value"))
         # shuffle on the partition key before the partitioned write —
         # the groupBy hashes on (key, dim), which would open a writer
         # per key per task (small-files bug); partials are tiny
         .repartition(partition_key)
         .write.mode("append").partitionBy(partition_key)
         .format("parquet").save(rollup_path))

    (stream.writeStream
     .foreachBatch(add_partials)
     .option("checkpointLocation", checkpoint_path)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
