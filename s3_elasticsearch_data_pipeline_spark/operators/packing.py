"""Sequence packing: lay documents out into fixed-length training
blocks (the GPT-style "concatenate the token stream, cut every
seq_len" step) — built on a distributed prefix sum.

Spark has no scan/prefix-sum primitive over a global order: a naive
``Window.orderBy(...)`` with no partition key collapses the whole
table onto ONE task. The classic two-phase parallel scan fixes that:

  1. range-partition by the order key and compute LOCAL running sums
     per partition (parallel windows keyed by partition id);
  2. collect the per-partition totals (one tiny row per partition),
     exclusive-scan them on the driver (kilobytes), and broadcast the
     offsets back.

Cost: one range shuffle + one broadcast — same shape at any scale;
the result is a pure function of the order key, independent of the
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sums(df: DataFrame, order_col: str, value_col: str,
                out_col: str = "cum", n_parts: int = 32) -> DataFrame:
    """Inclusive running sum of ``value_col`` over the global
    ``order_col`` order, without a single-task global window.

    The range-partitioned frame is MATERIALIZED before either
    consumer runs (r10): RangePartitioner samples its boundaries with
    an RDD-id-derived seed, so the offsets collect and the window
    pass — two separate actions — could otherwise see DIFFERENT
    boundaries and compose inconsistent running sums (the failure
    mode was observed and root-caused on dedup._global_row_number's
    suffix ranks; this call site had the same latent race). The
    checkpoint block is narrow (order + value columns) and stays
    pinned while the returned plan is live."""
    part = (df.repartitionByRange(n_parts, F.col(order_col))
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True))
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    local = part.withColumn("__local", F.sum(value_col).over(w))
    totals = (part.groupBy("__pid")
              .agg(F.sum(value_col).alias("__tot"))
              .orderBy("__pid").collect())
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["__tot"] or 0
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid int, __off long")
    return (local.join(F.broadcast(off_df), "__pid")
            .withColumn(out_col, F.col("__local") + F.col("__off"))
            .drop("__pid", "__local", "__off"))


def sequence_pack(documents: DataFrame, seq_len: int = 4096) -> DataFrame:
    """Assign each document its (block, offset) in the packed token
    stream: documents concatenate in doc_id order; block k holds
    stream positions [k*seq_len, (k+1)*seq_len). A document straddling
    a boundary spans ``n_blocks`` consecutive blocks (training-side
    attention masks handle the split, as in GPT-2/3 data loading).
    """
    toks = F.col("n_tokens")
    cum = F.col("__cum")
    start = (cum - toks).alias("stream_start")
    from s3_elasticsearch_data_pipeline_spark.functions.textfns import tokens
    counted = documents.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"))
    packed = prefix_sums(counted, "doc_id", "n_tokens", out_col="__cum")
    return packed.select(
        "doc_id", "n_tokens", start,
        F.floor((cum - toks) / seq_len).alias("block_id"),
        ((cum - toks) % seq_len).alias("block_offset"),
        (F.floor((cum - F.lit(1)) / seq_len)
         - F.floor((cum - toks) / seq_len) + 1).alias("n_blocks"))
