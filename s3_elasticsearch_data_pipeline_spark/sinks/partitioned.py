"""Hive-partitioned parquet sink (SURVEY.md S8).

The reference's backfill write (``Partition-script.py:34-38``) is
already idiomatic Spark; this keeps the identical call shape. Writes are
executor-parallel and shuffle-free: each task writes its own rows under
the right ``key=value/`` directory.

At 100 TB the one knob that matters is file sizing: a repartition on the
partition column (plus an optional within-partition bucket count) avoids
the small-files problem (every task writing a sliver of every month).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_col: str = "month",
                      mode: str = "append",
                      files_per_partition: int | None = None) -> None:
    """Append rows under ``{path}/{partition_col}=<v>/`` directories.

    ``files_per_partition`` repartitions by (partition value, bucket) so
    each hive partition gets a bounded file count — the scale guard the
    reference lacks.
    """
    out = df
    if files_per_partition is not None:
        bucket = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns]))
                  % files_per_partition)
        out = df.repartition(F.col(partition_col), bucket)
    (out.write.mode(mode).partitionBy(partition_col).format("parquet").save(path))


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """S2 — partitioned-layout scan with hive partition discovery; the
    partition column comes back as a regular column and prunes on
    ``where`` (Catalyst partition pruning, SURVEY.md §4)."""
    return spark.read.parquet(path)
