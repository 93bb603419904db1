"""Test-data catalog: load the driver-generated parquet tables.

The reference reads one logical table through a Glue catalog
(``data-s3-elastic-transfer.py:95-99``); our engine's equivalent is
plain ``spark.read.parquet`` + temp-view registration, which gives
Catalyst full pushdown/pruning visibility (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns that MAY be stored as parquet TIMESTAMP(NANOS) — Spark's
# reader rejects nanos natively; with ``nanosAsLong`` they surface as
# long and we convert to microsecond timestamps (identical to DuckDB's
# ns→µs truncation). Newer generator versions write plain µs
# timestamps, which arrive as TimestampType already — handled
# adaptively below so both layouts load identically.
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    nanos_cols = NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":
            # integer div — a float division would round the µs up at
            # ns magnitudes (double has 53 mantissa bits, ns epochs
            # need 61)
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            # session tz is pinned to UTC (session.py), so this cast is
            # wall-clock-preserving; keeps one TimestampType everywhere
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def parallelize_for_compute(df: DataFrame,
                            min_partitions: int | None = None) -> DataFrame:
    """Ensure a frame ENTERING AN EXPENSIVE PER-ROW COMPUTE STAGE
    (tokenization/shingling over full text, regex feature extraction,
    media decode) has at least cluster parallelism.

    Why: Spark splits parquet by row group — a source written as few
    large row groups (or any unsplittable codec) yields fewer input
    partitions than cores, and the projection pipelined into that scan
    stage then runs serially on one task no matter how wide the
    cluster is. At real scale split counts far exceed parallelism and
    this is a no-op; when they don't, one round-robin shuffle of the
    input buys a fully parallel compute stage. Deterministic filters
    and column pruning still push through the repartition to the scan.

    Use ONLY in front of genuinely expensive per-row work — cheap
    columnar aggregates are better off without the extra exchange.
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register each table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle sees."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
