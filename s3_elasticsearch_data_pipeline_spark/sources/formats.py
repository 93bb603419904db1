"""Row-format sources/sinks: CSV and JSON-lines.

The reference moves row-oriented JSON over the wire (NDJSON ``_bulk``
bodies, ``data-s3-elastic-transfer.py:192-196``) and fetches Athena
results as CSV (``ID-based-transfer.py:42-48``). Here both are
first-class Spark sources/sinks instead of driver-side string glue.

Scale posture: reads always take an EXPLICIT schema — ``inferSchema``
(CSV) / schema sampling (JSON) would scan the data twice, which is
unacceptable at 100 TB. Writers emit one file per partition in
parallel; no driver funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Executor-parallel CSV write with header (Athena-result shape)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV scan with explicit schema — single pass, no inference job."""
    return (spark.read.schema(schema)
            .option("header", True)
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .csv(path))


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Executor-parallel JSON-lines write (the reference's NDJSON doc
    shape, one JSON object per row)."""
    df.write.mode(mode).json(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines scan with explicit schema — no sampling pass."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink — Spark's second native columnar format;
    same executor-parallel write path as parquet (S8)."""
    df.write.mode(mode).format("orc").save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan: self-describing footer schema, vectorized reader,
    predicate pushdown — the parquet properties the engine relies on,
    available unchanged (format interchangeability at the source API)."""
    return spark.read.format("orc").load(path)
