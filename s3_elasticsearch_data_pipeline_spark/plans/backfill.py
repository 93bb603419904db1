"""Entry point C — partition backfill + describe (SURVEY.md §3.3;
reference ``Partition-script.py:7-51`` and ``Debug.py:14-27``).

The reference's backfill is already idiomatic Spark (read monolithic
parquet → filter → append partitioned); this keeps the shape and adds
the write-then-read-back verification it performs
(``Partition-script.py:42-49``) as a returned report.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators.diff import partition_counts
from s3_elasticsearch_data_pipeline_spark.sinks.partitioned import (
    read_partitioned, write_partitioned)


@dataclass
class BackfillReport:
    rows_in: int
    rows_written: int
    partitions: dict


def backfill_partition(spark: SparkSession, source: DataFrame, out_path: str,
                       partition_col: str = "month",
                       only_value: str | None = None) -> BackfillReport:
    """Filter (optionally) to one partition value and append under the
    hive layout, then verify by re-reading and re-counting — the
    reference's own check (``Partition-script.py:42-49``)."""
    rows_in = source.count()
    selected = (source.where(F.col(partition_col) == only_value)
                if only_value is not None else source)
    write_partitioned(selected, out_path, partition_col)
    back = read_partitioned(spark, out_path)
    counts = {r[0]: r[1] for r in partition_counts(back, partition_col).collect()}
    return BackfillReport(rows_in=rows_in,
                          rows_written=sum(counts.values()),
                          partitions=counts)


def describe(df: DataFrame, n: int = 10) -> dict:
    """``Debug.py:18-25`` equivalent: schema + columns + sample, as data
    instead of stdout."""
    return {
        "schema": df.schema.jsonValue(),
        "columns": df.columns,
        "sample": [row.asDict() for row in df.take(n)],
    }
