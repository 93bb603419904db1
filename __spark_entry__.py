"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator inventory from SURVEY.md §2 with
DuckDB oracle twins (see s3_elasticsearch_data_pipeline_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from s3_elasticsearch_data_pipeline_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    return registry.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ M4
    extension surface). Each callable takes (spark, sf_dir)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys missing here are the documented
    non-SQL-expressible ops (driver records a rows-only check)."""
    return registry.oracle_sql()
