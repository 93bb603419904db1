"""Custom Python DataSource (Spark 4 API): a deterministic generator
of the reference pipeline's own record schema (SURVEY.md §1.3 —
id/month/month_num/value/temperature/humidity/ts/city/date), so
lifecycle and sink tests can draw arbitrary volumes of
reference-shaped data without fixture files.

This is the engine's "connector extension point" demonstration: the
same ``DataSource``/``DataSourceReader`` pair is how one would wrap an
HTTP-paged store (the reference's Elasticsearch ``search_after`` scan,
``ID-based-transfer.py:111-157``) as a first-class parallel Spark
source — each InputPartition maps to a shard/page-range, executors
fetch independently, no driver funnel.

Scale shape: ``partitions()`` splits the keyspace into fixed-size row
ranges; each partition generates independently from its offset (pure
function of row index — no RNG state shared across partitions), so the
source is splittable, restartable, and deterministic at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

MONTHS = ("January", "February", "March", "April", "May", "June",
          "July", "August", "September", "October", "November", "December")
CITIES = ("Delhi", "Mumbai", "Pune", "Chennai", None)

SCHEMA = ("id string, month string, month_num int, value int, "
          "temperature double, humidity double, ts long, city string, "
          "date string")


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticReferenceReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.rows_per_partition = int(options.get("rowsperpartition", 250))

    def partitions(self):
        step = self.rows_per_partition
        return [_Range(i, min(i + step, self.n_rows))
                for i in range(0, self.n_rows, step)]

    def read(self, partition):
        # deterministic pure-function-of-index generation; runs on the
        # EXECUTOR for its own range only
        for i in range(partition.start, partition.end):
            month_num = i % 12 + 1
            day = i % 28 + 1
            yield (f"id_{i:08d}",
                   MONTHS[month_num - 1],
                   month_num,
                   (i * 37) % 1000,
                   round(15.0 + (i * 7 % 200) / 10.0, 1),
                   round(40.0 + (i * 13 % 500) / 10.0, 1),
                   1_700_000_000 + i * 60,
                   CITIES[i % len(CITIES)],
                   f"2025-{month_num:02d}-{day:02d}")


class SyntheticReferenceSource(DataSource):
    """``spark.read.format("reference_synthetic").option("rows", N)``"""

    @classmethod
    def name(cls) -> str:
        return "reference_synthetic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticReferenceReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticReferenceSource)
