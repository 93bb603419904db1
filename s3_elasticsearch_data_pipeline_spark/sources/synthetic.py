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

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

MONTHS = ("January", "February", "March", "April", "May", "June",
          "July", "August", "September", "October", "November", "December")
CITIES = ("Delhi", "Mumbai", "Pune", "Chennai", None)

SCHEMA = ("id string, month string, month_num int, value int, "
          "temperature double, humidity double, ts long, city string, "
          "date string")


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _generate(start: int, end: int):
    """Deterministic pure-function-of-index row generation, shared by
    the batch and streaming readers (identical rows for the same
    index range at any parallelism)."""
    for i in range(start, end):
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
        yield from _generate(partition.start, partition.end)


class SyntheticStreamReader(DataSourceStreamReader):
    """Streaming face of the same source: micro-batches advance a
    monotonic index offset — the exact resume-token shape of the
    reference's keyset pagination (``search_after`` sorted by id,
    ``ID-based-transfer.py:119-151``), made a first-class Spark stream.
    Offsets are durable in the checkpoint, so restart resumes from the
    last committed page instead of re-listing; each micro-batch range
    still splits into executor-parallel partitions (no driver funnel).
    The stream is bounded by ``maxrows`` so tests drain it to
    completion; an unbounded store just keeps advancing."""

    def __init__(self, options):
        self.max_rows = int(options.get("maxrows", 1000))
        self.rows_per_batch = int(options.get("rowsperbatch", 250))
        self.rows_per_partition = int(options.get("rowsperpartition", 100))
        self._reached = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # one page of new rows becomes visible per micro-batch
        self._reached = min(self._reached + self.rows_per_batch,
                            self.max_rows)
        return {"index": self._reached}

    def partitions(self, start, end):
        s, e = int(start["index"]), int(end["index"])
        step = self.rows_per_partition
        return [_Range(i, min(i + step, e)) for i in range(s, e, step)]

    def read(self, partition):
        yield from _generate(partition.start, partition.end)

    def commit(self, end):
        pass  # nothing to clean up — generation is pure


class SyntheticReferenceSource(DataSource):
    """``spark.read.format("reference_synthetic").option("rows", N)``;
    ``spark.readStream.format("reference_synthetic")`` for the
    streaming variant (options ``maxrows``/``rowsperbatch``)."""

    @classmethod
    def name(cls) -> str:
        return "reference_synthetic"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticReferenceReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticReferenceSource)
