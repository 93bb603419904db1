"""Scan-parallelism estimator (tables._scan_split_estimate): it must
mirror Spark's actual FilePartition planning — split-size formula
(openCostInBytes, totalBytes/defaultParallelism cap) plus small-file
bin-packing — because parallelize_for_compute uses it to decide whether
an expensive per-row stage needs a repartition. The old per-file
``min(row_groups, ceil(bytes/128MB))`` sum overestimated many-small-file
layouts (Spark packs them) and underestimated mid-size files (the
totalBytes/parallelism term shrinks splits), skipping or adding the
exchange in exactly the wrong cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.tables import (
    _packed_scan_partitions, _parse_size_bytes, _scan_split_estimate)

MB = 1024 * 1024


def test_parse_size_bytes_suffixes():
    assert _parse_size_bytes("134217728b", 0) == 128 * MB
    assert _parse_size_bytes("128m", 0) == 128 * MB
    assert _parse_size_bytes("128mb", 0) == 128 * MB
    assert _parse_size_bytes("1g", 0) == 1024 * MB
    assert _parse_size_bytes("512k", 0) == 512 * 1024
    assert _parse_size_bytes(4194304, 0) == 4 * MB
    assert _parse_size_bytes("garbage", 7) == 7
    assert _parse_size_bytes(None, 7) == 7


def test_packing_many_tiny_files_collapses_to_parallelism():
    """1000 × 10 KB files: openCost inflates totalBytes so maxSplitBytes
    rises to totalBytes/parallelism and the slices pack into ~32 bins —
    NOT 1000 (the old formula's answer, which made the caller skip the
    repartition precisely in the small-files case it exists to fix)."""
    infos = [(10 * 1024, 1)] * 1000
    bins = _packed_scan_partitions(infos, 128 * MB, 4 * MB, 32)
    assert 30 <= bins <= 40, bins


def test_packing_midsize_files_gains_splits_from_parallelism_term():
    """8 × 16 MB files with plenty of row groups at parallelism 32:
    maxSplitBytes drops to ~totalBytes/32 ≈ 5 MB so each file splits
    ~4 ways → ~32 work-bearing partitions (the old formula said 8 and
    forced a needless exchange)."""
    infos = [(16 * MB, 16)] * 8
    bins = _packed_scan_partitions(infos, 128 * MB, 4 * MB, 32)
    assert bins >= 24, bins


def test_packing_single_row_group_caps_work_bins():
    """A 512 MB file with ONE row group plans 4 byte-range slices but
    only one carries rows — the estimate must say 1, not 4."""
    assert _packed_scan_partitions([(512 * MB, 1)], 128 * MB, 4 * MB, 4) == 1
    # same file with 4+ row groups: all four slices carry rows
    assert _packed_scan_partitions([(512 * MB, 8)], 128 * MB, 4 * MB, 4) == 4


def _nonempty_scan_partitions(df) -> int:
    return (df.withColumn("__pid", F.spark_partition_id())
            .groupBy("__pid").count().count())


@pytest.mark.parametrize("n_files", [1, 7, 40])
def test_estimate_matches_sparks_actual_planning(spark, tmp_path, n_files):
    """End-to-end: for real parquet layouts the estimate must equal the
    number of scan partitions Spark actually gives rows to."""
    path = str(tmp_path / f"t{n_files}")
    (spark.range(20_000)
     .select("id", F.sha2(F.col("id").cast("string"), 256).alias("pad"))
     .repartition(n_files).write.parquet(path))
    df = spark.read.parquet(path)
    est = _scan_split_estimate(df)
    assert est is not None
    assert est == _nonempty_scan_partitions(df)


def test_estimate_honors_suffixed_conf(spark, tmp_path):
    """'128m'-style conf values must parse (they used to raise and
    silently fall back to the default)."""
    path = str(tmp_path / "t")
    spark.range(1000).write.parquet(path)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64m")
    try:
        df = spark.read.parquet(path)
        est = _scan_split_estimate(df)
        assert est is not None
        assert est == _nonempty_scan_partitions(df)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728b")
