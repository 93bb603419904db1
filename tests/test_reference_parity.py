"""End-to-end parity on the reference's OWN table shape (FIXTURES.md §A):
synthesize `incremental_table` with all 11 reference columns (including
messy values the reference's cleaning rules exist for), run the typed
projection with the reference field map, and drive the full
incremental-load + reconcile lifecycle on it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators.projection import (
    REFERENCE_FIELD_MAPPINGS, typed_projection, validate_and_clean)
from s3_elasticsearch_data_pipeline_spark.plans.incremental import incremental_load
from s3_elasticsearch_data_pipeline_spark.plans.reconcile import reconcile

MONTHS = ["January", "February", "March", "April"]


@pytest.fixture
def incremental_table(spark):
    """The reference's one logical table (SURVEY.md §1.3), with nulls
    and junk exercising every cleaning rule."""
    rows = []
    for i in range(400):
        month_idx = i % len(MONTHS)
        rows.append((
            str(i),                                  # id
            MONTHS[month_idx],                       # month
            month_idx + 1,                           # month_num
            i * 10,                                  # value
            None if i % 7 == 0 else 15.0 + i % 20,   # temperature (nulls)
            None if i % 11 == 0 else 40.0 + i % 50,  # humidity (nulls)
            1700000000 + i * 3600,                   # ts epoch
            None if i % 5 == 0 else f"city{i % 3}",  # city (nulls)
            f"2025-0{month_idx + 1}-15",             # date
            str(1700000000000000000 + i),            # date_timestamp_ns
            f"2025-0{month_idx + 1}-15T00:00:00",    # date_timestamp_converted
        ))
    return spark.createDataFrame(
        rows,
        "id string, month string, month_num int, value long, "
        "temperature double, humidity double, ts long, city string, "
        "date string, date_timestamp_ns string, date_timestamp_converted string")


def test_reference_projection_and_cleaning(spark, incremental_table):
    shaped = validate_and_clean(
        typed_projection(incremental_table, REFERENCE_FIELD_MAPPINGS))
    rows = {r.id: r for r in shaped.collect()}
    assert set(shaped.columns) == set(REFERENCE_FIELD_MAPPINGS)
    # cleaning rules (data-s3-elastic-transfer.py:126-152):
    assert rows["0"].temperature == 0.0        # null float → 0.0
    assert rows["0"].city == ""                # null city → ''
    assert rows["1"].temperature == 16.0       # present value untouched
    assert all(r.month in MONTHS for r in rows.values())


def test_reference_lifecycle_end_to_end(spark, incremental_table, tmp_path):
    """Lifecycle A + B on the reference's own schema: load all months,
    idempotent reload, damage one month, reconcile restores it."""
    sink = str(tmp_path / "serving")
    shaped = validate_and_clean(
        typed_projection(incremental_table, REFERENCE_FIELD_MAPPINGS))

    r1 = incremental_load(spark, shaped, sink)
    assert sorted(r1.partitions_loaded) == sorted(MONTHS)
    assert r1.rows_loaded == 400
    assert incremental_load(spark, shaped, sink).rows_loaded == 0

    # drop 10 January rows from the sink
    serving = spark.read.parquet(sink)
    doomed = (serving.where(F.col("month") == "January")
              .select("id").limit(10))
    kept = serving.join(doomed, "id", "left_anti")
    import os
    import shutil
    tmp2 = str(tmp_path / "serving2")
    kept.write.partitionBy("month").parquet(tmp2)
    shutil.rmtree(sink)
    os.rename(tmp2, sink)

    rep = reconcile(spark, shaped, sink)
    assert rep.mismatched_partitions == ["January"]
    assert rep.rows_repaired == 10
    assert spark.read.parquet(sink).count() == 400
