"""Property tests: the typed projection's cast-with-default semantics
must match the reference's Python try/except-default behavior
(``data-s3-elastic-transfer.py:176-184`` — SURVEY.md §7.4.2) on
arbitrary messy inputs."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s3_elasticsearch_data_pipeline_spark.operators.projection import (
    typed_projection)

# messy scalar pool: numbers, numeric strings, garbage strings, nulls
SCALARS = st.one_of(
    st.none(),
    st.integers(min_value=-2**31, max_value=2**31 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(alphabet="0123456789abcXYZ.-", max_size=8),
)


def reference_int(v, default=0):
    """The reference's int(...) try/except-default (int('3.9') raises)."""
    if v is None:
        return default
    try:
        if isinstance(v, str):
            return int(v)          # raises on '3.9', 'abc', ''
        return int(v)              # truncates floats
    except (ValueError, TypeError):
        return default


def reference_float(v, default=0.0):
    if v is None:
        return default
    try:
        return float(v)
    except (ValueError, TypeError):
        return default


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(SCALARS, min_size=1, max_size=30))
def test_int_cast_parity(spark, values):
    rows = [(str(i), v if not isinstance(v, float) else float(v))
            for i, v in enumerate(values)]
    df = spark.createDataFrame(
        [(k, str(v) if v is not None else None) for k, v in rows],
        "k string, v string")
    out = {r.k: r.v for r in
           typed_projection(df, {"k": ("string", ""),
                                 "v": ("int", 0)}).collect()}
    for k, v in rows:
        expected = reference_int(str(v) if v is not None else None)
        # Spark cast('3.9' as int) → null → default; int('3.9') raises
        # → default: both land on the default (SURVEY §7.4.2).
        assert out[k] == expected, (k, v, out[k], expected)


@settings(max_examples=20, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(SCALARS, min_size=1, max_size=30))
def test_float_cast_parity(spark, values):
    rows = [(str(i), v) for i, v in enumerate(values)]
    df = spark.createDataFrame(
        [(k, str(v) if v is not None else None) for k, v in rows],
        "k string, v string")
    out = {r.k: r.v for r in
           typed_projection(df, {"k": ("string", ""),
                                 "v": ("double", 0.0)}).collect()}
    for k, v in rows:
        expected = reference_float(str(v) if v is not None else None)
        assert abs(out[k] - expected) < 1e-6 or out[k] == expected, \
            (k, v, out[k], expected)


def test_absent_column_materializes_default(spark):
    df = spark.createDataFrame([("a",)], "k string")
    out = typed_projection(df, {"k": ("string", ""),
                                "city": ("string", ""),
                                "value": ("int", 0)}).collect()[0]
    assert out.city == "" and out.value == 0


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=24))
@pytest.mark.slow
def test_floor_stabilization_identical_across_engines(spark, xs):
    """The repo-wide rounding discipline — floor(x·10⁶ + 0.5)/10⁶ with
    plain IEEE ops — must produce bit-identical values in Python,
    Spark, and DuckDB for arbitrary doubles. Every decimal-stabilized
    aggregate in the registry rests on this property."""
    import math

    import duckdb
    import pyspark.sql.functions as F

    py = [math.floor(x * 1000000.0 + 0.5) / 1000000.0 for x in xs]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)],
                               "i long, x double")
    sp = [r["v"] for r in (df.orderBy("i")
          .select("i", (F.floor(F.col("x") * 1000000.0 + F.lit(0.5))
                        / 1000000.0).alias("v")).collect())]
    con = duckdb.connect()
    dk = [con.execute("SELECT floor(CAST(? AS DOUBLE) * 1000000.0 + 0.5)"
                      " / 1000000.0", [x]).fetchone()[0] for x in xs]
    con.close()
    assert sp == py == dk
