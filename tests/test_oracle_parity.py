"""Every registry query with an oracle must match DuckDB at sf0.01 —
the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from s3_elasticsearch_data_pipeline_spark import registry
from tests.oracle import compare, duckdb_conn

ORACLE_NAMES = sorted(registry.oracle_sql())


@pytest.fixture(scope="module")
def con(sf_oracle):
    con = duckdb_conn(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_oracle, con, name):
    df = registry.queries()[name](spark, sf_oracle)
    sql = registry.oracle_sql()[name]
    problems = compare(df, con, sql)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_have_rows_or_schema(spark, sf_smoke):
    for name, fn in registry.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, f"{name} returned no columns"
