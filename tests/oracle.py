"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet, compare row count, sorted
column names, and an order-insensitive canonicalized value set."""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from s3_elasticsearch_data_pipeline_spark.tables import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return str(v)


def canon_rows(columns, rows) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)
    return cols, canon


def spark_result(df):
    cols = df.columns
    rows = [tuple(row) for row in df.collect()]
    return canon_rows(cols, rows)


def oracle_result(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return canon_rows(cols, rows)


_INTEGRAL_SPARK = {"byte", "short", "int", "integer", "bigint", "long", "tinyint", "smallint"}
_FLOAT_SPARK = {"float", "double"}


def _spark_pandas_kinds(df, collected_rows) -> dict[str, str | None]:
    """Predict the pandas dtype *kind* each Spark column would render as
    under ``toPandas()`` (the driver's view): an integral column becomes
    int64 unless it holds nulls, in which case pandas promotes to float64.
    Non-numeric columns return None (not checked)."""
    kinds: dict[str, str | None] = {}
    for i, field in enumerate(df.schema.fields):
        t = field.dataType.simpleString()
        if t in _INTEGRAL_SPARK:
            has_null = any(r[i] is None for r in collected_rows)
            kinds[field.name] = "float" if has_null else "int"
        elif t in _FLOAT_SPARK:
            kinds[field.name] = "float"
        else:
            kinds[field.name] = None
    return kinds


def _duck_pandas_kinds(odf) -> dict[str, str | None]:
    """Pandas dtype kinds of the DuckDB result as the driver sees them
    (``.df()``): BIGINT -> int64, HUGEINT/DOUBLE -> float64, BIGINT with
    nulls -> float64."""
    kinds: dict[str, str | None] = {}
    for c in odf.columns:
        k = odf[c].dtype.kind
        if k in "iu":
            kinds[c] = "int"
        elif k == "f":
            kinds[c] = "float"
        else:
            kinds[c] = None
    return kinds


def compare(df, con, sql: str, strict_dtypes: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty = match).

    ``strict_dtypes`` mirrors the driver's pandas-rendered value hash:
    a numerically-identical result still *hash-mismatches* driver-side if
    one engine renders ints and the other floats (e.g. DuckDB ``sum(int)``
    is HUGEINT -> pandas float64 '1.0' vs Spark bigint '1'), so we flag
    any int-vs-float pandas-kind divergence as a failure too.
    """
    raw_rows = [tuple(row) for row in df.collect()]
    s_cols, s_rows = canon_rows(df.columns, raw_rows)
    o_cols, o_rows = oracle_result(con, sql)
    problems = []
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in set(o_rows)][:3]
        diff_o = [r for r in o_rows if r not in set(s_rows)][:3]
        problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    if strict_dtypes:
        s_kinds = _spark_pandas_kinds(df, raw_rows)
        o_kinds = _duck_pandas_kinds(con.execute(sql).df())
        for c in s_kinds:
            sk, ok = s_kinds.get(c), o_kinds.get(c)
            if sk is not None and ok is not None and sk != ok:
                problems.append(
                    f"pandas dtype kind differs on '{c}': spark={sk} oracle={ok} "
                    "(driver value-hash would mismatch on rendering)")
    return problems
