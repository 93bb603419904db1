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


def compare(df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    s_cols, s_rows = spark_result(df)
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
    return problems
