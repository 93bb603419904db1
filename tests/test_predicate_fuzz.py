"""Predicate fuzzing: deterministically generated WHERE clauses run as
the SAME SQL text on Spark (temp views) and DuckDB, compared exactly.

Fixed queries prove the operators; the fuzzer probes the long tail of
predicate semantics — comparison/BETWEEN/IN/LIKE over numeric, string
and timestamp columns, composed with AND/OR/NOT — where engine
differences (null handling, cast edges, date literals) would hide.
Seeded RNG → the same 48 predicates every run, on any machine.
"""

from __future__ import annotations

import random

import pytest

from s3_elasticsearch_data_pipeline_spark.tables import load_table
from tests.oracle import duckdb_conn, oracle_result, spark_result

N_CASES = 48


def _predicates() -> list[str]:
    rng = random.Random(20260814)

    def num(lo, hi, nd=2):
        return f"{rng.uniform(lo, hi):.{nd}f}"

    def day():
        return (f"TIMESTAMP '199{rng.randint(2, 8)}-"
                f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}'")

    def atom():
        kind = rng.randrange(8)
        if kind == 0:
            return f"l_quantity {rng.choice(['<', '<=', '>', '>=', '='])} " \
                   f"{rng.randint(1, 50)}"
        if kind == 1:
            return f"l_extendedprice BETWEEN {num(900, 30000)} " \
                   f"AND {num(30000, 95000)}"
        if kind == 2:
            return f"l_discount {rng.choice(['<', '>='])} {num(0.0, 0.1)}"
        if kind == 3:
            flags = rng.sample(["'A'", "'N'", "'R'"], rng.randint(1, 2))
            return f"l_returnflag IN ({', '.join(flags)})"
        if kind == 4:
            return f"l_shipdate {rng.choice(['<', '>='])} {day()}"
        if kind == 5:
            status = rng.choice(["'O'", "'F'"])
            return f"l_linestatus = {status}"
        if kind == 6:
            return f"l_orderkey % {rng.randint(2, 97)} = 0"
        return f"l_tax <= {num(0.0, 0.08)}"

    preds = []
    for _ in range(N_CASES):
        parts = [atom() for _ in range(rng.randint(1, 3))]
        ops = [rng.choice([" AND ", " OR "]) for _ in range(len(parts) - 1)]
        sql = parts[0]
        for op, part in zip(ops, parts[1:]):
            nxt = f"NOT ({part})" if rng.random() < 0.2 else part
            sql = f"({sql}){op}{nxt}"
        preds.append(sql)
    return preds


PREDICATES = _predicates()


@pytest.fixture(scope="module")
def fuzz_env(spark, sf_oracle):
    load_table(spark, sf_oracle, "lineitem").createOrReplaceTempView(
        "lineitem_fuzz")
    con = duckdb_conn(sf_oracle)
    con.execute("CREATE VIEW lineitem_fuzz AS SELECT * FROM lineitem")
    yield spark, con
    con.close()


@pytest.mark.parametrize("i", range(N_CASES))
def test_fuzzed_predicate_matches_duckdb(fuzz_env, i):
    spark, con = fuzz_env
    sql = (
        "SELECT count(*) AS n, "
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) "
        "AS qty, "
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) "
        "AS DOUBLE) AS price "
        f"FROM lineitem_fuzz WHERE {PREDICATES[i]}")
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {PREDICATES[i]}"


N_GROUP_CASES = 24


def _group_cases() -> list[str]:
    rng = random.Random(97531)
    keys = ("l_returnflag", "l_linestatus",
            "l_orderkey % 7", "l_orderkey % 13",
            "extract(year FROM l_shipdate)",
            "extract(month FROM l_shipdate)",
            "CAST(l_quantity AS BIGINT) % 5")
    aggs = (
        "count(*) AS n",
        "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)"
        " AS qty",
        "CAST(round(sum(CAST(l_discount AS DECIMAL(8,2))), 2) AS DOUBLE)"
        " AS disc",
        "min(l_orderkey) AS min_key", "max(l_orderkey) AS max_key",
        "round(min(l_extendedprice), 2) AS min_price",
        "round(max(l_extendedprice), 2) AS max_price",
    )
    cases = []
    for _ in range(N_GROUP_CASES):
        key = rng.choice(keys)
        chosen = ["count(*) AS n"] + rng.sample(
            [a for a in aggs if not a.startswith("count")],
            rng.randint(1, 3))
        cases.append(
            f"SELECT {key} AS grp, {', '.join(chosen)} "
            f"FROM lineitem_fuzz GROUP BY {key}")
    return cases


GROUP_CASES = _group_cases()


@pytest.mark.parametrize("i", range(N_GROUP_CASES))
def test_fuzzed_group_aggregate_matches_duckdb(fuzz_env, i):
    spark, con = fuzz_env
    sql = GROUP_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_JOIN_CASES = 24


def _join_cases() -> list[str]:
    rng = random.Random(424242)
    li_preds = (
        "l_quantity > 25", "l_discount >= 0.05", "l_returnflag = 'R'",
        "l_shipdate < TIMESTAMP '1996-06-01'", "l_tax <= 0.04",
        "l_linenumber <= 3", "TRUE")
    o_preds = (
        "o_orderstatus = 'F'", "o_totalprice > 50000",
        "o_orderdate >= TIMESTAMP '1994-01-01'",
        "o_orderpriority IN ('1-URGENT', '2-HIGH')", "TRUE")
    c_preds = ("c_acctbal > 0", "c_mktsegment = 'BUILDING'", "TRUE")
    cases = []
    for _ in range(N_JOIN_CASES):
        with_cust = rng.random() < 0.5
        group = rng.choice((
            "o_orderstatus", "l_returnflag",
            "extract(year FROM o_orderdate)"))
        joins = ("JOIN orders_fuzz ON l_orderkey = o_orderkey"
                 + (" JOIN customer_fuzz ON o_custkey = c_custkey"
                    if with_cust else ""))
        where = (f"({rng.choice(li_preds)}) AND ({rng.choice(o_preds)})"
                 + (f" AND ({rng.choice(c_preds)})" if with_cust else ""))
        cases.append(
            f"SELECT {group} AS grp, count(*) AS n, "
            "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) "
            "AS DOUBLE) AS price "
            f"FROM lineitem_fuzz {joins} WHERE {where} GROUP BY {group}")
    return cases


JOIN_CASES = _join_cases()


@pytest.fixture(scope="module")
def join_env(spark, sf_oracle):
    for t in ("lineitem", "orders", "customer"):
        load_table(spark, sf_oracle, t).createOrReplaceTempView(f"{t}_fuzz")
    con = duckdb_conn(sf_oracle)
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t}_fuzz AS SELECT * FROM {t}")
    yield spark, con
    con.close()


@pytest.mark.parametrize("i", range(N_JOIN_CASES))
def test_fuzzed_join_matches_duckdb(join_env, i):
    spark, con = join_env
    sql = JOIN_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_WINDOW_CASES = 16


def _window_cases() -> list[str]:
    rng = random.Random(13579)
    parts = ("l_returnflag", "l_linestatus", "l_orderkey % 11",
             "l_returnflag, l_linestatus")
    # total order inside every partition: unique (orderkey, linenumber)
    orders_ = ("l_extendedprice, l_orderkey, l_linenumber",
               "l_shipdate, l_orderkey, l_linenumber",
               "l_quantity DESC, l_orderkey, l_linenumber")
    # Spark's parser cannot refine a named window with a frame
    # (OVER (w ROWS ...)), so frame cases inline the full spec.
    fns = (
        "row_number() OVER w AS v",
        "rank() OVER w AS v",
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER "
        "(PARTITION BY {p} ORDER BY {o} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS DOUBLE) AS v",
        "lag(l_orderkey, 1, -1) OVER w AS v",
        "lead(l_linenumber, 2, 0) OVER w AS v",
        "count(*) OVER (PARTITION BY {p} ORDER BY {o} "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS v",
    )
    cases = []
    for _ in range(N_WINDOW_CASES):
        part, order = rng.choice(parts), rng.choice(orders_)
        fn = rng.choice(fns).format(p=part, o=order)
        cases.append(
            f"SELECT l_orderkey, l_linenumber, {fn} "
            "FROM lineitem_fuzz "
            f"WHERE l_orderkey % {rng.randint(5, 23)} = 0 "
            f"WINDOW w AS (PARTITION BY {part} ORDER BY {order})")
    return cases


WINDOW_CASES = _window_cases()


@pytest.mark.parametrize("i", range(N_WINDOW_CASES))
def test_fuzzed_window_matches_duckdb(fuzz_env, i):
    spark, con = fuzz_env
    sql = WINDOW_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_ORDER_CASES = 12


def _order_cases() -> list[str]:
    rng = random.Random(8642)
    sorts = ("l_extendedprice DESC, l_orderkey, l_linenumber",
             "l_shipdate, l_orderkey, l_linenumber",
             "l_quantity, l_extendedprice DESC, l_orderkey, l_linenumber")
    cases = []
    for _ in range(N_ORDER_CASES):
        lim = rng.choice((10, 50, 100))
        off = rng.choice((0, 25, 200))
        cases.append(
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
            f"FROM lineitem_fuzz WHERE l_discount >= "
            f"{rng.choice(('0.0', '0.03', '0.07'))} "
            f"ORDER BY {rng.choice(sorts)} LIMIT {lim} OFFSET {off}")
    return cases


ORDER_CASES = _order_cases()


@pytest.mark.parametrize("i", range(N_ORDER_CASES))
def test_fuzzed_order_limit_matches_duckdb(fuzz_env, i):
    spark, con = fuzz_env
    sql = ORDER_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_DISTINCT_CASES = 12


def _distinct_cases() -> list[str]:
    rng = random.Random(31415)
    keys = ("l_returnflag", "l_linestatus", "l_orderkey % 9")
    daggs = ("count(DISTINCT l_orderkey) AS d_orders",
             "count(DISTINCT l_partkey) AS d_parts",
             "count(DISTINCT l_suppkey) AS d_supps",
             "count(DISTINCT CAST(l_quantity AS BIGINT)) AS d_qty")
    havings = ("count(*) > 100", "count(DISTINCT l_partkey) >= 10",
               "min(l_orderkey) >= 0")
    cases = []
    for _ in range(N_DISTINCT_CASES):
        key = rng.choice(keys)
        chosen = rng.sample(daggs, rng.randint(1, 2))
        cases.append(
            f"SELECT {key} AS grp, count(*) AS n, {', '.join(chosen)} "
            f"FROM lineitem_fuzz GROUP BY {key} "
            f"HAVING {rng.choice(havings)}")
    return cases


DISTINCT_CASES = _distinct_cases()


@pytest.mark.parametrize("i", range(N_DISTINCT_CASES))
def test_fuzzed_distinct_having_matches_duckdb(fuzz_env, i):
    spark, con = fuzz_env
    sql = DISTINCT_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_SCALAR_CASES = 20


def _scalar_cases() -> list[str]:
    rng = random.Random(271828)
    # engine-portable scalar expressions (no float rounding, no
    # locale, no type-divergent returns) over the orders columns
    exprs = (
        "upper(o_orderpriority)",
        "lower(o_orderstatus)",
        "substr(o_orderpriority, 1, {k})",
        "replace(o_orderpriority, '-', '_')",
        "concat(o_orderstatus, ':', o_orderpriority)",
        "length(trim(o_orderpriority))",
        "lpad(o_orderstatus, {k}, '.')",
        "rpad(o_orderstatus, {k}, '*')",
        "position('-' IN o_orderpriority)",
        "nullif(o_orderstatus, 'O')",
        "coalesce(nullif(o_orderstatus, 'F'), 'filled')",
        "CAST(date_trunc('month', o_orderdate) AS DATE)",
        "CAST(o_orderdate + INTERVAL {k} DAY AS DATE)",
        "extract(year FROM o_orderdate) * 100 + extract(month FROM o_orderdate)",
        "greatest(o_orderkey % {k}, o_orderkey % 5)",
        "least(o_orderkey % {k}, o_orderkey % 7)",
        "abs(o_orderkey % {k} - 3)",
        "o_orderkey % {k} + o_custkey % 3",
    )
    cases = []
    for _ in range(N_SCALAR_CASES):
        e = rng.choice(exprs).format(k=rng.randint(2, 9))
        cases.append(
            f"SELECT {e} AS v, count(*) AS n FROM orders_fuzz GROUP BY 1")
    return cases


SCALAR_CASES = _scalar_cases()


@pytest.mark.parametrize("i", range(N_SCALAR_CASES))
def test_fuzzed_scalar_function_matches_duckdb(join_env, i):
    spark, con = join_env
    sql = SCALAR_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_SUBQ_CASES = 12


def _subquery_cases() -> list[str]:
    rng = random.Random(161803)
    inner_preds = ("o_orderstatus = 'F'", "o_totalprice > 100000",
                   "o_orderpriority = '1-URGENT'",
                   "o_orderdate < TIMESTAMP '1995-01-01'")
    outer_preds = ("l_quantity > 30", "l_discount >= 0.06",
                   "l_returnflag = 'A'", "TRUE")
    shapes = (
        "EXISTS (SELECT 1 FROM orders_fuzz WHERE o_orderkey = l_orderkey"
        " AND {ip})",
        "NOT EXISTS (SELECT 1 FROM orders_fuzz WHERE o_orderkey ="
        " l_orderkey AND {ip})",
        "l_orderkey IN (SELECT o_orderkey FROM orders_fuzz WHERE {ip})",
        "l_orderkey NOT IN (SELECT o_orderkey FROM orders_fuzz WHERE {ip})",
    )
    cases = []
    for _ in range(N_SUBQ_CASES):
        shape = rng.choice(shapes).format(ip=rng.choice(inner_preds))
        cases.append(
            "SELECT l_returnflag AS grp, count(*) AS n, "
            "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) "
            "AS DOUBLE) AS qty "
            f"FROM lineitem_fuzz WHERE ({rng.choice(outer_preds)}) "
            f"AND {shape} GROUP BY l_returnflag")
    return cases


SUBQ_CASES = _subquery_cases()


@pytest.mark.parametrize("i", range(N_SUBQ_CASES))
def test_fuzzed_subquery_matches_duckdb(join_env, i):
    spark, con = join_env
    sql = SUBQ_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"


N_OUTER_CASES = 10


def _outer_cases() -> list[str]:
    rng = random.Random(555)
    o_preds = ("o_totalprice > 150000", "o_orderstatus = 'P'",
               "o_orderpriority = '5-LOW'")
    cases = []
    for _ in range(N_OUTER_CASES):
        # LEFT JOIN against a sparse right side → NULL-extended rows;
        # aggregates must count/sum the nulls identically
        side = rng.choice(("LEFT", "FULL"))
        cases.append(
            "SELECT o_orderstatus AS grp, count(*) AS n, "
            "count(l2.big_orderkey) AS n_matched, "
            "CAST(round(sum(CAST(coalesce(l2.big_qty, 0) "
            "AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty "
            f"FROM orders_fuzz {side} JOIN ("
            "  SELECT l_orderkey AS big_orderkey, l_quantity AS big_qty "
            f"  FROM lineitem_fuzz WHERE l_quantity > {rng.randint(44, 49)}"
            ") l2 ON o_orderkey = big_orderkey "
            f"WHERE ({rng.choice(o_preds)}) OR o_orderstatus IS NULL "
            "GROUP BY o_orderstatus")
    return cases


OUTER_CASES = _outer_cases()


@pytest.mark.parametrize("i", range(N_OUTER_CASES))
def test_fuzzed_outer_join_matches_duckdb(join_env, i):
    spark, con = join_env
    sql = OUTER_CASES[i]
    assert spark_result(spark.sql(sql)) == oracle_result(con, sql), \
        f"divergence on: {sql}"
