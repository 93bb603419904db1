"""Data-quality expectations: declarative table checks evaluated as
one DataFrame (the Great-Expectations/dbt-test shape, engine-native).

The reference's only correctness instrument is operational
reconciliation (count/ID diffs — SURVEY.md §5); this generalizes it
into a first-class check surface a 100 TB ingest runs after every
load: per-table constraints fused into ONE aggregate pass per table
(no per-check scans), plus anti-join referential checks that reuse the
engine's J2 shape (`operators/diff.py`).

Output contract: one row per expectation — (expectation,
n_violations, passed) — so the result is tiny, joinable into a run
log, and alert-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check(name: str, violations: F.Column) -> F.Column:
    return F.struct(F.lit(name).alias("expectation"),
                    violations.cast("long").alias("n_violations"))


def dq_expectations(orders: DataFrame, customer: DataFrame,
                    lineitem: DataFrame, events: DataFrame) -> DataFrame:
    """Evaluate the engine's standard expectation suite.

    Scale shape: the orders / lineitem / events scalar checks each run
    as a single full scan producing one row (all constraints of one
    table are columns of ONE aggregate — adding a check adds zero
    I/O); the two foreign-key checks are broadcast/shuffle anti-joins
    counted on the executor side. Nothing but ~7 rows reaches the
    driver.
    """
    o = orders.agg(F.array(
        _check("orders_orderkey_unique",
               F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))),
        _check("orders_custkey_not_null",
               F.count(F.lit(1)) - F.count(F.col("o_custkey"))),
        _check("orders_totalprice_positive",
               F.count_if(F.col("o_totalprice") <= 0)),
        _check("orders_orderdate_in_range",
               F.count_if(~F.col("o_orderdate").between(
                   "1995-01-01", "2001-12-31")))).alias("c"))
    li = lineitem.agg(F.array(
        _check("lineitem_quantity_positive",
               F.count_if(F.col("l_quantity") <= 0)),
        _check("lineitem_discount_in_unit_interval",
               F.count_if(~F.col("l_discount").between(0.0, 1.0)))).alias("c"))
    ev = events.agg(F.array(
        _check("events_value_not_null",
               F.count(F.lit(1)) - F.count(F.col("value")))).alias("c"))
    fk_cust = (orders.join(customer,
                           orders["o_custkey"] == customer["c_custkey"],
                           "left_anti")
               .agg(F.array(_check("orders_custkey_fk_customer",
                                   F.count(F.lit(1)))).alias("c")))
    fk_ord = (lineitem.join(orders,
                            lineitem["l_orderkey"] == orders["o_orderkey"],
                            "left_anti")
              .agg(F.array(_check("lineitem_orderkey_fk_orders",
                                  F.count(F.lit(1)))).alias("c")))
    packs = o.unionByName(li).unionByName(ev) \
             .unionByName(fk_cust).unionByName(fk_ord)
    return (packs.select(F.explode("c").alias("c"))
            .select("c.expectation", "c.n_violations",
                    (F.col("c.n_violations") == 0).alias("passed")))


def benford_digit_audit(orders: DataFrame,
                        col: str = "o_totalprice") -> DataFrame:
    """Benford first-digit audit: the leading-digit distribution of a
    money column against Benford's law — the classic fraud/synthetic-
    data screen, as one hash aggregate plus fixed scalar math.

    First digit via string head of the integral part (no log10 on the
    row path); expected share is log10(1+1/d) evaluated identically on
    both engines; the chi-square-style distance folds per-digit
    contributions in exact decimal so the statistic is
    order-independent.
    """
    from pyspark.sql import functions as F
    digit = F.substring(F.floor(F.col(col)).cast("string"), 1, 1) \
        .cast("int")
    per = (orders.where(F.col(col) >= 1)
           .groupBy(digit.alias("digit"))
           .agg(F.count(F.lit(1)).alias("n")))
    tot = per.agg(F.sum("n").alias("total"))
    expected = F.log10(1 + 1 / F.col("digit").cast("double"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    dev = share - expected
    contrib = (dev * dev / expected).cast("decimal(18,12)")
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return (per.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    stab(share).alias("observed_share"),
                    stab(expected).alias("benford_share"),
                    stab(contrib.cast("double")).alias("chi2_contrib")))
