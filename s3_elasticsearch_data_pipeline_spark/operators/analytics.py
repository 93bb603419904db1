"""Aggregates & headline analytical queries (SURVEY.md §2.3 + §7 M4).

The reference's own aggregate surface is just count / group-count /
distinct (A1–A5); the extension surface declares the standard OLAP
aggregate pack over the TPC-H-ish fixture tables. Everything here is
pure DataFrame API: Catalyst gives partial+final hash aggregation,
parquet column pruning, and predicate pushdown for free; joins on the
dimension tables are explicitly broadcast.

Double-valued aggregates are rounded in the query itself so the result
is reproducible bit-for-bit against an ANSI-SQL oracle regardless of
summation order (floating addition is non-associative; at these
magnitudes a 2-decimal round is far coarser than the accumulated ulp
error, so both engines land on the same value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_count(df: DataFrame, *keys: str) -> DataFrame:
    """A1/A2 — ``groupBy(keys).count()`` with a stable output alias."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def distinct_values(df: DataFrame, *cols: str) -> DataFrame:
    """A4 — ``select(cols).distinct()``."""
    return df.select(*cols).distinct()


def global_count(df: DataFrame) -> DataFrame:
    """A5 — total row count as a 1-row DataFrame."""
    return df.agg(F.count(F.lit(1)).alias("cnt"))


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship query (TPC-H Q1 shape): pricing summary report.

    Scan → filter (pushed to parquet) → 2-key hash aggregate with 8
    partial-aggregated measures → sort. At 100 TB this is the canonical
    map-side-combine aggregate: one row per (returnflag, linestatus)
    crosses the shuffle per map task.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (lineitem
            .where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def revenue_by_segment(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: revenue per market segment and order month.

    customer is the small side → explicit broadcast; orders⋈lineitem is
    the big equi-join on the natural key, sort-merge at scale with AQE
    handling skewed order keys.
    """
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .groupBy(F.col("c_mktsegment"),
                     F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(F.round(F.sum(revenue), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def local_supplier_volume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation. All dimension tables broadcast; the only shuffles
    are the two fact-side equi-joins and the final 1-key aggregate."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(supplier),
                  (lineitem.l_suppkey == supplier.s_suppkey)
                  & (customer.c_nationkey == supplier.s_nationkey))
            .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"),
                     F.col("n_name").alias("nation_name"))
            .agg(F.round(F.sum(revenue), 2).alias("revenue")))


def forecast_revenue(lineitem: DataFrame,
                     date_from: str = "1995-01-01", date_to: str = "1996-01-01",
                     disc_lo: float = 0.05, disc_hi: float = 0.07,
                     qty_below: float = 24.0) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global sum — the pushdown showcase.

    All four predicates reach the parquet scan (min/max row-group
    pruning); the aggregate is a single partial+final sum.
    """
    return (lineitem
            .where((F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
                   & (F.col("l_discount") >= disc_lo)
                   & (F.col("l_discount") <= disc_hi)
                   & (F.col("l_quantity") < qty_below))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                  .alias("revenue")))


def top_orders(orders: DataFrame, k: int = 10) -> DataFrame:
    """O3 — deterministic top-k: order by value desc with key tiebreak."""
    return (orders
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(k))


def date_function_pack(orders: DataFrame) -> DataFrame:
    """Scalar date-function surface over orders (M4 extension): year /
    month / day extraction, truncation, formatting, date arithmetic."""
    return (orders
            .select(F.col("o_orderkey"),
                    F.year("o_orderdate").alias("order_year"),
                    F.month("o_orderdate").alias("order_month_num"),
                    F.dayofmonth("o_orderdate").alias("order_day"),
                    F.quarter("o_orderdate").alias("order_quarter"),
                    F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
                    F.datediff(F.lit("1998-12-31").cast("date"),
                               F.col("o_orderdate").cast("date")).alias("days_to_eoy")))


def json_extraction(events: DataFrame) -> DataFrame:
    """JSON scalar surface over ``events.props`` (M4): extract typed
    fields from the JSON wire format — the reference treats JSON purely
    as a wire format (``json.dumps``); here it is a queryable column."""
    return (events
            .select(F.col("event_id"),
                    F.col("event_type"),
                    F.get_json_object("props", "$.k").cast("int").alias("k")))
