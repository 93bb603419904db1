"""Aggregates & headline analytical queries (SURVEY.md §2.3 + §7 M4).

The reference's own aggregate surface is just count / group-count /
distinct (A1–A5); the extension surface declares the standard OLAP
aggregate pack over the TPC-H-ish fixture tables. Everything here is
pure DataFrame API: Catalyst gives partial+final hash aggregation,
parquet column pruning, and predicate pushdown for free; joins on the
dimension tables are explicitly broadcast.

Money-valued grouped sums are accumulated as DECIMAL(18,4): double
addition is non-associative and Spark's shuffle merge order is
nondeterministic run-to-run, so a double sum can land on either side of
a cent-rounding boundary; decimal addition is exact and therefore
order-independent. Results are cast back to double after the final
round so both engines emit identical canonical values.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
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
    # money inputs are 2-decimal values stored as doubles; casting the
    # INPUTS to decimal (exact — no stored value sits on a cast tie
    # boundary) and multiplying in decimal keeps every product and sum
    # exact, hence engine- and order-independent.
    price_d = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_d = F.col("l_discount").cast("decimal(4,2)")
    tax_d = F.col("l_tax").cast("decimal(4,2)")
    disc_price = price_d * (F.lit(1) - disc_d)
    charge = disc_price * (F.lit(1) + tax_d)
    return (lineitem
            .where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(  # quantities are integral → double sums exact as-is
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(price_d), 2)
                  .cast("double").alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2)
                  .cast("double").alias("sum_disc_price"),
                 F.round(F.sum(charge), 2)
                  .cast("double").alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.sum(price_d).cast("double") / F.count(F.lit(1)), 4)
                  .alias("avg_price"),
                 F.round(F.sum(disc_d).cast("double") / F.count(F.lit(1)), 6)
                  .alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def revenue_by_segment(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3 shape: revenue per market segment and order month.

    customer is the small side → explicit broadcast; orders⋈lineitem is
    the big equi-join on the natural key, sort-merge at scale with AQE
    handling skewed order keys.
    """
    revenue = (F.col("l_extendedprice").cast("decimal(12,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))  # exact decimal product
    return (lineitem
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .groupBy(F.col("c_mktsegment"),
                     F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
            .agg(F.round(F.sum(revenue), 2)
                  .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


def local_supplier_volume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation. All dimension tables broadcast; the only shuffles
    are the two fact-side equi-joins and the final 1-key aggregate."""
    revenue = (F.col("l_extendedprice").cast("decimal(12,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))  # exact decimal product
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
            .agg(F.round(F.sum(revenue), 2)
                  .cast("double").alias("revenue")))


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
            .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")
                               * F.col("l_discount").cast("decimal(4,2)")), 2)
                  .cast("double").alias("revenue")))


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


def agg_stats_pack(lineitem: DataFrame) -> DataFrame:
    """Full scalar-aggregate surface (M4): sum/avg/min/max/count/
    count-distinct/stddev/exact-interpolated-percentile per group.

    Percentile runs in its own aggregation joined back on the (tiny)
    group key: mixing it with count(DISTINCT) makes Spark rewrite the
    whole agg through a (group, partkey) pre-aggregation, which builds
    one percentile buffer per distinct pair instead of per group —
    quadratically more buffer merges at scale. Two narrow scans + a
    broadcast join of per-group rows is strictly cheaper."""
    main = (lineitem
            .groupBy("l_returnflag")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                          .cast("double") / F.count(F.lit(1)), 4)
                  .alias("avg_price"),
                 F.round(F.min("l_extendedprice"), 2).alias("min_price"),
                 F.round(F.max("l_extendedprice"), 2).alias("max_price"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("l_partkey").alias("n_parts"),
                 F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty")))
    median = (lineitem
              .groupBy("l_returnflag")
              .agg(F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4)
                    .alias("median_price")))
    return main.join(F.broadcast(median), "l_returnflag")


def rollup_revenue(orders: DataFrame) -> DataFrame:
    """ROLLUP aggregate: (status, priority) → status subtotals → grand
    total; Spark's Expand operator feeds one hash aggregate — no
    re-scan per grouping set."""
    return (orders
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
                  .cast("double").alias("revenue")))


def cube_revenue(orders: DataFrame) -> DataFrame:
    """CUBE aggregate over the same keys — all 4 grouping sets."""
    return (orders
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
                  .cast("double").alias("revenue")))


def pivot_status_by_priority(orders: DataFrame) -> DataFrame:
    """Pivot: order counts, priorities × status columns. The value list
    is declared (no extra distinct-scan job at planning time)."""
    return (orders
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["O", "F", "P"])
            .agg(F.count(F.lit(1)))
            .na.fill(0, ["O", "F", "P"]))


def approx_distinct_pack(lineitem: DataFrame) -> DataFrame:
    """Approximate aggregates (M4): HyperLogLog++ distinct count and
    approximate percentile — the sketches a 100 TB profile pass uses.
    Engine-specific sketch values → rows-only driver check."""
    return (lineitem
            .agg(F.approx_count_distinct("l_partkey").alias("approx_parts"),
                 F.approx_count_distinct("l_orderkey").alias("approx_orders"),
                 F.percentile_approx("l_extendedprice", 0.5, 10000)
                  .alias("approx_median_price")))


def order_priority_check(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: order counts per priority for orders having at
    least one line item shipped after the order date (EXISTS → left
    semi join; runtime bloom filter prunes the probe side)."""
    late_lines = (lineitem.alias("l")
                  .join(orders.alias("o"),
                        F.col("l.l_orderkey") == F.col("o.o_orderkey"))
                  .where(F.col("l.l_shipdate") > F.col("o.o_orderdate"))
                  .select(F.col("l.l_orderkey").alias("o_orderkey")))
    return (orders
            .join(late_lines, "o_orderkey", "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders")))


def top_returned_customers(customer: DataFrame, orders: DataFrame,
                           lineitem: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue on returned items."""
    revenue = (F.col("l_extendedprice").cast("decimal(12,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))  # exact decimal product
    return (lineitem
            .where(F.col("l_returnflag") == "R")
            .join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(F.round(F.sum(revenue), 2)
                  .cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(k))


def string_function_pack(customer: DataFrame) -> DataFrame:
    """Scalar string-function surface (M4): case, trim, substring,
    concat, length, replace, regexp extraction, padding."""
    return (customer
            .select(F.col("c_custkey"),
                    F.upper("c_name").alias("name_upper"),
                    F.lower("c_mktsegment").alias("segment_lower"),
                    F.length("c_name").alias("name_len"),
                    F.substring("c_name", 1, 8).alias("name_prefix"),
                    F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
                    F.regexp_extract("c_name", r"(\d+)$", 1).alias("name_num"),
                    F.lpad(F.col("c_custkey").cast("string"), 10, "0")
                     .alias("key_padded"),
                    F.replace(F.col("c_name"), F.lit("#"), F.lit("-"))
                     .alias("name_dashed")))


def math_function_pack(lineitem: DataFrame) -> DataFrame:
    """Scalar math-function surface (M4): rounding family, abs/sign,
    exp/log, sqrt/power, trig, ceil/floor — over lineitem measures."""
    v = F.col("l_extendedprice")
    return (lineitem
            .select(F.col("l_orderkey"), F.col("l_linenumber"),
                    F.round(v, 1).alias("r1"),
                    F.ceil(v).alias("ceil_v"),
                    F.floor(v).alias("floor_v"),
                    F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
                    F.round(F.sqrt(v), 6).alias("sqrt_v"),
                    F.round(F.ln(v), 6).alias("ln_v"),
                    F.round(F.pow(F.col("l_quantity"), F.lit(2.0)), 2)
                     .alias("qty_sq"),
                    F.sign(F.col("l_discount") - 0.05).alias("disc_sign")))


def conditional_pack(orders: DataFrame) -> DataFrame:
    """CASE/WHEN + null-handling scalar surface: multi-branch CASE,
    nullif, ifnull, least/greatest."""
    return (orders
            .select(F.col("o_orderkey"),
                    F.when(F.col("o_totalprice") > 300000, "large")
                     .when(F.col("o_totalprice") > 100000, "medium")
                     .otherwise("small").alias("size_class"),
                    F.nullif(F.col("o_orderstatus"), F.lit("P"))
                     .alias("status_or_null"),
                    F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")),
                               F.lit("PENDING")).alias("status_filled"),
                    F.least(F.col("o_totalprice"), F.lit(200000.0))
                     .alias("capped_price"),
                    F.greatest(F.col("o_totalprice"), F.lit(1000.0))
                     .alias("floored_price")))


def zscore_outliers(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Per-group z-score outlier detection over ``events.value`` —
    the data-quality screen a training pipeline runs before ingesting
    numeric telemetry (the reference has no anomaly surface at all).

    Numeric discipline for a reproducible threshold: the per-group
    moments (sum, sum-of-squares) are accumulated in DECIMAL, which is
    exact and therefore independent of partitioning/summation order —
    a double sum would put border rows on different sides of the
    threshold from run to run. The z itself is then a fixed-shape
    double expression and is rounded before the filter so the compare
    is stable bit-for-bit.

    Scale shape: one partial+final hash aggregate over the fact table
    (a few dozen groups), broadcast the tiny moments table back, filter
    executor-side. No second shuffle of the fact table.
    """
    val = F.col("value").cast("decimal(18,6)")
    moments = (events.groupBy("event_type")
               .agg(F.sum(val).alias("__s"),
                    F.sum(val * val).alias("__q"),
                    F.count(F.lit(1)).alias("__n")))
    s = F.col("__s").cast("double")
    q = F.col("__q").cast("double")
    n = F.col("__n").cast("double")
    mean = s / n
    var = (q - (s * s) / n) / n
    z = F.round((F.col("value") - mean) / F.sqrt(var), 4)
    return (events.join(F.broadcast(moments), "event_type")
            .withColumn("z", z)
            .where(F.abs(F.col("z")) >= z_threshold)
            .select("event_id", "event_type", "value", "z"))


def winsorized_stats(lineitem: DataFrame,
                     lo_p: float = 0.05, hi_p: float = 0.95) -> DataFrame:
    """Robust per-group statistics: winsorize ``l_extendedprice`` at the
    [p05, p95] exact percentiles, then report the clipped mean next to
    the raw mean and the clip counts — the outlier-resistant summary a
    data-quality dashboard shows before thresholding on it.

    Two narrow passes: a per-group percentile aggregate (broadcast back
    — rows = groups) and one clip+aggregate scan. Percentile bounds are
    rounded before clipping and the clipped sum accumulates in DECIMAL,
    so both engines agree bit-for-bit.
    """
    bounds = (lineitem.groupBy("l_returnflag")
              .agg(F.round(F.expr(f"percentile(l_extendedprice, {lo_p})"), 6)
                   .alias("p_lo"),
                   F.round(F.expr(f"percentile(l_extendedprice, {hi_p})"), 6)
                   .alias("p_hi")))
    v = F.col("l_extendedprice")
    clipped = F.when(v < F.col("p_lo"), F.col("p_lo")) \
               .when(v > F.col("p_hi"), F.col("p_hi")).otherwise(v)
    return (lineitem.join(F.broadcast(bounds), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((v < F.col("p_lo")).cast("int")).alias("n_clip_lo"),
                 F.sum((v > F.col("p_hi")).cast("int")).alias("n_clip_hi"),
                 F.round(F.sum(v.cast("decimal(18,4)")).cast("double")
                         / F.count(F.lit(1)), 4).alias("raw_mean"),
                 F.round(F.sum(clipped.cast("decimal(18,6)")).cast("double")
                         / F.count(F.lit(1)), 4).alias("winsor_mean")))


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted by
    day-offset of later activity — the standard growth-analytics
    triangle. One window pass pins each user's cohort day (single
    shuffle on user_id), then a (cohort, offset) count whose output is
    |days|^2 rows regardless of input size."""
    w = Window.partitionBy("user_id")
    with_cohort = events.withColumn(
        "cohort_day", F.min(F.to_date("ts")).over(w))
    return (with_cohort
            .select("user_id", "cohort_day",
                    F.datediff(F.to_date("ts"), F.col("cohort_day"))
                    .alias("day_offset"))
            .distinct()
            .groupBy("cohort_day", "day_offset")
            .agg(F.count(F.lit(1)).alias("n_users")))


def geomean_udaf(events: DataFrame) -> DataFrame:
    """Custom aggregate via an Arrow-batched GROUPED_AGG pandas UDF —
    the engine's UDAF extension point (everything else in this module
    is built-ins; this demonstrates the escape hatch for aggregates
    Catalyst lacks). The input is sorted inside the UDF and reduced
    with math.fsum, so the result is independent of partitioning and
    row order; rounded before output like every float aggregate here.
    """
    import math

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np
        x = np.sort(v.to_numpy(dtype="float64"))
        x = x[x > 0]
        if not len(x):
            return float("nan")
        return float(math.exp(math.fsum(np.log(x)) / len(x)))

    # A GROUPED_AGG pandas UDF cannot share an agg with JVM aggregates;
    # the count runs in its own (cheap) aggregate and joins back on the
    # tiny group key.
    gm = (events.groupBy("event_type")
          .agg(F.round(geomean(F.col("value")), 6).alias("geomean_value")))
    n = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    return gm.join(F.broadcast(n), "event_type")


def regression_pack(lineitem) -> "DataFrame":
    """Per-group simple linear regression (y = extendedprice over
    x = quantity) from EXACT decimal moment sums.

    The built-in ``regr_slope``/``regr_r2`` accumulate double
    covariances whose value depends on partition/merge order; here the
    five moments (Σx, Σy, Σxy, Σx², Σy²) are summed in DECIMAL — exact,
    so partition-count-independent — and slope/intercept/r² are then a
    fixed-shape scalar double expression any IEEE engine evaluates
    identically. One partial+final hash aggregate, no extra shuffle.
    """
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = (lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy")))
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return m.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
         .alias("intercept"),
        F.round(cov_n * cov_n / (var_x * var_y), 6).alias("r2"))


def percentile_pack(events) -> "DataFrame":
    """Exact interpolated percentiles of ``value`` per event type.

    Spark's ``percentile`` (exact, sort-based within the aggregate) ==
    DuckDB/ANSI ``quantile_cont``. Exact percentiles at 100 TB mean a
    per-group sort — acceptable for bounded groups like these; for
    unbounded cardinality switch to ``approx_percentile`` (t-digest
    sketch, mergeable, one pass) and accept the error bound.
    """
    pcts = F.percentile(
        F.col("value"), F.array(F.lit(0.25), F.lit(0.5),
                                F.lit(0.75), F.lit(0.95)))
    return (events.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_rows"), pcts.alias("p"))
            .select("event_type", "n_rows",
                    F.round(F.col("p")[0], 4).alias("p25"),
                    F.round(F.col("p")[1], 4).alias("p50"),
                    F.round(F.col("p")[2], 4).alias("p75"),
                    F.round(F.col("p")[3], 4).alias("p95")))


def unpivot_measures(lineitem) -> "DataFrame":
    """Wide→long reshape (melt) of the four lineitem measures via the
    built-in ``unpivot`` — a zero-shuffle generator expression (each
    input row yields 4 rows in-place), then one hash aggregate per
    measure. The inverse of the pivot in ``pivot_status_by_priority``.
    """
    long = lineitem.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure", valueColumnName="val")
    return (long.groupBy("measure")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum(F.col("val").cast("decimal(18,4)")), 2)
                  .cast("double").alias("total")))


def _group_moments(events, masked=None):
    """Per-type exact decimal moments of ``value`` (n, Σx, Σx²) —
    shared by scaling/imputation; sums are decimal-exact so results
    are partition-order-independent."""
    x = (masked if masked is not None else F.col("value")) \
        .cast("decimal(12,2)")
    return (events.groupBy("event_type").agg(
        F.count(x).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx")))


def feature_scaling(events) -> "DataFrame":
    """Per-group z-score standardization (the feature-scaling pass an
    ML-prep pipeline runs before training): join each row to its
    group's broadcast moment row, scale with a fixed-shape double
    expression. One partial+final aggregate + one broadcast join —
    the fact stream itself never shuffles."""
    stats = _group_moments(events)
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sigma = F.sqrt((n * sxx - sx * sx) / (n * (n - F.lit(1.0))))
    return (events.join(F.broadcast(stats), "event_type")
            .select("event_id", "event_type",
                    F.round((F.col("value") - sx / n) / sigma, 4)
                     .alias("z")))


def impute_group_mean(events) -> "DataFrame":
    """Null imputation with the per-group mean (Spark has fillna only
    for global constants — the grouped variant is a broadcast-join
    compose). Nulls are synthesized deterministically (every 7th
    event) since the fixtures are dense; the mean comes from the
    surviving rows' exact decimal sums."""
    masked = F.when(F.col("event_id") % 7 == 0, F.lit(None)) \
        .otherwise(F.col("value"))
    stats = _group_moments(events, masked)
    mean = F.col("sx") / F.col("n")
    return (events.join(F.broadcast(stats), "event_type")
            .select("event_id", "event_type",
                    (F.col("event_id") % 7 == 0).alias("was_imputed"),
                    F.round(F.coalesce(masked, mean), 4).alias("value_filled")))


def hll_rollup(orders) -> "DataFrame":
    """Mergeable distinct-count rollup via Datasketches HLL: one
    sketch per month, merged into the grand total WITHOUT rescanning
    (``hll_union_agg``) — the scale pattern for incremental distinct
    users/customers where exact count-distinct would re-shuffle all
    history every refresh. Estimates are deterministic (no RNG) but
    engine-specific → rows-only check + tolerance tests
    (tests/test_approx_ops.py)."""
    monthly = (orders
               .groupBy(F.date_format("o_orderdate", "yyyy-MM")
                        .alias("month"))
               .agg(F.hll_sketch_agg("o_custkey").alias("sk"),
                    F.count(F.lit(1)).alias("n_orders")))
    per_month = monthly.select(
        "month", "n_orders",
        F.hll_sketch_estimate("sk").alias("approx_customers"))
    total = monthly.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
         .alias("merged_total_customers"))
    return per_month.crossJoin(F.broadcast(total))


def hll_portable_rollup(orders, b: int = 9) -> "DataFrame":
    """:func:`hll_rollup` with an ENGINE-PORTABLE HyperLogLog — the
    md5-derived-hash trick that made MinHash/SimHash oracle-checkable
    (r5) applied to the last remaining sketch family: every register
    value derives from ``portable_hash60`` (md5 low-60), so a second
    engine re-derives identical registers in SQL and the estimate stops
    being "approximate vs a twin" and becomes deterministically
    oracle-checked (the registry runs THIS variant; Datasketches
    ``hll_rollup`` stays the scale default — equivalence-of-accuracy
    pytest in tests/test_approx_ops.py).

    Classic Flajolet HLL, integer-exact where it matters:

    - 60-bit hash → low ``b`` bits index one of m=2^b registers, the
      remaining 51 bits give ρ = leading-zeros+1 via ``length(bin(w))``
      (exact integer math in both engines — no float log2 near powers
      of two);
    - the harmonic-mean denominator Σ 2^(−ρ_j) is scaled by 2^52 into
      a BIGINT sum (≤ m·2^52 < 2^63): bit-identical cross-engine, no
      summation-order noise;
    - the only floats are one division (numerator literal precomputed
      in Python and embedded in both engines), the small-range
      ``m·ln(m/V)`` correction, and a final round-2 — the documented
      tolerance class (registry.py, _PQ_CODES_ORACLE note).

    Merging is the register-wise max across months, replayed by simply
    re-aggregating the same per-value registers without the month key
    — the mergeability the rollup exists to demonstrate."""
    from s3_elasticsearch_data_pipeline_spark.operators.dedup import (
        portable_hash60)
    m = 1 << b
    wbits = 60 - b
    alpha_num = (0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << 52)
    h = portable_hash60(F.col("o_custkey").cast("string"))
    w = F.shiftright(h, b)
    hashed = (orders
              .select(F.date_format("o_orderdate", "yyyy-MM")
                      .alias("month"),
                      h.bitwiseAND(F.lit(m - 1)).alias("reg"),
                      F.when(w == 0, wbits + 1)
                      .otherwise(wbits + 1 - F.length(F.bin(w)))
                      .alias("rho"))
              .localCheckpoint(eager=False))  # reused by both rollups

    def estimate(regs):  # regs: (..., reg, r) one row per used register
        gcols = [c for c in regs.columns if c not in ("reg", "r")]
        pow_term = F.expr("shiftleft(CAST(1 AS BIGINT), 52 - r)")
        st = regs.groupBy(*gcols).agg(
            F.sum(pow_term).alias("sp"),
            F.count(F.lit(1)).alias("used"))
        v = F.lit(m) - F.col("used")
        s_total = F.col("sp") + v * F.lit(1 << 52)
        e_raw = F.lit(alpha_num) / s_total.cast("double")
        e = F.when((e_raw <= 2.5 * m) & (v > 0),
                   m * F.log(F.lit(float(m)) / v.cast("double"))
                   ).otherwise(e_raw)
        return st.select(*gcols, F.round(e, 2).alias("est"))

    monthly = estimate(hashed.groupBy("month", "reg")
                       .agg(F.max("rho").alias("r"))) \
        .withColumnRenamed("est", "approx_customers")
    total = estimate(hashed.groupBy("reg").agg(F.max("rho").alias("r"))) \
        .withColumnRenamed("est", "merged_total_customers")
    n_orders = (orders.groupBy(F.date_format("o_orderdate", "yyyy-MM")
                               .alias("month"))
                .agg(F.count(F.lit(1)).alias("n_orders")))
    return (n_orders.join(monthly, "month")
            .crossJoin(F.broadcast(total))
            .select("month", "n_orders", "approx_customers",
                    "merged_total_customers"))


def interarrival_grouped_map(events: DataFrame) -> DataFrame:
    """Per-user inter-arrival-time stats via ``applyInPandas`` — the
    grouped-MAP pandas extension point (one pandas frame per group in,
    one out), completing the UDF surface next to the grouped-agg UDAF
    (geomean_udaf), mapInPandas (multimodal) and the UDTF (chunking).

    Escape-hatch rules applied: groups are user-sized (bounded memory);
    the frame is sorted inside the UDF so the result is independent of
    partitioning and arrival order. Kept off the hot path — the same
    stats ARE expressible relationally (lag + percentile); the pandas
    body exists to prove the grouped-map plumbing with a
    deterministically checkable computation (oracle-checked).
    """

    import math

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # integer microseconds end-to-end: no float division → no
        # decimal-rounding boundary where engines can disagree
        t_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        gaps = t_us.sort_values().diff().dropna().sort_values().to_numpy()
        if len(gaps) == 0:
            return pd.DataFrame({
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_gap_us": [float("nan")],
                "max_gap_us": [0]})
        # ANSI quantile_cont interpolation (lo + f*(hi-lo)); on int
        # inputs with f ∈ {0, .5} the result is exact in any engine
        k = (len(gaps) - 1) * 0.5
        lo, hi = gaps[math.floor(k)], gaps[math.ceil(k)]
        med = lo + (k - math.floor(k)) * (hi - lo)
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "median_gap_us": [float(med)],
            "max_gap_us": [int(gaps[-1])]})

    return (events.select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandas(stats,
                           "user_id long, n_events long, "
                           "median_gap_us double, max_gap_us long"))


def rfm_segmentation(orders) -> "DataFrame":
    """RFM customer segmentation: quintile scores for recency (latest
    order), frequency (order count), monetary (exact decimal spend),
    combined into the classic 'champion/loyal/at-risk/other' buckets.
    One aggregate + three ntile windows over the per-customer rollup
    (customer-cardinality frame, cheap after the first shuffle)."""
    per_cust = (orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("spend")))
    r = F.ntile(5).over(Window.orderBy(F.col("last_order").desc(),
                                       F.col("o_custkey")))
    fm = F.ntile(5).over(Window.orderBy(F.col("n_orders").desc(),
                                        F.col("o_custkey")))
    m = F.ntile(5).over(Window.orderBy(F.col("spend").desc(),
                                       F.col("o_custkey")))
    scored = per_cust.select(
        "o_custkey", r.alias("r_score"), fm.alias("f_score"),
        m.alias("m_score"))
    segment = (F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2)
                      & (F.col("m_score") <= 2), "champion")
               .when((F.col("f_score") <= 2) & (F.col("m_score") <= 3),
                     "loyal")
               .when(F.col("r_score") >= 4, "at_risk")
               .otherwise("other"))
    return (scored.select("o_custkey", "r_score", "f_score", "m_score",
                          segment.alias("segment")))


def mom_growth(orders) -> "DataFrame":
    """Month-over-month revenue growth: monthly decimal-exact revenue,
    lag window for the previous month, growth ratio as a fixed-shape
    double expression (NULL for the first month). Monthly frame is
    tiny — the window costs nothing after the one aggregate shuffle."""
    monthly = (orders
               .groupBy(F.date_format("o_orderdate", "yyyy-MM")
                        .alias("month"))
               .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                     .alias("__rev"), F.count(F.lit(1)).alias("n_orders")))
    w = Window.orderBy("month")
    prev = F.lag("__rev").over(w)
    return monthly.select(
        "month", "n_orders",
        F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        F.round((F.col("__rev").cast("double") - prev.cast("double"))
                / prev.cast("double") * 100.0, 4).alias("mom_growth_pct"))


def outlier_mad(events) -> "DataFrame":
    """Robust outlier stats via median absolute deviation — the
    median/MAD twin of the mean/σ ``zscore_outliers`` (robust to the
    very outliers it hunts). Two exact-percentile passes per group
    (median of values, then median of absolute deviations), broadcast
    back; the threshold compare runs on raw doubles with the same
    fixed-shape expression the oracle uses."""
    med = (events.groupBy("event_type")
           .agg(F.percentile(F.col("value"), F.lit(0.5)).alias("med")))
    dev = (events.join(F.broadcast(med), "event_type")
           .withColumn("__ad", F.abs(F.col("value") - F.col("med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.first("med").alias("med"),
                F.percentile(F.col("__ad"), F.lit(0.5)).alias("mad")))
    flagged = (dev.drop("med")
               .join(F.broadcast(mad), "event_type")
               .withColumn("__is_out",
                           F.col("__ad") > F.lit(3.0) * F.lit(1.4826)
                           * F.col("mad")))
    return (flagged.groupBy("event_type")
            .agg(F.round(F.first("med"), 4).alias("median_value"),
                 F.round(F.first("mad"), 4).alias("mad"),
                 F.count(F.lit(1)).alias("n_rows"),
                 F.count_if(F.col("__is_out")).alias("n_outliers")))


def countmin_heavy_hitters(events: DataFrame, key: str = "user_id",
                           width: int = 64, depth: int = 4,
                           top_n: int = 20) -> DataFrame:
    """Count-min-sketch frequency estimates for the heaviest keys,
    expressed as pure relational algebra.

    The sketch is the classic d×w counter grid: each key increments one
    bucket per row via independent universal hashes
    ``((a·x + b) mod p) mod w`` (Carter-Wegman; p = 2^31 − 1). Building
    it is ONE hash aggregate over (row, bucket) — d·w counters total,
    mergeable across partitions/days by cell-wise addition, which is
    the whole point at 100 TB: the sketch is a few KB regardless of key
    cardinality, and historical sketches sum. The estimate for a key is
    the MIN over its d buckets (overestimates only — collisions add).

    The arithmetic hash (no engine-specific xxhash) makes the entire
    computation oracle-checkable in ANSI SQL bit-for-bit. The top-n
    keys to report are taken exactly (small per-group count) so the
    output is deterministic; the pytest bound checks est ≥ true count
    (one-sided CMS guarantee) and the ε·N overestimate bound.
    """
    p = 2_147_483_647
    hashes = [(2 * i + 1, 3 * i + 7) for i in range(depth)]
    rows = events.select(F.col(key).cast("long").alias("k"))

    def bucket(a: int, b: int):
        return (((F.lit(a) * F.col("k") + F.lit(b)) % F.lit(p))
                % F.lit(width))

    # one scan: the d buckets fan out in-place (posexplode), then one
    # partial+final hash aggregate builds the whole d×w grid
    sketch = (rows
              .select(F.posexplode(F.array(*[bucket(a, b)
                                             for a, b in hashes]))
                      .alias("row", "bucket"))
              .groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c")))

    top = (rows.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
           .orderBy(F.col("true_count").desc(), F.col("k"))
           .limit(top_n))
    # probe buckets fan out in-place too — a per-hash union would
    # re-run the top-n aggregate (and its events scan) d times
    probes = top.select(
        "k", "true_count",
        F.posexplode(F.array(*[bucket(a, b) for a, b in hashes]))
        .alias("row", "bucket"))
    return (probes.join(F.broadcast(sketch), ["row", "bucket"])
            .groupBy("k", "true_count")
            .agg(F.min("c").alias("cms_estimate"))
            .orderBy(F.col("true_count").desc(), F.col("k"))
            .select(F.col("k").alias(key), "true_count", "cms_estimate"))


def welch_ttest(events: DataFrame, group_a: str = "purchase",
                group_b: str = "click",
                value_col: str = "value") -> DataFrame:
    """Welch's unequal-variance t-test between two event groups — the
    A/B experimentation primitive (does `purchase` value differ from
    `click` value?).

    One partial+final hash aggregate computes n/Σx/Σx² per group with
    DECIMAL accumulation (order-independent), then the t-statistic and
    Welch–Satterthwaite degrees of freedom are a scalar projection over
    the two-row aggregate — nothing but the 6 moments ever leaves the
    executors, at any data size. Rounding uses floor(x·10⁶+0.5)/10⁶ so
    the DuckDB oracle (same IEEE ops) matches bit-for-bit.
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    stats = (events
             .where(F.col("event_type").isin(group_a, group_b))
             .groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(dec).alias("s"),
                  F.sum(dec * dec).alias("q")))

    def side(tag, alias):
        f = stats.where(F.col("event_type") == tag)
        return f.select(F.lit(1).alias("__j"),
                        F.col("n").alias(f"n_{alias}"),
                        F.col("s").cast("double").alias(f"s_{alias}"),
                        F.col("q").cast("double").alias(f"q_{alias}"))

    both = side(group_a, "a").join(side(group_b, "b"), "__j")
    n1, n2 = F.col("n_a"), F.col("n_b")
    m1 = F.col("s_a") / n1
    m2 = F.col("s_b") / n2
    # unbiased sample variance from the moments
    v1 = (F.col("q_a") - F.col("s_a") * F.col("s_a") / n1) / (n1 - 1)
    v2 = (F.col("q_b") - F.col("s_b") * F.col("s_b") / n2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                        + (v2 / n2) * (v2 / n2) / (n2 - 1))

    def round6(x):
        return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return both.select(
        F.lit(group_a).alias("group_a"), F.lit(group_b).alias("group_b"),
        n1.alias("n_a"), n2.alias("n_b"),
        round6(m1).alias("mean_a"), round6(m2).alias("mean_b"),
        round6(t).alias("t_stat"), round6(df).alias("welch_df"))


def chi2_independence(events: DataFrame) -> DataFrame:
    """Chi-square test of independence between event type and ISO
    weekday — "does activity mix shift by day?" as one relational plan.

    The contingency table is a single hash aggregate (|types|×7 cells
    regardless of data size); marginals re-aggregate the CELLS, not the
    raw data, so the fact table is scanned once. Expected counts
    e = row·col/N use exact integer products (counts), and each cell's
    (o−e)²/e contribution is floor-rounded to 6 digits BEFORE the final
    sum, which then runs in exact DECIMAL — the total is therefore
    independent of cell summation order, the trap that makes naive
    float chi-squares engine- and partitioning-dependent.
    """
    cells = (events
             .groupBy(F.col("event_type").alias("r"),
                      (F.weekday("ts") + 1).alias("c"))
             .agg(F.count(F.lit(1)).alias("o")))
    rt = cells.groupBy("r").agg(F.sum("o").alias("rn"))
    ct = cells.groupBy("c").agg(F.sum("o").alias("cn"))
    n = cells.agg(F.sum("o").alias("nn"))
    e = (F.col("rn") * F.col("cn")).cast("double") / F.col("nn")
    contrib = ((F.col("o") - e) * (F.col("o") - e)) / e
    contrib6 = F.floor(contrib * F.lit(1000000.0) + F.lit(0.5)) \
        / F.lit(1000000.0)
    scored = (cells.join(F.broadcast(rt), "r").join(F.broadcast(ct), "c")
              .crossJoin(F.broadcast(n))
              .select(contrib6.cast("decimal(18,6)").alias("contrib")))
    return (scored.agg(
        F.sum("contrib").cast("double").alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"))
        .crossJoin(F.broadcast(
            rt.agg(F.count(F.lit(1)).alias("__r"))
              .crossJoin(ct.agg(F.count(F.lit(1)).alias("__c")))
              .select(((F.col("__r") - 1) * (F.col("__c") - 1))
                      .alias("dof"))))
        .select("chi2", "dof", "n_cells"))


def abc_classification(lineitem: DataFrame) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, labelled
    A/B/C at 80% / 95% cumulative revenue share.

    The heavy scan is ONE hash aggregate (lineitem → per-part revenue,
    exact decimal); the cumulative window then runs over dimension-
    sized data (one row per part — thousands, not billions — so the
    single-partition ordered window is deliberate and cheap). The
    share divide happens in identical IEEE double ops on both engines;
    the label compares the floor-rounded share so an engine cannot
    disagree at a bucket boundary.
    """
    revenue = (F.col("l_extendedprice").cast("decimal(12,2)")
               * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    per_part = (lineitem.groupBy("l_partkey")
                .agg(F.sum(revenue).alias("rev")))
    w = Window.orderBy(F.col("rev").desc(), F.col("l_partkey"))
    tot = per_part.agg(F.sum("rev").alias("tot"))
    share = (F.sum("rev").over(w).cast("double")
             / F.col("tot").cast("double"))
    rounded = F.floor(share * 1000000.0 + F.lit(0.5)) / 1000000.0
    return (per_part.crossJoin(F.broadcast(tot))
            .select("l_partkey",
                    F.col("rev").cast("double").alias("revenue"),
                    rounded.alias("cum_share"))
            .withColumn("abc_class",
                        F.when(F.col("cum_share") <= 0.80, F.lit("A"))
                         .when(F.col("cum_share") <= 0.95, F.lit("B"))
                         .otherwise(F.lit("C"))))


def skyline_pareto(part: DataFrame) -> DataFrame:
    """Pareto frontier (skyline) of parts: minimize retail price,
    maximize size; a part survives iff nothing is at-most-as-expensive
    AND at-least-as-large with strict improvement in one dimension.

    Naive skyline is a quadratic self-join; here the dominance test
    collapses to a running max over distinct prices: (price, size) is
    on the frontier iff size is the max at its price AND strictly
    beats the max size over all strictly cheaper prices. The groupBy
    shrinks the input to distinct-price cardinality before the ordered
    window, which is the scale trick — the window never sees raw rows.
    """
    per_price = (part.groupBy(F.col("p_retailprice").alias("price"))
                 .agg(F.max("p_size").alias("mx")))
    w = (Window.orderBy("price")
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (per_price
                .withColumn("prev_mx", F.max("mx").over(w))
                .where(F.col("prev_mx").isNull()
                       | (F.col("mx") > F.col("prev_mx"))))
    return (part.join(F.broadcast(frontier),
                      (part.p_retailprice == frontier.price)
                      & (part.p_size == frontier.mx))
            .select("p_partkey", "p_retailprice", "p_size"))


def higher_moments(events: DataFrame) -> DataFrame:
    """Skewness and excess kurtosis per event type from exact decimal
    power sums (Σx..Σx⁴) — one hash aggregate, mergeable across
    partitions, then scalar double math identical on any engine.

    Values carry two decimal digits, so x²/x³/x⁴ stay exact at scales
    4/6/8 and every partial sum is an integer-scaled decimal: the
    moment sums are bit-identical regardless of partitioning. The
    derived g1/g2 use the population (biased) convention.
    """
    x = F.col("value").cast("decimal(14,2)")
    x2 = (x * x).cast("decimal(18,4)")
    x3 = (x2 * x).cast("decimal(22,6)")
    x4 = (x2 * x2).cast("decimal(26,8)")
    agg = (events.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(x).cast("double").alias("s1"),
                F.sum(x2).cast("double").alias("s2"),
                F.sum(x3).cast("double").alias("s3"),
                F.sum(x4).cast("double").alias("s4")))
    n = F.col("n").cast("double")
    m = F.col("s1") / n
    m2 = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * F.col("s2") / n + 2 * m * m * m
    m4 = (F.col("s4") / n - 4 * m * F.col("s3") / n
          + 6 * m * m * F.col("s2") / n - 3 * m * m * m * m)
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return agg.select(
        "event_type", "n",
        stab(m).alias("mean_value"),
        stab(F.sqrt(m2)).alias("stddev_pop"),
        stab(m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        stab(m4 / (m2 * m2) - 3).alias("excess_kurtosis"))


def bloom_filter_probe(orders: DataFrame, lineitem: DataFrame,
                       n_bits: int = 65536, depth: int = 3) -> DataFrame:
    """A Bloom filter built and probed as relational algebra — the
    runtime-filter pattern (pre-reduce a big probe side against a
    compact membership sketch before the real join) made explicit and
    oracle-checkable.

    Build: hash each build-side key (orders with status 'F') into
    ``depth`` bit positions via Carter-Wegman hashes, fold into 32-bit
    words with bit_or — ONE hash aggregate, ≤ n_bits/32 rows, a few KB
    regardless of build cardinality (and mergeable cell-wise, like any
    sketch). Probe: each lineitem key fans out its d probe bits
    in-place, broadcast-joins the word table, and passes iff all d
    bits are set. The output compares bloom verdicts against the exact
    semi-join: false positives > 0, false negatives = 0 (the one-sided
    Bloom guarantee, asserted in pytest).
    """
    p = 2_147_483_647
    hashes = [(2 * i + 3, 5 * i + 11) for i in range(depth)]

    def bit_pos(a: int, b: int, key):
        return ((F.lit(a) * key + F.lit(b)) % F.lit(p)) % F.lit(n_bits)

    build = orders.where(F.col("o_orderstatus") == "F") \
        .select(F.col("o_orderkey").alias("k"))
    bits = F.array(*[bit_pos(a, b, F.col("k")) for a, b in hashes])
    words = (build
             .select(F.explode(bits).alias("pos"))
             .select((F.col("pos") / 32).cast("long").alias("word"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(pos % 32 AS INT))").alias("mask"))
             .groupBy("word")
             .agg(F.expr("bit_or(mask)").alias("bitmap")))

    probe_keys = lineitem.select(F.col("l_orderkey").alias("k")).distinct()
    probes = probe_keys.select(
        "k", F.posexplode(F.array(*[bit_pos(a, b, F.col("k"))
                                    for a, b in hashes])).alias("i", "pos"))
    hit = (probes
           .select("k", (F.col("pos") / 32).cast("long").alias("word"),
                   F.expr("shiftleft(CAST(1 AS BIGINT), "
                          "CAST(pos % 32 AS INT))").alias("mask"))
           .join(F.broadcast(words), "word", "left")
           .groupBy("k")
           .agg(F.min(
               F.when(F.col("bitmap").isNotNull()
                      & ((F.col("bitmap").bitwiseAND(F.col("mask"))) != 0),
                      F.lit(1)).otherwise(F.lit(0))).alias("bloom_pass")))
    truth = (probe_keys.join(build.distinct(),
                             probe_keys.k == build.k, "left_semi")
             .select(F.col("k"), F.lit(1).alias("is_member")))
    return (hit.join(truth, "k", "left")
            .select("k", "bloom_pass",
                    F.coalesce("is_member", F.lit(0)).alias("is_member"))
            .groupBy("bloom_pass", "is_member")
            .agg(F.count(F.lit(1)).alias("n_keys")))


def equidepth_histogram(lineitem: DataFrame) -> DataFrame:
    """Equi-depth (quartile) histogram of extended price: exact
    interpolated quartile boundaries (one aggregate), broadcast back
    over the scan for the per-bucket counts — two passes, no global
    sort, no single-partition ntile.
    """
    q = lineitem.agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("q1"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("q2"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("q3"))
    x = F.col("l_extendedprice")
    bucket = (F.when(x <= F.col("q1"), F.lit(1))
               .when(x <= F.col("q2"), F.lit(2))
               .when(x <= F.col("q3"), F.lit(3))
               .otherwise(F.lit(4)))
    return (lineitem.select("l_extendedprice")
            .crossJoin(F.broadcast(q))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(x).alias("lo"),
                 F.max(x).alias("hi")))


def mann_whitney_u(events: DataFrame, group_a: str = "purchase",
                   group_b: str = "click") -> DataFrame:
    """Mann–Whitney U rank-sum test (normal approximation, tie
    correction) between two event types — the nonparametric sibling of
    welch_ttest.

    Ranks are never assigned per row: the input reduces to per-distinct-
    value counts first (2-decimal values → bounded cardinality), average
    ranks come from a running count over that reduced frame, and the
    rank sum folds in exact 0.5-granular decimals — so the statistic is
    bit-identical at any partitioning, and the single-partition window
    only ever sees distinct values, not rows.
    """
    two = events.where(F.col("event_type").isin(group_a, group_b))
    vals = (two.groupBy(F.col("value").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"),
                 F.count(F.when(F.col("event_type") == group_a, 1))
                  .alias("ca")))
    w = (Window.orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    ranked = vals.withColumn("cum", F.sum("c").over(w))
    # avg rank of a tie block ending at cum with size c: cum − c + (c+1)/2
    avg_rank = (F.col("cum") - F.col("c")
                + (F.col("c") + 1).cast("decimal(18,1)") / 2)
    agg = ranked.agg(
        F.sum(F.col("ca").cast("decimal(18,1)")
              * avg_rank.cast("decimal(18,1)")).alias("rank_sum_a"),
        F.sum("ca").alias("n_a"),
        F.sum(F.col("c") - F.col("ca")).alias("n_b"),
        # cube in decimal — a long cube overflows once a tie block
        # passes ~2 M rows, exactly the 100 TB regime
        F.sum(F.col("c").cast("decimal(12,0)")
              * F.col("c").cast("decimal(12,0)")
              * F.col("c").cast("decimal(12,0)")
              - F.col("c").cast("decimal(12,0)")).alias("ties"))
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    n = n_a + n_b
    u = (F.col("rank_sum_a").cast("double")
         - n_a * (n_a + 1) / 2)
    mu = n_a * n_b / 2
    var = (n_a * n_b / 12
           * ((n + 1) - F.col("ties").cast("double") / (n * (n - 1))))
    z = (u - mu) / F.sqrt(var)
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return agg.select(
        F.col("n_a"), F.col("n_b"),
        F.col("rank_sum_a").cast("double").alias("rank_sum_a"),
        u.alias("u_stat"), stab(z).alias("z_score"))


def keyset_page(orders: DataFrame, page_size: int = 100,
                page: int = 3) -> DataFrame:
    """Keyset (cursor) pagination as relational algebra — the engine
    form of the reference's ES ``search_after`` scan
    (``ID-based-transfer.py:111-157``): page N is fetched by a cursor
    PREDICATE on the total order (o_totalprice DESC, o_orderkey), not
    by OFFSET.

    The cursor row (last row of page N−1) is itself computed
    relationally — top-(N−1)·size, then the order-extreme of that tiny
    frame — and broadcast into the filter, so the page query is a
    pruned top-k: no OFFSET scan that re-reads an ever-growing prefix,
    which is the whole point of keyset pagination at scale.
    """
    skip = (page - 1) * page_size
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    cursor = (base
              .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
              .limit(skip)
              .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").desc())
              .limit(1)
              .select(F.col("o_totalprice").alias("cur_price"),
                      F.col("o_orderkey").alias("cur_key")))
    after_cursor = ((F.col("o_totalprice") < F.col("cur_price"))
                    | ((F.col("o_totalprice") == F.col("cur_price"))
                       & (F.col("o_orderkey") > F.col("cur_key"))))
    return (base.crossJoin(F.broadcast(cursor))
            .where(after_cursor)
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(page_size)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


def seasonal_anomalies(events: DataFrame,
                       z_threshold: float = 3.0) -> DataFrame:
    """Seasonal-baseline anomaly counts: each (ISO weekday × hour)
    cell gets a mean/variance baseline from exact decimal moments;
    events deviating more than z·σ from their cell's baseline are
    anomalies. The baseline is 168 rows (broadcast back); the flag
    compares squared deviation against z²·σ² — same IEEE ops on any
    engine, no sqrt at the row level.
    """
    cell = [(F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hour")]
    x = F.col("value").cast("decimal(18,2)")
    base = (events.groupBy(*cell)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(x).cast("double").alias("s"),
                 F.sum((x * x).cast("decimal(38,4)")).cast("double")
                  .alias("q")))
    nd = F.col("n").cast("double")
    mean = F.col("s") / nd
    var = F.col("q") / nd - mean * mean
    base = base.select("dow", "hour", "n", mean.alias("mean_v"),
                       var.alias("var_v"))
    dev = F.col("value") - F.col("mean_v")
    is_anom = (dev * dev) > (F.lit(z_threshold * z_threshold)
                             * F.col("var_v"))
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return (events
            .select(*cell, "value")
            .join(F.broadcast(base), ["dow", "hour"])
            .groupBy("dow", "hour")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.when(is_anom, 1).otherwise(0)).alias("n_anomalies"),
                 stab(F.max("mean_v")).alias("mean_v"),
                 stab(F.max("var_v")).alias("var_v")))


def ks_test(events: DataFrame, group_a: str = "purchase",
            group_b: str = "click") -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between two event types:
    the max ECDF gap, its location, and the 5% decision — completing
    the hypothesis-test family (Welch t, chi², Mann–Whitney U).

    Same scale discipline as mann_whitney_u: rows reduce to
    per-distinct-value counts before any ordered work, ECDFs are
    running integer counts over that reduced frame, and the gap is one
    fixed-shape double expression — identical on any engine; the max
    and its (min-value) location are exact aggregates.
    """
    two = events.where(F.col("event_type").isin(group_a, group_b))
    vals = (two.groupBy(F.col("value").alias("v"))
            .agg(F.count(F.when(F.col("event_type") == group_a, 1))
                  .alias("ca"),
                 F.count(F.when(F.col("event_type") == group_b, 1))
                  .alias("cb")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = vals.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    ecdf = (vals
            .withColumn("cum_a", F.sum("ca").over(w))
            .withColumn("cum_b", F.sum("cb").over(w))
            .crossJoin(F.broadcast(tot)))
    gap = F.abs(F.col("cum_a").cast("double") / F.col("n_a").cast("double")
                - F.col("cum_b").cast("double") / F.col("n_b").cast("double"))
    scored = ecdf.select("v", "n_a", "n_b", gap.alias("d"))
    peak = scored.agg(F.max("d").alias("ks_raw"),
                      F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"))
    at_peak = (scored.select("v", "d")
               .join(F.broadcast(peak.select("ks_raw")),
                     F.col("d") == F.col("ks_raw"))
               .agg(F.min("v").alias("ks_location")))
    n_a = F.col("n_a").cast("double")
    n_b = F.col("n_b").cast("double")
    crit = F.lit(1.3581015157406195) * F.sqrt((n_a + n_b) / (n_a * n_b))
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return (peak.crossJoin(at_peak)
            .select("n_a", "n_b",
                    stab(F.col("ks_raw")).alias("ks_stat"),
                    "ks_location",
                    (F.col("ks_raw") > crit).cast("int").alias("reject_05")))


def type_entropy(events: DataFrame) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (0 = monotone user, ln(4) ≈ 1.386 =
    uniform over four types). Two hash aggregates; each −p·ln p term
    is floor-stabilized then summed in exact decimal, so the entropy
    is bit-identical at any partitioning."""
    per = (events.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("c")))
    tot = per.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = (F.floor(p * F.log(p) * 1000000000.0 + F.lit(0.5))
            / 1000000000.0).cast("decimal(18,9)")
    return (per.join(tot, "user_id")
            .groupBy("user_id")
            .agg(F.max("n").alias("n_events"),
                 F.count(F.lit(1)).alias("n_types"),
                 F.floor((-F.sum(term)).cast("double") * 1000000.0
                         + F.lit(0.5)).cast("double").alias("_t"))
            .select("user_id", "n_events", "n_types",
                    (F.col("_t") / 1000000.0).alias("entropy")))


def gini_concentration(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Gini coefficient of order-value concentration per market
    segment — the inequality/concentration metric, from the
    rank-weighted form G = Σ(2i − n − 1)·x_i / (n·Σx) over values
    sorted ascending within each segment.

    The window partitions by segment (shuffle-parallel); the
    rank-weighted terms are exact decimals, so both sums are
    order-independent; the final ratio is one stabilized double op.
    """
    seg = (orders.join(F.broadcast(customer),
                       orders.o_custkey == customer.c_custkey)
           .select("c_mktsegment",
                   F.col("o_totalprice").cast("decimal(12,2)").alias("x"),
                   "o_orderkey"))
    w = Window.partitionBy("c_mktsegment").orderBy("x", "o_orderkey")
    i = F.row_number().over(w)
    ranked = seg.select(
        "c_mktsegment", "x",
        ((2 * i).cast("decimal(18,0)")).alias("two_i"))
    agg = (ranked.groupBy("c_mktsegment")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.sum((F.col("two_i") * F.col("x")).cast("decimal(38,2)"))
                 .alias("swx")))
    n = F.col("n").cast("double")
    gini = ((F.col("swx").cast("double")
             - (n + 1) * F.col("sx").cast("double"))
            / (n * F.col("sx").cast("double")))
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return agg.select("c_mktsegment", "n",
                      F.round(F.col("sx"), 2).cast("double").alias("total"),
                      stab(gini).alias("gini"))


def kaplan_meier(events: DataFrame, horizon_days: int = 60) -> DataFrame:
    """Kaplan–Meier survival curve for signup → first-purchase
    conversion (right-censored at each user's last observed event).

    Per-user durations are two aggregates; the risk table reduces to
    one row per distinct day, so the ordered survival product runs
    over a dimension-sized frame. The product is computed as
    exp(Σ ln(1 − d/n)) with 9dp-rounded decimal accumulation — the
    same ln discipline as the LM scorers, so the curve is
    engine-identical.
    """
    per_user = (events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
         .alias("signup_ts"),
        F.max("ts").alias("last_ts")))
    first_purchase = (events.where(F.col("event_type") == "purchase")
                      .groupBy("user_id")
                      .agg(F.min("ts").alias("purchase_ts")))
    base = (per_user.where(F.col("signup_ts").isNotNull())
            .join(first_purchase, "user_id", "left")
            .select(
                "user_id",
                F.when(F.col("purchase_ts") >= F.col("signup_ts"),
                       F.datediff("purchase_ts", "signup_ts"))
                 .alias("event_day"),
                F.datediff("last_ts", "signup_ts").alias("censor_day")))
    # duration observed: event day if converted, else censoring day
    obs = base.select(
        F.coalesce("event_day", "censor_day").alias("t"),
        F.col("event_day").isNotNull().cast("int").alias("converted"))
    risk = (obs.where(F.col("t") <= horizon_days)
            .groupBy("t")
            .agg(F.sum("converted").alias("d"),
                 F.count(F.lit(1)).alias("leaving")))
    n_total = obs.agg(F.count(F.lit(1)).alias("n0"))
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    tbl = (risk.crossJoin(F.broadcast(n_total))
           .withColumn("at_risk",
                       F.col("n0") - F.coalesce(F.sum("leaving").over(w),
                                                F.lit(0)))
           # d == at_risk would be ln(0): survival hits exactly 0 and
           # the curve ends — excluded on both engines identically
           .where((F.col("d") > 0) & (F.col("d") < F.col("at_risk"))))
    term = (F.floor(
        F.log(1 - F.col("d").cast("double") / F.col("at_risk").cast("double"))
        * 1000000000.0 + F.lit(0.5)) / 1000000000.0).cast("decimal(18,9)")
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return (tbl.withColumn("logsum", F.sum(term).over(wc))
            .select("t", "d", "at_risk",
                    stab(F.exp(F.col("logsum").cast("double")))
                    .alias("survival")))


def market_basket(lineitem: DataFrame, min_pair_count: int = 2,
                  top_n: int = 100) -> DataFrame:
    """Association rules over order baskets: support / confidence /
    lift for part pairs that co-occur in the same order.

    The pair space is generated by a self equi-join on the order key
    with ``part_a < part_b`` — per-basket-quadratic but bounded by the
    basket size (≤7 lines in this schema), so the join output is a
    small constant multiple of the fact table at any scale. Everything
    after is hash aggregation; the per-item counts and the single-row
    order total join back in (AQE broadcasts both). No collect, one
    lazy plan. Ranked by the integer pair count (part keys as
    tiebreak) so the top-n cut is engine-independent.

    Extends the reference's aggregate surface
    (``ID-based-transfer.py:90-109`` counts per partition; this counts
    per co-occurrence pair).
    """
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    baskets = lineitem.select("l_orderkey", "l_partkey").distinct()
    totals = baskets.agg(
        F.count_distinct("l_orderkey").alias("n_orders"))
    item_cnt = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (a.join(b, F.col("a.l_orderkey") == F.col("b.l_orderkey"))
             .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
             .groupBy(F.col("a.l_partkey").alias("part_a"),
                      F.col("b.l_partkey").alias("part_b"))
             .agg(F.count(F.lit(1)).alias("pair_cnt"))
             .where(F.col("pair_cnt") >= min_pair_count))
    ca = item_cnt.select(F.col("l_partkey").alias("part_a"),
                         F.col("cnt").alias("cnt_a"))
    cb = item_cnt.select(F.col("l_partkey").alias("part_b"),
                         F.col("cnt").alias("cnt_b"))
    enriched = (pairs.join(ca, "part_a").join(cb, "part_b")
                .crossJoin(totals))
    return (enriched
            .select("part_a", "part_b", "pair_cnt",
                    stab(F.col("pair_cnt") / F.col("n_orders"))
                    .alias("support"),
                    stab(F.col("pair_cnt") / F.col("cnt_a"))
                    .alias("confidence"),
                    stab(F.col("pair_cnt") * F.col("n_orders")
                         / (F.col("cnt_a") * F.col("cnt_b")))
                    .alias("lift"))
            .orderBy(F.col("pair_cnt").desc(), "part_a", "part_b")
            .limit(top_n))


def markov_transitions(events: DataFrame) -> DataFrame:
    """Second-order Markov chain over per-user event sequences: for
    every bigram state ``(prev, cur)`` the distribution of the next
    event type, with row-normalized probabilities — the next-action
    model one order deeper than ``event_transitions`` (which counts
    first-order pairs only).

    ONE partitioned window pass produces both the lagged and the led
    neighbor (same shuffle, same sort — Catalyst fuses the two
    functions into a single Window node), then a hash aggregate on the
    25³-bounded state space and a per-state window sum for the
    normalizer; the integer count ratio is stabilized to 6 decimals
    so it is summation-order-independent.
    """
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = events.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("cur_type"),
        F.lead("event_type").over(w).alias("next_type"))
    trans = (tri.where(F.col("prev_type").isNotNull()
                       & F.col("next_type").isNotNull())
             .groupBy("prev_type", "cur_type", "next_type")
             .agg(F.count(F.lit(1)).alias("n")))
    per_state = Window.partitionBy("prev_type", "cur_type")
    return trans.select(
        "prev_type", "cur_type", "next_type", "n",
        stab(F.col("n") / F.sum("n").over(per_state)).alias("prob"))


def correlation_matrix(lineitem: DataFrame) -> DataFrame:
    """Pairwise Pearson correlations among the lineitem measures, as
    (col_a, col_b, corr) rows — the EDA primitive, computed from ONE
    aggregate pass of exact decimal power sums (no per-pair rescan,
    no float accumulation): n, Σx, Σx², and Σxy for all 6 pairs in a
    single hash aggregate, then the correlation formula as a scalar
    projection over the one-row result, floor-stabilized.
    """
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    d = {c: F.col(c).cast("decimal(18,4)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs.append(F.sum(d[c]).alias(f"s_{c}"))
        aggs.append(F.sum((d[c] * d[c]).cast("decimal(38,8)"))
                    .alias(f"q_{c}"))
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            aggs.append(F.sum((d[ca] * d[cb]).cast("decimal(38,8)"))
                        .alias(f"x_{ca}_{cb}"))
    # n < 2 → correlation undefined; emit nothing rather than 6 null
    # rows (the empty-partition mid-pipeline case)
    m = lineitem.agg(*aggs).where(F.col("n") >= 2)
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    n = F.col("n").cast("double")
    pair_rows = []
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            sx = F.col(f"s_{ca}").cast("double")
            sy = F.col(f"s_{cb}").cast("double")
            qx = F.col(f"q_{ca}").cast("double")
            qy = F.col(f"q_{cb}").cast("double")
            xy = F.col(f"x_{ca}_{cb}").cast("double")
            # zero-variance guard: denominator 0 → corr undefined (NULL)
            # in BOTH twins, not engine-dependent inf/NaN vs NULL
            denom2 = (n * qx - sx * sx) * (n * qy - sy * sy)
            corr = F.when(denom2 > 0,
                          (n * xy - sx * sy) / F.sqrt(denom2))
            pair_rows.append(F.struct(F.lit(ca).alias("col_a"),
                                      F.lit(cb).alias("col_b"),
                                      stab(corr).alias("corr")))
    return m.select(F.inline(F.array(*pair_rows)))
