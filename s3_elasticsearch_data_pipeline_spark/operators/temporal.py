"""Temporal join operators Spark lacks natively (M4 extension surface):
as-of join and range join, composed from built-in operators.

Neither exists in the reference (its join surface is semi/anti/full-
outer on one key — SURVEY.md §2.4); they are standard requirements for
event/timeseries analytics, so the engine provides them as first-class
composable operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: tuple[str, ...] = (),
              strict: bool = False) -> DataFrame:
    """As-of join: each left row gets the latest right row of the same
    ``key`` with ``right_ts <= left_ts`` (``<`` when ``strict``).

    Physical design — the union-and-carry pattern, NOT a range
    cross-join: tag both inputs, union, single hash shuffle on ``key``,
    sort by time within partition, and carry the most recent right-side
    values forward with ``last(..., ignorenulls)``. Cost is one shuffle
    + one sort over |L|+|R| rows — the same shape ``pd.merge_asof``
    has single-node, but distributed. No Python in the path.

    Ties (equal timestamps, non-strict): the right row at the same
    instant is visible to the left row — matching ``merge_asof``'s
    default and DuckDB's ``ASOF JOIN >=``.
    """
    carried = [f"__r_{c}" for c in right_cols]
    l_tag = (left.withColumn("__is_left", F.lit(1))
             .withColumn("__t", F.col(left_ts))
             .withColumn("__tag", F.lit(1)))
    r_tag = (right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)])
        .withColumn("__is_left", F.lit(0))
        .withColumn("__tag", F.lit(0)))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(
                (f.name, f.dataType) for f in left.schema.fields)[c]))
    for a in carried:
        if a not in l_tag.columns:
            l_tag = l_tag.withColumn(a, F.lit(None).cast(dict(
                (f.name, f.dataType) for f in r_tag.schema.fields)[a]))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # Within (key), ordered by time with right rows first at equal
    # timestamps (strict=False) or left rows first (strict=True), carry
    # the last non-null right-side values forward.
    tag_order = F.col("__tag").asc() if not strict else F.col("__tag").desc()
    order = [F.col("__t").asc(), tag_order]
    if carried:
        # deterministic winner among right rows sharing a timestamp:
        # the greatest first carried column is the one carried forward
        order.append(F.col(carried[0]).asc_nulls_first())
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned
    for c, a in zip(right_cols, carried):
        out = out.withColumn(a, F.last(F.col(a), ignorenulls=True).over(w))
    return (out.where(F.col("__is_left") == 1)
            .drop("__is_left", "__tag", "__t")
            .withColumnsRenamed({a: f"asof_{c}"
                                 for c, a in zip(right_cols, carried)}))


def scd2_history(events: DataFrame, key: str = "user_id",
                 attr: str = "event_type", ts: str = "ts",
                 tiebreak: str = "event_id") -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    key's attribute timeline into effective-dated versions.

    Consecutive rows with the same ``attr`` value merge into one
    version; a change opens a new version. Output one row per version
    with ``effective_from`` / ``effective_to`` (null = still current)
    and an ``is_current`` flag — the standard warehouse dimension shape
    the reference's append-only parquet layout cannot express
    (cf. ``Partition-script.py:34-38``, which only appends).

    Physical design: gaps-and-islands with two window passes, both
    partitioned by ``key`` — one hash shuffle total. The follow-up
    group-by on (key, run) and the LEAD over versions reuse the same
    partitioning (hash on ``key`` satisfies any clustering that
    includes it), so at 100 TB this is a single exchange of the events
    table, no matter how many versions per key.

    Ordering within a key is made total with ``tiebreak`` so equal
    timestamps collapse deterministically.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    changed = F.when(
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)),
        1).otherwise(0)
    runs = (events
            .withColumn("__chg", changed)
            .withColumn("__run", F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    versions = (runs.groupBy(key, "__run")
                .agg(F.first(attr).alias(attr),
                     F.min(ts).alias("effective_from"),
                     F.count(F.lit(1)).alias("n_events")))
    wv = Window.partitionBy(key).orderBy("effective_from", "__run")
    return (versions
            .withColumn("effective_to", F.lead("effective_from").over(wv))
            .withColumn("is_current",
                        F.col("effective_to").isNull().cast("int"))
            .select(F.col(key), F.col(attr),
                    "effective_from", "effective_to",
                    "n_events", "is_current"))


def range_join(facts: DataFrame, ranges: DataFrame,
               value_col: str, lo_col: str = "lo", hi_col: str = "hi",
               how: str = "inner") -> DataFrame:
    """Range (interval) join: match each fact row to the range rows with
    ``lo <= value < hi``.

    The ranges side is a dimension (tiers, buckets, SLAs) — small by
    construction — so the join is an explicit broadcast nested-loop
    with a range predicate: the fact side streams through untouched, no
    shuffle. For the rare big-big interval join, bucketize both sides
    to a common grid and equi-join on the bucket first.
    """
    pred = ((F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col)))
    return facts.join(F.broadcast(ranges), pred, how)


def gapfill_daily(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "user_id",
                  value_col: str = "value") -> DataFrame:
    """Calendar gap-fill + LOCF: a dense daily grid per key over the
    globally observed day span, missing days filled with a zero count
    and the last observed daily mean carried forward
    (timeseries resampling — the hypertable ``time_bucket_gapfill`` /
    ``locf`` shape, rebuilt as DataFrame algebra).

    Physical design: the day spine is ``sequence(min_day, max_day)``
    exploded from a ONE-ROW global aggregate — a broadcast cross join
    against the distinct-key frame, never a driver loop. The actual
    daily aggregate shuffles once on (key, day); the spine left-join
    is a second co-partitioned shuffle on the same key pair, and LOCF
    is a window ``last(ignorenulls)`` over the already-sorted
    partitions. Day counts are bounded (span ≤ a few thousand), so the
    grid is |keys| × span — linear in keys, never quadratic in rows.
    """
    day = F.to_date(F.col(ts_col))
    daily = (events
             .groupBy(F.col(key_col).alias("key"), day.alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  # decimal sum / count, not avg(): exact accumulation →
                  # result independent of partitioning and merge order.
                  # floor(x*1e4+0.5)/1e4, not F.round: the quotient can
                  # land exactly on a half-way point (e.g. 539.93/8),
                  # where Spark's BigDecimal HALF_UP and DuckDB's
                  # float-scaled round() disagree by 1 ulp — this form
                  # runs the same IEEE ops on both engines
                  (F.floor((F.sum(F.col(value_col).cast("decimal(12,2)"))
                            .cast("double") / F.count(F.lit(1)))
                           * F.lit(10000.0) + F.lit(0.5))
                   / F.lit(10000.0)).alias("day_avg")))
    span = F.broadcast(events.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")))
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = (keys.crossJoin(span)
             .select("key", F.explode(
                 F.sequence(F.col("d0"), F.col("d1"))).alias("day")))
    w = (Window.partitionBy("key").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(daily, ["key", "day"], "left")
            .select("key", "day",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.last("day_avg", ignorenulls=True).over(w)
                     .alias("locf_avg")))


def cogroup_asof_pandas(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """As-of attribution via cogrouped ``applyInPandas`` — the last of
    the pandas extension points (grouped-agg, grouped-map, mapInPandas,
    UDTF, cogroup): both sides shuffle once on the key, and each user's
    (purchases, views) frame pair meets in one ``pd.merge_asof``.

    The relational union-and-carry ``asof_join`` above is the hot-path
    implementation; this exists for per-key logic a window can't
    express (bespoke matching, model scoring against history, ...) and
    is oracle-checked to agree with the relational semantics.
    Timestamps travel as integer microseconds end-to-end (exact, no
    float rounding boundary); ties break to the highest view event_id,
    matching merge_asof's last-row-wins on a (ts, event_id) sort.
    """
    import pandas as pd

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=["event_id", "user_id",
                                         "purchase_us", "view_event_id",
                                         "view_value"])
        l = l.assign(
            purchase_us=l["ts"].astype("datetime64[us]").astype("int64"))
        out = l[["event_id", "user_id", "purchase_us"]] \
            .sort_values(["purchase_us", "event_id"])
        if len(r) == 0:
            return out.assign(view_event_id=pd.Series(dtype="Int64"),
                              view_value=pd.Series(dtype="float64"))
        r = (r.assign(t_us=r["ts"].astype("datetime64[us]").astype("int64"))
             .rename(columns={"event_id": "view_event_id",
                              "value": "view_value"})
             .sort_values(["t_us", "view_event_id"]))
        merged = pd.merge_asof(
            out, r[["t_us", "view_event_id", "view_value"]],
            left_on="purchase_us", right_on="t_us", direction="backward")
        merged["view_event_id"] = merged["view_event_id"].astype("Int64")
        return merged.drop(columns=["t_us"])

    return (purchases.groupBy("user_id")
            .cogroup(views.groupBy("user_id"))
            .applyInPandas(merge,
                           "event_id long, user_id long, purchase_us long, "
                           "view_event_id long, view_value double"))


def ohlc_downsample(events: DataFrame) -> DataFrame:
    """Per-user hourly OHLC (open/high/low/close) resampling — the
    canonical timeseries downsample.

    Open/close are picked with row_number over (ts, event_id) — a total
    order, so ties in ts cannot flip the answer — in both sort
    directions; both windows share the (user, bucket) hash partitioning
    so the plan pays ONE shuffle and two in-partition sorts, then a
    hash aggregate collapses each bucket. min/max/count are exact; no
    float arithmetic happens, so no rounding stabilization is needed.
    """
    b = events.select(
        "user_id", F.date_trunc("hour", "ts").alias("bucket"),
        "ts", "event_id", "value")
    wa = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    r = (b.withColumn("rn_a", F.row_number().over(wa))
          .withColumn("rn_d", F.row_number().over(wd)))
    return (r.groupBy("user_id", "bucket")
            .agg(F.max(F.when(F.col("rn_a") == 1, F.col("value")))
                  .alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(F.when(F.col("rn_d") == 1, F.col("value")))
                  .alias("close"),
                 F.count(F.lit(1)).alias("n_events")))


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """TimescaleDB-style time-weighted average of ``value`` per user:
    trapezoidal integral between consecutive observations divided by
    the observed span.

    One partitioned lag window (scales on user_id), integer-microsecond
    segment widths, and a decimal-stabilized segment sum so the
    integral is bit-identical under any partitioning. Users with a
    single observation have no segments and drop out (span 0).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    seg = (events
           .select("user_id", "ts", "event_id", "value")
           .withColumn("dt_us", t - F.lag(t).over(w))
           .withColumn("height",
                       ((F.col("value") + F.lag("value").over(w)) / 2)
                       .cast("decimal(18,6)"))
           .where(F.col("dt_us").isNotNull()))
    area = (F.col("dt_us").cast("decimal(14,0)") * F.col("height")) \
        .cast("decimal(38,6)")
    agg = (seg.groupBy("user_id")
           .agg(F.sum(area).alias("area"),
                F.sum("dt_us").alias("span_us"),
                F.count(F.lit(1)).alias("n_segments")))
    twa = F.col("area").cast("double") / F.col("span_us").cast("double")
    return agg.select(
        "user_id", "n_segments", "span_us",
        (F.floor(twa * 1000000.0 + F.lit(0.5)) / 1000000.0).alias("twa"))


def ewma_smooth(events: DataFrame, alpha: float = 0.25,
                n_lags: int = 8) -> DataFrame:
    """Truncated exponentially-weighted moving average per user: the
    last ``n_lags`` observations folded with weights α·(1−α)^k,
    renormalized over the lags actually present.

    The infinite-memory EWMA recurrence is inherently sequential; the
    truncated form is ONE window pass (all lags share a single
    shuffle+sort on user_id) and an explicit left-to-right summation
    tree, so the float result is bit-identical across engines and
    partitionings. α=0.25 keeps every weight an exact binary fraction
    (3^k / 4^(k+1)), so the literals round-trip exactly.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = [F.lag("value", k).over(w) for k in range(n_lags)]
    weights = [alpha * (1 - alpha) ** k for k in range(n_lags)]
    num = F.lit(0.0)
    den = F.lit(0.0)
    for x, wt in zip(lagged, weights):
        num = num + F.when(x.isNotNull(), F.lit(wt) * x).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return (events
            .select("event_id", "user_id", "ts", "value")
            .withColumn(
                "ewma",
                F.floor(num / den * 1000000.0 + F.lit(0.5)) / 1000000.0)
            .select("event_id", "user_id", "value", "ewma"))


def cusum_drawdown(events: DataFrame) -> DataFrame:
    """Per-user CUSUM drift statistics and maximum drawdown of the
    cumulative deviation path — the change-detection primitive.

    The per-user mean is fixed to a stabilized double (exact decimal
    sum, one rounded division), each deviation is re-cast to decimal
    before the running sum, and running max/min are decimal — so every
    path statistic is exact and order-independent despite being built
    from a sequential-looking recurrence. One shuffle (user_id);
    the window and both aggregates share it.
    """
    sums = (events.groupBy("user_id")
            .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
                 F.count(F.lit(1)).alias("n")))
    mean = (F.floor(F.col("s").cast("double") / F.col("n").cast("double")
                    * 1000000.0 + F.lit(0.5)) / 1000000.0)
    base = (events.select("user_id", "ts", "event_id", "value")
            .join(sums.select("user_id", mean.alias("mean_u")), "user_id"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    path = base.withColumn(
        "cusum",
        F.sum((F.col("value") - F.col("mean_u")).cast("decimal(18,6)"))
         .over(w))
    path = path.withColumn("runmax", F.max("cusum").over(w))
    return (path.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max("cusum").cast("double").alias("max_cusum"),
                 F.min("cusum").cast("double").alias("min_cusum"),
                 F.max(F.col("runmax") - F.col("cusum")).cast("double")
                  .alias("max_drawdown")))


def interval_join_grid(events: DataFrame,
                       window_sec: int = 3600) -> DataFrame:
    """Big-big interval join via time-grid bucketing: each purchase
    matches the same user's views in the trailing hour.

    A range predicate alone forces a broadcast nested-loop or a range
    cross-join; bucketizing both sides onto a window-sized grid turns
    it into an EQUI-join on (user, bucket) — the probe side fans out to
    the (at most) two buckets its window overlaps, the join shuffles
    on the composite key like any other equi-join, and the exact
    interval predicate filters the candidates. Both sides scale: no
    broadcast, no quadratic pairing beyond genuine bucket co-residents.
    """
    t = F.unix_timestamp("ts")
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id"),
                         F.col("event_id").alias("purchase_id"),
                         t.alias("p_sec")))
    views = (events.where(F.col("event_type") == "view")
             .select(F.col("user_id"),
                     F.col("event_id").alias("view_id"),
                     t.alias("v_sec")))
    probe = purchases.select(
        "user_id", "purchase_id", "p_sec",
        F.explode(F.array_distinct(F.array(
            F.floor((F.col("p_sec") - window_sec) / window_sec),
            F.floor(F.col("p_sec") / window_sec)))).alias("bucket"))
    build = views.withColumn(
        "bucket", F.floor(F.col("v_sec") / window_sec))
    pairs = (probe.join(build, ["user_id", "bucket"])
             .where((F.col("v_sec") >= F.col("p_sec") - window_sec)
                    & (F.col("v_sec") < F.col("p_sec"))))
    return (pairs.groupBy("user_id")
            .agg(F.countDistinct("purchase_id").alias("n_purchases"),
                 F.count(F.lit(1)).alias("n_pairs"),
                 F.min("view_id").alias("first_view_id")))


def additive_decompose(events: DataFrame) -> DataFrame:
    """Naive additive timeseries decomposition:
    value = trend + seasonal + residual.

    trend is the ±3-day centered moving average of the (stabilized)
    global daily mean — the ordered window runs over the distinct-day
    spine (hundreds of rows, dimension-sized by construction), with
    daily means re-cast to decimal so the sliding sum is exact.
    seasonal is the (ISO weekday × hour) cell mean of the detrended
    values (one hash aggregate, 168 cells). residual is what's left,
    per event. Every component is floor-stabilized → engine- and
    partitioning-independent.
    """
    day = F.to_date("ts")
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    daily = (events.groupBy(day.alias("d"))
             .agg(stab(F.sum(F.col("value").cast("decimal(18,2)"))
                       .cast("double") / F.count(F.lit(1)))
                  .alias("daily_mean")))
    wd = (Window.orderBy("d").rowsBetween(-3, 3))
    trend_tbl = daily.select(
        "d",
        stab(F.sum(F.col("daily_mean").cast("decimal(18,6)")).over(wd)
             .cast("double")
             / F.count(F.lit(1)).over(wd)).alias("trend"))
    cell = [(F.weekday("ts") + 1).alias("dow"), F.hour("ts").alias("hour")]
    base = (events.select("event_id", "ts", "value", day.alias("d"),
                          *cell)
            .join(F.broadcast(trend_tbl), "d"))
    detr = (F.col("value") - F.col("trend")).cast("decimal(18,6)")
    seasonal_tbl = (base.groupBy("dow", "hour")
                    .agg(stab(F.sum(detr).cast("double")
                              / F.count(F.lit(1))).alias("seasonal")))
    return (base.join(F.broadcast(seasonal_tbl), ["dow", "hour"])
            .select("event_id", "value", "trend", "seasonal",
                    stab(F.col("value") - F.col("trend")
                         - F.col("seasonal")).alias("residual")))
