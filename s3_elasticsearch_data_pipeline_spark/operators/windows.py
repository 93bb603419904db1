"""Window-function operators over the events table (SURVEY.md §2.6, M4).

The reference has no window functions (its keyset pagination,
``ID-based-transfer.py:123-127``, is the closest cousin and is obsolete
under Spark). These are the extension-surface window ops a real events
pipeline needs. All are single ``Window.partitionBy(user_id)`` shapes:
one hash shuffle on the partition key, then sorted evaluation within
partitions — the scale-friendly window pattern (no global ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user event sequence numbers and running value sums."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events
            .select("event_id", "user_id", "ts", "value")
            .withColumn("seq", F.row_number().over(w))
            .withColumn("running_value",
                        F.round(F.sum("value").over(
                            w.rowsBetween(Window.unboundedPreceding, 0)), 2)))


def top_k_per_group(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k events by value per user — rank-and-filter window pattern.

    At scale this beats a global sort: only the per-user top-k rows
    survive the window filter, and AQE coalesces the output.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (events
            .select("event_id", "user_id", "event_type", "value")
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag-gap + cumulative session counter.

    A new session starts when the gap to the previous event of the same
    user exceeds ``gap_minutes``. Returns one row per session with
    bounds and aggregates. Two window passes over the same partitioning
    (user_id) → a single shuffle, reused across both windows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    with_gap = (events
                .select("event_id", "user_id", "ts", "value")
                .withColumn("prev_ts", F.lag("ts").over(w))
                .withColumn(
                    "is_new_session",
                    F.when(F.col("prev_ts").isNull(), F.lit(1))
                     .when(F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                           > gap_sec, F.lit(1))
                     .otherwise(F.lit(0))))
    with_session = with_gap.withColumn(
        "session_id",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (with_session
            .groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                  .cast("double").alias("session_value")))


def tumbling_window_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregate: bucket ts
    into fixed windows, count + sum per (window, event_type)."""
    bucket = F.window("ts", f"{minutes} minutes")
    return (events
            .groupBy(bucket.alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                  .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def lag_lead_deltas(events: DataFrame) -> DataFrame:
    """lag/lead + per-user deltas: inter-event gap seconds and value
    delta — the standard event-sequence features."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (events
            .select("event_id", "user_id", "ts", "value")
            .withColumn("prev_value", F.lag("value").over(w))
            .withColumn("next_value", F.lead("value").over(w))
            .withColumn("gap_sec",
                        F.unix_timestamp("ts")
                        - F.unix_timestamp(F.lag("ts").over(w)))
            .withColumn("value_delta",
                        F.round(F.col("value") - F.col("prev_value"), 2)))


def moving_average(events: DataFrame, window_rows: int = 5) -> DataFrame:
    """Per-user trailing moving average over the last N events."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-(window_rows - 1), 0))
    return (events
            .select("event_id", "user_id", "ts", "value")
            .withColumn("moving_avg", F.round(F.avg("value").over(w), 4)))


def rank_dense_ntile(events: DataFrame) -> DataFrame:
    """rank / dense_rank / ntile quartiles of event values per user."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id"))
    return (events
            .select("event_id", "user_id", "value")
            .withColumn("rnk", F.rank().over(w))
            .withColumn("dense_rnk", F.dense_rank().over(w))
            .withColumn("quartile", F.ntile(4).over(w)))


def sliding_window_agg(events: DataFrame, width_minutes: int = 60,
                       slide_minutes: int = 30) -> DataFrame:
    """Sliding-window aggregate: each event lands in width/slide
    overlapping windows (F.window emits one row per covering window —
    Spark's Expand under the hood, no self-join)."""
    bucket = F.window("ts", f"{width_minutes} minutes",
                      f"{slide_minutes} minutes")
    return (events
            .groupBy(bucket.alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
                  .cast("double").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def funnel_conversion(events: DataFrame,
                      steps: tuple[str, str, str] =
                      ("view", "click", "purchase")) -> DataFrame:
    """Ordered funnel: per user, the first step-1 event, the first
    step-2 event at-or-after it, and the first step-3 event at-or-after
    that; then corpus-level stage counts and conversion rates.

    All three stage timestamps come from chained min-over-window
    passes with the SAME partition key, so Catalyst plans ONE shuffle
    of the events table; the final reduction is a single-row global
    aggregate. No self-joins — at 100 TB the usual 3-way funnel join
    would shuffle the fact table three times.
    """
    s1, s2, s3 = steps
    w = Window.partitionBy("user_id")
    t = F.col("ts")
    staged = (events
              .withColumn("t1", F.min(F.when(F.col("event_type") == s1, t))
                          .over(w))
              .withColumn("t2", F.min(F.when((F.col("event_type") == s2)
                                             & (t >= F.col("t1")), t))
                          .over(w))
              .withColumn("t3", F.min(F.when((F.col("event_type") == s3)
                                             & (t >= F.col("t2")), t))
                          .over(w)))
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("t1").isNotNull().cast("int")).alias("r1"),
        F.max(F.col("t2").isNotNull().cast("int")).alias("r2"),
        F.max(F.col("t3").isNotNull().cast("int")).alias("r3"))
    return per_user.agg(
        F.sum("r1").alias("n_step1"),
        F.sum("r2").alias("n_step2"),
        F.sum("r3").alias("n_step3"),
        F.round(F.sum("r2") / F.sum("r1"), 6).alias("rate_step2"),
        F.round(F.sum("r3") / F.sum("r2"), 6).alias("rate_step3"))


def value_functions(events: DataFrame) -> DataFrame:
    """The window value-function family missing from the rank pack:
    first/last/nth value, percent_rank, cume_dist — all over one
    window spec, so Spark plans ONE shuffle + sort and evaluates the
    whole family in a single Window operator (verify: one Window node,
    one Exchange in the plan)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    return (events
            .select("event_id", "user_id", "value",
                    F.first("value").over(w_all).alias("first_value"),
                    F.last("value").over(w_all).alias("last_value"),
                    F.nth_value("value", 3).over(w_all).alias("third_value"),
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume")))


def time_range_average(events: DataFrame,
                       window_micros: int = 3_600_000_000) -> DataFrame:
    """Trailing time-RANGE window aggregate: for every event, the count
    and average value of the same user's events in the preceding hour —
    a RANGE frame over the (numeric) event time, which a row-count
    frame cannot express when event spacing is irregular.

    Same scale shape as every other window here: one hash shuffle on
    the partition key, one sort per partition; the frame is evaluated
    with a sliding aggregate over the sorted run (no per-row rescan).
    The sum is decimal-stabilized so the result is identical at any
    partitioning/order of execution.
    """
    t = F.unix_micros(F.col("ts"))
    w = (Window.partitionBy("user_id").orderBy(t)
         .rangeBetween(-window_micros, Window.currentRow))
    n = F.count(F.lit(1)).over(w)
    s = F.sum(F.col("value").cast("decimal(18,2)")).over(w)
    return events.select(
        "event_id", "user_id",
        n.alias("n_1h"),
        F.round((s / n).cast("double"), 6).alias("avg_1h"))


def activity_islands(events: DataFrame) -> DataFrame:
    """Gaps-and-islands: per-user runs of consecutive active days.

    Classic row_number difference trick: distinct active days minus
    their per-user rank is constant within a consecutive run, so one
    partitioned window + two hash aggregates produce streak lengths —
    no self-join, no iteration. The window partitions by user, so it
    scales horizontally; the distinct() pre-reduction shrinks the
    windowed input to (user × active-day) cardinality first.
    """
    days = (events.select("user_id", F.to_date("ts").alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp",
        F.datediff("d", F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w))
    streaks = (isl.groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).alias("len")))
    return (streaks.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_streaks"),
                 F.max("len").alias("longest_streak"),
                 F.sum("len").alias("active_days")))


def session_paths(events: DataFrame, gap_minutes: int = 30,
                  max_steps: int = 5, top_n: int = 25) -> DataFrame:
    """Top navigation paths: the most frequent ordered event-type
    sequences (first ``max_steps`` steps) across 30-minute sessions.

    Reuses the sessionize lag-gap trick for session ids, keeps the
    first ``max_steps`` rows per session via a row_number over the SAME
    (user, ts) sort — so both windows share one shuffle+sort — then
    reassembles each session's path with sort_array over collected
    (step, type) structs (deterministic: the struct sort key is the
    step number, not executor arrival order). The final path count is
    a low-cardinality hash aggregate; top_n is an exact ordered limit.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = gap_minutes * 60
    with_gap = (events
                .select("event_id", "user_id", "ts", "event_type")
                .withColumn("prev_ts", F.lag("ts").over(w))
                .withColumn(
                    "is_new",
                    F.when(F.col("prev_ts").isNull(), F.lit(1))
                     .when(F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                           > gap_sec, F.lit(1))
                     .otherwise(F.lit(0))))
    sess = with_gap.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    steps = (sess.withColumn("step", F.row_number().over(ws))
             .where(F.col("step") <= max_steps))
    paths = (steps.groupBy("user_id", "session_id")
             .agg(F.array_join(
                 F.transform(
                     F.sort_array(F.collect_list(
                         F.struct("step", "event_type"))),
                     lambda s: s["event_type"]),
                 ">").alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), "path")
            .limit(top_n))


def distribution_ranks(events: DataFrame) -> DataFrame:
    """percent_rank + cume_dist per event type over a total
    (value, event_id) order — the distribution-position window family
    complementing rank/dense_rank/ntile. Partitioned by event_type →
    shuffle-parallel; the total order removes peer groups so both
    functions are engine-independent."""
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    stab = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return (events
            .select("event_id", "event_type", "value",
                    stab(F.percent_rank().over(w)).alias("pct_rank"),
                    stab(F.cume_dist().over(w)).alias("cume_dist")))


def attribution_touchpoints(events: DataFrame) -> DataFrame:
    """First-touch / last-touch attribution: for every purchase, the
    first and most recent preceding non-purchase event type of the
    same user, cross-tabulated — the marketing-attribution contrast
    table in one partitioned window pass (first/last with
    ignorenulls over the strictly-preceding frame)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    attributed = (events
                  .select("user_id", "ts", "event_id", "event_type",
                          F.first(touch, ignorenulls=True).over(w)
                           .alias("first_touch"),
                          F.last(touch, ignorenulls=True).over(w)
                           .alias("last_touch"))
                  .where(F.col("event_type") == "purchase"))
    return (attributed
            .groupBy(F.coalesce("first_touch", F.lit("none"))
                     .alias("first_touch"),
                     F.coalesce("last_touch", F.lit("none"))
                     .alias("last_touch"))
            .agg(F.count(F.lit(1)).alias("n_purchases")))


def rolling_median(orders: DataFrame, days: int = 7) -> DataFrame:
    """Exact trailing-``days`` rolling median of the daily order count.

    Two stages: a hash aggregate collapses the fact table to one row
    per calendar day (the calendar, not the data volume, bounds the
    output — ~2.4k rows at ANY scale factor), then an unpartitioned
    ROWS-frame window computes the exact ``percentile`` over the
    trailing week. The global window is safe precisely because its
    input is calendar-sized; the raw table never passes through a
    single task.
    """
    daily = (orders
             .groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.count(F.lit(1)).alias("n_orders")))
    w = Window.orderBy("day").rowsBetween(-(days - 1), 0)
    return daily.select(
        "day", "n_orders",
        F.percentile("n_orders", F.lit(0.5)).over(w).alias("med_7d"))
