"""Edge-case properties for the round-1 extension operators: CDC
apply, calendar gap-fill, DQ expectations, token-id encoding."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from s3_elasticsearch_data_pipeline_spark.operators.diff import apply_changes
from s3_elasticsearch_data_pipeline_spark.operators.expectations import (
    dq_expectations)
from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
    gapfill_daily)
from s3_elasticsearch_data_pipeline_spark.operators.text import (
    encode_token_ids)
from s3_elasticsearch_data_pipeline_spark.tables import load_table


def test_cdc_apply_empty_feed_is_identity(spark, sf_smoke):
    base = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    empty = base.where(F.lit(False)).select(
        "o_orderkey", F.lit("upsert").alias("op"),
        "o_totalprice", "o_orderstatus")
    out = apply_changes(base, empty, "o_orderkey",
                        ("o_totalprice", "o_orderstatus"))
    assert out.exceptAll(base).count() == 0
    assert base.exceptAll(out).count() == 0


def test_cdc_apply_delete_all_empties_snapshot(spark, sf_smoke):
    base = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus")
    feed = base.select("o_orderkey", F.lit("delete").alias("op"),
                       "o_totalprice", "o_orderstatus")
    assert apply_changes(base, feed, "o_orderkey",
                         ("o_totalprice", "o_orderstatus")).count() == 0


def test_gapfill_grid_is_dense_and_zero_filled(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    out = gapfill_daily(events).cache()
    span = events.select(
        (F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1)
        .alias("days")).first()["days"]
    n_keys = events.select("user_id").distinct().count()
    # dense grid: every key × every day, exactly once
    assert out.count() == span * n_keys
    assert out.groupBy("key", "day").count().where("count > 1").count() == 0
    # gap rows are zero-events and LOCF never null after first activity
    first_active = out.where(F.col("n_events") > 0) \
        .groupBy("key").agg(F.min("day").alias("d0"))
    gaps_after = (out.join(first_active, "key")
                  .where((F.col("day") >= F.col("d0"))
                         & (F.col("n_events") == 0)))
    assert gaps_after.where(F.col("locf_avg").isNull()).count() == 0
    out.unpersist()


def test_dq_expectations_detect_seeded_violations(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    customer = load_table(spark, sf_smoke, "customer")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    events = load_table(spark, sf_smoke, "events")
    # corrupt: duplicate one orderkey, orphan one custkey, negative price
    bad_orders = orders.unionByName(
        orders.limit(1).select(
            "o_orderkey", F.lit(-99).alias("o_custkey"),
            "o_orderstatus", F.lit(-5.0).alias("o_totalprice"),
            "o_orderdate", "o_orderpriority"))
    got = {r["expectation"]: r["n_violations"]
           for r in dq_expectations(bad_orders, customer,
                                    lineitem, events).collect()}
    assert got["orders_orderkey_unique"] == 1
    assert got["orders_totalprice_positive"] == 1
    assert got["orders_custkey_fk_customer"] == 1
    assert got["lineitem_orderkey_fk_orders"] == 0


def test_encode_ids_roundtrip_decodes_to_tokens(spark, sf_smoke):
    """Decoding the id arrays through the vocab reproduces the exact
    token stream — the encoding is lossless."""
    docs = load_table(spark, sf_smoke, "documents")
    enc = encode_token_ids(docs)
    # rebuild vocab the same way to decode
    from s3_elasticsearch_data_pipeline_spark.functions.textfns import tokens
    from pyspark.sql import Window
    vocab = (docs.select(F.explode(tokens(F.col("text"))).alias("term"))
             .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    vocab = vocab.select(
        "term", F.row_number().over(
            Window.orderBy(F.col("n").desc(), "term")).alias("tid"))
    id2term = {r["tid"]: r["term"] for r in vocab.collect()}
    orig = {r["doc_id"]: r["toks"] for r in
            docs.select("doc_id", tokens(F.col("text")).alias("toks"))
            .collect() if r["toks"]}
    for r in enc.collect():
        assert [id2term[i] for i in r["token_ids"]] == orig[r["doc_id"]]
        assert r["n_tokens"] == len(orig[r["doc_id"]])


def test_python_datasource_generates_reference_schema(spark):
    """Custom Python DataSource (Spark 4): parallel, deterministic,
    partition-count-invariant generation of the reference's record
    schema (SURVEY.md §1.3)."""
    from s3_elasticsearch_data_pipeline_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("reference_synthetic")
          .option("rows", 1000).option("rowsperpartition", 250).load())
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.columns == ["id", "month", "month_num", "value",
                          "temperature", "humidity", "ts", "city", "date"]
    # deterministic + partition-invariant: different split, same rows
    df2 = (spark.read.format("reference_synthetic")
           .option("rows", 1000).option("rowsperpartition", 100).load())
    assert df2.rdd.getNumPartitions() == 10
    assert df.exceptAll(df2).count() == 0 and df2.exceptAll(df).count() == 0
    # typed projection consumes it like any table (P3 parity path)
    from s3_elasticsearch_data_pipeline_spark.operators.projection import (
        validate_and_clean)
    cleaned = validate_and_clean(df)
    assert cleaned.where(F.col("id") == "unknown").count() == 0


def test_python_datasource_streams_with_offsets(spark):
    """Streaming face of the custom DataSource: micro-batches advance a
    monotonic index offset (the reference's search_after resume-token
    pattern, ID-based-transfer.py:119-151); the drained stream must
    equal the batch read of the same range, and arrive across multiple
    micro-batches."""
    import uuid

    from s3_elasticsearch_data_pipeline_spark.sources.synthetic import (
        register)
    register(spark)
    name = f"synthstream_{uuid.uuid4().hex[:8]}"
    stream = (spark.readStream.format("reference_synthetic")
              .option("maxrows", 500).option("rowsperbatch", 200)
              .option("rowsperpartition", 50).load())
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        # drains until latestOffset stops advancing (the maxrows cap)
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    batch = (spark.read.format("reference_synthetic")
             .option("rows", 500).load())
    assert got.count() == 500
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "offset pagination collapsed to one batch"


def test_bloom_filter_one_sided_guarantee(spark, sf_smoke):
    """Bloom membership can overestimate, never underestimate: the
    (bloom_pass=0, is_member=1) cell must be empty, and every true
    member must land in the pass bucket."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        bloom_filter_probe)
    rows = {(r["bloom_pass"], r["is_member"]): r["n_keys"]
            for r in bloom_filter_probe(
                load_table(spark, sf_smoke, "orders"),
                load_table(spark, sf_smoke, "lineitem")).collect()}
    assert (0, 1) not in rows, "false negatives break the Bloom contract"
    assert rows.get((1, 1), 0) > 0


def test_skyline_frontier_mutually_nondominated(spark, sf_smoke):
    """No frontier point may dominate another frontier point."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        skyline_pareto)
    pts = [(r["p_retailprice"], r["p_size"])
           for r in skyline_pareto(load_table(spark, sf_smoke, "part")).collect()]
    assert pts
    for p, s in pts:
        for q, t in pts:
            dominated = (q <= p and t >= s and (q < p or t > s))
            assert not dominated, f"({q},{t}) dominates ({p},{s})"


def test_ewma_first_observation_and_bounds(spark, sf_smoke):
    """For each user's first event the (renormalized) EWMA equals the
    raw value; every EWMA lies within the running min/max envelope of
    that user's values (convex-combination property)."""
    from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
        ewma_smooth)
    ev = load_table(spark, sf_smoke, "events")
    out = ewma_smooth(ev)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (ev.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") == 1).select("event_id"))
    bad_first = (out.join(first, "event_id")
                 .where(F.abs(F.col("ewma") - F.col("value")) > 1e-6).count())
    assert bad_first == 0
    env = (ev.withColumn("lo", F.min("value").over(
               w.rowsBetween(-7, 0)))
             .withColumn("hi", F.max("value").over(w.rowsBetween(-7, 0)))
             .select("event_id", "lo", "hi"))
    bad_env = (out.join(env, "event_id")
               .where((F.col("ewma") < F.col("lo") - 1e-6)
                      | (F.col("ewma") > F.col("hi") + 1e-6)).count())
    assert bad_env == 0


def test_twa_constant_signal_is_the_constant(spark):
    """Time-weighted average of a constant signal is that constant,
    regardless of irregular spacing."""
    from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
        time_weighted_avg)
    rows = [(1, f"2024-01-01 00:{m:02d}:00", i, 7.5)
            for i, m in enumerate([0, 1, 5, 6, 59])]
    df = (spark.createDataFrame(rows, "user_id long, ts string, "
                                "event_id long, value double")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    out = time_weighted_avg(df).collect()
    assert len(out) == 1 and abs(out[0]["twa"] - 7.5) < 1e-9
    assert out[0]["n_segments"] == 4


def test_activity_islands_invariants(spark, sf_smoke):
    """Longest streak ≤ active days; Σ active_days over users equals
    the distinct (user, day) cardinality."""
    from s3_elasticsearch_data_pipeline_spark.operators.windows import (
        activity_islands)
    ev = load_table(spark, sf_smoke, "events")
    isl = activity_islands(ev)
    assert isl.where(F.col("longest_streak") > F.col("active_days")).count() == 0
    total = isl.agg(F.sum("active_days")).first()[0]
    expect = (ev.select("user_id", F.to_date("ts").alias("d"))
              .distinct().count())
    assert total == expect


def test_cusum_drawdown_invariants(spark, sf_smoke):
    """Drawdown is non-negative and bounded by the cusum range."""
    from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
        cusum_drawdown)
    out = cusum_drawdown(load_table(spark, sf_smoke, "events"))
    bad = out.where(
        (F.col("max_drawdown") < -1e-9)
        | (F.col("max_drawdown")
           > F.col("max_cusum") - F.col("min_cusum") + 1e-9)).count()
    assert bad == 0


def test_equidepth_buckets_are_balanced(spark, sf_smoke):
    """Quartile buckets each hold roughly a quarter of the rows (ties
    at boundaries allowed a wide margin) and partition the total."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        equidepth_histogram)
    li = load_table(spark, sf_smoke, "lineitem")
    rows = {r["bucket"]: r["n_rows"]
            for r in equidepth_histogram(li).collect()}
    total = li.count()
    assert sum(rows.values()) == total
    assert set(rows) == {1, 2, 3, 4}
    for b, n in rows.items():
        assert 0.15 * total <= n <= 0.35 * total, (b, n, total)


def test_markov_probabilities_normalize(spark, sf_smoke):
    """Per (prev, cur) state the next-type probabilities sum to ~1
    (6-decimal stabilization tolerance × fan-out) and every count is
    positive."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        markov_transitions)
    out = markov_transitions(load_table(spark, sf_smoke, "events"))
    sums = (out.groupBy("prev_type", "cur_type")
            .agg(F.sum("prob").alias("p"), F.count(F.lit(1)).alias("k")))
    bad = sums.where(
        (F.col("p") < 1.0 - 1e-6 * F.col("k") - 1e-9)
        | (F.col("p") > 1.0 + 1e-6 * F.col("k") + 1e-9)).count()
    assert bad == 0
    assert out.where(F.col("n") <= 0).count() == 0


def test_correlation_matrix_bounds_and_diag(spark, sf_smoke):
    """All 6 pairwise correlations lie in [-1, 1]; a column duplicated
    into another slot self-correlates to exactly 1."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        correlation_matrix)
    li = load_table(spark, sf_smoke, "lineitem")
    out = correlation_matrix(li)
    rows = out.collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9, r
    # self-correlation: feed l_quantity in the l_tax slot → corr
    # (l_quantity, l_tax) must be exactly 1 (up to the 1e-6 rounding)
    dup = li.withColumn("l_tax", F.col("l_quantity"))
    selfr = {(r["col_a"], r["col_b"]): r["corr"]
             for r in correlation_matrix(dup).collect()}
    assert selfr[("l_quantity", "l_tax")] == pytest.approx(1.0, abs=1e-6)


def test_correlation_matrix_degenerate_inputs(spark, sf_smoke):
    """n<2 → no rows (both twins); zero-variance column → NULL corr for
    its pairs, not inf/NaN."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        correlation_matrix)
    li = load_table(spark, sf_smoke, "lineitem")
    assert correlation_matrix(li.limit(1)).count() == 0
    assert correlation_matrix(li.limit(0)).count() == 0
    flat = li.withColumn("l_tax", F.lit(0.0))
    rows = {(r["col_a"], r["col_b"]): r["corr"]
            for r in correlation_matrix(flat).collect()}
    assert rows[("l_quantity", "l_tax")] is None
    assert rows[("l_quantity", "l_extendedprice")] is not None


def test_rolling_median_frame_bounds(spark, sf_smoke):
    """The rolling median lies between the min and max daily count of
    any 7-day window — checked against per-day count bounds."""
    from s3_elasticsearch_data_pipeline_spark.operators.windows import (
        rolling_median)
    from pyspark.sql import Window
    out = rolling_median(load_table(spark, sf_smoke, "orders"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    chk = out.select(
        "med_7d",
        F.min("n_orders").over(w).alias("lo"),
        F.max("n_orders").over(w).alias("hi"))
    assert chk.where((F.col("med_7d") < F.col("lo"))
                     | (F.col("med_7d") > F.col("hi"))).count() == 0


def test_market_basket_lift_consistency(spark, sf_smoke):
    """support ≤ confidence, pair_cnt ≥ 2, and the part-key ordering
    canonicalizes each pair exactly once."""
    from s3_elasticsearch_data_pipeline_spark.operators.analytics import (
        market_basket)
    out = market_basket(load_table(spark, sf_smoke, "lineitem")).collect()
    seen = set()
    for r in out:
        assert r["part_a"] < r["part_b"]
        assert r["pair_cnt"] >= 2
        assert r["support"] <= r["confidence"] + 1e-9
        assert (r["part_a"], r["part_b"]) not in seen
        seen.add((r["part_a"], r["part_b"]))
