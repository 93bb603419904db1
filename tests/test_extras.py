"""Edge-case properties for the round-1 extension operators: CDC
apply, calendar gap-fill, DQ expectations, token-id encoding."""

from __future__ import annotations

import pyspark.sql.functions as F

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
