"""Skew stress for the two join surfaces a Zipfian corpus hits hardest
(r4 verdict item 3): the J2 id anti-join and the MinHash-LSH band join.

J2's physical shape makes KEY-frequency skew structurally impossible at
the join — both sides are reduced to DISTINCT keys first, and partial
aggregation combines duplicate keys map-side before any shuffle — so
the tests here (a) verify correctness on a Zipf-duplicated key stream,
(b) pin the distinct-below-join plan shape that provides the guarantee,
and (c) demonstrate that for a join that DOES carry key skew (the raw
stream joined without the distinct), the session's AQE skew-join
config engages and splits the hot partition.

The LSH band join has the classic production failure mode: boilerplate
corpora put thousands of docs into one (band, bucket) and the
within-bucket self-join is df². The stress measures the blowup and the
``max_bucket_docs`` cap that bounds it.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators import dedup, diff


@pytest.fixture(scope="module")
def documents(spark, sf_smoke):
    return spark.read.parquet(os.path.join(sf_smoke, "documents.parquet"))


def _zipf_stream(spark, n_keys: int, heaviest: int):
    """Deterministic Zipf-shaped key stream: key r (1-based) appears
    ceil(heaviest / r) times — key 1 carries ``heaviest`` rows, the
    tail is unique. Built with a generator expression, no driver data."""
    return (spark.range(1, n_keys + 1)
            .select(F.col("id").alias("k"))
            .select(F.explode(F.sequence(
                F.lit(1),
                F.ceil(F.lit(heaviest) / F.col("k")).cast("int")))
                .alias("rep"), "k")
            .select(F.col("k").alias("id")))


def test_j2_missing_ids_correct_and_distinct_below_join_on_zipf(spark):
    """J2 on a Zipfian stream: correct answer, and the plan reduces
    both sides to distinct keys BELOW the anti-join (partial aggregate
    combines the hot key map-side), so no join partition can inherit
    the key's row count."""
    src = _zipf_stream(spark, n_keys=20_000, heaviest=50_000)
    snk = _zipf_stream(spark, n_keys=20_000, heaviest=10)\
        .where(F.col("id") % 7 != 0)
    out = diff.missing_ids(src, snk)
    got = {r.id for r in out.collect()}
    assert got == {i for i in range(1, 20_001) if i % 7 == 0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    anti_pos = plan.find("LeftAnti")
    assert anti_pos != -1, "expected an anti-join"
    below = plan[anti_pos:]
    assert below.count("HashAggregate") >= 2, \
        "both sides must reduce to distinct keys below the anti-join"


def test_aqe_skew_join_engages_on_zipf_key_skew(spark):
    """The session's AQE skew-join config actually fires: join the RAW
    Zipf stream (no distinct pre-reduction) against a dimension with
    thresholds scaled to local data sizes, run it, and assert the
    final adaptive plan marks the sort-merge join ``isSkew=true``.
    This is the safety net behind every non-prereduced join in the
    repo; J2 additionally removes the skew structurally (test above)."""
    tweaks = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prior = {k: spark.conf.get(k, None) for k in tweaks}
    try:
        for k, v in tweaks.items():
            spark.conf.set(k, v)
        # incompressible PER-ROW payload: skew detection reads
        # COMPRESSED map output sizes, and a constant payload
        # compresses the 200k-row hot partition below any threshold
        # (found empirically — repeat('x', 64) never triggers the
        # split), so the payload must vary row by row
        left = (spark.range(1, 501).select(F.col("id").alias("k"))
                .select(F.explode(F.sequence(
                    F.lit(1),
                    F.ceil(F.lit(200_000) / F.col("k")).cast("int")))
                    .alias("rep"), "k")
                .select(F.col("k").alias("id"),
                        F.sha2(F.concat_ws(
                            ":", F.col("k"), F.col("rep")), 256)
                        .alias("payload")))
        right = spark.range(1, 501).select(
            F.col("id"), F.lit("dim").alias("tag"))
        # No aggregate downstream of the join: AQE skips the skew split
        # when re-splitting would break a required output partitioning
        # (forceOptimizeSkewedJoin is off) — the action is on the join
        # itself, as in the fetch/reconcile shapes this models.
        joined = left.join(right, "id")
        assert len(joined.collect()) > 200_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, \
            "AQE skew-join did not engage on the Zipf hot key"
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lsh_hot_bucket_cap_bounds_boilerplate_blowup(spark, documents):
    """Boilerplate mega-buckets: B identical docs collide in EVERY band
    → B² candidate pairs before the est filter (measured below). With
    ``max_bucket_docs`` the hot buckets drop before the join, the
    boilerplate family contributes nothing, and ordinary near-dup
    pairs from the rest of the corpus are untouched."""
    normal = documents.limit(150).select("doc_id", "text")
    boiler = (spark.range(100)
              .select((F.col("id") + 500_000).alias("doc_id"),
                      F.lit("the quick brown fox jumps over the lazy "
                            "dog again and again " * 3).alias("text")))
    corpus = normal.unionByName(boiler)

    uncapped = dedup.minhash_lsh_pairs(corpus, threshold=0.4,
                                       max_bucket_docs=None)
    boiler_pairs = (uncapped
                    .where((F.col("doc_id_a") >= 500_000)
                           & (F.col("doc_id_b") >= 500_000)).count())
    assert boiler_pairs == 100 * 99 // 2, \
        "identical boilerplate must collide quadratically when uncapped"

    capped = dedup.minhash_lsh_pairs(corpus, threshold=0.4,
                                     max_bucket_docs=50)
    rows = capped.collect()
    assert not [r for r in rows if r.doc_id_a >= 500_000
                and r.doc_id_b >= 500_000], \
        "hot-bucket cap must drop the boilerplate mega-bucket"
    # ordinary pairs (cool buckets) are byte-identical to uncapped
    want_normal = {(r.doc_id_a, r.doc_id_b, r.est_jaccard)
                   for r in uncapped.collect()
                   if r.doc_id_a < 500_000 and r.doc_id_b < 500_000}
    got_normal = {(r.doc_id_a, r.doc_id_b, r.est_jaccard)
                  for r in rows
                  if r.doc_id_a < 500_000 and r.doc_id_b < 500_000}
    assert got_normal == want_normal
    # the boilerplate family is still caught by exact dedup — the
    # documented division of labor behind the cap's recall note
    ex = dedup.exact_dedup(corpus)
    fam = [r for r in ex.collect() if r.n_dups == 100]
    assert fam and fam[0].keep_doc_id == 500_000


@pytest.mark.slow
def test_lsh_auto_cap_is_the_default(spark, documents):
    """The production default (``max_bucket_docs="auto"`` =
    DEFAULT_MAX_BUCKET_DOCS) drops an over-cap boilerplate family
    WITHOUT the caller opting in — the df² failure mode is no longer
    reachable from the bare entry points — while under-cap buckets
    behave exactly like the explicit-exhaustive oracle setting."""
    n_boiler = dedup.DEFAULT_MAX_BUCKET_DOCS + 176
    normal = documents.limit(100).select("doc_id", "text")
    boiler = (spark.range(n_boiler)
              .select((F.col("id") + 500_000).alias("doc_id"),
                      F.lit("the quick brown fox jumps over the lazy "
                            "dog again and again " * 3).alias("text")))
    corpus = normal.unionByName(boiler)

    default_rows = dedup.minhash_lsh_pairs(corpus, threshold=0.4).collect()
    assert not [r for r in default_rows if r.doc_id_a >= 500_000
                and r.doc_id_b >= 500_000], \
        "default path must drop the over-cap boilerplate mega-bucket"
    # cool buckets: default ≡ explicit exhaustive
    exhaustive = {(r.doc_id_a, r.doc_id_b, r.est_jaccard)
                  for r in dedup.minhash_lsh_pairs(
                      corpus, threshold=0.4,
                      max_bucket_docs=None).collect()
                  if r.doc_id_a < 500_000 and r.doc_id_b < 500_000}
    got = {(r.doc_id_a, r.doc_id_b, r.est_jaccard)
           for r in default_rows
           if r.doc_id_a < 500_000 and r.doc_id_b < 500_000}
    assert got == exhaustive

    # the ingest entry point inherits the same default — the cap is
    # per side (index = 2/3 of the family, probe = 1/3), so the family
    # must be large enough for the INDEX side alone to exceed the cap:
    # its buckets drop, nothing matches, the boilerplate batch is
    # ADMITTED instead of paying batch x corpus
    n_big = 3 * dedup.DEFAULT_MAX_BUCKET_DOCS // 2 + 300
    big_boiler = (spark.range(n_big)
                  .select((F.col("id") + 500_000).alias("doc_id"),
                          F.lit("the quick brown fox jumps over the "
                                "lazy dog again and again " * 3)
                          .alias("text")))
    big_corpus = normal.unionByName(big_boiler)
    admitted = {r["doc_id"] for r in
                dedup.incremental_lsh_dedup(big_corpus, batch_mod=3)
                .collect()}
    boiler_batch = {i for i in range(500_000, 500_000 + n_big)
                    if i % 3 == 0}
    assert boiler_batch <= admitted
