"""Zero-row robustness: representative operators across every family
must not crash — and must return EMPTY (or well-defined degenerate)
results — when their input has no rows. At 100 TB a partition-pruned
read, an over-selective filter, or a brand-new day routinely produces
an empty frame mid-pipeline; an operator that throws on it takes the
whole job down."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from s3_elasticsearch_data_pipeline_spark.operators import (
    analytics, dedup, diff, similarity, text, windows)
from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
    additive_decompose, cusum_drawdown, ewma_smooth, ohlc_downsample,
    time_weighted_avg)
from s3_elasticsearch_data_pipeline_spark.tables import load_table


@pytest.fixture(scope="module")
def empties(spark, sf_smoke):
    # real schemas, zero rows — exactly what an over-selective filter
    # or pruned partition hands downstream
    return {name: load_table(spark, sf_smoke, name).where(F.lit(False))
            for name in ("events", "documents", "lineitem", "orders",
                         "part", "customer", "embeddings")}


CASES = (
    ("pricing_summary", lambda e: analytics.pricing_summary(e["lineitem"])),
    ("group_count", lambda e: analytics.group_count(e["orders"],
                                                    "o_orderstatus")),
    ("higher_moments", lambda e: analytics.higher_moments(e["events"])),
    ("welch_ttest", lambda e: analytics.welch_ttest(e["events"])),
    ("mann_whitney", lambda e: analytics.mann_whitney_u(e["events"])),
    ("ks_test", lambda e: analytics.ks_test(e["events"])),
    ("abc_classification",
     lambda e: analytics.abc_classification(e["lineitem"])),
    ("skyline", lambda e: analytics.skyline_pareto(e["part"])),
    ("equidepth", lambda e: analytics.equidepth_histogram(e["lineitem"])),
    ("gini", lambda e: analytics.gini_concentration(e["orders"],
                                                    e["customer"])),
    ("kaplan_meier", lambda e: analytics.kaplan_meier(e["events"])),
    ("type_entropy", lambda e: analytics.type_entropy(e["events"])),
    ("bloom", lambda e: analytics.bloom_filter_probe(e["orders"],
                                                     e["lineitem"])),
    ("keyset_page", lambda e: analytics.keyset_page(e["orders"])),
    ("seasonal_anomalies",
     lambda e: analytics.seasonal_anomalies(e["events"])),
    ("missing_ids", lambda e: diff.missing_ids(
        e["lineitem"].select(F.col("l_orderkey").alias("k")),
        e["orders"].select(F.col("o_orderkey").alias("k")), "k")),
    ("sessionize", lambda e: windows.sessionize(e["events"])),
    ("activity_islands", lambda e: windows.activity_islands(e["events"])),
    ("session_paths", lambda e: windows.session_paths(e["events"])),
    ("funnel", lambda e: windows.funnel_conversion(e["events"])),
    ("distribution_ranks",
     lambda e: windows.distribution_ranks(e["events"])),
    ("attribution",
     lambda e: windows.attribution_touchpoints(e["events"])),
    ("ohlc", lambda e: ohlc_downsample(e["events"])),
    ("twa", lambda e: time_weighted_avg(e["events"])),
    ("ewma", lambda e: ewma_smooth(e["events"])),
    ("cusum", lambda e: cusum_drawdown(e["events"])),
    ("decompose", lambda e: additive_decompose(e["events"])),
    ("token_counts", lambda e: text.token_counts(e["documents"])),
    ("quality_scores", lambda e: text.quality_scores(e["documents"])),
    ("bpe_pairs", lambda e: text.bpe_pair_counts(e["documents"])),
    ("bigram_lm", lambda e: text.bigram_logprob_scores(e["documents"])),
    ("significant_terms",
     lambda e: text.significant_terms(e["documents"])),
    ("weighted_sample", lambda e: text.weighted_sample(e["documents"])),
    ("feature_hashing", lambda e: text.feature_hashing(e["documents"])),
    ("exact_dedup", lambda e: dedup.exact_dedup(e["documents"])),
    ("brute_topk", lambda e: similarity.brute_force_topk(
        e["embeddings"], e["embeddings"].limit(0))),
    ("market_basket", lambda e: analytics.market_basket(e["lineitem"])),
    ("markov_transitions",
     lambda e: analytics.markov_transitions(e["events"])),
    ("correlation_matrix",
     lambda e: analytics.correlation_matrix(e["lineitem"])),
    ("rolling_median", lambda e: windows.rolling_median(e["orders"])),
    # round-2 additions
    ("ngram_prefix_jaccard",
     lambda e: dedup.ngram_jaccard_pairs(e["documents"])),
    ("containment_decon",
     lambda e: dedup.containment_decontamination(e["documents"])),
    ("incremental_lsh",
     lambda e: dedup.incremental_lsh_dedup(e["documents"])),
    ("incremental_semantic",
     lambda e: dedup.incremental_semantic_dedup(e["embeddings"])),
    ("bpe_train", lambda e: text.bpe_train(e["documents"])),
    ("bpe_encode", lambda e: text.bpe_encode(e["documents"], merges=[])),
    ("product_quantize",
     lambda e: similarity.product_quantize(e["embeddings"])),
)


def test_media_pipelines_survive_empty_input(empties):
    from s3_elasticsearch_data_pipeline_spark.operators import multimodal
    docs = empties["documents"]
    assert multimodal.audio_features(
        multimodal.attach_audio_payload(docs)).count() == 0
    assert multimodal.video_frame_features(
        multimodal.attach_video_payload(docs)).count() == 0
    assert multimodal.audio_chunk_rms(
        multimodal.attach_audio_payload(docs)).count() == 0


@pytest.mark.parametrize("name,build", CASES, ids=[c[0] for c in CASES])
def test_operator_survives_empty_input(empties, name, build):
    df = build(empties)
    rows = df.collect()
    # empty input → empty output for per-row/per-group operators; the
    # few global-aggregate shapes may emit a single all-null/zero row
    assert len(rows) <= 1, f"{name} fabricated rows from nothing: {rows[:3]}"
