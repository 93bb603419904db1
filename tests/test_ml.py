"""Distributed logistic-regression trainer: must match a numpy
reference implementation of the same full-batch GD to float tolerance,
and actually learn (beat the majority-class baseline)."""

from __future__ import annotations

import numpy as np
import pytest

from s3_elasticsearch_data_pipeline_spark.operators import ml
from s3_elasticsearch_data_pipeline_spark.tables import load_table


def _numpy_reference(X, y, iters, lr):
    w = np.zeros(X.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        w = w - lr * (X.T @ (p - y)) / len(y)
    return w


@pytest.mark.parametrize("driver_cap", [0, ml.DRIVER_GD_MAX_ROWS],
                         ids=["distributed", "driver"])
def test_trainer_matches_numpy_reference(spark, sf_smoke, driver_cap):
    docs = load_table(spark, sf_smoke, "documents")
    feats = ml.quality_features(docs).orderBy("doc_id").collect()
    X = np.array([[r[f] for f in ml.FEATURES] for r in feats])
    y = np.array([r["y"] for r in feats])
    want = _numpy_reference(X, y, iters=15, lr=0.5)
    got_rows = {r["feature"]: r["weight"]
                for r in ml.train_quality_classifier(
                    docs, driver_path_max_rows=driver_cap).collect()}
    got = np.array([got_rows[f] for f in ml.FEATURES])
    assert np.allclose(got, want, atol=1e-6), (got, want)
    assert got_rows["__loss__"] > 0


def test_trainer_paths_agree(spark, sf_smoke):
    """The distributed decimal-aggregate loop and the driver numpy loop
    are the same algorithm — their weights must agree to float
    tolerance on the same corpus."""
    docs = load_table(spark, sf_smoke, "documents")
    dist = {r["feature"]: r["weight"]
            for r in ml.train_quality_classifier(
                docs, driver_path_max_rows=0).collect()}
    drv = {r["feature"]: r["weight"]
           for r in ml.train_quality_classifier(docs).collect()}
    for f in ml.FEATURES + ("__loss__",):
        assert abs(dist[f] - drv[f]) < 1e-6, (f, dist[f], drv[f])


def test_classifier_learns_something(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    weights = ml.train_quality_classifier(docs)
    scored = ml.apply_quality_classifier(docs, weights)
    rows = scored.collect()
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    acc = sum(r["predicted"] == r["label"] for r in rows) / len(rows)
    base = max(sum(r["label"] for r in rows),
               len(rows) - sum(r["label"] for r in rows)) / len(rows)
    assert acc >= base - 1e-9, (acc, base)


def test_trainer_empty_input(spark):
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string")
    assert ml.train_quality_classifier(docs).count() == 0


def test_apply_with_empty_weights_degrades(spark, sf_smoke):
    docs_empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string")
    weights = ml.train_quality_classifier(docs_empty)
    docs = load_table(spark, sf_smoke, "documents").limit(5)
    assert ml.apply_quality_classifier(docs, weights).count() == 0
