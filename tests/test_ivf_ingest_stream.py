"""Streaming IVF ingest: bootstrap-train, add-after-train epochs,
effectively-once replay layout, and probe-equivalence with the batch
build+append path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators import similarity
from s3_elasticsearch_data_pipeline_spark.streaming.ivf_ingest import (
    ivf_ingest_stream, read_index_cells)
from s3_elasticsearch_data_pipeline_spark.tables import load_table


def _paths(tmp_path, name):
    base = str(tmp_path / name)
    return (os.path.join(base, "src"), os.path.join(base, "index"),
            os.path.join(base, "ckpt"))


def test_stream_ivf_matches_batch_build_plus_append(spark, sf_oracle,
                                                    tmp_path):
    """Two streamed drops (even ids, then odd ids) must serve the SAME
    top-k as the batch path that trains on the even half and appends
    the odd half — identical centroids (deterministic k-means over the
    same bootstrap set) ⇒ identical assignments ⇒ identical probes."""
    emb = (load_table(spark, sf_oracle, "embeddings")
           .select("vec_id", "embedding"))
    queries = emb.where(F.col("vec_id") < 10)
    src, index, ckpt = _paths(tmp_path, "stream")
    emb.where(F.col("vec_id") % 2 == 0).write.parquet(src)
    ivf_ingest_stream(spark, src, index, ckpt)
    emb.where(F.col("vec_id") % 2 == 1).write.mode("append").parquet(src)
    ivf_ingest_stream(spark, src, index, ckpt)
    streamed = {(r.query_id, r.neighbor_id, r.sim, r.rank)
                for r in similarity.ivf_probe_topk(
                    spark, index, queries, k=10).collect()}

    batch_index = str(tmp_path / "batch")
    similarity.build_ivf_index(emb.where(F.col("vec_id") % 2 == 0),
                               batch_index)
    similarity.ivf_index_append(spark, batch_index,
                                emb.where(F.col("vec_id") % 2 == 1))
    batch = {(r.query_id, r.neighbor_id, r.sim, r.rank)
             for r in similarity.ivf_probe_topk(
                 spark, batch_index, queries, k=10).collect()}
    assert streamed == batch
    # every vector indexed exactly once, under per-epoch directories
    cells = read_index_cells(spark, index)
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()
    assert cells.select("epoch").distinct().count() >= 2


def test_stream_ivf_rerun_is_noop(spark, sf_oracle, tmp_path):
    """Draining with no new files must not change the index (the
    checkpoint file log owns what's new)."""
    emb = (load_table(spark, sf_oracle, "embeddings")
           .select("vec_id", "embedding").where(F.col("vec_id") < 500))
    src, index, ckpt = _paths(tmp_path, "noop")
    emb.write.parquet(src)
    ivf_ingest_stream(spark, src, index, ckpt)
    before = sorted(map(tuple, read_index_cells(spark, index)
                        .select("vec_id", "cell").collect()))
    ivf_ingest_stream(spark, src, index, ckpt)
    after = sorted(map(tuple, read_index_cells(spark, index)
                       .select("vec_id", "cell").collect()))
    assert before == after


def test_stream_ivf_empty_source(spark, tmp_path):
    """An empty (schema-only) source bootstraps nothing and the probe
    returns an empty frame with the contract schema."""
    src, index, ckpt = _paths(tmp_path, "empty")
    spark.createDataFrame([], "vec_id long, embedding array<float>") \
         .write.parquet(src)
    ivf_ingest_stream(spark, src, index, ckpt)
    out = similarity.ivf_probe_topk(
        spark, index,
        spark.createDataFrame([], "vec_id long, embedding array<float>"),
        k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "sim", "rank"]
