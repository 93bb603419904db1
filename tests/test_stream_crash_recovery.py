"""Mid-epoch crash fault-injection for the two streaming ingest loops
(streaming/lsh_ingest.py, streaming/ivf_ingest.py).

The effectively-once story rests on per-epoch overwrite: a failure in
the torn window AFTER a sink write but BEFORE the checkpoint commit
must be healed by the replay, leaving corpus/index state byte-equal to
a run that never crashed. The whole-epoch replays were already tested;
these tests kill the stream INSIDE the window (via the loops'
``fault_hook`` seam), restart it, and compare every persisted row
against an independent clean-run twin.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.streaming.ivf_ingest import (
    ivf_ingest_stream, read_index_cells)
from s3_elasticsearch_data_pipeline_spark.streaming.lsh_ingest import (
    _read_optional_parquet, lsh_ingest_stream, read_corpus)


def _canon(df):
    if df is None:
        return []
    return sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in row)
        for row in df.select(*sorted(df.columns)).collect())


class _LshLoop:
    stages = ("after_corpus_write", "after_index_write")

    @staticmethod
    def batches(spark, sf_smoke):
        docs = (spark.read
                .parquet(os.path.join(sf_smoke, "documents.parquet"))
                .select("doc_id", "lang", "text"))
        return (docs.where(F.col("doc_id") < 30),
                docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 45)))

    @staticmethod
    def ingest(spark, src, work, hook=None):
        lsh_ingest_stream(spark, src, os.path.join(work, "corpus"),
                          os.path.join(work, "index"),
                          os.path.join(work, "ckpt"), fault_hook=hook)

    @staticmethod
    def state(spark, work):
        index = _read_optional_parquet(spark, os.path.join(work, "index"))
        return (_canon(read_corpus(spark, os.path.join(work, "corpus"))),
                _canon(index))


class _IvfLoop:
    stages = ("after_centroids_write", "after_cells_write")

    @staticmethod
    def batches(spark, sf_smoke):
        embs = spark.read.parquet(
            os.path.join(sf_smoke, "embeddings.parquet"))
        return (embs.where(F.col("vec_id") < 60),
                embs.where((F.col("vec_id") >= 60) & (F.col("vec_id") < 90)))

    @staticmethod
    def ingest(spark, src, work, hook=None):
        ivf_ingest_stream(spark, src, os.path.join(work, "index"),
                          os.path.join(work, "ckpt"), n_cells=4,
                          fault_hook=hook)

    @staticmethod
    def state(spark, work):
        cents = _read_optional_parquet(
            spark, os.path.join(work, "index", "centroids"))
        return (_canon(read_index_cells(spark, os.path.join(work, "index"))),
                _canon(cents))


@pytest.mark.parametrize(
    "loop,stage",
    [(loop, stage) for loop in (_LshLoop, _IvfLoop) for stage in loop.stages],
    ids=lambda v: v if isinstance(v, str) else v.__name__.strip("_").lower())
def test_mid_epoch_crash_heals_on_restart(spark, sf_smoke, tmp_path,
                                          loop, stage):
    """Kill the stream after the ``stage`` write of the FIRST epoch
    (sink written, checkpoint not committed), restart, continue with a
    second drop: every persisted table must equal the clean twin's —
    including the epoch partition values (the replay reuses the failed
    epoch id)."""
    src = str(tmp_path / "src")
    crash_work, clean_work = str(tmp_path / "crash"), str(tmp_path / "clean")
    batch1, batch2 = loop.batches(spark, sf_smoke)
    batch1.write.parquet(src)

    def boom(s, epoch_id):
        if s == stage:
            raise RuntimeError(f"injected crash at {s}")

    with pytest.raises(Exception, match="injected crash"):
        loop.ingest(spark, src, crash_work, hook=boom)
    loop.ingest(spark, src, crash_work)          # restart: replay heals
    loop.ingest(spark, src, clean_work)          # clean twin, same files

    batch2.write.mode("append").parquet(src)     # later epochs unpoisoned
    loop.ingest(spark, src, crash_work)
    loop.ingest(spark, src, clean_work)

    crash_state = loop.state(spark, crash_work)
    clean_state = loop.state(spark, clean_work)
    assert crash_state[0], "ingest admitted nothing"
    assert crash_state == clean_state
