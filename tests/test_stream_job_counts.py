"""Per-epoch job-count guard for the four streaming ingest loops
(r8, VERDICT item 7): the batch build/append/probe surface got its
pins in ``test_index_job_counts.py``; the ingest streams run their own
per-epoch job sequences inside ``foreachBatch``, where a stray
probe/count (the class found manually in r5 and r6) would hide from
the batch pins. One bootstrap epoch and one steady-state epoch per
loop, exact totals.

Counting: streaming jobs run under the query's own job group on the
stream-execution thread, so ``setJobGroup`` on the test thread never
sees them — instead we read the monotonically increasing max job id
from the AppStatusStore (eviction-safe, unlike the list's size) and
poll until the async listener bus has drained. Counts are actions:
they don't vary with data volume or partitioning, only with the code
path. A dropping count is an improvement; a rising one is a stray
action to find before re-pinning.
"""

from __future__ import annotations

import time

import numpy as np
import pytest


def _max_job_id(spark) -> int:
    jobs = spark.sparkContext._jsc.sc().statusStore().jobsList(None)
    n = jobs.size()
    if not n:
        return -1
    return max(jobs.apply(i).jobId() for i in range(n))


def _stable_max_job_id(spark, settle: float = 0.4,
                       timeout: float = 15.0) -> int:
    """The listener bus is async — poll until the max job id holds
    still for ``settle`` seconds."""
    deadline = time.time() + timeout
    prev = _max_job_id(spark)
    while time.time() < deadline:
        time.sleep(settle)
        cur = _max_job_id(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def _jobs_during(spark, fn) -> int:
    before = _stable_max_job_id(spark)
    fn()
    return _stable_max_job_id(spark) - before


@pytest.fixture()
def emb_writer(spark, tmp_path):
    """Deterministic embedding batches written as parquet files under
    one source dir (near-twin pairs across batches so the dedup loops
    exercise their drop paths)."""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(40, 8))

    def write(batch_no: int):
        rows = []
        for i in range(40):
            v = base[i] + rng.normal(scale=1e-3, size=8) * batch_no
            rows.append((batch_no * 1000 + i,
                         [float(x) for x in v]))
        (spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
         .coalesce(1).write.mode("append")
         .parquet(str(tmp_path / "src")))
        return str(tmp_path / "src")
    return write, tmp_path


def test_lsh_ingest_epoch_job_counts(spark, tmp_path):
    from s3_elasticsearch_data_pipeline_spark.streaming.lsh_ingest import (
        lsh_ingest_stream)
    src = str(tmp_path / "src")

    def docs(batch_no):
        rows = [(batch_no * 1000 + i,
                 f"document number {i} in batch {batch_no} "
                 f"with several words of text") for i in range(30)]
        (spark.createDataFrame(rows, "doc_id long, text string")
         .coalesce(1).write.mode("append").parquet(src))

    docs(0)
    args = (spark, src, str(tmp_path / "c"), str(tmp_path / "i"))
    boot = _jobs_during(
        spark, lambda: lsh_ingest_stream(*args, str(tmp_path / "k")))
    docs(1)
    steady = _jobs_during(
        spark, lambda: lsh_ingest_stream(*args, str(tmp_path / "k")))
    assert (boot, steady) == (20, 26), (boot, steady)


def test_ivf_ingest_epoch_job_counts(spark, emb_writer):
    from s3_elasticsearch_data_pipeline_spark.streaming.ivf_ingest import (
        ivf_ingest_stream)
    write, tmp_path = emb_writer
    src = write(0)
    args = (spark, src, str(tmp_path / "i"), str(tmp_path / "k"))
    boot = _jobs_during(spark, lambda: ivf_ingest_stream(*args))
    write(1)
    steady = _jobs_during(spark, lambda: ivf_ingest_stream(*args))
    # bootstrap: schema read + isEmpty + k-means training (init fetch
    # + 2x assign/agg collect) + centroids write + assign/cells write;
    # steady swaps training for the quantizer load — a pyarrow driver
    # read since r11, zero Spark jobs (10 -> 6)
    assert (boot, steady) == (11, 6), (boot, steady)


def test_ivfpq_ingest_epoch_job_counts(spark, emb_writer):
    from s3_elasticsearch_data_pipeline_spark.streaming.ivfpq_ingest import (
        ivfpq_ingest_stream)
    write, tmp_path = emb_writer
    src = write(0)
    args = (spark, src, str(tmp_path / "i"), str(tmp_path / "k"))
    boot = _jobs_during(spark, lambda: ivfpq_ingest_stream(*args))
    write(1)
    steady = _jobs_during(spark, lambda: ivfpq_ingest_stream(*args))
    # r11: the steady epoch's quantizer/codebooks/meta loads are
    # pyarrow driver reads — zero Spark jobs (17 -> 7)
    assert (boot, steady) == (13, 7), (boot, steady)


def test_semantic_ingest_epoch_job_counts(spark, emb_writer):
    from s3_elasticsearch_data_pipeline_spark.streaming.semantic_ingest \
        import semantic_ingest_stream
    write, tmp_path = emb_writer
    src = write(0)
    args = (spark, src, str(tmp_path / "c"), str(tmp_path / "i"),
            str(tmp_path / "k"))
    boot = _jobs_during(spark, lambda: semantic_ingest_stream(*args))
    write(1)
    steady = _jobs_during(spark, lambda: semantic_ingest_stream(*args))
    # r9 (22 -> 21 steady): the shared _load_quantizer reads+collects
    # the centroid table in one job; r11 (21 -> 17): that load is a
    # pyarrow driver read now — zero Spark jobs
    assert (boot, steady) == (18, 17), (boot, steady)
