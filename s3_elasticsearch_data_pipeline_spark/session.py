"""SparkSession factory tuned for the engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32
threads); the same configs are the ones we would set on a 1000-executor
cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), runtime bloom filters (pre-reduces the shuffle-heavy
id-level anti-join), UTC session timezone (oracle comparability), Arrow
for the few Pandas-UDF extension operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(app_name: str = "s3_elasticsearch_data_pipeline_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    At cluster scale only ``master`` and memory sizing change; every
    ``spark.sql.*`` setting below is scale-portable.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle sizing: ~cores locally. On a real cluster AQE coalesces
        # from a deliberately-high initial number, so this is a ceiling,
        # not a hand-tuned constant.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing, skew-join splitting, and
        # dynamic broadcast decisions — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom filter: pre-reduces the big probe side of the
        # id-level anti/semi joins before the shuffle (SURVEY.md §4).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Python DataSource filter pushdown (off by default in 4.1):
        # lets the es_http reader translate predicates into ES
        # query-DSL so the cluster prunes scans server-side.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Deterministic timestamps vs the DuckDB oracle (UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for the Pandas-UDF extension operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


import contextlib
import threading

#: Serializes AQE-toggle windows across operators (conf toggles are
#: session-global — racing callers must not plan under each other's
#: setting). Moved here from operators/graph.py in r11 so every
#: scoped toggle shares ONE lock.
_AQE_SCOPE_LOCK = threading.Lock()


@contextlib.contextmanager
def aqe_disabled(spark: SparkSession):
    """Scope AQE off around a small materializing action whose plan
    gains nothing from runtime re-optimization (kilobyte aggregates,
    broadcast-only iteration loops): AQE's per-stage re-plan turns one
    action into one job per exchange, and for driver-blocking chains
    the extra job GAPS are the cost (PageRank measured 17 jobs →
    slower wall clock). Same caveats as the PageRank scope: other
    queries planned concurrently in this session would also see AQE
    off — multi-tenant services should hand such operators a session
    clone."""
    key = "spark.sql.adaptive.enabled"
    with _AQE_SCOPE_LOCK:
        prior = spark.conf.get(key, "true")
        try:
            spark.conf.set(key, "false")
            yield
        finally:
            spark.conf.set(key, prior)


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Snapshot the ids of every currently persisted/checkpointed RDD
    (the BlockManager-resident relations)."""
    ids: set[int] = set()
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def release_persistent_rdds(spark: SparkSession, ids: set[int]) -> int:
    """Unpersist the persisted/checkpointed RDDs with the given ids.
    Returns how many were freed.

    Why this exists: iterative operators (PageRank, connected
    components, trainers) localCheckpoint per round to truncate
    lineage. Those blocks are reclaimed only when the JVM GCs the
    frame and the async ContextCleaner runs — under repeated calls in
    one session (benchmarks, sweeps, long-lived services) blocks pile
    up in the BlockManager faster than GC notices, and eviction storms
    showed up as multi-second stalls (2.5 s → 14 s over eight calls,
    measured). Operators therefore snapshot :func:`persistent_rdd_ids`
    at entry, snapshot again once every intermediate is materialized,
    eagerly checkpoint their RESULT last (its blocks are created after
    the second snapshot, so the diff can never name them), and release
    the diff deterministically before returning.

    Single-controller discipline: callers must not run this
    concurrently with other work persisting RDDs in the same session —
    the id diff cannot tell an intermediate from a neighbor's cache.
    """
    sc = spark.sparkContext._jsc.sc()
    it = sc.getPersistentRDDs().iterator()
    stale = []
    while it.hasNext():
        e = it.next()
        if e._1() in ids:
            stale.append(e._2())
    for rdd in stale:
        rdd.unpersist(False)
    return len(stale)
