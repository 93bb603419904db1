"""Diff-and-load joins (SURVEY.md §2.4, J1–J4) — the heart of the pipeline.

The reference computes "what needs loading?" with Python ``set`` algebra
over driver-collected keys pulled through paginated HTTP
(``data-s3-elastic-transfer.py:281-291``; ``ID-based-transfer.py:241``).
Those are relational semi/anti joins in disguise; here they are actual
joins, so Catalyst chooses broadcast vs sort-merge, AQE fixes skew at
runtime, and the Spark 3.3+ runtime bloom filter pre-reduces the probe
side of the id-level anti-join before its shuffle — the one op that is
shuffle-heavy at 100 TB.

Scale posture per operator:
- partition-key diff (J1): both sides are tiny aggregates (≤ thousands
  of partitions) → broadcast anti-join, no meaningful shuffle.
- id diff (J2) and fetch (J3): source side is the 100 TB table. The
  partition predicate prunes to the mismatched partitions first; the
  anti/semi join then shuffles only those partitions, with the bloom
  filter dropping non-candidates map-side.
- count compare (J4): two partial-aggregated count tables, both tiny →
  broadcast full-outer join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_counts(df: DataFrame, key: str = "month") -> DataFrame:
    """Per-partition-value counts (A1/A2): ``groupBy(key).count()``.

    Spark's hash aggregate is automatically partial+final (map-side
    combine), so only one row per distinct key crosses the shuffle —
    unlike the reference's ES terms agg this has no bucket cap
    (``data-s3-elastic-transfer.py:57`` silently truncates at 20;
    documented divergence, SURVEY.md §7.4.3).
    """
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))


def missing_partitions(source: DataFrame, sink: DataFrame,
                       key: str = "month") -> DataFrame:
    """J1 — partition values present in source but absent in sink.

    Declarative twin of ``months_to_transfer = athena − es``
    (``data-s3-elastic-transfer.py:281-291``). Both inputs may be full
    tables; they are reduced to distinct key sets first so the anti-join
    build side is tiny and broadcasts.
    """
    src_keys = source.select(key).distinct()
    sink_keys = sink.select(key).distinct()
    return src_keys.join(F.broadcast(sink_keys), key, "left_anti")


def missing_ids(source: DataFrame, sink: DataFrame, id_col: str = "id",
                partition_pred: Column | None = None) -> DataFrame:
    """J2 — row keys in source but not sink (``ID-based-transfer.py:241``).

    At scale: ``partition_pred`` prunes the scan to mismatched
    partitions; the anti-join is sort-merge with a runtime bloom filter
    (enabled in session.py) reducing the probe side map-side.
    """
    src = source.where(partition_pred) if partition_pred is not None else source
    snk = sink.where(partition_pred) if partition_pred is not None else sink
    return src.select(id_col).distinct().join(
        snk.select(id_col).distinct(), id_col, "left_anti")


def fetch_rows_for_ids(source: DataFrame, ids: DataFrame, id_col: str = "id",
                       partition_pred: Column | None = None) -> DataFrame:
    """J3 — semi-join fetch of full rows for a key set.

    The reference issues ``WHERE id IN (...)`` in 10 000-id chunks
    (``ID-based-transfer.py:170-196``) purely because of Athena
    query-string limits; a semi-join needs no chunking at any scale.
    """
    src = source.where(partition_pred) if partition_pred is not None else source
    return src.join(ids.select(id_col).distinct(), id_col, "left_semi")


def count_mismatches(source: DataFrame, sink: DataFrame,
                     key: str = "month") -> DataFrame:
    """J4 — per-key count compare, keeping keys whose counts differ
    (``ID-based-transfer.py:90-109``). Missing side counts as 0.

    Shape (r9): tag each side's rows with a (source, sink) one-hot,
    UNION, then ONE hash aggregate — a single shuffle of one row per
    (key, side) per task after map-side combine, versus the previous
    two-aggregate + full-outer-join plan (2 Exchanges + 2 sort-merge
    joins for the same kilobyte output). A missing side simply sums
    to 0, so no coalesce/outer-join null handling is needed; NULL
    keys group together (one compared row), which is the comparison
    semantics a reconciler wants.

    Returns ``(key, source_cnt, sink_cnt)``.
    """
    a = source.select(F.col(key),
                      F.lit(1).cast("long").alias("source_cnt"),
                      F.lit(0).cast("long").alias("sink_cnt"))
    b = sink.select(F.col(key).cast(source.schema[key].dataType),
                    F.lit(0).cast("long").alias("source_cnt"),
                    F.lit(1).cast("long").alias("sink_cnt"))
    return _sum_and_keep_mismatches(a.unionByName(b), key)


def count_mismatches_against_counts(source: DataFrame,
                                    sink_counts: DataFrame,
                                    key: str = "month") -> DataFrame:
    """J4 against a PRE-AGGREGATED sink: ``sink_counts`` is
    ``(key, sink_cnt)`` — e.g. the buckets of a wire-level terms
    aggregation (``sources.es_http.es_terms_counts``) or a load-log
    state table — so the sink side never materializes row-level data.
    Same contract and union-aggregate shape as
    :func:`count_mismatches`: source rows tagged 1, the count table's
    rows carry their count, one hash aggregate, no join."""
    a = source.select(F.col(key),
                      F.lit(1).cast("long").alias("source_cnt"),
                      F.lit(0).cast("long").alias("sink_cnt"))
    b = sink_counts.select(
        F.col(key).cast(source.schema[key].dataType).alias(key),
        F.lit(0).cast("long").alias("source_cnt"),
        F.col("sink_cnt").cast("long").alias("sink_cnt"))
    return _sum_and_keep_mismatches(a.unionByName(b), key)


def _sum_and_keep_mismatches(tagged: DataFrame, key: str) -> DataFrame:
    return (tagged.groupBy(key)
            .agg(F.sum("source_cnt").alias("source_cnt"),
                 F.sum("sink_cnt").alias("sink_cnt"))
            .where(F.col("source_cnt") != F.col("sink_cnt")))


def snapshot_diff(old: DataFrame, new: DataFrame, key: str,
                  compare_cols: tuple[str, ...]) -> DataFrame:
    """Change-data-capture diff of two table snapshots: one row per
    added / removed / changed key, with the sorted list of columns that
    changed — the input a MERGE/SCD pipeline consumes.

    ONE full-outer join on the key; presence markers (constant 1 per
    side) distinguish a missing row from legitimately-null compare
    columns, and the change classification is a pure projection over
    the joined row. Null-safe equality (`eqNullSafe`) so NULL->value
    and value->NULL both count as changes. Unchanged keys are dropped
    by the final filter, so the output is delta-sized.
    """
    o = old.select(F.col(key), F.lit(1).alias("__in_old"),
                   *[F.col(c).alias(f"__o_{c}") for c in compare_cols])
    n = new.select(F.col(key), F.lit(1).alias("__in_new"),
                   *[F.col(c).alias(f"__n_{c}") for c in compare_cols])
    j = o.join(n, key, "full_outer")
    changed_cols = F.array_sort(F.filter(F.array(*[
        F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
        for c in compare_cols]), lambda x: x.isNotNull()))
    out = j.select(
        key,
        F.when(F.col("__in_old").isNull(), F.lit("added"))
         .when(F.col("__in_new").isNull(), F.lit("removed"))
         .otherwise(F.lit("changed")).alias("change_type"),
        F.when(F.col("__in_old").isNull() | F.col("__in_new").isNull(),
               F.array().cast("array<string>"))
         .otherwise(changed_cols).alias("changed_cols"))
    return out.where((F.col("change_type") != "changed")
                     | (F.size("changed_cols") > 0))


def apply_changes(old: DataFrame, changes: DataFrame, key: str,
                  payload_cols: tuple[str, ...]) -> DataFrame:
    """Apply a keyed change feed (``op`` ∈ {'upsert','delete'} +
    payload columns) to a snapshot — MERGE INTO semantics as pure
    DataFrame algebra, the write-side twin of ``snapshot_diff``.

    ONE anti-join (drop every keyed-in-feed row from the snapshot) +
    one union of the upsert payloads. The change feed is delta-sized
    by construction, so it is explicitly broadcast: the 100 TB
    snapshot streams through untouched, shuffle-free. For a feed too
    large to broadcast, drop the hint and the same plan runs as a
    shuffled anti-join.
    """
    feed_keys = changes.select(key)
    kept = old.join(F.broadcast(feed_keys), key, "left_anti")
    upserts = (changes.where(F.col("op") == "upsert")
               .select(key, *payload_cols))
    return kept.select(key, *payload_cols).unionByName(upserts)


def null_safe_join_counts(events: DataFrame) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) vs
    plain ``=``: nulls match each other under <=> and never under =.

    Demonstrated on a deterministically nulled key (user_id % 13 == 0
    → NULL on both sides): the output contrasts pair counts under the
    two semantics, a one-row audit of how much of a join would
    silently vanish with plain equality. Both joins are ordinary hash
    shuffles — <=> hashes null as a regular key value.
    """
    nulled = F.when(F.col("user_id") % 13 == 0, F.lit(None)) \
        .otherwise(F.col("user_id"))
    a = (events.where(F.col("event_type") == "purchase")
         .select(nulled.alias("k"), F.col("event_id").alias("pid")))
    b = (events.where(F.col("event_type") == "signup")
         .select(nulled.alias("k"), F.col("event_id").alias("sid")))
    eq = a.join(b, a["k"] == b["k"]).agg(
        F.count(F.lit(1)).alias("n"))
    nseq = a.join(b, a["k"].eqNullSafe(b["k"])).agg(
        F.count(F.lit(1)).alias("n"))
    return (eq.select(F.lit("equals").alias("semantics"), "n")
            .unionByName(nseq.select(
                F.lit("null_safe").alias("semantics"), "n")))
