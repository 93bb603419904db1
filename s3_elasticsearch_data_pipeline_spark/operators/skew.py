"""Skew-mitigation operators (100 TB posture, SURVEY.md §4).

AQE handles most skew automatically (``skewJoin.enabled`` in
session.py); these are the explicit tools for when it can't — custom
partitioners, pre-3.0 clusters, or extreme single-key hot spots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, key: str, salts: int = 16) -> DataFrame:
    """Two-phase skew-safe count: phase 1 aggregates on (key, salt) so a
    hot key spreads over ``salts`` reducers; phase 2 merges per key.
    Identical results to ``groupBy(key).count()``.

    The salt is derived from a hash of the full row via ``spark_partition_id
    + monotonically_increasing_id`` — cheap, uniform, and deterministic
    within a run (determinism across runs is not required: the salt never
    reaches the output).
    """
    salted = df.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id()))
                   % salts))
    phase1 = (salted.groupBy(key, "__salt")
              .agg(F.count(F.lit(1)).alias("__partial")))
    return (phase1.groupBy(key)
            .agg(F.sum("__partial").alias("cnt")))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salts: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the small
    side once per salt value, join on (key, salt). Spreads a hot join
    key over ``salts`` tasks at the cost of replicating the small side
    ``salts``× — the classic manual skew join.
    """
    big_salted = big.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id()))
                   % salts))
    salt_values = big.sparkSession.range(salts) \
        .select(F.col("id").cast("long").alias("__salt"))
    small_replicated = small.crossJoin(F.broadcast(salt_values))
    return (big_salted
            .join(small_replicated, [key, "__salt"], how)
            .drop("__salt"))
