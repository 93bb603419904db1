"""Typed, schema-tolerant projections (SURVEY.md §2.2, P1–P6).

The reference shapes every row into a flat document with a per-field
``(type, default)`` map and try/except-default casts, applied through a
Python row loop over an RDD (``data-s3-elastic-transfer.py:154-186``,
``:321``). That disables codegen and forces JVM↔Python serialization for
what are pure casts.

Here the same semantics are *declared*: Spark's ``cast`` yields null on
failure, so ``coalesce(cast(col, type), default)`` reproduces the
reference's try/except-default exactly (edge cases documented in
SURVEY.md §7.4), stays inside whole-stage codegen, and vectorizes over
parquet. The projection is schema-tolerant the same way the reference is
(``data-s3-elastic-transfer.py:174-184``): fields absent from the input
are emitted as their defaults.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (spark_type, default) — mirrors the reference's field_mappings table
# (data-s3-elastic-transfer.py:163-172) for its one logical table.
REFERENCE_FIELD_MAPPINGS: dict[str, tuple[str, object]] = {
    "id": ("string", ""),
    "month": ("string", ""),
    "month_num": ("int", 0),
    "value": ("int", 0),
    "temperature": ("double", 0.0),
    "humidity": ("double", 0.0),
    "ts": ("long", 0),
    "city": ("string", ""),
    "date": ("string", ""),
    "date_timestamp_ns": ("string", ""),
    "date_timestamp_converted": ("string", ""),
}


def safe_cast(col: Column, spark_type: str, default: object) -> Column:
    """``coalesce(try_cast(col, type), default)`` — the declarative twin
    of the reference's ``safe_get`` + try/except cast
    (``data-s3-elastic-transfer.py:118-124,176-184``). ``try_cast``
    (not ``cast``): Spark 4 runs ANSI mode by default, where a failing
    ``cast`` throws instead of yielding null."""
    return F.coalesce(col.try_cast(spark_type), F.lit(default).cast(spark_type))


def typed_projection(df: DataFrame,
                     field_mappings: Mapping[str, tuple[str, object]] | None = None,
                     ) -> DataFrame:
    """Schema-tolerant typed projection (P3/P4/P6).

    Emits every field in ``field_mappings``: present columns are
    safe-cast, absent columns become their default — identical
    observable behavior to ``row_to_document_safe``
    (``data-s3-elastic-transfer.py:154-186``) but fully columnar.
    """
    mappings = dict(field_mappings or REFERENCE_FIELD_MAPPINGS)
    present = set(df.columns)
    cols = []
    for name, (spark_type, default) in mappings.items():
        if name in present:
            cols.append(safe_cast(F.col(name), spark_type, default).alias(name))
        else:
            cols.append(F.lit(default).cast(spark_type).alias(name))
    return df.select(*cols)


def validate_and_clean(df: DataFrame,
                       required_nonempty: tuple[str, ...] = ("id", "month"),
                       float_fields: tuple[str, ...] = ("temperature", "humidity"),
                       empty_string_fields: tuple[str, ...] = ("city",),
                       ) -> DataFrame:
    """Declarative twin of ``validate_and_clean_document``
    (``data-s3-elastic-transfer.py:126-152``):

    - required string keys: null/empty → ``'unknown'``
    - float measures: failed coercion → ``0.0``
    - nullable strings: null → ``''``
    """
    out = df
    for c in required_nonempty:
        if c in df.columns:
            cleaned = F.trim(F.coalesce(F.col(c).cast("string"), F.lit("")))
            out = out.withColumn(
                c, F.when(cleaned == "", F.lit("unknown")).otherwise(cleaned))
    for c in float_fields:
        if c in df.columns:
            out = out.withColumn(c, safe_cast(F.col(c), "double", 0.0))
    for c in empty_string_fields:
        if c in df.columns:
            out = out.withColumn(
                c, F.coalesce(F.col(c).cast("string"), F.lit("")))
    return out
