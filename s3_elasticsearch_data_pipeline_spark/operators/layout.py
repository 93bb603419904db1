"""Physical-layout operators: multi-dimensional clustering (Morton /
Z-order) for data-skipping file layouts.

The reference's only layout tool is one-column hive partitioning
(``Partition-script.py:34-38``). A 100 TB table queried by more than
one key needs multi-dimensional clustering: sorting files by the
interleaved-bit (Morton) code of two keys gives every file a tight
min/max envelope on BOTH keys, so parquet row-group statistics prune
scans for either predicate — the same idea as Delta/Iceberg Z-ORDER.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Standard bit-spreading masks: spread the low 16 bits of x so bit k
# lands at position 2k (then interleave two spread words).
_SPREAD_STEPS = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                 (2, 0x33333333), (1, 0x55555555))


def _spread16(col: Column) -> Column:
    x = col.bitwiseAND(F.lit(0xFFFF)).cast("bigint")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_code(a: Column, b: Column) -> Column:
    """64-bit Morton (Z-order) code interleaving the low 16 bits of two
    integer columns: pure JVM bit algebra inside codegen."""
    return F.shiftleft(_spread16(a), 1).bitwiseOR(_spread16(b))


def zorder_layout(df: DataFrame, code: Column, n_files: int = 32) -> DataFrame:
    """Cluster a frame for writing: range-partition on the Z-code (one
    skew-aware range shuffle, AQE-friendly) and sort within partitions,
    so each output file covers a compact Z-interval of the key space."""
    return (df.withColumn("__z", code)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z"))
