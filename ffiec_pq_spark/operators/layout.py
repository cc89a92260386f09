"""Z-order (Morton) data layout: interleave the bits of two clustering
dimensions so that sorting by the single z value co-locates rows that
are close in BOTH dimensions — the lakehouse clustering trick that
makes parquet min/max pruning effective for range predicates on either
column (a plain sort clusters only its leading column).

Everything is shift/and/or column expressions (whole-stage codegen, no
UDF); the write path is ``repartitionByRange(z).sortWithinPartitions
(z)`` so each output file owns one contiguous z-range = one small
bounding box in (a, b) space.  At 100 TB this is how you keep BOTH
``WHERE user_id = ?`` and ``WHERE ts BETWEEN ?`` scans sparse from one
copy of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1 (``bits`` low bits each)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def interleave_bits_sql(expr_a: str, expr_b: str, bits: int = 16) -> str:
    """DuckDB mirror of :func:`interleave_bits` (same shift/mask ops on
    64-bit integers)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({expr_a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({expr_b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by the z-value of (col_a, col_b):
    range-partition on z (each file = one contiguous z-range), sort
    within partitions so row groups are clustered too, drop the helper
    column on write."""
    z = interleave_bits(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
