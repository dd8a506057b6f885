"""Multi-dimensional data layout: z-order (Morton) clustering keys.

Parquet/Delta file skipping works off per-file (and per-row-group)
min/max stats. Sorting by ONE column gives perfect skipping on that
column and none on any other; interleaving the bits of two columns — the
z-order curve — bounds every file to a small rectangle in BOTH
dimensions, so predicates on either column (or both) skip most files.
This is the layout trick behind Delta's OPTIMIZE ZORDER BY, expressed
here as a plain sort key any writer can use.

Pure bit arithmetic, JVM-side, no UDF. Columns must be non-negative
integers (quantize floats/dates to ordinals first — e.g. day-of-epoch,
bucketed id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative int
    columns: bit i of ``a`` lands at position 2i, of ``b`` at 2i+1.
    ``bits=16`` covers dimensions up to 65k distinct quantized values and
    fits the result in a long."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: Column,
    col_b: Column,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered on the z-order curve of (col_a, col_b):
    range-partition by the z-key (contiguous curve segments per file) and
    sort within files, so each file's min/max box is tight in both
    dimensions. One shuffle; at scale ``n_files`` follows data volume."""
    keyed = df.withColumn("__z", zorder_key(col_a, col_b, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
