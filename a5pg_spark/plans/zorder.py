"""Z-order (Morton) layout — multi-dimension clustering for snapshot tables.

A table sorted on one column prunes range scans on THAT column only; any
second dimension spans its full domain inside every file, so its footer
stats prune nothing.  Interleaving the bits of two dimensions and sorting by
the interleaved value bounds BOTH dimensions' extents per file (a contiguous
z-run is a small set of quad-tree boxes), which is exactly what Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(a, b))``
maintenance action does.

The interleave is pure JVM bit arithmetic (the classic parallel-prefix
spread: five shift-or-mask rounds), so the z-value computes inside
whole-stage codegen at scan speed — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parallel-prefix spread masks: after round k, each input bit has 2^k zeros
# behind it; composing all five spaces 32 bits into the even positions
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(x: Column, bits: int) -> Column:
    x = x.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zvalue(a: Column, b: Column, bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative longs
    (a in even positions, b in odd): z = spread(a) | spread(b) << 1.
    bits ≤ 31 keeps every intermediate below 2⁶³."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in 1..31")
    return _spread_bits(a.cast("long"), bits).bitwiseOR(
        F.shiftleft(_spread_bits(b.cast("long"), bits), 1)
    )


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, bits: int = 21, z_col: str = "zv"
) -> DataFrame:
    """Add the z-value column — write the result through
    ``SnapshotTable`` with ``sort_col=z_col`` and
    ``stats_cols=(col_a, col_b)`` to get a multi-dimension-prunable layout."""
    return df.withColumn(z_col, zvalue(F.col(col_a), F.col(col_b), bits))
