"""Cardinality and frequency sketches (HyperLogLog, count-min) with a
PORTABLE bit-for-bit contract.

Spark ships ``approx_count_distinct`` (HLL++), but its register layout is an
implementation detail — no other engine reproduces its estimates, so it can
never be oracle-checked exactly.  This module implements classic HLL
(Flajolet et al. 2007) from integer primitives every SQL engine shares
(``*``, ``%``, ``xor``, ``>>``, ``bin``, ``instr``), which makes the whole
sketch — hash, registers, estimator, small-range correction — replayable in
DuckDB SQL down to the last bit:

* hash: two multiply-mod-2³¹ rounds interleaved with xor-shifts (values stay
  < 2³¹ before each multiply, so int64 products never overflow — DuckDB
  errors on BIGINT overflow, Spark silently wraps; we stay clear of both);
* rho: position of the first set bit of the 23-bit suffix via
  ``instr(lpad(bin(v), 23, '0'), '1')`` — string ops, identical everywhere;
* register sum: ``sum(1 << (24 - rho))`` scaled by 2⁻²⁴ — INTEGER arithmetic,
  so the harmonic mean is exact, order-independent, engine-independent;
* small-range correction ``m·ln(m/zeros)``: the domain is finite
  (zeros ∈ 1..m), and all 256 values were verified to round identically in
  Spark (java.lang.Math.log) and DuckDB (libm) at 4 decimals.

Scale design: one shuffle of (group, bucket, rho) partials — map-side combine
reduces each partition to ≤ m rows per group before the exchange — then an
m-row-per-group rollup.  The sketch state for ANY data size is m registers;
merging two sketches is ``max`` per register, so this parallelizes the way
HLL is meant to.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M31 = 2_147_483_648  # 2^31
MIX1 = 2_654_435_761  # Knuth multiplicative constant
MIX2 = 1_597_334_677

# additive salts giving the d independent CMS hash rows (any constants < 2^31)
CMS_SALTS = (0, 69_069, 747_796_405, 1_013_904_223)


def portable_hash31(key: Column, salt: int = 0) -> Column:
    """31-bit integer hash: mod-(2³¹−1) fold (+ additive salt for
    independent rows), then two multiply/xor-shift rounds.  Every
    intermediate stays < 2⁶³ (no BIGINT overflow anywhere)."""
    a = F.pmod(F.pmod(key.cast("long"), F.lit(M31 - 1)) + F.lit(salt), F.lit(M31 - 1))
    b = F.pmod(a * F.lit(MIX1), F.lit(M31))
    c = b.bitwiseXOR(F.shiftright(b, 15))
    d = F.pmod(c * F.lit(MIX2), F.lit(M31))
    return d.bitwiseXOR(F.shiftright(d, 13))


def portable_hash31_sql(key_expr: str, salt: int = 0) -> str:
    """The identical hash as ANSI/DuckDB SQL text — used by oracle authors so
    Spark and the oracle share one definition by construction."""
    a = f"((({key_expr}) % 2147483647 + {salt}) % 2147483647)"
    b = f"(({a} * 2654435761) % 2147483648)"
    c = f"xor({b}, {b} >> 15)"
    d = f"((({c}) * 1597334677) % 2147483648)"
    return f"xor({d}, {d} >> 13)"


def hll_registers(
    df: DataFrame, key_col: str, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """The HLL sketch STATE: (group…, __bkt, __r) — at most ``2**p`` rows per
    group for any input size.  Registers from different data slices merge
    with ``hll_merge`` (per-register max), so sketches build incrementally
    and union across partitions/tables without re-reading data."""
    m = 1 << p
    h = portable_hash31(F.col(key_col))
    bucket = F.pmod(h, F.lit(m))
    v = F.shiftright(h, p)  # 23 suffix bits at p=8 (h < 2^31)
    rho = (
        F.when(v == 0, F.lit(24))
        .otherwise(F.instr(F.lpad(F.bin(v), 23, "0"), "1"))
        .cast("int")
    )
    gcols = list(group_cols)
    return (
        df.select(*gcols, bucket.alias("__bkt"), rho.alias("__rho"))
        .groupBy(*gcols, "__bkt")
        .agg(F.max("__rho").alias("__r"))
    )


def hll_merge(*registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union sketch: per-register max across any number of register tables
    (the HLL merge law: est(merge(A, B)) == est(sketch(A ∪ B)), exactly)."""
    gcols = list(group_cols)
    u = registers[0]
    for r in registers[1:]:
        u = u.unionByName(r)
    return u.groupBy(*gcols, "__bkt").agg(F.max("__r").alias("__r"))


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """Estimator over a register table: harmonic mean of the registers with
    linear-counting small-range correction (Flajolet et al. 2007)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gcols = list(group_cols)
    stats = registers.groupBy(*gcols).agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 24 - __r)")).alias("__ss"),
        F.count(F.lit(1)).alias("nonzero_buckets"),
    )
    zeros = (F.lit(m) - F.col("nonzero_buckets")).cast("double")
    sum_inv = zeros + F.col("__ss") / F.lit(float(1 << 24))
    est_raw = F.lit(alpha * m * m) / sum_inv
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros), 4),
    ).otherwise(F.round(est_raw, 4))
    return stats.select(*gcols, "nonzero_buckets", est.alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    p: int = 8,
) -> DataFrame:
    """HLL distinct-count estimate of ``key_col`` per group: returns
    (group…, nonzero_buckets, est_distinct).  ``m = 2**p`` registers;
    relative error ≈ 1.04/sqrt(m) (6.5 % at p=8).  Composition of
    ``hll_registers`` → ``hll_estimate``."""
    return hll_estimate(hll_registers(df, key_col, group_cols, p), group_cols, p)


def _cms_pairs(key: Column, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(portable_hash31(key, s), F.lit(width)).alias("bucket"),
            )
            for i, s in enumerate(CMS_SALTS)
        ]
    )


def cms_counters(df: DataFrame, key_col: str, width: int = 1024) -> DataFrame:
    """Count-min sketch counter table: (row, bucket, cnt) — at most
    d·width rows for ANY input size.  One scan (the d hash rows explode from
    an array literal), one shuffle of partial counts; counters from disjoint
    data unions MERGE BY ADDITION, so sketches build incrementally."""
    return (
        df.select(F.explode(_cms_pairs(F.col(key_col), width)).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for ``keys`` from a ``cms_counters`` table:
    min over the d rows of the key's counters.  One-sided: est ≥ true count,
    overshoot bounded by collisions (≤ 2n/width with probability 1−2⁻ᵈ).
    The counter table is tiny (d·width), so the join broadcasts."""
    kb = keys.select(
        key_col, F.explode(_cms_pairs(F.col(key_col), width)).alias("p")
    ).select(key_col, F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        kb.join(F.broadcast(counters), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )
