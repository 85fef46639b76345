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


# --------------------------------------------------------------------------
# histogram quantiles — the portable analogue of approx_percentile
# --------------------------------------------------------------------------
#
# Spark's approx_percentile (Greenwald-Khanna) and DuckDB's approx_quantile
# (t-digest) are different algorithms — their estimates can never agree
# bit-for-bit.  A fixed-width integer histogram CAN: binning is pure integer
# arithmetic ((v-lo)*B div (hi-lo+1), non-negative operands so Spark's DIV
# and DuckDB's // agree), ranks are exact integers (ceil(q·n) via
# (n·num + den - 1) div den), and only the final interpolation touches
# doubles (same IEEE expression in both engines, rounded to 4 decimals).
#
# Scale design: state is ≤ ``bins`` counters per group — constant in data
# size, MERGES BY ADDITION (the law tests/test_sketches pins) — built by one
# map-side-combined shuffle.  Accuracy: the estimate is within one bin width
# (hi-lo+1)/bins of an exact quantile, a deterministic guarantee rather than
# a probabilistic one.  The per-group (lo, hi, n) pass broadcasts back (a
# group-count-sized table); at a known fixed domain pass lo/hi as literals
# and it becomes single-pass.

QUANTILES: Sequence[tuple[str, int, int]] = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def histogram_counts(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    bins: int = 256,
    domain: tuple[int, int] | None = None,
) -> DataFrame:
    """The sketch STATE: (group…, lo, hi, n, __bin, cnt) — at most ``bins``
    rows per group for any input size, mergeable by adding ``cnt`` (same
    lo/hi).  ``value_col`` must be integral (cast upstream).

    With ``domain=(lo, hi)`` the histogram is SINGLE-PASS (no stats
    pre-aggregation) and sketches over different data slices share the same
    binning — the precondition of the merge law.  Without it, lo/hi are
    derived per group by one extra bounded aggregation."""
    gcols = list(group_cols)
    v = F.col(value_col).cast("long")
    if domain is not None:
        from pyspark.sql import Window

        lo, hi = int(domain[0]), int(domain[1])
        return (
            df.select(
                *gcols,
                F.lit(lo).cast("long").alias("lo"),
                F.lit(hi).cast("long").alias("hi"),
                F.expr(
                    f"CAST(({value_col} - {lo}L) * {bins} DIV ({hi}L - {lo}L + 1) AS INT)"
                ).alias("__bin"),
            )
            .groupBy(*gcols, "lo", "hi", "__bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("n", F.sum("cnt").over(Window.partitionBy(*gcols)))
            .select(*gcols, "lo", "hi", "n", "__bin", "cnt")
        )
    stats = df.groupBy(*gcols).agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count(F.lit(1)).alias("n")
    )
    binned = df.join(F.broadcast(stats), gcols).select(
        *gcols,
        "lo",
        "hi",
        "n",
        F.expr(f"CAST(({value_col} - lo) * {bins} DIV (hi - lo + 1) AS INT)").alias(
            "__bin"
        ),
    )
    return binned.groupBy(*gcols, "lo", "hi", "n", "__bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    bins: int = 256,
    quantiles: Sequence[tuple[str, int, int]] = QUANTILES,
) -> DataFrame:
    """Quantile estimates per group from the bounded histogram: for each
    (name, num, den) the rank is ceil(n·num/den); the estimate interpolates
    inside the first bin whose cumulative count reaches it.  Deterministic
    error ≤ one bin width."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    h = histogram_counts(df, value_col, group_cols, bins)
    w = Window.partitionBy(*gcols).orderBy("__bin")
    cum = h.withColumn("cum", F.sum("cnt").over(w))
    out = None
    for name, num, den in quantiles:
        r = F.expr(f"(n * {num} + {den} - 1) DIV {den}")
        hit = (
            cum.where(F.col("cum") >= r)
            .groupBy(*gcols, "lo", "hi", "n")
            .agg(F.min(F.struct("__bin", "cnt", "cum")).alias("s"))
        )
        est = F.round(
            F.col("lo")
            + (
                F.col("s.__bin")
                + (r - (F.col("s.cum") - F.col("s.cnt"))) / F.col("s.cnt")
            )
            * (F.col("hi") - F.col("lo") + 1)
            / F.lit(bins),
            4,
        ).alias(f"est_{name}")
        q = hit.select(*gcols, "n", est)
        out = q if out is None else out.join(q.drop("n"), gcols)
    return out


def exact_quantile_via_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    num: int = 1,
    den: int = 2,
    bins: int = 256,
) -> DataFrame:
    """EXACT rank-``ceil(n·num/den)`` value per group — without ever sorting
    the data.  Two-pass selection guided by the bounded histogram: binning
    is monotone, so values in lower bins are strictly smaller than values in
    higher bins; the global rank-r element is therefore the local rank
    ``r - cum_prev`` element INSIDE the bin where the cumulative count
    reaches r.  Pass 1 aggregates ≤ bins counters per group; pass 2 sorts
    only that one bin's rows (≈ n/bins of the data, per group) under a
    window keyed by group.  At 100 TB this replaces a full per-group sort
    with one bounded aggregation plus a 1/bins-sized sort — the same trick
    as a distributed quickselect with a fixed pivot grid.

    ``value_col`` must be INTEGRAL (same contract as ``histogram_counts``,
    restated here per r05 ADVICE): pass 1 derives lo/hi from the value cast
    to long while pass 2 re-bins the raw expression — for non-integral
    inputs the two binnings could disagree and silently select the wrong
    rank.  Cast upstream.

    Returns (group…, q_exact)."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    h = histogram_counts(df, value_col, gcols, bins)
    w = Window.partitionBy(*gcols).orderBy("__bin")
    cum = h.withColumn("cum", F.sum("cnt").over(w))
    r = F.expr(f"(n * {num} + {den} - 1) DIV {den}")
    target = (
        cum.where(F.col("cum") >= r)
        .groupBy(*gcols, "lo", "hi", "n")
        .agg(F.min(F.struct("__bin", "cnt", "cum")).alias("s"))
        .select(
            *gcols,
            "lo",
            "hi",
            F.col("s.__bin").alias("__tbin"),
            (r - (F.col("s.cum") - F.col("s.cnt"))).alias("__lrank"),
        )
    )
    binned = df.join(F.broadcast(target), gcols).where(
        F.expr(f"CAST(({value_col} - lo) * {bins} DIV (hi - lo + 1) AS INT)")
        == F.col("__tbin")
    )
    wv = Window.partitionBy(*gcols).orderBy(value_col)
    return (
        binned.withColumn("__rn", F.row_number().over(wv))
        .where(F.col("__rn") == F.col("__lrank"))
        .select(*gcols, F.col(value_col).alias("q_exact"))
    )
