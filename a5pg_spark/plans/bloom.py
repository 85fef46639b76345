"""Portable Bloom-filter join pruning — filter the fact side BEFORE its
shuffle.

The 100 TB problem: a selective dimension (say 3% of parts) inner-joined to
a huge fact table still shuffles EVERY fact row — the join condition can't
discard a row until both sides are co-located.  Spark's runtime bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects this filter
automatically but only under planner-chosen conditions, and its hash
(xxhash64) is an implementation detail no other engine replays.  This module
builds an EXPLICIT bloom filter from the same portable integer primitives as
the sketch family (`operators/sketches.py`), so:

* the bitmap build is one aggregation of the dim side — ``m`` bits of state
  regardless of dim cardinality, mergeable by ``|`` per word;
* the probe is pure JVM bit arithmetic on a broadcast single-row bitmap —
  ``element_at`` + shift + mask inside whole-stage codegen, zero Python,
  applied at the fact SCAN, before any exchange;
* no false negatives ⇒ bloom-pruned-join ≡ plain join (result-neutral, the
  law the tests pin), and because the hash chain is shared with
  ``portable_hash31_sql`` the EXACT pass/prune counts replay bit-for-bit in
  DuckDB (a key passes iff all k of its bit positions are in the dim's
  position set — expressible as k IN-subqueries on the same hash SQL).

At 100 TB: the bitmap (e.g. 2^20 bits = 16 KB) broadcasts to every executor
once; each pruned fact row is a row that never enters the shuffle, so the
exchange shrinks by the true-match rate plus a provably-bounded false
positive rate (1 - e^(-kn/m))^k.

Reference parity note: the reference (a5pg, a PostgreSQL extension) gets
this pruning for free from Postgres' btree semi-join; on Spark the explicit
bloom is the idiomatic equivalent for shuffle avoidance.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from a5pg_spark.operators.sketches import portable_hash31, portable_hash31_sql

# additive salts giving k independent hash rows (any constants < 2^31;
# distinct from CMS_SALTS so a bloom and a CMS over the same key don't share
# bit patterns)
BLOOM_SALTS: Sequence[int] = (97, 193_939, 899_809_343)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(portable_hash31(key, salt=BLOOM_SALTS[i]), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(dim: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3) -> DataFrame:
    """Aggregate the dim side into a ONE-ROW bitmap: ``bitmap`` is
    ``array<long>`` of ``m_bits/64`` words, word ``w`` holding bits
    ``[64w, 64w+63]``.  One shuffle of at most ``k·|dim|`` ints collapsing to
    ≤ ``m_bits`` distinct positions; the bitmap itself is built by a bounded
    JVM fold (no collect, no Python)."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    k = min(k, len(BLOOM_SALTS))
    words = m_bits // 64
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    ).distinct()
    # fold the ≤ m_bits distinct positions into the fixed-width word array
    # (SQL-expression form: the Python shiftleft/shiftright wrappers take a
    # Python int for the shift amount, but here it is a per-element column)
    return pos.agg(F.collect_set("p").alias("ps")).select(
        F.expr(
            f"""transform(sequence(0, {words - 1}), w ->
                  aggregate(filter(ps, p -> shiftright(p, 6) = w),
                            CAST(0 AS BIGINT),
                            (acc, p) -> acc | shiftleft(CAST(1 AS BIGINT),
                                                        CAST(p & 63 AS INT))))"""
        ).alias("bitmap")
    )


def bloom_prune(
    fact: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Keep only fact rows whose key MAY be in the dim (all k bits set).
    The one-row bitmap broadcasts; the test is codegen'd bit math at the
    scan, upstream of any join exchange."""
    k = min(k, len(BLOOM_SALTS))
    # r05 ADVICE: the probe injects working columns into the fact frame and
    # drops them by name — refuse loudly if the caller's frame already uses
    # those names (silently overwriting/dropping a user column is worse)
    clash = {"bitmap", *(f"__bp{i}" for i in range(k))} & set(fact.columns)
    if clash:
        raise ValueError(
            f"bloom_prune working columns collide with fact columns: {sorted(clash)}; "
            "rename them before pruning"
        )
    df = fact.crossJoin(F.broadcast(bloom))
    tmp = [f"__bp{i}" for i in range(k)]
    for name, p in zip(tmp, _positions(F.col(key_col), m_bits, k)):
        df = df.withColumn(name, p)
    cond = F.lit(True)
    for name in tmp:
        cond = cond & F.expr(
            f"(shiftright(element_at(bitmap, CAST(shiftright({name}, 6) + 1 AS INT)),"
            f" CAST({name} & 63 AS INT)) & 1) = 1"
        )
    return df.where(cond).drop("bitmap", *tmp)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Inner equi-join with the fact side bloom-pruned first.  Result is
    IDENTICAL to ``fact.join(dim, fact[fact_key] == dim[dim_key])`` — the
    bloom has no false negatives — but only surviving fact rows reach the
    join."""
    bm = bloom_build(dim, dim_key, m_bits, k)
    pruned = bloom_prune(fact, fact_key, bm, m_bits, k)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def bloom_pass_sql(key_expr: str, dim_sql: str, dim_key: str, m_bits: int = 4096, k: int = 3) -> str:
    """Returns ``(cte, checks)`` — a named CTE defining the dim's bit-position
    set and the conjunct replaying the probe exactly (`key passes` ⇔ each of
    its k positions is in that set; the set bits ARE the position set).
    Compose as ``WITH {cte}, … WHERE {checks}``.  Same hash text as the
    Spark build by construction."""
    k = min(k, len(BLOOM_SALTS))
    pos_union = " UNION ALL ".join(
        f"SELECT ({portable_hash31_sql(dim_key, salt=BLOOM_SALTS[i])}) % {m_bits} AS p FROM ({dim_sql})"
        for i in range(k)
    )
    checks = " AND ".join(
        f"(({portable_hash31_sql(key_expr, salt=BLOOM_SALTS[i])}) % {m_bits}) IN (SELECT p FROM __bloom_pos)"
        for i in range(k)
    )
    return f"__bloom_pos AS (SELECT DISTINCT p FROM ({pos_union}))", checks
