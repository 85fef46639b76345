"""Deterministic, portable sampling for training-data pipelines.

``df.sample(rate)`` is the wrong tool at 100 TB pipeline scale: it is
non-deterministic across retries (a resumed stage samples DIFFERENT rows —
lineage-breaking), non-reproducible across engines, and can't be
consistently applied to two tables (sampling users and their events
independently breaks referential integrity).  Hash-based sampling fixes all
three: membership is a pure function of the KEY, so retries, other engines,
and joined tables all agree on who is in.

* ``hash_sample`` — Bernoulli by key: keep iff
  ``portable_hash31(key, salt) < rate·2³¹``.  Same key ⇒ same verdict in
  every table that samples on it (consistent cross-table sampling); change
  the salt to draw an independent sample.  Scale: a codegen'd filter at the
  scan, zero shuffles, zero state.
* ``group_sample_k`` — uniform K per group without replacement: rank rows by
  the key hash inside each group and keep the K smallest.  The hash is a
  random permutation of the group for any non-adversarial key set, so this
  is a fixed-size uniform sample; it is also a window over (group) — ONE
  shuffle — where a naive ``ORDER BY rand() LIMIT k`` per group needs a
  nondeterministic sort and breaks on retry.

Both replay bit-for-bit in DuckDB via the shared ``portable_hash31_sql``
chain (no false stream/seed semantics to emulate — the sample IS the hash).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from a5pg_spark.operators.sketches import M31, portable_hash31, portable_hash31_sql


def hash_sample(df: DataFrame, key_col: str, rate: float, salt: int = 0) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows, decided per KEY.
    Exact expectation: P(keep) = floor(rate·2³¹)/2³¹."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    thresh = int(rate * M31)
    return df.where(portable_hash31(F.col(key_col), salt=salt) < F.lit(thresh))


def hash_sample_sql(key_expr: str, rate: float, salt: int = 0) -> str:
    """The identical membership predicate as SQL text (oracle side).

    Precondition (r05 ADVICE): ``key_expr`` must be NON-NEGATIVE.  The SQL
    replay folds with ``%``, which follows the dividend's sign in DuckDB,
    while the Spark side uses ``pmod`` (always non-negative) — a negative
    key would silently produce different hashes in the two engines.  All
    engine callers pass non-negative ids; assert it upstream if a new key
    source can go negative."""
    thresh = int(rate * M31)
    return f"({portable_hash31_sql(key_expr, salt=salt)}) < {thresh}"


def group_sample_k(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Uniform fixed-size sample: the K group members with the smallest key
    hash (ties broken by the key itself, so the result is a deterministic
    SET).  One shuffle (the group window); rows carry a ``__rk`` rank
    column (1..K) that downstream stratified logic can use."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    h = portable_hash31(F.col(key_col), salt=salt)
    w = Window.partitionBy(*gcols).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
    )
