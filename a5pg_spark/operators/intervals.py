"""Range (interval) join — the brief's named custom-operator gap, done the
scalable way.

Spark plans a raw ``l.ts BETWEEN r.s AND r.e`` join as
BroadcastNestedLoopJoin (or worse, CartesianProduct) — O(|L|·|R|) work that
dies at cluster scale.  The standard fix is bucketization: quantize the
domain into fixed-width buckets, explode each interval into the buckets it
covers, bucket each point once, equi-join on the bucket, then re-check the
exact predicate.  Work becomes O(|L| + |R|·(len/W)) candidates through ONE
hash shuffle, and Catalyst/AQE pick broadcast vs shuffle-hash freely since
it is now an equi-join.

A point lands in exactly one bucket, so each qualifying (point, interval)
pair is produced exactly once — no dedup pass.  Bucket width trades interval
replication (len/W + 1 copies) against candidate precision; pass the median
interval length for a sound default.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    pt_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    key_cols: Sequence[str] = (),
    inclusive_end: bool = True,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= pt <= end`` (or ``< end``), optionally also matching on
    ``key_cols``.  All three columns must be integral (callers convert
    timestamps to epoch micros first — see ``sessions.epoch_us``).

    Returns points ⋈ intervals with all columns of both sides; overlapping
    column names must be disambiguated by the caller beforehand.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = list(key_cols)
    w = F.lit(int(bucket_width))

    # floor(x / w) evaluates in doubles; IEEE division by a constant is
    # monotonic, so s <= t <= e still implies bkt(s) <= bkt(t) <= bkt(e)
    # even if a boundary quotient rounds below the exact integer — the
    # candidate set stays a superset and the exact recheck stays sound
    pt_b = points.withColumn("__bkt", F.floor(F.col(pt_col) / w))
    iv_b = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    cond = F.col(pt_col) >= F.col(start_col)
    cond &= (
        F.col(pt_col) <= F.col(end_col)
        if inclusive_end
        else F.col(pt_col) < F.col(end_col)
    )
    return pt_b.join(iv_b, keys + ["__bkt"]).filter(cond).drop("__bkt")
