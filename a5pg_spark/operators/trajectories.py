"""Trajectory → A5 cell paths: which cells does a route segment touch?

The missing line-geometry primitive next to point encode (a5_lonlat_to_cell)
and polygon cover (operators/spatial_join.py): GPS tracks, shipping lanes,
and image-capture sweeps are SEGMENTS, and indexing them means the set of
cells each segment crosses.  The reference has no line operator (its PostGIS
bridge would lean on ST_LineInterpolatePoint + the scalar encode); here it
is one declarative plan:

    segments → posexplode(sequence(0, S)) → lerp → encode → distinct cells

Everything except the encode itself is JVM codegen (the sample fan-out is an
Expand over an array literal, the lerp is arithmetic); the encode is the
same vectorized chain every other query uses.  One shuffle total (the
per-route distinct/rollup).

Sampling semantics (deterministic, oracle-replayable): S+1 points at
t = i/S, linear in lon/lat (NOT great-circle — documented choice: it is the
bit-replayable one, and for the short segments cell-indexing cares about the
two agree to well under a cell width).  Completeness: a sample step shorter
than half the res-R cell width cannot skip a cell column, so pick
S ≥ 2·len/width(res); the helper does not guess — callers know their
segment lengths.  At 100 TB the fan-out multiplies rows by S+1 BEFORE the
distinct collapses them; S is the knob that trades completeness for shuffle
volume, and the map-side partial aggregation absorbs most duplicates (cells
repeat consecutively along a track).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_segment_points(
    df: DataFrame,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
    samples: int = 32,
) -> DataFrame:
    """Fan each segment row out to ``samples+1`` interpolated points, adding
    (__i, __lon, __lat).  The lerp is the exact IEEE shape
    ``p1 + (p2 - p1) * (i / S)`` — the same text an oracle replays."""
    s = float(samples)
    ex = df.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(samples))).alias("__i")
    )
    t = F.col("__i") / F.lit(s)
    return ex.select(
        df["*"],
        F.col("__i"),
        (F.col(lon1) + (F.col(lon2) - F.col(lon1)) * t).alias("__lon"),
        (F.col(lat1) + (F.col(lat2) - F.col(lat1)) * t).alias("__lat"),
    )


def route_cells(
    df: DataFrame,
    route_col: str,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
    res: int,
    samples: int = 32,
) -> DataFrame:
    """Distinct (route, cell) pairs touched by each segment's sample chain.
    Requires a5 functions registered on the session (functions.register)."""
    pts = sample_segment_points(df, lon1, lat1, lon2, lat2, samples)
    return (
        pts.select(
            F.col(route_col),
            F.expr(f"a5_lonlat_to_cell(__lon, __lat, {res})").alias("cell"),
        )
        .distinct()
    )


def route_cell_stats(
    df: DataFrame,
    route_col: str,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
    res: int,
    samples: int = 32,
) -> DataFrame:
    """Per-route rollup of the cell path: how many distinct cells, and the
    id range (min/max are meaningful: Hilbert-ordered ids make the range a
    locality witness)."""
    rc = route_cells(df, route_col, lon1, lat1, lon2, lat2, res, samples)
    return rc.groupBy(route_col).agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.min("cell").alias("min_cell"),
        F.max("cell").alias("max_cell"),
    )
