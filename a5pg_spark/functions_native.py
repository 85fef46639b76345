"""JVM-native ``a5_lonlat_to_cell`` — the encode hot path without Python.

Motivation (BENCH/BASELINE.md round 1): the Arrow-UDF encode puts a Python
worker next to every JVM task; at local[32] that is 64 hot threads on 32
cores and the stated local[8]→local[32] scaling protocol collapses to
0.15–0.38.  At 100 TB the same co-residency doubles the executor CPU bill of
every encode stage.  This module builds the *same* math as
``core/projection.py`` + ``core/hilbert.py`` as pure Catalyst expressions:

* the dodecahedral forward projection as scalar expressions (trig functions
  are codegen'd built-ins; per-face constants are literal-array gathers);
* the Sierpiński 2-bits-per-level loop as ONE ``aggregate()`` higher-order
  function over a constant ``sequence`` with a struct accumulator — constant
  expression size regardless of resolution (a naive unroll grows the tree
  exponentially through the P/Q/R dependencies).

Exact equivalence with the NumPy kernel is asserted in
tests/test_native_encode.py over randomized points at several resolutions
(the two implementations perform the same double-precision operations; only
points within ~1 ulp of a subdivision boundary could ever disagree).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from .core import bits
from .core.dodecahedron import FACE_AXES, FACE_ROT, TAN_DM
from .core.projection import _ALPHAS, _SIGNS, AREA_TOT, TAN_36, TRI_APEX, TRI_ENTRY, TRI_EXIT, _K

PI = float(np.pi)
PI_OVER_5 = PI / 5.0
TWO_PI_OVER_5 = 2.0 * PI / 5.0


def _gather(table: np.ndarray, idx: Column) -> Column:
    """Literal-array gather: table[idx] as a Column (1-based element_at)."""
    return F.element_at(F.array(*[F.lit(float(v)) for v in table]), idx + F.lit(1))


def encode_native(df, lon_col: str, lat_col: str, res: int, out_col: str = "cell"):
    """DataFrame transform: add ``out_col`` = A5 cell id of (lon, lat) at
    ``res`` — entirely JVM-side (no Python workers).

    Built as a chain of ``select``s so each stage stays a small codegen'd
    projection; a single-Column form would embed the (expensive, multiply
    referenced) face/projection subtrees into the interpreted HOF and
    re-evaluate them per copy (measured ~200 rows/s vs ~1M rows/s here).
    CollapseProject keeps the boundaries because the reused intermediates are
    non-cheap.
    """
    if res < 0 or res > bits.MAX_RES:
        raise ValueError(f"resolution out of range 0..{bits.MAX_RES}")
    others = df.columns

    lonr, latr = F.radians(F.col(lon_col)), F.radians(F.col(lat_col))
    cl = F.cos(latr)
    d1 = df.select(
        *others,
        (cl * F.cos(lonr)).alias("__vx"),
        (cl * F.sin(lonr)).alias("__vy"),
        F.sin(latr).alias("__vz"),
    )

    # face = argmax over the 12 axes (first max wins, same as np.argmax)
    vx, vy, vz = F.col("__vx"), F.col("__vy"), F.col("__vz")
    dots = [
        F.lit(float(a[0])) * vx + F.lit(float(a[1])) * vy + F.lit(float(a[2])) * vz
        for a in FACE_AXES
    ]
    mx = F.greatest(*dots)
    expr = F.when(dots[0] == mx, F.lit(0))
    for f in range(1, 12):
        expr = expr.when(dots[f] == mx, F.lit(f))
    d2 = d1.select(*others, "__vx", "__vy", "__vz", expr.cast("int").alias("__face"))

    if res == 0:
        u = F.shiftleft(F.col("__face").cast("bigint"), 58).bitwiseOR(
            F.lit(1 << 57).cast("bigint")
        )
        return d2.select(*others, u.cast("long").alias(out_col))

    # rotate into the face frame: w = R[face] @ v (9 literal-array gathers)
    face = F.col("__face")
    R = FACE_ROT
    wz = _gather(R[:, 2, 0], face) * vx + _gather(R[:, 2, 1], face) * vy + _gather(R[:, 2, 2], face) * vz
    wx = _gather(R[:, 0, 0], face) * vx + _gather(R[:, 0, 1], face) * vy + _gather(R[:, 0, 2], face) * vz
    wy = _gather(R[:, 1, 0], face) * vx + _gather(R[:, 1, 1], face) * vy + _gather(R[:, 1, 2], face) * vz
    z = F.acos(F.greatest(F.lit(-1.0), F.least(F.lit(1.0), wz)))
    az = F.atan2(wy, wx)
    azl = F.pmod(_gather(_SIGNS, face) * (az - _gather(_ALPHAS, face)), F.lit(2.0 * PI))
    d3 = d2.select(
        *others, "__face", z.alias("__z"), azl.alias("__azl"),
    )

    azl = F.col("__azl")
    q = F.least(F.floor(azl / F.lit(TWO_PI_OVER_5)).cast("int"), F.lit(4))
    d4 = d3.select(*others, "__face", "__z", "__azl", q.alias("__q"))

    b = F.col("__azl") - F.lit(TWO_PI_OVER_5) * F.col("__q") - F.lit(PI_OVER_5)
    d5 = d4.select(
        *others, "__face", "__z", "__q",
        F.abs(b).alias("__a"),
        F.when(b < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("__mirror"),
    )

    # equal-area sector warp (projection.py closed forms)
    a = F.col("__a")
    area = a - F.asin(F.sin(a) / F.lit(float(_K)))
    d6 = d5.select(
        *others, "__face", "__z", "__q", "__a", "__mirror",
        F.atan(F.lit(float(TAN_36)) * area / F.lit(float(AREA_TOT))).alias("__ap"),
    )

    a, ap, z = F.col("__a"), F.col("__ap"), F.col("__z")
    ca = F.cos(a)
    cze = ca / F.sqrt(ca * ca + F.lit(float(TAN_DM * TAN_DM)))
    re = F.lit(float(TAN_DM)) / F.cos(ap)
    ratio = F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - F.cos(z)) / (F.lit(1.0) - cze))
    d7 = d6.select(
        *others, "__face", "__q",
        (re * ratio * F.cos(ap)).alias("__px"),
        (re * ratio * F.sin(ap) * F.col("__mirror")).alias("__py"),
    )

    # Sierpinski quaternary loop as ONE aggregate() with a struct accumulator
    # over plain attribute refs (interpreted HOF, but ~20 flops x depth each)
    depth = 2 * (res - 1)
    if depth == 0:
        s_col = F.lit(0).cast("bigint")
    else:
        init = F.struct(
            F.lit(float(TRI_ENTRY[0])).alias("Px"), F.lit(float(TRI_ENTRY[1])).alias("Py"),
            F.lit(float(TRI_APEX[0])).alias("Qx"), F.lit(float(TRI_APEX[1])).alias("Qy"),
            F.lit(float(TRI_EXIT[0])).alias("Rx"), F.lit(float(TRI_EXIT[1])).alias("Ry"),
            F.lit(0).cast("bigint").alias("s"),
            # carried point (names must not collide case-insensitively with Px/Py)
            F.col("__px").alias("ptx"), F.col("__py").alias("pty"),
        )

        def step(acc: Column, _i: Column) -> Column:
            Mx = (acc["Px"] + acc["Rx"]) * F.lit(0.5)
            My = (acc["Py"] + acc["Ry"]) * F.lit(0.5)
            dx = Mx - acc["Qx"]
            dy = My - acc["Qy"]
            cr_pt = dx * (acc["pty"] - acc["Qy"]) - dy * (acc["ptx"] - acc["Qx"])
            cr_p = dx * (acc["Py"] - acc["Qy"]) - dy * (acc["Px"] - acc["Qx"])
            bbit = (cr_pt * cr_p) < F.lit(0.0)
            return F.struct(
                F.when(bbit, acc["Qx"]).otherwise(acc["Px"]).alias("Px"),
                F.when(bbit, acc["Qy"]).otherwise(acc["Py"]).alias("Py"),
                Mx.alias("Qx"), My.alias("Qy"),
                F.when(bbit, acc["Rx"]).otherwise(acc["Qx"]).alias("Rx"),
                F.when(bbit, acc["Ry"]).otherwise(acc["Qy"]).alias("Ry"),
                F.shiftleft(acc["s"], 1).bitwiseOR(
                    F.when(bbit, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
                ).alias("s"),
                acc["ptx"].alias("ptx"), acc["pty"].alias("pty"),
            )

        s_col = F.aggregate(
            F.sequence(F.lit(1), F.lit(depth)), init, step, lambda acc: acc["s"]
        )

    d8 = d7.select(*others, "__face", "__q", s_col.alias("__s"))

    origin = (F.lit(5) * F.col("__face") + F.col("__q")).cast("bigint")
    p = 59 - 2 * res
    u = (
        F.shiftleft(origin, 58)
        .bitwiseOR(F.shiftleft(F.col("__s"), p + 1))
        .bitwiseOR(F.lit(1 << p).cast("bigint"))
    )
    return d8.select(*others, u.cast("long").alias(out_col))
