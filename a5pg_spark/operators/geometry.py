"""Vectorized planar/spherical geometry kernels used by the spatial operators.

The reference leans on PostGIS (`ST_Contains`, `ST_Segmentize`,
`ST_GeneratePoints` — tests/elephant_a5_cells.sql:63-101); we carry no
geometry dependency: polygons are GeoJSON rings in lon/lat degrees, the
point-in-polygon test is an even-odd crossing test in degree space (matching
PostGIS planar ST_Contains semantics on SRID-4326 as the reference uses it),
and distances are great-circle haversine.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371007.1809184747


def point_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test: (N,) points vs one (K,2) lon/lat ring.
    Boundary points are implementation-defined (same as PostGIS)."""
    inside = np.zeros(px.shape, dtype=bool)
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    for k in range(len(ring)):
        cond = (y1[k] > py) != (y2[k] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = (x2[k] - x1[k]) * (py - y1[k]) / (y2[k] - y1[k]) + x1[k]
        inside ^= cond & (px < xs)
    return inside


def point_in_polygon(px, py, polygon: list) -> np.ndarray:
    """GeoJSON polygon = [outer_ring, hole1, …]; even-odd over all rings."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in polygon:
        inside ^= point_in_ring(px, py, np.asarray(ring, dtype=np.float64))
    return inside


def segmentize_ring(ring: np.ndarray, max_len_deg: float) -> np.ndarray:
    """Insert vertices so no edge exceeds ``max_len_deg`` (planar degrees) —
    mirrors the reference's ST_Segmentize(geom, 0.02) boundary sampling
    (tests/elephant_a5_cells.sql:69-72)."""
    out = []
    n = len(ring)
    for i in range(n):
        a = ring[i]
        b = ring[(i + 1) % n]
        d = float(np.hypot(b[0] - a[0], b[1] - a[1]))
        steps = max(1, int(np.ceil(d / max_len_deg)))
        for t in range(steps):
            out.append(a + (b - a) * (t / steps))
    return np.asarray(out)


def bbox_grid_points(polygon: list, n: int = 50) -> np.ndarray:
    """Deterministic (n+1)×(n+1) bbox grid filtered by PIP — the reference's
    grid sampler (tests/elephant_a5_cells.sql:80-93)."""
    outer = np.asarray(polygon[0], dtype=np.float64)
    xmin, ymin = outer.min(axis=0)
    xmax, ymax = outer.max(axis=0)
    xs = xmin + (xmax - xmin) * (np.arange(n + 1) / n)
    ys = ymin + (ymax - ymin) * (np.arange(n + 1) / n)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    m = point_in_polygon(gx, gy, polygon)
    return np.stack([gx[m], gy[m]], axis=-1)


def haversine_m(lon1, lat1, lon2, lat2) -> Column:
    """Great-circle distance in meters as a native Column expression
    (whole-stage codegen — no Python)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    rl1, rl2 = np.radians(lat1), np.radians(lat2)
    dlat = rl2 - rl1
    dlon = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dlat / 2) ** 2 + np.cos(rl1) * np.cos(rl2) * np.sin(dlon / 2) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0, 1)))
