"""Dissolve: cell sets → union polygon rings (the reference's per-part
``ST_Union(a5_cell_to_geom(...))`` export, tests/elephant_a5_cells.sql and
the elephant_cells_union_per_part.geojson artifact).

Algorithm (exact for our edge-aligned cells): every cell contributes its
boundary edges; edges shared by two cells of the same group appear twice with
opposite orientation and cancel; the surviving edges are stitched into closed
rings.  Distributed shape: one ``applyInPandas`` per group — the per-group
work is O(cells in group), groups are the small dimension (polygon layers),
and nothing is collected to the driver.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from ..core import cells as _cells

OUT_SCHEMA = StructType(
    [
        StructField("part", StringType()),
        StructField("geom_json", StringType()),
    ]
)


def _dissolve_cells_np(cell_ids: np.ndarray) -> list:
    """Cell ids → list of closed rings [[lon, lat], …] (outer + holes mixed;
    even-odd semantics, consistent with geometry.point_in_polygon)."""
    rings = _cells.cell_to_boundary_batch(cell_ids, closed_ring=False, segments=1)
    # edge bag keyed by rounded endpoints (cells share vertices exactly up to
    # float noise; 1e-9 deg rounding is ~0.1 µm)
    def key(pt):
        return (round(float(pt[0]), 9), round(float(pt[1]), 9))

    edges = {}
    for ring in rings:
        k = len(ring)
        for i in range(k):
            a, b = key(ring[i]), key(ring[(i + 1) % k])
            if (b, a) in edges:
                edges.pop((b, a))  # interior edge: cancels with its twin
            else:
                edges[(a, b)] = True
    # stitch remaining directed edges into rings
    nxt = {}
    for (a, b) in edges:
        nxt.setdefault(a, []).append(b)
    out = []
    while nxt:
        start = next(iter(nxt))
        ring = [start]
        cur = start
        while True:
            succ = nxt.get(cur)
            if not succ:
                break  # defensive: open chain (shouldn't happen)
            nx = succ.pop()
            if not succ:
                nxt.pop(cur)
            ring.append(nx)
            cur = nx
            if cur == start:
                break
        if len(ring) >= 4 and ring[0] == ring[-1]:
            out.append([[float(x), float(y)] for x, y in ring])
    return out


def dissolve(df: DataFrame, part_col: str = "part", cell_col: str = "cell") -> DataFrame:
    """(part, cell) → (part, geom_json) with geom_json a GeoJSON MultiPolygon
    of the dissolved cell union (each ring as its own polygon; even-odd)."""

    def one(key, pdf):
        ids = np.unique(pdf[cell_col].to_numpy(dtype=np.int64))
        rings = _dissolve_cells_np(ids)
        geom = {"type": "MultiPolygon", "coordinates": [[r] for r in rings]}
        return pd.DataFrame({"part": [key[0]], "geom_json": [json.dumps(geom)]})

    return (
        df.select(part_col, cell_col)
        .repartition(part_col)
        .groupBy(part_col)
        .applyInPandas(one, OUT_SCHEMA)
    )
