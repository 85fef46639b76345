"""Point-in-polygon spatial join via A5 cell covers.

Re-expresses the reference's demonstrated pattern
(tests/elephant_a5_cells.sql: polygon → sampled points → cells → DISTINCT)
as a scale-first DataFrame program (SURVEY.md §2.4.1):

1. **cover**: each polygon → covering cell set at resolution R, classified
   ``interior`` (cell fully inside — accepted without refinement) or
   ``boundary`` (needs the exact test).  Computed distributed via
   ``applyInPandas`` (one polygon per group), then materialized driver-side —
   covers are the small dimension side, and broadcasting a raw
   applyInPandas plan re-executes its Python stage inside the broadcast
   exchange (measured 3× slower).
2. **join**: points get their res-R cell (Arrow UDF) and equi-join the
   broadcast cover on ``cell`` — Catalyst sees a plain broadcast-hash join;
   payload columns are never touched (column pruning).
3. **refine**: rows matched through *boundary* cells run an exact even-odd
   crossing test **as a native Catalyst expression** (higher-order aggregate
   over the polygon's edge list, carried on the broadcast row).  No Python
   operator after the join: a pandas UDF downstream of a broadcast join
   measured ~10× slower per stage than the native filter, and at 100 TB the
   refinement must stay inside whole-stage codegen anyway.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core import cells as _cells
from ..functions import a5_lonlat_to_cell
from . import geometry as G

COVER_SCHEMA = StructType(
    [
        StructField("part", StringType()),
        StructField("cell", LongType()),
        StructField("interior", BooleanType()),
    ]
)

EDGE_TYPE = ArrayType(
    StructType(
        [
            StructField("x1", DoubleType()),
            StructField("y1", DoubleType()),
            StructField("x2", DoubleType()),
            StructField("y2", DoubleType()),
        ]
    )
)


def polygon_cover(
    polygons: DataFrame, res: int, segment_deg: float | None = None,
    grid_n: int | None = None,
) -> DataFrame:
    """(part, geom_json) → (part, cell, interior) covering cells at ``res``.

    Sampling mirrors the reference's deterministic strategies (boundary
    segmentize + bbox grid + vertices), with density tied to the cell size —
    a fixed 51×51 grid (the reference's choice) misses interior cells
    whenever grid spacing exceeds the cell width.  A cell is ``interior``
    when every vertex of its boundary ring passes the PIP test.
    """
    from ..core.areas import cell_area

    # approximate cell width in degrees at this resolution (equal-area cells)
    cell_w_deg = float(np.sqrt(cell_area(res)) / 111_000.0)
    seg = segment_deg if segment_deg is not None else max(cell_w_deg / 3.0, 1e-6)

    def cover_one(pdf: pd.DataFrame) -> pd.DataFrame:
        out_part, out_cell, out_int = [], [], []
        for _, row in pdf.iterrows():
            geom = json.loads(row.geom_json)
            part = row.part
            if geom["type"] == "Point":
                lon, lat = geom["coordinates"]
                cid = int(_cells.lonlat_to_cell(np.array([lon]), np.array([lat]), res)[0])
                out_part.append(part); out_cell.append(cid); out_int.append(False)
                continue
            polys = [geom["coordinates"]] if geom["type"] == "Polygon" else geom["coordinates"]
            for poly in polys:
                outer = np.asarray(poly[0], dtype=np.float64)
                if grid_n is None:
                    span = float(
                        max(outer[:, 0].ptp(), outer[:, 1].ptp(), 1e-9)
                    )
                    n_grid = int(np.clip(np.ceil(span / (0.4 * cell_w_deg)), 50, 4000))
                else:
                    n_grid = grid_n
                pts = [
                    G.segmentize_ring(outer, seg),
                    G.bbox_grid_points(poly, n_grid),
                    outer,
                ]
                pts = np.concatenate([p for p in pts if len(p)], axis=0)
                ids = _cells.lonlat_to_cell(pts[:, 0], pts[:, 1], res)
                uniq = np.unique(ids)
                rings = _cells.cell_to_boundary_batch(uniq, closed_ring=False, segments=1)
                for cid, ring in zip(uniq, rings):
                    inside = G.point_in_polygon(ring[:, 0], ring[:, 1], poly)
                    out_part.append(part)
                    out_cell.append(int(cid))
                    out_int.append(bool(inside.all()))
        return pd.DataFrame({"part": out_part, "cell": out_cell, "interior": out_int})

    return (
        polygons.repartition("part")
        .groupBy("part")
        .applyInPandas(lambda _key, pdf: cover_one(pdf), COVER_SCHEMA)
        .dropDuplicates(["part", "cell"])
    )


def _edge_rows(polygons: DataFrame) -> list:
    """Driver-side: (part, edges, is_point, px, py) — all rings' edges
    concatenated (even-odd works across outer ring + holes)."""
    rows = []
    for r in polygons.collect():
        geom = json.loads(r.geom_json)
        if geom["type"] == "Point":
            x, y = geom["coordinates"]
            rows.append((r.part, [], True, float(x), float(y)))
            continue
        polys = [geom["coordinates"]] if geom["type"] == "Polygon" else geom["coordinates"]
        edges = []
        for poly in polys:
            for ring in poly:
                arr = np.asarray(ring, dtype=np.float64)
                for i in range(len(arr)):
                    a, b = arr[i], arr[(i + 1) % len(arr)]
                    if a[0] == b[0] and a[1] == b[1]:
                        continue
                    edges.append((float(a[0]), float(a[1]), float(b[0]), float(b[1])))
        rows.append((r.part, edges, False, 0.0, 0.0))
    return rows


def pip_native(lon: Column, lat: Column, edges: Column) -> Column:
    """Exact even-odd crossing test as a pure Catalyst expression:
    count edges whose span straddles ``lat`` and whose crossing x exceeds
    ``lon``; odd count ⇒ inside.  Same semantics as geometry.point_in_ring."""
    # nested WHEN so the division is only evaluated for straddling edges
    # (y2 != y1 there) — ANSI mode errors on divide-by-zero otherwise
    crossing = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            (e["y1"] > lat) != (e["y2"] > lat),
            F.when(
                lon
                < (e["x2"] - e["x1"]) * (lat - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"],
                F.lit(1),
            ).otherwise(F.lit(0)),
        ).otherwise(F.lit(0)),
    )
    return (crossing % 2) == 1


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_cover: bool = True,
) -> DataFrame:
    """Join points (lon/lat) against polygons (part, geom_json) → points
    annotated with the containing ``part``.  Exact: interior-cell fast path;
    boundary cells refined by the native even-odd test (zero Python after
    the join)."""
    spark = points.sparkSession
    cover = polygon_cover(polygons, res)
    edges_schema = StructType(
        [
            StructField("part", StringType()),
            StructField("edges", EDGE_TYPE),
            StructField("is_point", BooleanType()),
            StructField("px", DoubleType()),
            StructField("py", DoubleType()),
        ]
    )
    edges_df = spark.createDataFrame(_edge_rows(polygons), edges_schema)
    cover_full = cover.join(edges_df, "part")
    if broadcast_cover:
        # materialize: broadcasting the applyInPandas plan would re-run its
        # Python stage inside the broadcast exchange (slow) — a local-relation
        # broadcast is instant
        cover_full = F.broadcast(
            spark.createDataFrame(cover_full.toPandas(), cover_full.schema)
        )

    pts = points.withColumn(
        "__cell", a5_lonlat_to_cell(F.col(lon_col), F.col(lat_col), res)
    )
    joined = pts.join(cover_full, pts["__cell"] == cover_full["cell"], "inner")

    lon = F.col(lon_col)
    lat = F.col(lat_col)
    keep = (
        F.col("interior")
        | (F.col("is_point") & (lon == F.col("px")) & (lat == F.col("py")))
        | (~F.col("is_point") & pip_native(lon, lat, F.col("edges")))
    )
    return joined.filter(keep).drop(
        "cell", "interior", "edges", "is_point", "px", "py", "__cell"
    )


def assign_cells_distinct(points: DataFrame, res: int, part_col: str = "part",
                          lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """The reference's elephant final stage: SELECT DISTINCT part, cell
    (tests/elephant_a5_cells.sql:104-110) — hash-distinct after vectorized
    encode; dropDuplicates shuffles on (part, cell) only."""
    return (
        points.withColumn("cell_id", a5_lonlat_to_cell(F.col(lon_col), F.col(lat_col), res))
        .select(part_col, "cell_id")
        .dropDuplicates([part_col, "cell_id"])
    )
