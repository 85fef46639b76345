"""Point-in-polygon spatial join via A5 cell covers.

Re-expresses the reference's demonstrated pattern
(tests/elephant_a5_cells.sql: polygon → sampled points → cells → DISTINCT)
as a scale-first DataFrame program (SURVEY.md §2.4.1):

1. **cover**: each polygon → covering cell set at resolution R, classified
   ``interior`` (cell fully inside — accepted without refinement) or
   ``boundary`` (needs the exact test).  Computed distributed via
   ``applyInPandas`` (one polygon per group) — polygons are the small side.
2. **join**: points get their res-R cell (Arrow UDF) and equi-join the cover
   on ``cell``.  The cover is broadcast when small; AQE handles skew
   otherwise.  Catalyst sees a plain equi-join → broadcast-hash or
   sort-merge, and the heavy `bytes`-style payload columns are never touched
   (column pruning).
3. **refine**: rows matched through *boundary* cells run the exact even-odd
   PIP test in a vectorized pandas UDF; interior matches skip Python
   entirely.  At 100 TB the interior fraction dominates (→ the Python path
   is a thin sliver of boundary cells).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
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


def polygon_cover(
    polygons: DataFrame, res: int, segment_deg: float = 0.02, grid_n: int = 50
) -> DataFrame:
    """(part, geom_json) → (part, cell, interior) covering cells at ``res``.

    Sampling mirrors the reference's three deterministic strategies
    (boundary segmentize + bbox grid + vertices); a cell is ``interior`` when
    every vertex of its boundary ring passes the PIP test.
    """

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
                pts = [
                    G.segmentize_ring(outer, segment_deg),
                    G.bbox_grid_points(poly, grid_n),
                    outer,
                ]
                pts = np.concatenate([p for p in pts if len(p)], axis=0)
                ids = _cells.lonlat_to_cell(pts[:, 0], pts[:, 1], res)
                uniq = np.unique(ids)
                # classify: all boundary-ring vertices inside → interior
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


def spatial_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    broadcast_cover: bool = True,
) -> DataFrame:
    """Join points (lon/lat) against polygons (part, geom_json) → points
    annotated with the containing ``part``.  Exact: interior-cell fast path +
    PIP refinement on boundary cells."""
    spark = points.sparkSession
    cover = polygon_cover(polygons, res)
    if broadcast_cover:
        cover = F.broadcast(cover)

    pts = points.withColumn("__cell", a5_lonlat_to_cell(F.col(lon_col), F.col(lat_col), res))
    joined = pts.join(cover, pts["__cell"] == cover["cell"], "inner")

    # exact refinement only where interior = false
    geoms = {r.part: json.loads(r.geom_json) for r in polygons.collect()}
    bc = spark.sparkContext.broadcast(geoms)

    @pandas_udf(BooleanType())
    def pip(part: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(part), dtype=bool)
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        for p in part.unique():
            geom = bc.value.get(p)
            m = (part == p).to_numpy()
            if geom is None:
                continue
            if geom["type"] == "Point":
                out[m] = (np.abs(lo[m] - geom["coordinates"][0]) < 1e-12) & (
                    np.abs(la[m] - geom["coordinates"][1]) < 1e-12
                )
            else:
                polys = [geom["coordinates"]] if geom["type"] == "Polygon" else geom["coordinates"]
                acc = np.zeros(m.sum(), dtype=bool)
                for poly in polys:
                    acc |= G.point_in_polygon(lo[m], la[m], poly)
                out[m] = acc
        return pd.Series(out)

    refined = joined.filter(
        F.col("interior") | pip(F.col("part"), F.col(lon_col), F.col(lat_col))
    )
    return refined.drop("cell", "interior")


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
