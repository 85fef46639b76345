"""Raster ↔ vector tiling: assign decoded image pixels to A5 cells
(SURVEY.md §2.4.3; north-star tiling stage).

``mapInPandas`` iterator-of-batches keeps memory bounded: each Arrow batch of
(image_id, bytes, w, h, fmt, phash) is decoded (vectorized codecs,
sources/images.py), pixels are georeferenced around the capture point, encoded
to cells in one NumPy call, and pre-aggregated *within the batch* (map-side
combine) before the shuffle — the per-cell partial aggregates are what crosses
the wire, never raw pixels.  At 100 TB this is the difference between
shuffling ~10^15 pixels and ~10^12 partial rows.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core import cells as _cells
from ..sources.images import capture_point, decode_image

TILE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("cell", LongType()),
        StructField("n_pixels", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def pixels_to_cells(
    images: DataFrame,
    res: int = 15,
    pixel_deg: float = 1e-4,
) -> DataFrame:
    """images(image_id, bytes, w, h, fmt, phash, …) → per-(image, cell) pixel
    aggregates at resolution ``res``.  ``pixel_deg`` is the ground sample
    distance in degrees (images are anchored at their capture point)."""

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_img, out_cell, out_n, out_s, out_mn, out_mx = [], [], [], [], [], []
            for row in pdf.itertuples():
                img = decode_image(bytes(row.bytes), row.fmt)
                h, w = img.shape
                lon0, lat0 = capture_point(np.array([row.phash]))
                cols = (np.arange(w) - w / 2.0) * pixel_deg + lon0[0]
                rows_ = (h / 2.0 - np.arange(h)) * pixel_deg + lat0[0]
                glon, glat = np.meshgrid(cols, rows_)
                ids = _cells.lonlat_to_cell(glon.ravel(), glat.ravel(), res)
                vals = img.ravel().astype(np.float64)
                # map-side combine within the image
                uniq, inv = np.unique(ids, return_inverse=True)
                n = np.bincount(inv)
                s = np.bincount(inv, weights=vals)
                mn = np.full(len(uniq), np.inf)
                np.minimum.at(mn, inv, vals)
                mx = np.full(len(uniq), -np.inf)
                np.maximum.at(mx, inv, vals)
                out_img.extend([row.image_id] * len(uniq))
                out_cell.extend(uniq.tolist())
                out_n.extend(n.tolist())
                out_s.extend(s.tolist())
                out_mn.extend(mn.tolist())
                out_mx.extend(mx.tolist())
            yield pd.DataFrame(
                {
                    "image_id": out_img,
                    "cell": out_cell,
                    "n_pixels": out_n,
                    "sum_value": out_s,
                    "min_value": out_mn,
                    "max_value": out_mx,
                }
            )

    cols = ["image_id", "bytes", "w", "h", "fmt", "phash"]
    return images.select(*cols).mapInPandas(tile, TILE_SCHEMA)


def cell_mosaic(tiles: DataFrame, target_res: int) -> DataFrame:
    """Roll per-image tiles up to a global mosaic at ``target_res`` — native
    bit-op parent + one shuffle agg (partial aggregation map-side)."""
    return (
        tiles.withColumn(
            "mosaic_cell",
            F.call_function("a5_cell_to_parent", F.col("cell"), F.lit(target_res)),
        )
        .groupBy("mosaic_cell")
        .agg(
            F.sum("n_pixels").alias("n_pixels"),
            (F.sum("sum_value") / F.sum("n_pixels")).alias("mean_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.countDistinct("image_id").alias("n_images"),
        )
    )
