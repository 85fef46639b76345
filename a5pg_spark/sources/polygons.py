"""Polygon-layer sources — GeoJSON FeatureCollections as (part, geom_json)
tables, mirroring the reference's fixture loader
(tests/elephant_a5_cells.sql:23-46: jsonb literal → jsonb_array_elements →
typed rows → persisted table)."""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ELEPHANT_SQL = "/root/reference/tests/elephant_a5_cells.sql"


def elephant_feature_collection() -> dict:
    """The exact 5-feature elephant FeatureCollection embedded in the
    reference test (3 polygons + 2 point eyes near (0, 0))."""
    sql = open(ELEPHANT_SQL).read()
    m = re.search(r"'(\{\"type\":\"FeatureCollection\".*?\})'::jsonb", sql, re.S)
    return json.loads(m.group(1))


def from_feature_collection(spark: SparkSession, fc: dict,
                            part_prop: str = "part") -> DataFrame:
    """FeatureCollection → (part, geom_json).

    GeoJSON geometry coordinates are heterogeneous (Point [x,y] vs Polygon
    [[[x,y]…]]), so a single Catalyst schema can't type them; the feature
    list is split driver-side (FeatureCollections are small dimension data —
    the reference likewise inlines its fixture as a literal CTE) and each
    geometry is carried as a JSON string column.
    """
    rows = [
        (f["properties"][part_prop], json.dumps(f["geometry"]))
        for f in fc["features"]
    ]
    # one slice: a handful of driver rows must not fan into
    # defaultParallelism near-empty parallelize tasks on every collect
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "part string, geom_json string"
    )


def elephant_polygons(spark: SparkSession) -> DataFrame:
    return from_feature_collection(spark, elephant_feature_collection())
