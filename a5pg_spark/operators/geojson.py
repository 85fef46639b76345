"""Geometry output surface: WKT / GeoJSON formatting + FeatureCollection export.

Parity targets in the reference:

* ``a5_cell_to_geom`` (sql/a5pg--0.6.1.sql:90-117): cell boundary → PostGIS
  polygon.  We carry no geometry dependency, so the engine's geometry value is
  the serialized form itself — WKT (matching ``ST_AsText`` formatting,
  tests/pg_regress/expected/postgis_wrapper.out:3) and GeoJSON (matching
  ``ST_AsGeoJSON(geom, digits)``, expected/postgis_wrapper.out:4).
* the elephant FeatureCollection export (tests/elephant_a5_cells.sql:116-134):
  ``jsonb_build_object('type','FeatureCollection','features', jsonb_agg(...))``
  → :func:`feature_collection`.

Formatting parity (round 3): the user-facing ``a5_cell_to_wkt/geojson``
surfaces are Arrow UDFs that reproduce PostGIS 3's ryu float printing
exactly (shortest round-trip repr; fixed-precision zero-trim for GeoJSON) —
the boundary path already crossed into Python once, so this adds no extra
stage.  The codegen'd ``wkt_polygon``/``geojson_polygon`` Column builders
remain for JVM-only pipelines that prefer zero Python.  For 10^12-row exports use
:func:`features_df` + ``write.text`` (newline-delimited GeoJSON, fully
distributed); :func:`feature_collection` collapses to a single driver row and
is only for small result sets, like the reference's ``\\copy`` of one row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import functions as A


def _fmt(x: Column, digits: int | None) -> Column:
    """Double → string; shortest round-trip repr (PostGIS-like), optionally
    rounded to ``digits`` decimals first (ST_AsGeoJSON's maxdecimaldigits)."""
    if digits is not None:
        x = F.round(x, digits)
    return x.cast("string")


def wkt_polygon(boundary: Column) -> Column:
    """Closed boundary ring array<array<double>> → ``POLYGON((x y, …))`` WKT."""
    pts = F.transform(
        boundary, lambda p: F.concat_ws(" ", _fmt(p[0], None), _fmt(p[1], None))
    )
    return F.concat(F.lit("POLYGON(("), F.array_join(pts, ","), F.lit("))"))


def geojson_polygon(boundary: Column, digits: int | None = 9) -> Column:
    """Closed boundary ring → GeoJSON Polygon string (ST_AsGeoJSON shape)."""
    pts = F.transform(
        boundary,
        lambda p: F.concat(
            F.lit("["), _fmt(p[0], digits), F.lit(","), _fmt(p[1], digits), F.lit("]")
        ),
    )
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        F.array_join(pts, ","),
        F.lit("]]}"),
    )


def a5_cell_to_wkt(cell, digits: int | None = None) -> Column:
    """Mirrors ``a5_cell_to_geom`` + ``ST_AsText`` (src/lib.rs boundary path);
    ``digits`` caps decimal places like 2-arg ST_AsText (None = full).

    Delegates to the exact-formatting Arrow UDF (functions._cell_to_wkt_udf):
    PostGIS-ryu float strings, validated against
    expected/postgis_wrapper.out:3.  (wkt_polygon above is the codegen'd
    approximation kept for JVM-only pipelines.)"""
    c = F.col(cell) if isinstance(cell, str) else cell
    return A._cell_to_wkt_udf(c, F.lit(-1 if digits is None else digits))


def a5_cell_to_geojson(cell, digits: int | None = 9) -> Column:
    """Mirrors ``a5_cell_to_geom`` + ``ST_AsGeoJSON(geom, digits)``; digits
    None → full shortest-repr precision.  Exact PostGIS formatting parity
    (expected/postgis_wrapper.out:4)."""
    c = F.col(cell) if isinstance(cell, str) else cell
    return A._cell_to_geojson_udf(c, F.lit(-1 if digits is None else digits))


def feature_df(
    df: DataFrame, cell_col: str = "cell", props: list[str] | None = None,
    digits: int | None = 6,
) -> DataFrame:
    """One GeoJSON Feature string per row (adds ``feature`` column).

    Property columns are serialized with ``to_json`` — numeric/str/struct all
    work.  This is the distributed export shape: write with
    ``df.write.text(path)`` for newline-delimited GeoJSON at any scale.
    """
    props = props if props is not None else [c for c in df.columns if c != cell_col]
    prop_json = (
        F.to_json(F.struct(*[F.col(p) for p in props])) if props else F.lit("{}")
    )
    feat = F.concat(
        F.lit('{"type":"Feature","properties":'),
        prop_json,
        F.lit(',"geometry":'),
        a5_cell_to_geojson(cell_col, digits),
        F.lit("}"),
    )
    return df.withColumn("feature", feat)


def feature_collection(
    df: DataFrame, cell_col: str = "cell", props: list[str] | None = None,
    digits: int | None = 6, order_by: list[str] | None = None,
) -> DataFrame:
    """Aggregate to a single-row FeatureCollection (the reference's export,
    tests/elephant_a5_cells.sql:116-134).  Driver-bound by design — use
    :func:`feature_df` + ``write.text`` for large layers."""
    fdf = feature_df(df, cell_col, props, digits)
    if order_by:
        # deterministic feature order: sort inside the aggregate (collect_list
        # has no cross-partition order guarantee after orderBy)
        arr = F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in order_by], F.col("feature")))
        )
        feats = F.transform(arr, lambda s: s["feature"])
    else:
        feats = F.collect_list("feature")
    return fdf.agg(
        F.concat(
            F.lit('{"type":"FeatureCollection","features":['),
            F.array_join(feats, ","),
            F.lit("]}"),
        ).alias("geojson")
    )
