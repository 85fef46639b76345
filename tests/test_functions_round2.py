"""Round-2 regression tests at the Spark UDF layer (ADVICE items)."""
import numpy as np
import pytest
from pyspark.sql import functions as F


def test_deep_res_cell_roundtrip_spark(spark):
    """LongType ids with >53 significant bits must survive the pandas UDFs."""
    df = spark.createDataFrame([(-73.9857, 40.758)], "lon double, lat double")
    from a5pg_spark import functions as A

    r = (
        df.select(A.a5_lonlat_to_cell("lon", "lat", 28).alias("c"))
        .select(
            "c",
            A.a5_lonlat_to_cell(
                A.a5_cell_to_lon("c"), A.a5_cell_to_lat("c"), 28
            ).alias("rt"),
        )
        .first()
    )
    assert r["c"] == r["rt"]
    # and the resolution decodes correctly through SQL
    res = spark.sql(f"SELECT a5_get_resolution({r['c']}L) AS r").first()["r"]
    assert res == 28


def test_boundary_per_row_args(spark):
    """closed/segments may differ per row within one Arrow batch."""
    from a5pg_spark import functions as A

    df = spark.createDataFrame(
        [(-73.9857, 40.758, True, 2), (-73.9857, 40.758, False, 5)],
        "lon double, lat double, closed boolean, seg int",
    )
    rows = (
        df.select(
            A.a5_cell_to_boundary(
                A.a5_lonlat_to_cell("lon", "lat", 10),
            ).alias("auto"),
            F.call_function(
                "a5_cell_to_boundary",
                A.a5_lonlat_to_cell("lon", "lat", 10),
                F.col("closed"),
                F.col("seg"),
            ).alias("b"),
        )
        .collect()
    )
    n_closed = len(rows[0]["b"])
    n_open = len(rows[1]["b"])
    # closed ring repeats the first point; per-row segments honored
    assert n_closed != n_open
    assert rows[0]["b"][0] == rows[0]["b"][-1]
    assert rows[1]["b"][0] != rows[1]["b"][-1]


def test_sql_parent_res0_identity(spark):
    c = spark.sql("SELECT a5_cell_to_parent(a5_lonlat_to_cell(0.0d, 0.0d, 0), 0) AS p").first()["p"]
    w = spark.sql("SELECT a5_lonlat_to_cell(0.0d, 0.0d, 0) AS c").first()["c"]
    assert c == w


def test_geometry_output_surface(spark):
    """a5_cell_to_wkt / a5_cell_to_geojson / a5_cell_to_geom SQL functions and
    the FeatureCollection export (reference elephant_a5_cells.sql:116-134)."""
    import json

    r = spark.sql("""
        SELECT a5_cell_to_wkt(a5_lonlat_to_cell(-73.9857d, 40.758d, 10)) AS wkt,
               a5_cell_to_geojson(a5_lonlat_to_cell(-73.9857d, 40.758d, 10), 6) AS gj,
               a5_cell_to_geom(a5_lonlat_to_cell(-73.9857d, 40.758d, 10)) AS geom,
               a5pg_version() AS ver, a5pg_info() AS info
    """).first()
    assert r["wkt"].startswith("POLYGON((") and r["wkt"].endswith("))")
    gj = json.loads(r["gj"])
    assert gj["type"] == "Polygon"
    ring = gj["coordinates"][0]
    assert ring[0] == ring[-1]          # closed
    assert len(ring) >= 4
    assert json.loads(r["geom"])["type"] == "Polygon"
    assert r["ver"] == "0.1.0"
    assert json.loads(r["info"])["a5_compat"] == "0.6.1"
    # WKT vertices match the GeoJSON ring (WKT carries full precision)
    wkt_ring = [
        [float(v) for v in pt.split(" ")]
        for pt in r["wkt"][len("POLYGON(("):-2].split(",")
    ]
    assert len(wkt_ring) == len(ring)

    # FeatureCollection export
    from a5pg_spark.operators.geojson import feature_collection

    cells = spark.sql(
        "SELECT id, a5_synth_cell(id, 8) AS cell FROM range(5) AS t(id)"
    )
    fc = json.loads(
        feature_collection(cells, props=["id"], order_by=["id"]).first()["geojson"]
    )
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 5
    assert [f["properties"]["id"] for f in fc["features"]] == list(range(5))
    assert all(f["geometry"]["type"] == "Polygon" for f in fc["features"])


def test_sql_compact_uncompact_arrays(spark):
    """Array-valued a5_compact/a5_uncompact (src/lib.rs:189-222 signatures)."""
    r = spark.sql("""
        WITH seed AS (SELECT a5_synth_cell(7, 3) AS c)
        SELECT c,
               a5_uncompact(array(c), 5) AS kids,
               a5_compact(a5_uncompact(array(c), 5)) AS back
        FROM seed
    """).first()
    assert len(r["kids"]) == 16
    assert r["back"] == [r["c"]]


def test_postgis_float_format_parity():
    """Formatter reproduces the reference's PostGIS output strings
    char-for-char (expected/postgis_wrapper.out:3-4): ST_AsText = ryu
    shortest repr, ST_AsGeoJSON = 9-decimal cap with zero-trim."""
    from a5pg_spark.functions import _pg_double, _pg_double_fixed

    golden = [
        (-74.01466735453606, 40.72977833231509),
        (-73.95656875648214, 40.72969872633765),
        (-73.90722131384905, 40.74911917245756),
        (-73.94429903619088, 40.77973535107036),
        (-73.99836905619028, 40.76659823811294),
        (-74.01466735453606, 40.72977833231509),
    ]
    wkt = ("POLYGON((" + ",".join(
        f"{_pg_double(x)} {_pg_double(y)}" for x, y in golden) + "))")
    assert wkt == (
        "POLYGON((-74.01466735453606 40.72977833231509,"
        "-73.95656875648214 40.72969872633765,"
        "-73.90722131384905 40.74911917245756,"
        "-73.94429903619088 40.77973535107036,"
        "-73.99836905619028 40.76659823811294,"
        "-74.01466735453606 40.72977833231509))"
    )
    gj = ('{"type":"Polygon","coordinates":[[' + ",".join(
        f"[{_pg_double_fixed(x, 9)},{_pg_double_fixed(y, 9)}]"
        for x, y in golden) + "]]}")
    assert gj == (
        '{"type":"Polygon","coordinates":[['
        '[-74.014667355,40.729778332],[-73.956568756,40.729698726],'
        '[-73.907221314,40.749119172],[-73.944299036,40.779735351],'
        '[-73.998369056,40.766598238],[-74.014667355,40.729778332]]]}'
    )
    # edge cases the reference's printer pins: integral → no ".0", -0 → "0"
    assert _pg_double(40.0) == "40"
    assert _pg_double(-0.0) == "0"
    assert _pg_double_fixed(-1e-12, 9) == "0"
    assert _pg_double_fixed(2.5, 9) == "2.5"


def test_wkt_geojson_udf_cross_consistency(spark):
    """The Arrow formatting UDFs agree with the boundary UDF's coordinates
    (full-precision GeoJSON round-trips to the exact boundary doubles)."""
    import json

    r = spark.sql("""
        SELECT a5_cell_to_wkt(a5_synth_cell(42, 9)) AS wkt,
               a5_cell_to_geojson(a5_synth_cell(42, 9), -1) AS gj,
               a5_cell_to_boundary(a5_synth_cell(42, 9)) AS b
    """).first()
    ring = json.loads(r["gj"])["coordinates"][0]
    assert ring == [list(p) for p in r["b"]]
    wkt_ring = [[float(v) for v in pt.split(" ")]
                for pt in r["wkt"][len("POLYGON(("):-2].split(",")]
    assert wkt_ring == [list(p) for p in r["b"]]


def test_invalid_ids_null_not_crash(spark):
    """Decode UDFs must NULL structurally-invalid ids per-row (the
    reference's .ok()? semantics), not crash the batch: a garbage origin
    (>= 60) would index past the 12-face tables inside the NumPy kernel if
    it reached it unneutralized."""
    rows = spark.sql("""
        SELECT c, a5_cell_to_lonlat(c) AS ll, a5_cell_to_boundary(c) AS b
        FROM VALUES (CAST(((60::BIGINT << 58) | (1::BIGINT << 57)) AS BIGINT)),
                    (2742822465196523520) AS t(c) ORDER BY c
    """).collect()
    bad = [r for r in rows if r.c != 2742822465196523520][0]
    good = [r for r in rows if r.c == 2742822465196523520][0]
    assert bad.ll is None and bad.b is None
    assert good.ll is not None and good.b is not None


def test_world_cell_zero_decodes(spark):
    """id 0 is the WORLD_CELL special case (reference CHANGELOG 0.2.0):
    decodes to (0, 0), never NULLed as garbage."""
    r = spark.sql("SELECT a5_cell_to_lonlat(0) AS ll").first()
    assert r.ll is not None and list(r.ll) == [0.0, 0.0]


def test_is_valid_i64_null_in_null_out(spark):
    """STRICT parity: a5_is_valid_i64(NULL) is NULL, not true."""
    rows = spark.sql(
        "SELECT c, a5_is_valid_i64(c) AS v FROM VALUES "
        "(CAST(NULL AS BIGINT)), (2742822465196523520) AS t(c)"
    ).collect()
    got = {r.c: r.v for r in rows}
    assert got[2742822465196523520] is True
    assert got[None] is None
