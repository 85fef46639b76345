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
