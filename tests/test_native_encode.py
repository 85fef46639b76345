"""Bit-exact equivalence of the JVM-native encode with the NumPy kernel."""
import numpy as np
import pandas as pd
import pytest


@pytest.mark.parametrize("res", [0, 1, 5, 10, 28])
def test_native_encode_matches_kernel(spark, res):
    from a5pg_spark.core import cells as C
    from a5pg_spark.functions_native import encode_native

    rng = np.random.default_rng(11 + res)
    n = 50_000
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    pdf = encode_native(df, "lon", "lat", res, "c").toPandas()
    ref = C.lonlat_to_cell(pdf.lon.to_numpy(), pdf.lat.to_numpy(), np.full(len(pdf), res))
    assert int((pdf.c.to_numpy() != ref).sum()) == 0
