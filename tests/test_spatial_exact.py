"""Property tests for the exact polygon cover (round-2 VERDICT item 3):
random concave polygons x dense point grids -> spatial_join output must equal
brute-force PIP on every point (no false positives from concave interiors,
no false negatives from cover gaps)."""
import json

import numpy as np
import pytest

from a5pg_spark.core import cells as C
from a5pg_spark.operators import geometry as G
from a5pg_spark.operators.spatial_join import exact_cover_cells


def _random_concave_polygon(rng, cx, cy, scale):
    """Star-ish concave polygon: jittered radial profile around (cx, cy)."""
    n = int(rng.integers(7, 15))
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    rad = scale * rng.uniform(0.25, 1.0, n)  # wild radius swings => concave
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    ring = [[float(x), float(y)] for x, y in zip(xs, ys)]
    ring.append(ring[0])
    return [ring]


@pytest.mark.parametrize("seed", [7, 19, 101])
def test_cover_matches_bruteforce_pip(seed):
    rng = np.random.default_rng(seed)
    # place polygons in different faces/quintants incl. the golden region
    cx, cy = float(rng.uniform(-30, 30)), float(rng.uniform(-40, 40))
    poly = _random_concave_polygon(rng, cx, cy, scale=1.5)
    res = 7
    cov, interior = exact_cover_cells(poly, res)
    cov_set = set(int(c) for c in cov)
    int_set = set(int(c) for c, i in zip(cov, interior) if i)

    # dense grid over bbox + margin
    outer = np.asarray(poly[0])
    m = 0.3
    xs = np.linspace(outer[:, 0].min() - m, outer[:, 0].max() + m, 60)
    ys = np.linspace(outer[:, 1].min() - m, outer[:, 1].max() + m, 60)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    truth = G.point_in_polygon(gx, gy, poly)
    ids = C.lonlat_to_cell(gx, gy, np.full(len(gx), res))

    # completeness: every inside point's cell is in the cover
    missing = [i for i in range(len(gx)) if truth[i] and int(ids[i]) not in cov_set]
    assert not missing, f"{len(missing)} inside points missed by the cover"

    # interior soundness: every point in an interior-classified cell is inside
    bad = [i for i in range(len(gx)) if int(ids[i]) in int_set and not truth[i]]
    assert not bad, f"{len(bad)} outside points admitted via interior cells"


def test_spatial_join_equals_bruteforce(spark):
    """End-to-end spatial_join vs per-point brute force on a concave poly."""
    rng = np.random.default_rng(42)
    poly = _random_concave_polygon(rng, 5.0, -10.0, scale=2.0)
    geom = {"type": "Polygon", "coordinates": poly}
    polys = spark.createDataFrame(
        [("blob", json.dumps(geom))], "part string, geom_json string"
    )
    xs = np.linspace(2.0, 8.0, 35)
    ys = np.linspace(-13.0, -7.0, 35)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(gx, gy))],
        "pid long, lon double, lat double",
    )
    from a5pg_spark.operators.spatial_join import spatial_join

    got = set(
        r.pid for r in spatial_join(pts, polys, res=7).select("pid").collect()
    )
    truth = set(np.nonzero(G.point_in_polygon(gx, gy, poly))[0].astype(int).tolist())
    assert got == truth


def test_dissolve_union(spark):
    """Dissolving a full sibling block yields the parent's ring area; interior
    edges cancel exactly."""
    import json as _json

    import numpy as np

    from a5pg_spark.core import bits
    from a5pg_spark.operators.dissolve import dissolve, _dissolve_cells_np

    parent = bits.encode_components(19, 123, 7)
    kids = bits.cell_to_children(parent, 9)  # 16 cells
    rings = _dissolve_cells_np(np.asarray(kids))
    # exact nesting => the union of 16 children is the parent triangle: 1 ring
    assert len(rings) == 1

    def area(r):
        a = np.asarray(r)
        return 0.5 * abs(np.sum(a[:-1, 0] * a[1:, 1] - a[1:, 0] * a[:-1, 1]))

    from a5pg_spark.core import cells as C

    pring = C.cell_to_boundary(parent, closed_ring=True, segments=1)
    assert abs(area(rings[0]) - area(pring)) / area(pring) < 2e-3

    # distributed path: two groups
    rows = [("a", int(k)) for k in kids[:8]] + [("b", int(k)) for k in kids[8:]]
    df = spark.createDataFrame(rows, "part string, cell long")
    out = {r.part: _json.loads(r.geom_json) for r in dissolve(df).collect()}
    assert set(out) == {"a", "b"}
    assert all(g["type"] == "MultiPolygon" for g in out.values())
