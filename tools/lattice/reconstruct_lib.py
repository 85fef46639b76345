"""Shared lattice-recovery pipeline (steps 1-4 of reconstruct.py) as a library.

build_lattice() returns
  {"pents": {part: [(i,j,c)...]}, "shapes": {c: (5,2) ndarray},
   "to_uv": callable gnomonic->lattice, "gnom": callable lonlat->gnomonic}
"""
from __future__ import annotations

import csv
import json
import os
import sys

import numpy as np

# anchor the repo root from this file's location so imports work from any cwd
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))
from a5pg_spark.core.dodecahedron import FACE_ROT  # noqa: E402
from a5pg_spark.core.projection import lonlat_to_xyz, nearest_face  # noqa: E402

GEOJSON = "/root/reference/tests/elephant_cells_union_per_part.geojson"
CSV = "/root/reference/tests/elephant_cells.csv"


def _ori_class(P: np.ndarray):
    E = np.roll(P, -1, axis=0) - P
    ang = np.empty(5)
    for i in range(5):
        a, b = -E[i - 1], E[i]
        ang[i] = np.degrees(
            np.arccos(np.clip(a @ b / np.linalg.norm(a) / np.linalg.norm(b), -1, 1))
        )
    i = int(np.argmax(ang))
    v = E[i]
    th = np.degrees(np.arctan2(v[1], v[0]))
    x, y = P[:, 0], P[:, 1]
    A = 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return th, np.sign(A)


def _classify(th, sgn):
    if sgn > 0:
        return -1
    for c, ref in enumerate((-146.1, -137.9, 33.8, 42.1)):
        if abs(th - ref) < 2:
            return c
    return -2


def _pip(pt, ring):
    x, y = pt
    inside = False
    for a, b in zip(ring[:-1], ring[1:]):
        if (a[1] > y) != (b[1] > y):
            if a[0] + (y - a[1]) / (b[1] - a[1]) * (b[0] - a[0]) > x:
                inside = not inside
    return inside


def build_lattice():
    g = json.load(open(GEOJSON))
    singles, rings_all = [], []
    for f in g["features"]:
        part = f["properties"]["part"]
        geom = f["geometry"]
        polys = (
            geom["coordinates"] if geom["type"] == "MultiPolygon" else [geom["coordinates"]]
        )
        for p in polys:
            ring = np.array(p[0])
            if len(ring) == 6:
                singles.append((part, ring[:5]))
            rings_all.append((part, ring))

    allv = np.vstack([r for _, r in singles])
    v = lonlat_to_xyz(allv[:, 0], allv[:, 1])
    assert set(np.unique(nearest_face(np.atleast_2d(v)))) == {3}
    R3 = FACE_ROT[3]

    def gnom(lonlat):
        w = lonlat_to_xyz(lonlat[:, 0], lonlat[:, 1]) @ R3.T
        return w[:, :2] / w[:, 2:3]

    XY = gnom(allv).reshape(len(singles), 5, 2)
    cents = XY.mean(axis=1)
    classes = np.array([_classify(*_ori_class(P)) for P in XY])
    good = classes >= 0

    t1 = 0.001672 * np.array([np.cos(np.radians(141.0)), np.sin(np.radians(141.0))])
    t2 = 0.0030 * np.array([np.cos(np.radians(49.6)), np.sin(np.radians(49.6))])
    Binv = np.linalg.inv(np.stack([t1, t2], axis=1))
    mu = cents[good].mean(0)
    sc = 0.02

    def design(pts):
        x = (pts[:, 0] - mu[0]) / sc
        y = (pts[:, 1] - mu[1]) / sc
        return np.stack(
            [np.ones_like(x), x, y, x * x, x * y, y * y, x**3, x * x * y, x * y * y, y**3],
            axis=1,
        )

    O = cents[classes == 0][0]
    delta = {
        0: np.array([0.0, 0.0]),
        1: np.array([0.52, 0.17]),
        2: np.array([0.655, 0.67]),
        3: np.array([0.15, 0.50]),
    }
    uv0 = (cents - O) @ Binv.T
    gidx = [k for k in range(len(singles)) if good[k]]
    ij = {k: np.round(uv0[k] - delta[classes[k]]) for k in gidx}
    coef = None
    for _ in range(6):
        D = design(cents[good])
        tgt = np.array([ij[k] + delta[classes[k]] for k in gidx])
        coef, *_ = np.linalg.lstsq(D, tgt, rcond=None)
        pred = D @ coef
        for n, k in enumerate(gidx):
            ij[k] = np.round(pred[n] - delta[classes[k]])
        for c in range(4):
            m = np.array([classes[k] == c for k in gidx])
            if m.sum():
                delta[c] = (pred[m] - np.array([ij[k] for k in gidx])[m]).mean(0)
    resid = np.abs(tgt - pred).max()
    assert resid < 1e-3, resid

    def to_uv(pts):
        return design(pts) @ coef

    V = {}
    for c in range(4):
        ks = [k for k in gidx if classes[k] == c]
        S = [to_uv(XY[k]) - ij[k] for k in ks]
        ref = S[0]
        aligned = [
            np.roll(
                s,
                -int(
                    np.argmin(
                        [np.linalg.norm(np.roll(s, -r, axis=0) - ref) for r in range(5)]
                    )
                ),
                axis=0,
            )
            for s in S
        ]
        A = np.stack(aligned)
        V[c] = A.mean(0)
        assert np.abs(A - V[c]).max() < 1e-3

    pents = {}
    for part, ring in rings_all:
        uvring = to_uv(gnom(ring))
        i0, i1 = int(np.floor(uvring[:, 0].min())) - 1, int(np.ceil(uvring[:, 0].max())) + 1
        j0, j1 = int(np.floor(uvring[:, 1].min())) - 1, int(np.ceil(uvring[:, 1].max())) + 1
        for i in range(i0, i1 + 1):
            for j in range(j0, j1 + 1):
                for c in range(4):
                    if _pip(V[c].mean(0) + np.array([i, j]), uvring):
                        pents.setdefault(part, []).append((i, j, c))

    ids = {}
    for row in csv.DictReader(open(CSV)):
        ids.setdefault(row["part"], []).append(int(row["cell_id"]))
    for p in ids:
        assert len(pents[p]) == len(ids[p]), (p, len(pents[p]), len(ids[p]))

    return {"pents": pents, "shapes": V, "to_uv": to_uv, "gnom": gnom}
