"""Regression pins for the reconstructed A5 pentagon-lattice geometry.

These facts were derived in round 4 from the reference's per-part union
GeoJSON (``reference/tests/elephant_cells_union_per_part.geojson``) and are
the foundation of the Track G curve solvers (DESIGN.md §4 v5):

1. the four pentagon orientation classes are ONE equilateral pentagon under
   axis reflections in an exactly ORTHOGONAL lattice;
2. the pentagon's interior angles match the public A5 pentagon constants
   (72, 108, and the three irrational angles of the equilateral tiling
   pentagon);
3. class centroids sit at exact half-unit-cell shifts, so cells biject to
   anchor points z = 2*(i,j) + parity(class) on a doubled integer grid;
4. pentagon edge-adjacency in anchor space is the 4-neighbour grid plus one
   parity-dependent diagonal (5 neighbours each — a proper pentagon tiling).

If the reference corpus or the reconstruction pipeline drifts, these break
loudly before any solver conclusion is trusted.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools", "lattice"))

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/tests/elephant_cells_union_per_part.geojson"),
    reason="reference corpus not available",
)


@pytest.fixture(scope="module")
def lattice():
    from reconstruct_lib import build_lattice

    return build_lattice()


def _align_residual(A, B, M):
    """min over cyclic rolls/reversal of max-vertex distance between M@A
    (+ free translation) and B."""
    best = np.inf
    TA = A @ M.T
    for rev in (False, True):
        T2 = TA[::-1] if rev else TA
        for r in range(5):
            T3 = np.roll(T2, r, axis=0)
            t = (B - T3).mean(0)
            best = min(best, np.abs(B - T3 - t).max())
    return best


def test_classes_are_axis_reflections(lattice):
    V = lattice["shapes"]
    mirror_y = np.diag([1.0, -1.0])
    mirror_x = np.diag([-1.0, 1.0])
    rot180 = -np.eye(2)
    assert _align_residual(V[0], V[1], mirror_y) < 1e-3
    assert _align_residual(V[0], V[2], rot180) < 1e-3
    assert _align_residual(V[0], V[3], mirror_x) < 1e-3
    # and the pairings are sharp: the best WRONG transform misses by > 0.05
    assert _align_residual(V[0], V[1], rot180) > 0.05
    assert _align_residual(V[0], V[3], mirror_y) > 0.05


def test_pentagon_is_equilateral_with_a5_angles(lattice):
    P = lattice["shapes"][0]
    E = np.roll(P, -1, axis=0) - P
    # assert equilaterality directly at the A5 lattice aspect rho = tan(54 deg)
    rho = np.tan(np.radians(54))
    ln = np.sqrt(E[:, 0] ** 2 + (rho ** 2) * E[:, 1] ** 2)
    spread = (ln.max() - ln.min()) / ln.mean()
    assert spread < 1e-3, "pentagon is not equilateral at rho = tan(54 deg)"
    # interior angles match the public A5 pentagon (sorted, degrees)
    Pp = P * np.array([1.0, rho])
    Ep = np.roll(Pp, -1, axis=0) - Pp
    ang = []
    for k in range(5):
        a, b = -Ep[k - 1], Ep[k]
        ang.append(np.degrees(np.arccos(np.clip(
            a @ b / np.linalg.norm(a) / np.linalg.norm(b), -1, 1))))
    want = np.array([72.0, 82.29202980963508, 108.0, 127.94543761193603,
                     540.0 - 72.0 - 82.29202980963508 - 108.0
                     - 127.94543761193603])
    got = np.sort(ang)
    assert np.abs(got - want).max() < 0.02, got
    assert abs(sum(ang) - 540.0) < 1e-6


def test_class_centroids_at_half_shifts(lattice):
    V = lattice["shapes"]
    mu = {c: V[c].mean(0) for c in range(4)}
    d10 = mu[1] - mu[0]
    d30 = mu[3] - mu[0]
    d20 = mu[2] - mu[0]
    # exact half-integer components pinned by the reflection algebra
    assert abs(d10[0] - 0.5) < 1e-3
    assert abs(d30[1] - 0.5) < 1e-3
    # mu2 - mu0 == (mu1 - mu0) + (mu3 - mu0): the doubled-grid consistency
    assert np.abs(d20 - (d10 + d30)).max() < 1e-3


def test_anchor_adjacency_is_grid_plus_parity_diagonal(lattice):
    V = lattice["shapes"]
    tol = 5e-3
    # parity map 0 (the gauge used throughout Track G)
    par = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}
    neighbours = {q: set() for q in range(4)}
    for c1 in range(4):
        for c2 in range(4):
            for di in range(-2, 3):
                for dj in range(-2, 3):
                    if c1 == c2 and di == 0 and dj == 0:
                        continue
                    P1, P2 = V[c1], V[c2] + np.array([di, dj])
                    shared = sum(
                        1 for v1 in P1
                        if np.min(np.linalg.norm(P2 - v1, axis=1)) < tol)
                    if shared >= 2:
                        p1, p2 = par[c1], par[c2]
                        dz = (2 * di + p2[0] - p1[0], 2 * dj + p2[1] - p1[1])
                        neighbours[c1].add(dz)
    for c in range(4):
        px, py = par[c]
        diag = (2 * py - 1, 2 * px - 1)
        want = {(1, 0), (-1, 0), (0, 1), (0, -1), diag}
        assert neighbours[c] == want, (c, neighbours[c])
