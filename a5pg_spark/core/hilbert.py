"""Quaternary space-filling curve over triangle subdivision (vectorized).

Each quintant triangle subdivides 4:1 per resolution level via two rounds of
Sierpiński bisection: triangle (P, Q, R) — curve enters at P, exits at R —
splits at M = midpoint(P, R) into (P, M, Q) then (Q, M, R), giving a
continuous curve whose 2-bit digits per A5 level form the Hilbert-S payload of
the cell id (``bits.py`` layout).

This is our engine's intra-quintant geometry: cells are triangles with *exact*
geometric parent/child nesting and exactly equal areas (midpoint subdivision
is area-uniform in the plane; the plane is an equal-area image of the sphere —
projection.py).  The reference's a5 crate instead tiles pentagons on a lattice
(its source is unavailable here); the cell-id algebra, face/quintant layout,
and areas agree — the intra-quintant vertex geometry differs.  See DESIGN.md §4.
"""

from __future__ import annotations

import numpy as np


def point_to_s(px, py, res: int, entry, apex, exit_) -> np.ndarray:
    """Sierpiński index (2·(res−1) bits) of each point within its triangle.

    px/py: (N,) sector-frame coords; entry/apex/exit_: (2,) canonical triangle.
    """
    n = px.shape[0]
    P = np.broadcast_to(entry, (n, 2)).astype(np.float64).copy()
    Q = np.broadcast_to(apex, (n, 2)).astype(np.float64).copy()
    R = np.broadcast_to(exit_, (n, 2)).astype(np.float64).copy()
    pt = np.stack([px, py], axis=-1)
    s = np.zeros(n, dtype=np.uint64)
    depth = 2 * (res - 1)
    for _ in range(depth):
        M = 0.5 * (P + R)
        d = M - Q
        cr_pt = d[:, 0] * (pt[:, 1] - Q[:, 1]) - d[:, 1] * (pt[:, 0] - Q[:, 0])
        cr_p = d[:, 0] * (P[:, 1] - Q[:, 1]) - d[:, 1] * (P[:, 0] - Q[:, 0])
        b = (cr_pt * cr_p) < 0  # opposite side from P → second child
        s = (s << np.uint64(1)) | b.astype(np.uint64)
        bb = b[:, None]
        P_new = np.where(bb, Q, P)
        R_new = np.where(bb, R, Q)
        Q_new = M
        P, Q, R = P_new, Q_new, R_new
    return s


def s_to_triangle(s, res: int, entry, apex, exit_):
    """Inverse: Hilbert-S values → final triangle vertices (P, Q, R), each (N, 2)."""
    s = np.asarray(s, dtype=np.uint64)
    n = s.shape[0]
    P = np.broadcast_to(entry, (n, 2)).astype(np.float64).copy()
    Q = np.broadcast_to(apex, (n, 2)).astype(np.float64).copy()
    R = np.broadcast_to(exit_, (n, 2)).astype(np.float64).copy()
    depth = 2 * (res - 1)
    for i in range(depth - 1, -1, -1):
        M = 0.5 * (P + R)
        b = ((s >> np.uint64(i)) & np.uint64(1)).astype(bool)[:, None]
        P_new = np.where(b, Q, P)
        R_new = np.where(b, R, Q)
        P, Q, R = P_new, M, R_new
    return P, Q, R
