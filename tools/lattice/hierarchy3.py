"""Backtracking search for per-level parent rules (vectorized).

Parent rule at a level: child-center x belongs to parent pentagon (i,j,c) iff
x lies in  2*M*(shape_c + (i,j)) + t,  for level transform (M, t) with M in a
dihedral set of unimodular matrices and t on a grid.  Equivalently
y = M^-1 (x - t)/2  lies in shape_c + (i,j):  locate the unit-lattice pentagon
containing y.

DFS over depths 1..6, keeping every (M, t) whose leaf-count signatures match
the S >> 2k signatures for ALL parts; dedupes states by the induced leaf
partition (many (M,t) give the same grouping).

Run:  python3 tools/lattice/hierarchy3.py
"""
from __future__ import annotations

import json
from collections import Counter, defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
SHAPES = [np.array(GT["shapes"][str(c)]) for c in range(4)]
CENTROIDS = np.stack([s.mean(0) for s in SHAPES])

DIHEDRAL = [
    np.array(m)
    for m in (
        [[1, 0], [0, 1]], [[-1, 0], [0, -1]],
        [[0, 1], [1, 0]], [[0, -1], [-1, 0]],
        [[1, 0], [0, -1]], [[-1, 0], [0, 1]],
        [[0, 1], [-1, 0]], [[0, -1], [1, 0]],
    )
]


def locate_all(pts: np.ndarray):
    """Vectorized unit-lattice pentagon location.

    pts: (n,2) -> (i, j, c) int arrays; c = -1 where ambiguous/not found.
    """
    n = len(pts)
    base = np.floor(pts).astype(np.int64)
    frac = pts - base
    out_c = np.full(n, -1, dtype=np.int64)
    out_ij = np.zeros((n, 2), dtype=np.int64)
    nfound = np.zeros(n, dtype=np.int64)
    for c in range(4):
        ring = SHAPES[c]  # (5,2)
        for oi in (-2, -1, 0, 1):
            for oj in (-2, -1, 0, 1):
                # ring at lattice offset (oi, oj); test frac against it
                R = ring + np.array([oi, oj])
                A = R
                B = np.roll(R, -1, axis=0)
                x = frac[:, 0:1]
                y = frac[:, 1:2]
                ay, by = A[:, 1][None, :], B[:, 1][None, :]
                ax, bx = A[:, 0][None, :], B[:, 0][None, :]
                cond = (ay > y) != (by > y)
                with np.errstate(divide="ignore", invalid="ignore"):
                    xi = ax + (y - ay) / (by - ay) * (bx - ax)
                crossings = (cond & (xi > x)).sum(axis=1)
                inside = crossings % 2 == 1
                idx = np.where(inside)[0]
                out_c[idx] = c
                out_ij[idx, 0] = base[idx, 0] + oi
                out_ij[idx, 1] = base[idx, 1] + oj
                nfound[idx] += 1
    out_c[nfound > 1] = -2  # ambiguous (shouldn't happen for a proper tiling)
    return out_ij[:, 0], out_ij[:, 1], out_c


def main():
    parts = GT["parts"]
    part_names = sorted(parts)
    leaves = []
    leaf_part = []
    for p in part_names:
        for c in parts[p]["cells"]:
            leaves.append(tuple(c))
            leaf_part.append(p)
    ssigs = {
        k: {
            p: sorted(Counter(s >> (2 * k) for s in parts[p]["S"]).values())
            for p in part_names
        }
        for k in range(1, 7)
    }

    def centers_of(cells):
        ij = np.array([[c[0], c[1]] for c in cells], dtype=float)
        cls = np.array([c[2] for c in cells])
        return ij + CENTROIDS[cls]

    tgrid = [round(t, 2) for t in np.arange(-1.0, 2.0, 0.1)]

    def children_sig(anc_cells, k):
        """Given per-leaf ancestor cells, check signature match for all parts."""
        for p in part_names:
            gg = Counter(
                anc_cells[i] for i in range(len(leaves)) if leaf_part[i] == p
            )
            if sorted(gg.values()) != ssigs[k][p]:
                return False
        return True

    # DFS
    results = []

    def dfs(anc, k, path):
        if k > 6:
            results.append(path)
            print("FULL CHAIN:", path)
            return
        X = centers_of(anc)
        seen_partitions = {}
        for mi, M in enumerate(DIHEDRAL):
            Minv = np.linalg.inv(M)
            for tx in tgrid:
                for ty in tgrid:
                    Y = (X - np.array([tx, ty])) / 2.0 @ Minv.T
                    ii, jj, cc = locate_all(Y)
                    if (cc < 0).any():
                        continue
                    nxt = [(int(ii[i]), int(jj[i]), int(cc[i])) for i in range(len(anc))]
                    if not children_sig(nxt, k):
                        continue
                    key = tuple(nxt)
                    if key in seen_partitions:
                        continue
                    seen_partitions[key] = (mi, tx, ty)
                    print(f"  depth {k}: viable M#{mi} t=({tx},{ty})")
                    dfs(nxt, k + 1, path + [(mi, tx, ty)])

    dfs(leaves, 1, [])
    print(f"total full chains: {len(results)}")


if __name__ == "__main__":
    main()
