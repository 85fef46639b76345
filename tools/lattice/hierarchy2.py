"""Fit per-level parent offsets t_k (and orientation M_k) for the hierarchy.

Level k=1 is the confirmed (M=-I, t=(0.3,1.5)) rule.  For k>=2 the parents of
level-(k-1) cells (already unscale-normalized to the unit lattice) are found
by a fresh grid search over t_k in [0,2)^2 and M_k in {-I, +I}, requiring the
leaf-count signature of every part to match the S >> 2k signature.

Run:  python3 tools/lattice/hierarchy2.py
"""
from __future__ import annotations

import json
from collections import Counter, defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
SHAPES = {int(c): np.array(v) for c, v in GT["shapes"].items()}


def pip(pt, ring):
    x, y = pt
    inside = False
    for a, b in zip(ring[:-1], ring[1:]):
        if (a[1] > y) != (b[1] > y):
            if a[0] + (y - a[1]) / (b[1] - a[1]) * (b[0] - a[0]) > x:
                inside = not inside
    return inside


def locate(y):
    i0, j0 = int(np.floor(y[0])), int(np.floor(y[1]))
    for i in (i0 - 2, i0 - 1, i0, i0 + 1, i0 + 2):
        for j in (j0 - 2, j0 - 1, j0, j0 + 1, j0 + 2):
            for c in range(4):
                ring = SHAPES[c] + np.array([i, j])
                if pip(y, np.vstack([ring, ring[:1]])):
                    return (i, j, c)
    return None


def center(cell):
    i, j, c = cell
    return SHAPES[c].mean(0) + np.array([i, j])


def main():
    parts = GT["parts"]
    # state: per leaf -> current ancestor cell (normalized coords); per part
    cur = {p: {tuple(c): tuple(c) for c in d["cells"]} for p, d in parts.items()}
    rules = []
    for k in range(1, 7):
        ssig = {
            p: sorted(Counter(s >> (2 * k) for s in d["S"]).values())
            for p, d in parts.items()
        }
        hits = []
        for mi, M in ((1, -np.eye(2)), (0, np.eye(2))):
            for tx in np.arange(-1.0, 2.0, 0.1):
                for ty in np.arange(-1.0, 2.0, 0.1):
                    t = np.array([tx, ty])
                    ok = True
                    newcur = {}
                    for p, d in parts.items():
                        gg = defaultdict(int)
                        nc = {}
                        for leaf, anc in cur[p].items():
                            par = locate(np.linalg.solve(2 * M, center(anc) - t))
                            if par is None:
                                ok = False
                                break
                            nc[leaf] = par
                            gg[par] += 1
                        if not ok:
                            break
                        # collapse: group by ancestor, count leaves
                        if sorted(gg.values()) != ssig[p]:
                            ok = False
                            break
                        newcur[p] = nc
                    if ok:
                        hits.append((mi, round(tx, 2), round(ty, 2), newcur))
        print(f"depth {k}: {len(hits)} viable (M,t): {[(h[0], h[1], h[2]) for h in hits]}")
        if not hits:
            print("DEAD END")
            return
        # take the first hit; dedupe ancestors for next level
        mi, tx, ty, newcur = hits[0]
        rules.append((mi, tx, ty))
        cur = newcur
    print("rules per depth:", rules)


if __name__ == "__main__":
    main()
