"""Pentagon->triangle-quadtree correspondence search (label-free).

Model: pentagon (i,j,c) maps to a triangle (x, y, o) of a triangular grid:
    (x, y) = A @ (i, j) + b_c + v,   o = o_c
with A integer, |det A| = 2 (4 pentagons per pentagon-unit-cell <-> 4
triangles = 2 triangle-unit-cells), classes assigned bijectively to the four
(coset, orientation) combos, and v an unknown translation (mod 64).

Triangle quadtree parent: (x, y, o) -> (x>>1, y>>1, o') where o' flips
U->D when both coords odd, D->U when both even.

Check: all 146 cells share one depth-6 ancestor, and a per-node digit<->child
bijection exists at every tree node matching per-part counts (DT from S).

Run:  python3 tools/lattice/solve_triangle.py
"""
from __future__ import annotations

import itertools
import json
from collections import defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])
NP_ = len(PART_NAMES)

CELLS = []
for pi, p in enumerate(PART_NAMES):
    for c in GT["parts"][p]["cells"]:
        CELLS.append((c[0], c[1], c[2], pi))
SUFF = {pi: [] for pi in range(NP_)}
for pi, p in enumerate(PART_NAMES):
    for s in GT["parts"][p]["S"]:
        digs = [(s >> (2 * k)) & 3 for k in range(5, -1, -1)]
        SUFF[pi].append(digs)

IJ = np.array([[c[0], c[1]] for c in CELLS])
CLS = np.array([c[2] for c in CELLS])
PIDX = np.array([c[3] for c in CELLS])
N = len(CELLS)


def digit_tree():
    tree = defaultdict(lambda: np.zeros(NP_, dtype=np.int64))
    for pi, suffs in SUFF.items():
        for digs in suffs:
            for k in range(7):
                tree[tuple(digs[:k])][pi] += 1
    return dict(tree)


DT = digit_tree()


def parents(x, y, o):
    both_odd = (x & 1) & (y & 1)
    both_even = 1 - ((x | y) & 1)
    po = np.where(o == 0, np.where(both_odd == 1, 1, 0), np.where(both_even == 1, 0, 1))
    return x >> 1, y >> 1, po


def anc_chain(x, y, o, depth=6):
    """Return list of (x,y,o) ancestor arrays for levels 1..depth."""
    out = []
    for _ in range(depth):
        x, y, o = parents(x, y, o)
        out.append((x.copy(), y.copy(), o.copy()))
    return out


def match_node(prefix, cells_idx, chain, level):
    """level: 1..6 counts levels ABOVE leaves remaining; leaves at level 0.
    chain[k-1] = ancestors at level k.  Node at level `level` splits into
    children at level level-1 (or leaves when level==1)."""
    if len(cells_idx) == 0:
        return True
    if level == 0:
        return True
    # children keys at level-1 (leaf coords when level-1 == 0)
    if level == 1:
        kx, ky, ko = LEAF
    else:
        kx, ky, ko = chain[level - 2]
    groups = defaultdict(list)
    for ci in cells_idx:
        groups[(kx[ci], ky[ci], ko[ci])].append(ci)
    gkeys = list(groups)
    if len(gkeys) > 4:
        return False
    gcounts = []
    for gk in gkeys:
        v = np.zeros(NP_, dtype=np.int64)
        for ci in groups[gk]:
            v[PIDX[ci]] += 1
        gcounts.append(tuple(v))
    dvecs = [tuple(DT.get(prefix + (d,), np.zeros(NP_, dtype=np.int64))) for d in range(4)]
    # match each group to a distinct digit with equal count vector
    used = [False] * 4

    def backtrack(gi):
        if gi == len(gkeys):
            return True
        for d in range(4):
            if used[d] or dvecs[d] != gcounts[gi]:
                continue
            used[d] = True
            if match_node(prefix + (d,), groups[gkeys[gi]], chain, level - 1):
                if backtrack(gi + 1):
                    used[d] = False  # keep exploring? no — accept
                    return True
            used[d] = False
        return False

    return backtrack(0)


def main():
    global LEAF
    bases = []
    rng = range(-2, 3)
    for a, b, c, d in itertools.product(rng, repeat=4):
        if abs(a * d - b * c) == 2:
            bases.append(np.array([[a, b], [c, d]], dtype=np.int64))
    print(f"{len(bases)} bases")
    root_d = np.stack([DT.get((d,), np.zeros(NP_, dtype=np.int64)) for d in range(4)])

    VX, VY = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    hits = []
    tried = 0
    for A in bases:
        # coset reps of A Z^2 in Z^2 (2 cosets)
        reps = []
        seen = set()
        Ainv = np.linalg.inv(A)
        for xx in range(4):
            for yy in range(4):
                f = Ainv @ np.array([xx, yy])
                key = (round((f[0] % 1.0) * 4) % 4, round((f[1] % 1.0) * 4) % 4)
                if key not in seen:
                    seen.add(key)
                    reps.append((xx, yy))
                if len(reps) == 2:
                    break
            if len(reps) == 2:
                break
        # class -> (rep, orient) bijections: 4! orderings of the 4 combos
        combos = [(reps[0], 0), (reps[0], 1), (reps[1], 0), (reps[1], 1)]
        base_xy = IJ @ A.T  # (N,2)
        for perm in itertools.permutations(range(4)):
            tried += 1
            offs = np.array([combos[perm[c]][0] for c in CLS])
            oo = np.array([combos[perm[c]][1] for c in CLS])
            xy = base_xy + offs
            # vectorize over v: chains for x+vx, y+vy
            # depth-6 ancestor must be unique across cells for SOME v
            X = xy[:, 0][None, None, :] + VX[:, :, None]  # (64,64,N)
            Y = xy[:, 1][None, None, :] + VY[:, :, None]
            O = np.broadcast_to(oo[None, None, :], X.shape).copy()
            for _ in range(6):
                X, Y, O = parents(X, Y, O)
            key = (X * 1024 + Y) * 2 + O
            same = (key == key[:, :, :1]).all(axis=2)  # (64,64)
            vs = np.argwhere(same)
            if len(vs) == 0:
                continue
            for vx, vy in vs:
                x = xy[:, 0] + vx
                y = xy[:, 1] + vy
                o = oo.copy()
                chain = anc_chain(x, y, o, 6)
                LEAF = (x, y, o)
                # root digit counts must match depth-5 grouping; recursive
                if match_node((), list(range(N)), chain, 6):
                    hits.append((A.tolist(), [combos[perm[c]] for c in range(4)], (int(vx), int(vy))))
                    print("HIT:", hits[-1])
    print(f"tried {tried} (A, perm) combos; hits: {len(hits)}")
    if hits:
        json.dump(hits, open("tools/lattice/triangle_solution.json", "w"), indent=1)


if __name__ == "__main__":
    main()
