"""Label-free quadtree-packing search over the elephant block.

Model: pentagon (i,j,c) maps to fine-grid coords z = P @ (i,j) + q_c + v in a
64x64 block (all 146 cells share S prefix '300', 4096 = 64^2 cells).  The
6-digit S suffix is the quadtree path of z, with UNKNOWN per-node labeling of
digits to sub-blocks (curve state).  A candidate (P, q-perm, v) is viable iff
a digit<->sub-block bijection exists at every node making per-part counts
match (checked by exact bipartite matching of count vectors, recursively).

Stage 1: root-level filter vectorized over all v via wrapped integral images.
Stage 2: full recursive check on survivors.

Run:  python3 tools/lattice/solve_quadtree.py
"""
from __future__ import annotations

import itertools
import json
from collections import defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])
NP_ = len(PART_NAMES)

# cells and S suffixes (6 quaternary digits, MSB first) per part
CELLS = []  # (i, j, c, part_idx)
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


def index4_bases(lim=2):
    out = []
    rng = range(-lim, lim + 1)
    for a, b, c, d in itertools.product(rng, repeat=4):
        if abs(a * d - b * c) == 4:
            out.append(np.array([[a, b], [c, d]], dtype=np.int64))
    return out


def coset_reps(P):
    reps, seen = [], set()
    Pinv = np.linalg.inv(P)
    for x in range(8):
        for y in range(8):
            f = Pinv @ np.array([x, y])
            key = (round((f[0] % 1.0) * 8) % 8, round((f[1] % 1.0) * 8) % 8)
            if key not in seen:
                seen.add(key)
                reps.append((x, y))
            if len(reps) == 4:
                return reps
    return reps


# ---- digit-count tree from S suffixes (independent of geometry) ------------
def digit_tree():
    """node key = digit prefix tuple; value = per-part count vector."""
    tree = defaultdict(lambda: np.zeros(NP_, dtype=np.int64))
    for pi, suffs in SUFF.items():
        for digs in suffs:
            for k in range(7):
                tree[tuple(digs[:k])][pi] += 1
    return dict(tree)


DT = digit_tree()


def match_node(prefix, cells_idx, zb, level):
    """cells_idx: indices of cells in this node; zb: (N,2) block coords.
    level: 5..0, sub-block size 2^level.  Returns True if a consistent
    digit<->quadrant matching exists recursively."""
    if level < 0 or len(cells_idx) == 0:
        return True
    half = 1 << level
    qx = (zb[cells_idx, 0] // half) % 2
    qy = (zb[cells_idx, 1] // half) % 2
    quad = (qx * 2 + qy).astype(np.int64)  # arbitrary quadrant labeling 0..3
    # per-quadrant per-part counts
    qcounts = np.zeros((4, NP_), dtype=np.int64)
    for n, ci in enumerate(cells_idx):
        qcounts[quad[n], PIDX[ci]] += 1
    # digit count vectors
    dvecs = []
    for d in range(4):
        key = prefix + (d,)
        dvecs.append(DT.get(key, np.zeros(NP_, dtype=np.int64)))
    # try all bijections digit -> quadrant
    for perm in itertools.permutations(range(4)):
        ok = True
        for d in range(4):
            if not np.array_equal(dvecs[d], qcounts[perm[d]]):
                ok = False
                break
        if not ok:
            continue
        # recurse
        good = True
        for d in range(4):
            sub = [ci for n, ci in enumerate(cells_idx) if quad[n] == perm[d]]
            if not match_node(prefix + (d,), sub, zb, level - 1):
                good = False
                break
        if good:
            return True
    return False


def main():
    bases = index4_bases()
    root_dcounts = np.stack(
        [DT.get((d,), np.zeros(NP_, dtype=np.int64)) for d in range(4)]
    )  # (4, NP)
    print(f"search: {len(bases)} bases x 24 perms, root-filter over 4096 v")
    survivors = 0
    hits = []
    for P in bases:
        reps = coset_reps(P)
        if len(reps) != 4:
            continue
        for perm in itertools.permutations(range(4)):
            q = np.array([reps[perm[c]] for c in CLS])
            z = IJ @ P.T + q  # (N,2)
            zm = np.mod(z, 64)
            # per-part 64x64 histograms
            H = np.zeros((NP_, 64, 64), dtype=np.int64)
            np.add.at(H, (PIDX, zm[:, 0], zm[:, 1]), 1)
            # wrapped integral: count in window [a, a+32) x [b, b+32) for all a,b
            H2 = np.tile(H, (1, 2, 2))
            Cum = H2.cumsum(1).cumsum(2)
            Z = np.zeros((NP_, 65, 129), dtype=np.int64)
            # easier: brute window sums via cumsum with padding
            Cp = np.zeros((NP_, 129, 129), dtype=np.int64)
            Cp[:, 1:, 1:] = Cum
            a = np.arange(64)
            # W[p, ax, by] = sum over [ax..ax+32) x [by..by+32)
            W = (
                Cp[:, (a + 32)[:, None], (a + 32)[None, :]]
                - Cp[:, a[:, None], (a + 32)[None, :]]
                - Cp[:, (a + 32)[:, None], a[None, :]]
                + Cp[:, a[:, None], a[None, :]]
            )  # (NP, 64, 64)
            # quarters for alignment v: root splits at (-v) mod 64: the four
            # quarter windows start at ax in {-vx mod 64, -vx+32 mod 64} etc.
            # For every (ax, by): window counts per part; root viable iff the
            # 4 windows {ax,ax+32}x{by,by+32} match root_dcounts as multiset.
            for ax in range(32):  # (ax, ax+32) symmetric; scan half
                for by in range(64):
                    wins = [
                        W[:, ax, by], W[:, ax, (by + 32) % 64],
                        W[:, (ax + 32) % 64, by], W[:, (ax + 32) % 64, (by + 32) % 64],
                    ]
                    if wins[0].sum() + wins[1].sum() + wins[2].sum() + wins[3].sum() != N:
                        continue
                    got = sorted(tuple(w) for w in wins)
                    want = sorted(tuple(r) for r in root_dcounts)
                    if got != want:
                        continue
                    survivors += 1
                    # full recursive check at this alignment
                    vx, vy = (-ax) % 64, (-by) % 64
                    zb = np.mod(z + np.array([vx, vy]), 64)
                    if match_node((), list(range(N)), zb, 5):
                        hits.append((P.tolist(), [reps[perm[c]] for c in range(4)], (vx, vy)))
                        print("HIT:", hits[-1])
    print(f"root survivors: {survivors}, full hits: {len(hits)}")
    if hits:
        json.dump(hits, open("tools/lattice/quadtree_solution.json", "w"), indent=1)


if __name__ == "__main__":
    main()
