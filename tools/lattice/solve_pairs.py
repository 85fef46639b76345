"""Pair-Hilbert curve search:  S = 2 * H(u, w) + m.

Model: pentagons pair up (2 pairs per unit cell).  Pair coords
(u, w) = B @ (i, j) + r_pairtype + v  with |det B| = 2; H = Hilbert index on
a 512x256 grid (two 256^2 square Hilbert halves, each with a searchable
dihedral orientation); member bit m = m_c (fixed per class), optionally
XOR'ed with the pair direction parity (H & 1).

v is pinned by the eye_left anchor; eye_right prefilters; full 146-cell
part-set check decides.

Run:  python3 tools/lattice/solve_pairs.py
"""
from __future__ import annotations

import itertools
import json

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])
SUFF = {p: list(GT["parts"][p]["S"]) for p in PART_NAMES}
CELLS = {p: [tuple(c) for c in GT["parts"][p]["cells"]] for p in PART_NAMES}
ANCH = {a["part"]: (a["S"], tuple(a["cell"])) for a in GT["anchors"]}
SL, CL = ANCH["eye_left"]
SR, CR = ANCH["eye_right"]


# ---- square Hilbert (order 8, 256x256), dihedral-parameterized -------------
def d2xy_sq(order, d):
    d = int(d)
    x = y = 0
    t = d
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def xy2d_sq(order, x, y):
    d = 0
    s = (1 << order) // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


DIH = [np.array(m) for m in (
    [[1, 0], [0, 1]], [[-1, 0], [0, -1]], [[0, 1], [1, 0]], [[0, -1], [-1, 0]],
    [[1, 0], [0, -1]], [[-1, 0], [0, 1]], [[0, 1], [-1, 0]], [[0, -1], [1, 0]])]


def apply_dih(o, x, y, n):
    """Apply dihedral transform o to (x,y) within [0,n)^2 (integer)."""
    M = DIH[o]
    cx = (n - 1) / 2.0
    p = M @ (np.array([x, y]) - cx) + cx
    return int(round(p[0])), int(round(p[1]))


def xy2d_rect(o1, o2, u, w):
    """17-bit Hilbert-ish index on 512x256: u in [0,512), w in [0,256).
    Half 0: u<256 with orientation o1; half 1: u>=256, index offset 2^16,
    orientation o2 applied to (u-256, w)."""
    if u < 0 or u >= 512 or w < 0 or w >= 256:
        return None
    if u < 256:
        x, y = apply_dih(o1, u, w, 256)
        return xy2d_sq(8, x, y)
    x, y = apply_dih(o2, u - 256, w, 256)
    return (1 << 16) + xy2d_sq(8, x, y)


def d2xy_rect(o1, o2, h):
    half = h >> 16
    x, y = d2xy_sq(8, h & 0xFFFF)
    # invert dihedral: find p with apply_dih(o,p)= (x,y): use inverse matrix
    o = o1 if half == 0 else o2
    M = np.linalg.inv(DIH[o]).astype(np.int64)
    cx = (256 - 1) / 2.0
    p = M @ (np.array([x, y]) - cx) + cx
    u, w = int(round(p[0])), int(round(p[1]))
    if half:
        u += 256
    return u, w


def main():
    bases = []
    for a, b, c, d in itertools.product(range(-2, 3), repeat=4):
        if abs(a * d - b * c) == 2:
            bases.append(np.array([[a, b], [c, d]], dtype=np.int64))
    pairings = [((0, 1), (2, 3)), ((0, 2), (1, 3)), ((0, 3), (1, 2))]
    hits = []
    tried = 0
    for o1 in range(8):
        for o2 in range(8):
            # eye pair coords from S
            res = []
            for S in (SL, SR):
                H, m = S >> 1, S & 1
                res.append((d2xy_rect(o1, o2, H), m, H))
            (uwL, mL, HL), (uwR, mR, HR) = res
            for B in bases:
                # coset reps of B Z^2
                reps, seen = [], set()
                Binv = np.linalg.inv(B)
                for xx in range(4):
                    for yy in range(4):
                        f = Binv @ np.array([xx, yy])
                        key = (round((f[0] % 1.0) * 4) % 4, round((f[1] % 1.0) * 4) % 4)
                        if key not in seen:
                            seen.add(key)
                            reps.append(np.array([xx, yy]))
                        if len(reps) == 2:
                            break
                    if len(reps) == 2:
                        break
                for pairing in pairings:
                    for rperm in (0, 1):  # which pair-type gets which coset
                        rmap = {}
                        for t, pr in enumerate(pairing):
                            for c in pr:
                                rmap[c] = reps[t ^ rperm]
                        for mflip in range(4):
                            # m_c for the two classes of each pair: bit0 of
                            # mflip flips pair0's order, bit1 pair1's
                            mmap = {}
                            for t, pr in enumerate(pairing):
                                lo = (mflip >> t) & 1
                                mmap[pr[0]] = lo
                                mmap[pr[1]] = 1 - lo
                            for dirpar in (0, 1):  # m ^= dirpar*(H&1)
                                tried += 1
                                # check eyes' m first
                                mexpL = mmap[CL[2]] ^ (dirpar * (HL & 1))
                                mexpR = mmap[CR[2]] ^ (dirpar * (HR & 1))
                                if mexpL != mL or mexpR != mR:
                                    continue
                                v = np.array(uwL) - B @ np.array(CL[:2]) - rmap[CL[2]]
                                # eye_right position check
                                pR = B @ np.array(CR[:2]) + rmap[CR[2]] + v
                                if tuple(pR) != uwR:
                                    continue
                                # full check
                                ok = True
                                for p in PART_NAMES:
                                    want = set()
                                    for (i, j, c) in CELLS[p]:
                                        uw = B @ np.array([i, j]) + rmap[c] + v
                                        H = xy2d_rect(o1, o2, int(uw[0]), int(uw[1]))
                                        if H is None:
                                            ok = False
                                            break
                                        m = mmap[c] ^ (dirpar * (H & 1))
                                        want.add(2 * H + m)
                                    if not ok or want != set(SUFF[p]):
                                        ok = False
                                        break
                                if ok:
                                    hits.append({"o1": o1, "o2": o2, "B": B.tolist(),
                                                 "rmap": {c: rmap[c].tolist() for c in rmap},
                                                 "mmap": mmap, "dirpar": dirpar,
                                                 "v": v.tolist()})
                                    print("HIT:", hits[-1])
    print(f"tried {tried}; hits {len(hits)}")
    if hits:
        json.dump(hits, open("tools/lattice/pair_solution.json", "w"), indent=1, default=int)


if __name__ == "__main__":
    main()
