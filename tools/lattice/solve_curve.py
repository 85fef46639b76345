"""Curve-rule solver attempt #2: Hilbert-on-packed-square-grid hypothesis.

Model: a cell's 18-bit S (res 10, 9 quaternary digits, local to the quintant)
is the index of a space-filling curve on a 512x512 fine grid; pentagons map to
fine cells via (x, y) = P @ (i, j) + q_c + v with P an index-4 sublattice basis
(|det P| = 4; absorbs all dihedral curve orientations), q_c the four coset
representatives of P@Z^2 in Z^2 assigned to the 4 pentagon classes, and v an
unknown translation pinned by the eye_left exact anchor.

Curve variants tested: standard Hilbert (MSB-first), digit-reversed Hilbert,
Z-order (Morton), and transposed Morton.

Validation: predicted position sets must equal the observed position sets for
every elephant part (set match; the intra-part S<->cell bijection is unknown).

Run:  python3 tools/lattice/solve_curve.py
"""
from __future__ import annotations

import itertools
import json

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
N = 512  # 2^9 per side at res 10


# ---------------------------------------------------------------- curves
def hilbert_d2xy(order: int, d: np.ndarray):
    """Vectorized standard Hilbert decode: index -> (x, y) on 2^order grid."""
    d = np.asarray(d, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        xs, ys = x.copy(), y.copy()
        x = np.where(swap, ys, x)
        y = np.where(swap, xs, y)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s *= 2
    return x, y


def morton_d2xy(order: int, d: np.ndarray):
    d = np.asarray(d, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    for b in range(order):
        x |= ((d >> (2 * b)) & 1) << b
        y |= ((d >> (2 * b + 1)) & 1) << b
    return x, y


def rev_digits(d: np.ndarray, order: int):
    d = np.asarray(d, dtype=np.int64)
    out = np.zeros_like(d)
    for b in range(order):
        out |= ((d >> (2 * b)) & 3) << (2 * (order - 1 - b))
    return out


CURVES = {
    "hilbert": lambda d: hilbert_d2xy(9, d),
    "hilbert_rev": lambda d: hilbert_d2xy(9, rev_digits(d, 9)),
    "morton": lambda d: morton_d2xy(9, d),
    "morton_rev": lambda d: morton_d2xy(9, rev_digits(d, 9)),
}


# ---------------------------------------------------------------- lattice maps
def index4_bases(lim=3):
    """All 2x2 integer matrices, entries in [-lim, lim], |det| == 4,
    deduplicated up to right-multiplication by nothing (each P distinct map)."""
    out = []
    rng = range(-lim, lim + 1)
    for a, b, c, d in itertools.product(rng, repeat=4):
        if abs(a * d - b * c) == 4:
            out.append(np.array([[a, b], [c, d]], dtype=np.int64))
    return out


def coset_reps(P):
    """4 canonical coset representatives of P@Z^2 in Z^2 (Smith-style scan)."""
    reps = []
    seen = set()
    Pinv = np.linalg.inv(P)
    for x in range(8):
        for y in range(8):
            # residue key: fractional part of P^-1 @ (x,y)
            f = Pinv @ np.array([x, y])
            key = (round((f[0] % 1.0) * 8) % 8, round((f[1] % 1.0) * 8) % 8)
            if key not in seen:
                seen.add(key)
                reps.append(np.array([x, y], dtype=np.int64))
            if len(reps) == 4:
                return reps
    return reps


def main():
    parts = GT["parts"]
    anchors = {a["part"]: (a["S"], tuple(a["cell"])) for a in GT["anchors"]}
    sL, cellL = anchors["eye_left"]
    sR, cellR = anchors["eye_right"]

    # pre-decode every S per curve
    all_S = sorted({s for p in parts.values() for s in p["S"]})
    Sarr = np.array(all_S, dtype=np.int64)
    decoded = {}
    for name, fn in CURVES.items():
        x, y = fn(Sarr)
        decoded[name] = {int(s): (int(xx), int(yy)) for s, xx, yy in zip(all_S, x, y)}

    bases = index4_bases()
    print(f"searching: {len(CURVES)} curves x {len(bases)} bases x 24 class perms")

    hits = []
    for cname, dec in decoded.items():
        hL = np.array(dec[sL])
        hR = np.array(dec[sR])
        for P in bases:
            reps = coset_reps(P)
            if len(reps) != 4:
                continue
            iL = np.array(cellL[:2])
            iR = np.array(cellR[:2])
            base_L = P @ iL
            base_R = P @ iR
            for perm in itertools.permutations(range(4)):
                # class c -> reps[perm[c]]
                v = hL - base_L - reps[perm[cellL[2]]]
                # check eye_right immediately
                if not np.array_equal(base_R + reps[perm[cellR[2]]] + v, hR):
                    continue
                ok = True
                for pname, pdat in parts.items():
                    want = set()
                    for (i, j, c) in pdat["cells"]:
                        q = reps[perm[c]]
                        want.add((int(P[0, 0] * i + P[0, 1] * j + q[0] + v[0]),
                                  int(P[1, 0] * i + P[1, 1] * j + q[1] + v[1])))
                    got = {dec[s] for s in pdat["S"]}
                    if want != got:
                        ok = False
                        break
                if ok:
                    hits.append((cname, P.tolist(), [reps[perm[c]].tolist() for c in range(4)],
                                 v.tolist()))
                    print("HIT:", hits[-1])
    print(f"done: {len(hits)} full-corpus solutions")
    if hits:
        json.dump(hits, open("tools/lattice/curve_solution.json", "w"), indent=1)


if __name__ == "__main__":
    main()
