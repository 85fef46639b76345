"""Complex-base / matrix-base numeration curve search.

Model (pure positional numeration, no hidden state):
    z(S) = sum_k M^k * t[d_k]     (digits d_k of S, k=0 LSB)
    z(cell) = P @ (i,j) + q[class] + v
with M integer 2x2, |det M| = 4, t[] a digit assignment to canonical coset
representatives of M Z^2; P one of the 7 left-GL2(Z) Hermite forms of index-4
sublattices (gauge-fixed); q[] an assignment of classes to coset reps of
P Z^2; v eliminated via the eye_left anchor.  Only the 6 low digits matter
(common prefix '300' is absorbed into v).

Filter order: eye_right anchor -> full 146-cell part-set check.

Run:  python3 tools/lattice/solve_numeration.py
"""
from __future__ import annotations

import itertools
import json

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])

SUFF = {}  # part -> list of 6-digit tuples (LSB first)
for p in PART_NAMES:
    SUFF[p] = [tuple((s >> (2 * k)) & 3 for k in range(6)) for s in GT["parts"][p]["S"]]
CELLS = {p: [tuple(c) for c in GT["parts"][p]["cells"]] for p in PART_NAMES}

ANCH = {a["part"]: (a["S"], tuple(a["cell"])) for a in GT["anchors"]}
SL = tuple((ANCH["eye_left"][0] >> (2 * k)) & 3 for k in range(6))
SR = tuple((ANCH["eye_right"][0] >> (2 * k)) & 3 for k in range(6))
CL = ANCH["eye_left"][1]
CR = ANCH["eye_right"][1]

# Hermite forms of index-4 sublattices
P_FORMS = []
for a, d in ((1, 4), (2, 2), (4, 1)):
    for b in range(d):
        P_FORMS.append(np.array([[a, b], [0, d]], dtype=np.int64))

def p_cosets(P):
    """Coset reps of P Z^2 in Z^2 for Hermite P=[[a,b],[0,d]]: ad=4."""
    a, d = P[0, 0], P[1, 1]
    return [np.array([x, y], dtype=np.int64) for x in range(a) for y in range(d)]

def m_cosets(M):
    """4 canonical coset reps of M Z^2 (small, via residue scan)."""
    reps, seen = [], set()
    Minv = np.linalg.inv(M)
    for r in range(6):  # scan shells to prefer small reps
        for x in range(-r, r + 1):
            for y in range(-r, r + 1):
                if max(abs(x), abs(y)) != r:
                    continue
                f = Minv @ np.array([x, y])
                key = (round((f[0] % 1.0) * 8) % 8, round((f[1] % 1.0) * 8) % 8)
                if key not in seen:
                    seen.add(key)
                    reps.append(np.array([x, y], dtype=np.int64))
                if len(reps) == 4:
                    return reps
    return reps

def z_of_digits(digs, M, T):
    z = np.zeros(2, dtype=np.int64)
    Mk = np.eye(2, dtype=np.int64)
    for d in digs:
        z = z + Mk @ T[d]
        Mk = Mk @ M
    return z

def main():
    Ms = []
    rng = range(-2, 3)
    for a, b, c, d in itertools.product(rng, repeat=4):
        if abs(a * d - b * c) == 4:
            Ms.append(np.array([[a, b], [c, d]], dtype=np.int64))
    print(f"{len(Ms)} M bases, {len(P_FORMS)} P forms")

    hits = []
    for M in Ms:
        reps = m_cosets(M)
        if len(reps) != 4:
            continue
        # precompute M^k for k=0..5
        Mk = [np.eye(2, dtype=np.int64)]
        for _ in range(5):
            Mk.append(Mk[-1] @ M)
        for tperm in itertools.permutations(range(4)):
            T = [reps[tperm[d]] for d in range(4)]
            zL = z_of_digits(SL, M, T)
            zR = z_of_digits(SR, M, T)
            dz = zR - zL
            for P in P_FORMS:
                qs = p_cosets(P)
                dij = P @ (np.array(CR[:2]) - np.array(CL[:2]))
                for qperm in itertools.permutations(range(4)):
                    dq = qs[qperm[CR[2]]] - qs[qperm[CL[2]]]
                    if not np.array_equal(dij + dq, dz):
                        continue
                    v = zL - P @ np.array(CL[:2]) - qs[qperm[CL[2]]]
                    # full check
                    ok = True
                    for p in PART_NAMES:
                        want = set()
                        for (i, j, c) in CELLS[p]:
                            w = P @ np.array([i, j]) + qs[qperm[c]] + v
                            want.add((int(w[0]), int(w[1])))
                        got = set()
                        for digs in SUFF[p]:
                            z = sum((Mk[k] @ T[d] for k, d in enumerate(digs)),
                                    np.zeros(2, dtype=np.int64))
                            got.add((int(z[0]), int(z[1])))
                        if want != got:
                            ok = False
                            break
                    if ok:
                        hits.append({"M": M.tolist(), "T": [t.tolist() for t in T],
                                     "P": P.tolist(), "q": [qs[qperm[c]].tolist() for c in range(4)],
                                     "v": v.tolist()})
                        print("HIT:", hits[-1])
    print(f"hits: {len(hits)}")
    if hits:
        json.dump(hits, open("tools/lattice/numeration_solution.json", "w"), indent=1)

if __name__ == "__main__":
    main()
