"""Diagnostic: partial scoring of the Hilbert-on-packed-grid family."""
import itertools, json
import numpy as np
import sys
sys.path.insert(0, "tools/lattice")
from solve_curve import CURVES, index4_bases, coset_reps, GT

parts = GT["parts"]
anchors = {a["part"]: (a["S"], tuple(a["cell"])) for a in GT["anchors"]}
sL, cellL = anchors["eye_left"]
sR, cellR = anchors["eye_right"]
all_S = sorted({s for p in parts.values() for s in p["S"]})
Sarr = np.array(all_S, dtype=np.int64)
decoded = {}
for name, fn in CURVES.items():
    x, y = fn(Sarr)
    decoded[name] = {int(s): (int(xx), int(yy)) for s, xx, yy in zip(all_S, x, y)}

bases = index4_bases()
n_anchor_pass = 0
best = []
for cname, dec in decoded.items():
    hL = np.array(dec[sL]); hR = np.array(dec[sR])
    for P in bases:
        reps = coset_reps(P)
        iL = np.array(cellL[:2]); iR = np.array(cellR[:2])
        for perm in itertools.permutations(range(4)):
            v = hL - P @ iL - reps[perm[cellL[2]]]
            if not np.array_equal(P @ iR + reps[perm[cellR[2]]] + v, hR):
                continue
            n_anchor_pass += 1
            score = 0; total = 0
            for pname, pdat in parts.items():
                want = set()
                for (i, j, c) in pdat["cells"]:
                    q = reps[perm[c]]
                    want.add((int(P[0,0]*i + P[0,1]*j + q[0] + v[0]),
                              int(P[1,0]*i + P[1,1]*j + q[1] + v[1])))
                got = {dec[s] for s in pdat["S"]}
                score += len(want & got); total += len(want)
            best.append((score, total, cname, P.tolist(), [reps[perm[c]].tolist() for c in range(4)], v.tolist()))
best.sort(key=lambda t: -t[0])
print(f"anchor-passing combos: {n_anchor_pass}")
for b in best[:10]:
    print(b)
