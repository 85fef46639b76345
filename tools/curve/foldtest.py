"""Test: triangle anchors = 16x16 square folded along the diagonal.
Unfold extracted visit order to square coords; if the curve is a square
Hilbert variant, consecutive steps are unit moves."""
import pickle, sys
import numpy as np

seq = pickle.load(open(sys.argv[1] if len(sys.argv)>1 else "seq_polished.pkl","rb"))

def unfold(zx, zy, variant):
    m = zy
    t = zx - zy - 1            # 0 .. 30-2m
    arm = 15 - m               # max index on each arm
    # hook: arm1 cells (i=m, j=m..15) has arm+1 cells; arm2 (j=m, i=m+1..15) arm cells
    if variant & 1:
        t = (30 - 2*m) - t     # reverse hook direction
    if t <= arm:
        i, j = m, m + t
    else:
        i, j = m + (t - arm), m
    if variant & 2:
        i, j = j, i
    return i, j

for v in range(4):
    pts = [unfold(zx, zy, v) for zx, zy in seq]
    # bijection check
    ok_bij = len(set(pts)) == 256
    steps = [abs(pts[k+1][0]-pts[k][0]) + abs(pts[k+1][1]-pts[k][1]) for k in range(255)]
    unit = sum(1 for s in steps if s == 1)
    print(f"variant {v}: bijection={ok_bij} unit-steps={unit}/255 hist={np.bincount(steps)[:6]}")
