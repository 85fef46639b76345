"""Anchor sequence via lattice-Voronoi walking of the repaired pixel path.

1. Repair path3: re-place mis-inserted stub detours (pixel jumps) and
   reverse the one backward section (sustained negative param slope).
2. Assign each pixel to the nearest anchor in lattice coords; a visit is
   >=MIN_RUN consecutive pixels in one cell.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from trace2 import param_of  # noqa: E402

M = np.load("/root/repo/tools/curve/fitM.npy")
T = np.load("/root/repo/tools/curve/fitT.npy")
Minv = np.linalg.inv(M)
ANCHORS = [(zx, zy) for zy in range(16) for zx in range(zy + 1, 32 - zy)]
ASET = set(ANCHORS)
GHOSTS = {(30, 1), (28, 3), (26, 5), (24, 7), (22, 9), (20, 11),
          (18, 13), (16, 15)}
GSHIFT = np.array([-0.6, -0.35])


def site(z):
    u = np.array(z, float)
    return u + GSHIFT if z in GHOSTS else u


def nearest_anchor(y, x):
    u = (np.array([y, x], float) - T) @ Minv.T
    zx, zy = int(round(u[0])), int(round(u[1]))
    best, bd = None, 1e9
    for ddx in (-2, -1, 0, 1, 2):
        for ddy in (-1, 0, 1):
            z = (zx + ddx, zy + ddy)
            if z in ASET:
                s = site(z)
                d = (u[0] - s[0]) ** 2 + (u[1] - s[1]) ** 2
                if d < bd:
                    best, bd = z, d
    return best


def repair(pixels):
    P = np.array(pixels, float)
    # 1) remove+collect misplaced detours: find jump pairs (dist>6 px)
    jumps = [t for t in range(len(P) - 1)
             if np.hypot(*(P[t + 1] - P[t])) > 6]
    print("pixel jumps at:", jumps)
    # detour block = between two jumps close together (< 80 px apart)
    blocks = []
    i = 0
    while i + 1 < len(jumps):
        a, b = jumps[i], jumps[i + 1]
        if b - a < 80:
            blocks.append((a + 1, b + 1))  # pixel slice [a+1, b+1)
            i += 2
        else:
            i += 1
    print("detour blocks:", blocks)
    keep = np.ones(len(P), bool)
    detours = []
    for a, b in blocks:
        keep[a:b] = False
        detours.append([tuple(map(int, p)) for p in P[a:b]])
    base = [tuple(map(int, p)) for p in P[keep]]
    # 2) fix reversed section via param slope
    pa = np.array([param_of(*p) for p in base])
    k = 51
    sm = np.convolve(pa, np.ones(k) / k, mode="same")
    neg = sm[1:] - sm[:-1] < -0.02
    # find longest negative run
    runs = []
    s = None
    for t, v in enumerate(neg):
        if v and s is None:
            s = t
        elif not v and s is not None:
            runs.append((s, t))
            s = None
    if s is not None:
        runs.append((s, len(neg)))
    runs.sort(key=lambda r: r[1] - r[0], reverse=True)
    print("negative-slope runs:", runs[:5])
    if runs and runs[0][1] - runs[0][0] > 150:
        a, b = runs[0]
        # expand to pixel-jump-free boundaries? just reverse the slice
        base = base[:a] + base[a:b][::-1] + base[b:]
        print(f"reversed slice [{a},{b})")
    # 3) reinsert detours at nearest pixel position
    B = np.array(base, float)
    for det in detours:
        anchor_pt = np.array(det[0], float)
        d = np.hypot(B[:, 0] - anchor_pt[0], B[:, 1] - anchor_pt[1])
        t = int(np.argmin(d))
        base[t + 1:t + 1] = det
        B = np.array(base, float)
    return base


def main():
    d = pickle.load(open("/root/repo/tools/curve/path3.pkl", "rb"))
    pixels = repair(d["pixels"])
    cells = [nearest_anchor(y, x) for y, x in pixels]
    # sustained visits
    seq = []
    run = 1
    for t in range(1, len(cells) + 1):
        if t < len(cells) and cells[t] == cells[t - 1]:
            run += 1
            continue
        if run >= 3 and cells[t - 1] is not None:
            if not seq or seq[-1] != cells[t - 1]:
                seq.append(cells[t - 1])
        run = 1
    print("visits:", len(seq), "distinct:", len(set(seq)))
    from collections import Counter
    c = Counter(seq)
    print("multi:", sorted([(z, n) for z, n in c.items() if n > 1])[:20])
    missing = [z for z in ANCHORS if z not in c]
    print("missing:", missing)
    pickle.dump(seq, open("/root/repo/tools/curve/vseq.pkl", "wb"))


if __name__ == "__main__":
    main()
