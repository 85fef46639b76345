"""Polish the extracted sequence by re-choosing contested visits.

The Voronoi walk yields multiple visit candidates for ~60 cells. Choosing
which visit to keep changes the cell's position in the sequence. Hill-climb
on: sum of log-frequency of quad patterns (re-estimated each pass) plus a
param-consistency term.
"""
import pickle
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from voronoi_seq import nearest_anchor, ANCHORS, M, T, Minv, repair  # noqa: E402

E = np.load("/root/repo/tools/curve/fitE.npy")
PARS = [(0, 0), (0, 1), (1, 0), (1, 1)]
from voronoi_seq import GHOSTS, GSHIFT  # noqa: E402


def esite(z):
    if z in GHOSTS:
        return np.array(z, float) + GSHIFT
    return np.array(z, float) + E[PARS.index((z[0] % 2, z[1] % 2))]


def get_visits():
    d = pickle.load(open("/root/repo/tools/curve/path3.pkl", "rb"))
    pixels = repair(d["pixels"])
    cells = [nearest_anchor(y, x) for y, x in pixels]
    U = (np.array(pixels, float) - T) @ Minv.T
    visits = []
    t = 0
    while t < len(cells):
        s = t
        while t < len(cells) and cells[t] == cells[s]:
            t += 1
        if t - s >= 3:
            cell = cells[s]
            dmin = min(np.hypot(*(U[k] - esite(cell))) for k in range(s, t))
            visits.append([cell, s, t, dmin])
    merged = []
    for v in visits:
        if merged and merged[-1][0] == v[0] and v[1] - merged[-1][2] < 12:
            merged[-1][2] = v[2]
            merged[-1][3] = min(merged[-1][3], v[3])
        else:
            merged.append(v)
    return merged


def seq_from_choice(visits, choice):
    # choice: cell -> index into its candidate list
    by_cell = {}
    for i, v in enumerate(visits):
        by_cell.setdefault(v[0], []).append(i)
    keep = set()
    for cell, idxs in by_cell.items():
        idxs2 = sorted(idxs, key=lambda i: visits[i][3])
        keep.add(idxs2[choice.get(cell, 0)])
    return [visits[i][0] for i in sorted(keep)]


def score(seq, pat_w, pa):
    s = 0.0
    for k in range(len(seq) // 4):
        q = seq[4 * k:4 * k + 4]
        p = tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:])
        s += pat_w.get(p, -3.0)
    # param consistency
    ps = [pa[z] for z in seq]
    for t in range(len(seq) - 1):
        if ps[t + 1] < ps[t] - 12:
            s -= 1.0
    return s


def main():
    visits = get_visits()
    pa = pickle.load(open("/root/repo/tools/curve/pa.pkl", "rb"))
    by_cell = {}
    for i, v in enumerate(visits):
        by_cell.setdefault(v[0], []).append(i)
    contested = [c for c, idxs in by_cell.items() if len(idxs) > 1]
    print("contested cells:", len(contested))
    choice = {}
    for it in range(6):
        seq = seq_from_choice(visits, choice)
        assert len(seq) == 256 and len(set(seq)) == 256, len(seq)
        pats = Counter()
        for k in range(64):
            q = seq[4 * k:4 * k + 4]
            pats[tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:])] += 1
        pat_w = {p: float(np.log(n)) for p, n in pats.items() if n >= 2}
        base = score(seq, pat_w, pa)
        improved = False
        for c in contested:
            cur = choice.get(c, 0)
            ncand = len(by_cell[c])
            for alt in range(ncand):
                if alt == cur:
                    continue
                choice[c] = alt
                s2 = score(seq_from_choice(visits, choice), pat_w, pa)
                if s2 > base + 1e-9:
                    base = s2
                    cur = alt
                    improved = True
                choice[c] = cur
        rare = sum(n for p, n in pats.items() if n <= 2)
        print(f"pass {it}: score {base:.2f}, rare-pattern quads {rare}, "
              f"flips {sum(1 for v in choice.values() if v)}")
        if not improved:
            break
    seq = seq_from_choice(visits, choice)
    pickle.dump(seq, open("/root/repo/tools/curve/seq_polished.pkl", "wb"))
    pats = Counter()
    for k in range(64):
        q = seq[4 * k:4 * k + 4]
        pats[tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:])] += 1
    for p, n in pats.most_common():
        print(n, p)


if __name__ == "__main__":
    main()
