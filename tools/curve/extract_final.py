"""Final sequence extractor + suspicion report.

Visits = entries of the repaired pixel path into tight zones (r=2.3px)
around the E-model visit points; dedupe by closest approach. Reports
suspicious positions for visual verification.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from voronoi_seq import ANCHORS, M, T, Minv, repair, GHOSTS, GSHIFT  # noqa: E402

E = np.load("/root/repo/tools/curve/fitE.npy")
PARS = [(0, 0), (0, 1), (1, 0), (1, 1)]


def esite(z):
    if z in GHOSTS:
        return np.array(z, float) + GSHIFT
    return np.array(z, float) + E[PARS.index((z[0] % 2, z[1] % 2))]


def extract(radius=0.22):
    d = pickle.load(open("/root/repo/tools/curve/path3.pkl", "rb"))
    pixels = repair(d["pixels"])
    U = (np.array(pixels, float) - T) @ Minv.T
    sites = np.array([esite(z) for z in ANCHORS])
    # distance of every path pixel to every site is 256x4k — fine
    visits = []  # [cell_idx, t_start, t_end, dmin, t_at_dmin]
    cur = [None, 0, 0, 9e9, 0]
    for t, u in enumerate(U):
        dd = np.hypot(sites[:, 0] - u[0], sites[:, 1] - u[1])
        k = int(np.argmin(dd))
        inzone = dd[k] <= radius
        key = k if inzone else None
        if key != cur[0]:
            if cur[0] is not None:
                visits.append(cur)
            cur = [key, t, t, dd[k] if inzone else 9e9, t]
        else:
            cur[2] = t
            if inzone and dd[k] < cur[3]:
                cur[3], cur[4] = dd[k], t
    if cur[0] is not None:
        visits.append(cur)
    visits = [v for v in visits if v[0] is not None]
    # merge same-cell visits separated by < 10 px of path
    merged = []
    for v in visits:
        if merged and merged[-1][0] == v[0] and v[1] - merged[-1][2] < 10:
            merged[-1][2] = v[2]
            if v[3] < merged[-1][3]:
                merged[-1][3], merged[-1][4] = v[3], v[4]
        else:
            merged.append(list(v))
    return merged, pixels


def main():
    merged, pixels = extract()
    from collections import Counter
    cnt = Counter(v[0] for v in merged)
    print("visit events:", len(merged), "distinct:", len(cnt),
          "missing:", [ANCHORS[i] for i in range(256)
                       if i not in cnt] if len(cnt) < 256 else "none")
    best = {}
    for i, v in enumerate(merged):
        if v[0] not in best or v[3] < merged[best[v[0]]][3]:
            best[v[0]] = i
    seq_idx = [i for i, v in enumerate(merged) if best[v[0]] == i]
    seq = [ANCHORS[merged[i][0]] for i in seq_idx]
    print("final:", len(seq), "distinct", len(set(seq)))
    # suspicion report
    sus = set()
    # (a) dropped double-visits that were nearly as close
    for i, v in enumerate(merged):
        j = best[v[0]]
        if i != j and v[3] < 2.5 * merged[j][3] + 0.02:
            sus.add(ANCHORS[v[0]])
    # (b) rare quad patterns
    pats = Counter()
    qp = []
    for k in range(len(seq) // 4):
        q = seq[4 * k:4 * k + 4]
        p = tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:])
        pats[p] += 1
        qp.append(p)
    for k, p in enumerate(qp):
        if pats[p] <= 2:
            sus.update(seq[4 * k:4 * k + 4])
    print("suspicious cells:", len(sus))
    pickle.dump({"seq": seq, "merged": merged, "best": best,
                 "suspicious": sorted(sus), "pixels": pixels},
                open("/root/repo/tools/curve/extract_final.pkl", "wb"))
    print("patterns:", pats.most_common())


if __name__ == "__main__":
    main()
