"""Recover the visit order of the 256 anchors.

Edges: anchor pairs (8-neighborhood in z) whose connecting segment is fully
drawn in the curve mask. Order: Hamiltonian path from min-param to max-param
anchor, DFS guided by color parameter.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from trace2 import param_of  # noqa: E402

M = np.load("/root/repo/tools/curve/fitM.npy")
T = np.load("/root/repo/tools/curve/fitT.npy")
E = np.load("/root/repo/tools/curve/fitE.npy")
CM = np.load("/root/repo/tools/curve/curvemask.npy")
PARS = [(0, 0), (0, 1), (1, 0), (1, 1)]
ANCHORS = [(zx, zy) for zy in range(16) for zx in range(zy + 1, 32 - zy)]

# distance-to-curve field (within 3): dilate mask
near = CM.copy()
for _ in range(3):
    n2 = near.copy()
    n2[1:, :] |= near[:-1, :]
    n2[:-1, :] |= near[1:, :]
    n2[:, 1:] |= near[:, :-1]
    n2[:, :-1] |= near[:, 1:]
    near = n2



VERTS = np.load("/root/repo/tools/curve/verts.npy")
VERTS = VERTS[(VERTS[:, 0] > 20) & (VERTS[:, 0] < 460)
              & (VERTS[:, 1] > 55) & (VERTS[:, 1] < 365)]
_VP = {}


def vpoint(z):
    if z in _VP:
        return _VP[z]
    pi = PARS.index((z[0] % 2, z[1] % 2))
    v = T + M @ (np.array(z, float) + E[pi])
    d = np.hypot(VERTS[:, 0] - v[0], VERTS[:, 1] - v[1])
    k = int(np.argmin(d))
    if d[k] < 7.0:
        v = VERTS[k].copy()
    else:
        ys0, xs0 = np.nonzero(CM)
        dd = np.hypot(ys0 - v[0], xs0 - v[1])
        if dd.min() > 5.0:
            # edge cell visited away from its anchor: snap to nearest stroke
            w = T + M @ (np.array(z, float) + np.array([-0.6, -0.35]))
            dd = np.hypot(ys0 - w[0], xs0 - w[1])
            j = int(np.argmin(dd))
            v = np.array([float(ys0[j]), float(xs0[j])])
    _VP[z] = v
    return v


def drawn(a, b, cover=0.80):
    va, vb = vpoint(a), vpoint(b)
    L = np.hypot(*(vb - va))
    n = max(6, int(L * 2))
    ts = np.linspace(0.15, 0.85, n)
    pts = va[None, :] + ts[:, None] * (vb - va)[None, :]
    iy = np.clip(np.round(pts[:, 0]).astype(int), 0, CM.shape[0] - 1)
    ix = np.clip(np.round(pts[:, 1]).astype(int), 0, CM.shape[1] - 1)
    return near[iy, ix].mean() >= cover


def main():
    ys, xs = np.nonzero(CM)
    P = np.stack([ys, xs], 1).astype(float)
    params = np.array([param_of(y, x) for y, x in zip(ys, xs)])
    pa = {}
    for z in ANCHORS:
        v = vpoint(z)
        d = np.hypot(P[:, 0] - v[0], P[:, 1] - v[1])
        r = 3.5
        while (d < r).sum() < 3 and r < 20:
            r += 1.5
        pa[z] = float(np.median(params[d < r]))

    aset = set(ANCHORS)
    edges = {z: [] for z in ANCHORS}
    ne = 0
    for z in ANCHORS:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) <= (0, 0):
                    continue
                w = (z[0] + dx, z[1] + dy)
                if w in aset and drawn(z, w):
                    edges[z].append(w)
                    edges[w].append(z)
                    ne += 1
    # second pass: for low-degree nodes admit weaker edges
    for z in ANCHORS:
        if len(edges[z]) >= 2:
            continue
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                w = (z[0] + dx, z[1] + dy)
                if w in aset and w not in edges[z] and drawn(z, w, cover=0.6):
                    edges[z].append(w)
                    edges[w].append(z)
                    ne += 1
    print("edges:", ne, "avg degree", 2 * ne / 256)
    from collections import Counter
    print("degree histogram:", Counter(len(v) for v in edges.values()))

    start = min(ANCHORS, key=lambda z: pa[z])
    end = max(ANCHORS, key=lambda z: pa[z])
    print("start", start, pa[start], "end", end, pa[end])

    # DFS guided by param
    sys.setrecursionlimit(100000)
    path = [start]
    onpath = {start}
    calls = [0]

    def dfs():
        calls[0] += 1
        if calls[0] > 3_000_000:
            raise RuntimeError("too many calls")
        cur = path[-1]
        if len(path) == 256:
            return cur == end
        cands = [w for w in edges[cur] if w not in onpath]
        # prune: end reachable only as last
        if end in cands and len(path) < 255:
            cands = [w for w in cands if w != end]
        cands.sort(key=lambda w: pa[w])
        for w in cands:
            path.append(w)
            onpath.add(w)
            if dfs():
                return True
            path.pop()
            onpath.remove(w)
        return False

    ok = dfs()
    print("hamiltonian found:", ok, "dfs calls:", calls[0])
    if ok:
        # param monotonicity sanity
        ps = [pa[z] for z in path]
        inc = sum(1 for t in range(255) if ps[t + 1] >= ps[t] - 2)
        print("soft-monotone steps:", inc, "/255")
        pickle.dump({"path": path, "pa": pa, "edges": edges},
                    open("/root/repo/tools/curve/order_final.pkl", "wb"))
        from collections import Counter
        steps = Counter((path[t + 1][0] - path[t][0], path[t + 1][1] - path[t][1])
                        for t in range(255))
        print("step histogram:", steps)


if __name__ == "__main__":
    main()
