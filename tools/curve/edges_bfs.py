"""Anchor adjacency via BFS along the stroke mask.

Edge (a,b) exists iff the curve mask connects visit(a) to visit(b) without
entering any other anchor's visit zone (radius 3px) and within a length cap.
Handles the polyline's mid-segment elbows that defeat straight-line tests.
"""
import pickle
import sys
from collections import deque

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
import solve_order as so  # noqa: E402  (vpoint with snapping, CM, ANCHORS)


def main():
    CM = so.CM
    H, W = CM.shape
    vps = {z: so.vpoint(z) for z in so.ANCHORS}
    # zone map: nearest anchor within 3.2 px
    zone = np.full((H, W), -1, np.int32)
    zlist = list(so.ANCHORS)
    for idx, z in enumerate(zlist):
        vy, vx = vps[z]
        y0, y1 = int(vy - 4), int(vy + 5)
        x0, x1 = int(vx - 4), int(vx + 5)
        for y in range(max(0, y0), min(H, y1)):
            for x in range(max(0, x0), min(W, x1)):
                if (y - vy) ** 2 + (x - vx) ** 2 <= 3.2 ** 2:
                    zone[y, x] = idx

    edges = {z: set() for z in so.ANCHORS}
    for idx, z in enumerate(zlist):
        vy, vx = vps[z]
        # seeds: mask pixels in z's zone
        seeds = [(y, x) for y in range(max(0, int(vy) - 4), min(H, int(vy) + 5))
                 for x in range(max(0, int(vx) - 4), min(W, int(vx) + 5))
                 if CM[y, x] and zone[y, x] == idx]
        if not seeds:
            # take nearest mask pixels
            ys, xs = np.nonzero(CM)
            d = np.hypot(ys - vy, xs - vx)
            k = np.argsort(d)[:4]
            seeds = [(int(ys[i]), int(xs[i])) for i in k]
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        CAP = 60
        while q:
            cy, cx = q.popleft()
            dcur = dist[(cy, cx)]
            if dcur >= CAP:
                continue
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == dx == 0:
                        continue
                    yy, xx = cy + dy, cx + dx
                    if not (0 <= yy < H and 0 <= xx < W) or not CM[yy, xx]:
                        continue
                    if (yy, xx) in dist:
                        continue
                    zid = zone[yy, xx]
                    if zid >= 0 and zid != idx:
                        edges[z].add(zlist[zid])
                        edges[zlist[zid]].add(z)
                        continue  # stop expansion into another zone
                    dist[(yy, xx)] = dcur + 1
                    q.append((yy, xx))

    from collections import Counter
    deg = Counter(len(v) for v in edges.values())
    print("degree histogram:", deg)
    # lattice step stats of edges
    steps = Counter()
    for z, ws in edges.items():
        for w in ws:
            if z < w:
                steps[(w[0] - z[0], w[1] - z[1])] += 1
    print("edge step histogram:", steps.most_common(15))
    pickle.dump({z: sorted(v) for z, v in edges.items()},
                open("/root/repo/tools/curve/edges.pkl", "wb"))


if __name__ == "__main__":
    main()
