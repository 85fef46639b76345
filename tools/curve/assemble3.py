"""Greedy graph walk + post-insertion of missed reversal stubs.

Output: ordered pixel path (curve start -> end) with every chain used.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from trace2 import param_of  # noqa: E402

G = pickle.load(open("/root/repo/tools/curve/graph.pkl", "rb"))
CHAINS = G["chains"]
CLUSTERS = G["clusters"]


def direction(path, at_start, k=6):
    seg = path[:k] if at_start else path[::-1][:k]
    a, b = np.array(seg[0], float), np.array(seg[-1], float)
    v = b - a
    n = np.linalg.norm(v)
    return v / n if n else v


def is_leaf(i):
    return CHAINS[i][0][0] == "E" or CHAINS[i][1][0] == "E"


def main():
    incid = {}
    for i, (a, b, path) in enumerate(CHAINS):
        for n, at_start in ((a, True), (b, False)):
            incid.setdefault(n, []).append((i, at_start))

    # global start = free end with min param
    best = None
    for i, (a, b, path) in enumerate(CHAINS):
        for n, at_start in ((a, True), (b, False)):
            if n[0] == "E":
                p = param_of(*path[0 if at_start else -1])
                if best is None or p < best[0]:
                    best = (p, i, at_start)
    _, ci, fwd = best

    used = {ci}
    order = [(ci, fwd, False)]  # (chain, forward, is_detour_return)
    cur_chain, forward = ci, fwd
    while True:
        a, b, path = CHAINS[cur_chain]
        exit_node = b if forward else a
        exit_px = path[-1] if forward else path[0]
        if exit_node[0] == "E":
            break
        cands = [(j, s) for (j, s) in incid[exit_node] if j not in used]
        # drop degenerate self-loops
        cands = [(j, s) for (j, s) in cands
                 if not (CHAINS[j][0] == CHAINS[j][1] and len(CHAINS[j][2]) <= 4)]
        if not cands:
            break
        cur_param = param_of(*exit_px)
        scored = []
        for j, at_s in cands:
            jp = CHAINS[j][2]
            near = jp[0] if at_s else jp[-1]
            far = jp[-1] if at_s else jp[0]
            pfar = param_of(*far)
            scored.append((abs(pfar - cur_param), j, at_s))
        scored.sort()
        # take every leaf whose tip-param is closest first as detours
        while scored and is_leaf(scored[0][1]):
            _, j, at_s = scored.pop(0)
            used.add(j)
            order.append((j, at_s, False))
            order.append((j, not at_s, True))
        if not scored:
            break
        _, j, at_s = scored[0]
        used.add(j)
        order.append((j, at_s, False))
        cur_chain, forward = j, at_s

    # post-pass: insert missed leaf chains as detours at the matching junction pass
    missed = [i for i in range(len(CHAINS)) if i not in used and is_leaf(i)
              and not (CHAINS[i][0] == CHAINS[i][1])]
    print(f"walk used {len(used)}/{len(CHAINS)}; missed leaves {len(missed)}")
    for m in missed:
        a, b, path = CHAINS[m]
        jn = a if a[0] == "J" else b
        tip_fwd = (a[0] == "E")  # traverse from J to tip: forward if tip is at end
        tipp = param_of(*(path[0] if a[0] == "E" else path[-1]))
        # find order positions whose chain touches junction jn
        cand_pos = []
        for t, (i, f, det) in enumerate(order):
            ca, cb, cp = CHAINS[i]
            if jn in (ca, cb):
                exitp = param_of(*(cp[-1] if f else cp[0]))
                cand_pos.append((abs(exitp - tipp), t))
        if not cand_pos:
            print("  no insertion point for", m, jn)
            continue
        cand_pos.sort()
        t = cand_pos[0][1]
        # insert detour after position t
        out_fwd = (a[0] == "J")  # J->tip is forward if chain starts at J
        order[t + 1:t + 1] = [(m, out_fwd, False), (m, not out_fwd, True)]
        used.add(m)
    print(f"final used {len(used)}/{len(CHAINS)}")
    still = [i for i in range(len(CHAINS)) if i not in used
             and not (CHAINS[i][0] == CHAINS[i][1] and len(CHAINS[i][2]) <= 4)]
    print("still missing:", [(i, CHAINS[i][0], CHAINS[i][1], len(CHAINS[i][2]))
                             for i in still])

    pixels = []
    for i, f, det in order:
        p = CHAINS[i][2] if f else CHAINS[i][2][::-1]
        if det:
            p = p[1:]  # avoid duplicating the tip pixel
        pixels.extend(p)
    pa = np.array([param_of(*p) for p in pixels])
    k = 25
    sm = np.convolve(pa, np.ones(k) / k, mode="valid")
    drops = int(np.sum(np.diff(sm) < -1.0))
    big = float(np.max(sm[:-1] - np.minimum.accumulate(sm[::-1])[::-1][1:])) if len(sm) > 1 else 0
    # regression depth: how far param falls below its running max
    runmax = np.maximum.accumulate(sm)
    depth = float(np.max(runmax - sm))
    print(f"pixel path {len(pixels)}; drops {drops}; max param regression {depth:.1f}")
    with open("/root/repo/tools/curve/path3.pkl", "wb") as f:
        pickle.dump({"order": order, "pixels": pixels}, f)


if __name__ == "__main__":
    main()
