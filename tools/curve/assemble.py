"""Assemble the chain graph into the single ordered curve pixel path.

Start at the global minimum-parameter end; at each junction choose the
unused chain by parameter continuity, with direction continuity as a
tiebreak. Leaf chains are out-and-back reversal detours.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from trace2 import param_of  # noqa: E402

G = pickle.load(open("/root/repo/tools/curve/graph.pkl", "rb"))
CHAINS = G["chains"]
CLUSTERS = G["clusters"]


def chain_params(path):
    ps = [param_of(*p) for p in path]
    return np.median(ps[: max(3, len(ps) // 4)]), np.median(ps[-max(3, len(ps) // 4):])


def direction(path, at_start, k=6):
    seg = path[:k] if at_start else path[::-1][:k]
    a, b = np.array(seg[0], float), np.array(seg[-1], float)
    v = b - a
    n = np.linalg.norm(v)
    return v / n if n else v


def main():
    # node -> incident chain list
    incid = {}
    for i, (a, b, path) in enumerate(CHAINS):
        for n, at_start in ((a, True), (b, False)):
            incid.setdefault(n, []).append((i, at_start))

    # global start: free-end chain whose end param is the global minimum
    best = None
    for i, (a, b, path) in enumerate(CHAINS):
        for n, at_start in ((a, True), (b, False)):
            if n[0] == "E":
                p = param_of(*path[0 if at_start else -1])
                if best is None or p < best[0]:
                    best = (p, i, at_start)
    print("start chain", best)

    used = set()
    order = []  # list of (chain_idx, forward?) in traversal order
    p0, ci, at_start = best
    cur_chain, forward = ci, at_start  # traverse from the free end inward
    used.add(ci)
    order.append((ci, forward))

    while True:
        a, b, path = CHAINS[cur_chain]
        exit_node = b if forward else a
        exit_px = path[-1] if forward else path[0]
        if exit_node[0] == "E":
            break  # reached the global end
        cands = [(j, s) for (j, s) in incid[exit_node] if j not in used]
        if not cands:
            break
        cur_param = param_of(*exit_px)
        out_dir = direction(CHAINS[cur_chain][2], not forward)  # direction of travel
        scored = []
        for j, at_s in cands:
            jp = CHAINS[j][2]
            near = jp[0] if at_s else jp[-1]
            pnear = param_of(*near)
            d_in = direction(jp, at_s)
            straight = float(np.dot(out_dir, d_in))
            is_leaf = (CHAINS[j][0][0] == "E") or (CHAINS[j][1][0] == "E")
            scored.append((abs(pnear - cur_param), -straight, j, at_s, is_leaf))
        scored.sort()
        _, _, j, at_s, is_leaf = scored[0]
        leafj = None
        if is_leaf and len(cands) > 1:
            # detour: traverse leaf out and back, then take next best non-leaf
            used.add(j)
            order.append((j, at_s))
            order.append((j, not at_s))
            rest = [s for s in scored if s[2] != j and not s[4]]
            if not rest:
                rest = [s for s in scored if s[2] != j]
            _, _, j2, at_s2, _ = rest[0]
            used.add(j2)
            order.append((j2, at_s2))
            cur_chain, forward = j2, at_s2
        else:
            used.add(j)
            order.append((j, at_s))
            cur_chain, forward = j, at_s

    print(f"traversed {len(used)} of {len(CHAINS)} chains, order len {len(order)}")
    missing = [i for i in range(len(CHAINS)) if i not in used]
    print("missing chains:", [(i, len(CHAINS[i][2]),
                               CHAINS[i][0], CHAINS[i][1]) for i in missing][:20])
    # flatten to pixel path
    pixels = []
    for i, fwd in order:
        p = CHAINS[i][2] if fwd else CHAINS[i][2][::-1]
        pixels.extend(p)
    params = [param_of(*p) for p in pixels]
    # monotonicity check (smoothed)
    pa = np.array(params)
    k = 25
    sm = np.convolve(pa, np.ones(k) / k, mode="valid")
    drops = np.sum(np.diff(sm) < -1.0)
    print(f"pixel path {len(pixels)}, param start {pa[:5].mean():.0f} "
          f"end {pa[-5:].mean():.0f}, smoothed drops {drops}")
    with open("/root/repo/tools/curve/path.pkl", "wb") as f:
        pickle.dump({"order": order, "pixels": pixels}, f)


if __name__ == "__main__":
    main()
