"""Order the a5-visuals curve skeleton into a single pixel path.

Graph model: skeleton pixels -> junction clusters + chains. Leaf chains are
reversal detours (the curve doubles back over its own stroke); 4-way
junctions are touch points resolved by direction continuity.
Color encodes the curve parameter: cool branch (b>=r) g rises 130->255,
warm branch (r>b) g falls 255->20.
"""
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")

BL = np.load("/root/repo/tools/curve/visuals.npy")[471:942, 0:472, :3].astype(np.int32)
SK = np.load("/root/repo/tools/curve/skel2.npy")
COMP = np.load("/root/repo/tools/curve/comp2.npy")
H, W = SK.shape


def param_of(y, x):
    r, g, b = BL[y, x]
    if b >= r:
        return float(g)
    return float(510 - g)


def build():
    sk = SK & (COMP == 1)
    pix = set(zip(*np.nonzero(sk)))

    def nbrs(p):
        y, x = p
        out = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == dx == 0:
                    continue
                q = (y + dy, x + dx)
                if q in pix:
                    out.append(q)
        return out

    deg = {p: len(nbrs(p)) for p in pix}
    junc = {p for p in pix if deg[p] >= 3}
    # cluster junction pixels
    jid = {}
    clusters = []
    for p in junc:
        if p in jid:
            continue
        stack, cl = [p], []
        jid[p] = len(clusters)
        while stack:
            c = stack.pop()
            cl.append(c)
            for q in nbrs(c):
                if q in junc and q not in jid:
                    jid[q] = len(clusters)
                    stack.append(q)
        clusters.append(cl)

    ends = [p for p in pix if deg[p] == 1]

    # walk chains: from every end or junction-adjacent pixel
    visited = set()
    chains = []  # (nodeA, nodeB, [pixels...]) node = ('J', id) or ('E', pixel)

    def node_of(p):
        return ("J", jid[p]) if p in junc else ("E", p)

    def walk(start, first):
        path = [start, first]
        visited.add(first)
        prev, cur = start, first
        while True:
            if cur in junc:
                return path
            nxt = [q for q in nbrs(cur) if q != prev and (q not in visited or q in junc)]
            # prefer non-visited non-junction
            cand = [q for q in nxt if q not in junc]
            if not cand:
                cand = [q for q in nxt if q in junc]
            if not cand:
                return path
            prev, cur = cur, cand[0]
            if cur not in junc:
                visited.add(cur)
            path.append(cur)

    for e in ends:
        if e in visited:
            continue
        visited.add(e)
        nb = [q for q in nbrs(e) if q not in junc]
        if not nb:
            nb = nbrs(e)
        if not nb:
            continue
        path = walk(e, nb[0])
        chains.append((node_of(path[0]), node_of(path[-1]), path))

    for cl in clusters:
        for p in cl:
            for q in nbrs(p):
                if q not in junc and q not in visited:
                    visited.add(q)
                    path = walk(p, q)
                    chains.append((node_of(path[0]), node_of(path[-1]), path))

    # leftover cycles (no ends, no junctions) — shouldn't happen
    leftover = [p for p in pix if p not in visited and p not in junc]
    return chains, clusters, ends, leftover


def main():
    chains, clusters, ends, leftover = build()
    print(f"chains {len(chains)}, junction clusters {len(clusters)}, "
          f"ends {len(ends)}, leftover px {len(leftover)}")
    lens = sorted(len(c[2]) for c in chains)
    print("chain length dist:", lens[:10], "...", lens[-5:])
    # junction degree = number of chains touching it
    jdeg = defaultdict(list)
    for i, (a, b, path) in enumerate(chains):
        for n in (a, b):
            if n[0] == "J":
                jdeg[n[1]].append(i)
    from collections import Counter
    print("junction chain-degree histogram:", Counter(len(v) for v in jdeg.values()))
    # params of chain ends (curve global endpoints)
    echains = [(i, a, b, path) for i, (a, b, path) in enumerate(chains)
               if a[0] == "E" or b[0] == "E"]
    print("chains with a free end:", len(echains))
    import pickle
    with open("/root/repo/tools/curve/graph.pkl", "wb") as f:
        pickle.dump({"chains": chains, "clusters": clusters}, f)


if __name__ == "__main__":
    main()
