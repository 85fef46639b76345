"""Slot-free stationary-automaton induction from the polished sequence.

Model: z(S) = sum_k 2^(n-1-k) g(d_k, s_k), s_{k+1} = tau(d_k, s_k).
Leaf quad pattern (m1-m0, m2-m0, m3-m0) identifies the state's relative
offsets. Parent anchors Z = (m0 - g(0,s))/2 need the absolute g(0,s):
solved by requiring parity-evenness and that parent-level patterns fall in
the same pattern set (stationarity).
"""
import itertools
import pickle
import sys
from collections import Counter, defaultdict

import numpy as np

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))


def patterns_of(seq):
    out = []
    for k in range(len(seq) // 4):
        q = seq[4 * k:4 * k + 4]
        out.append(tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:]))
    return out


def main():
    pats = patterns_of(SEQ)
    m0 = [SEQ[4 * k] for k in range(64)]
    keys = [(p, (m[0] % 2, m[1] % 2)) for p, m in zip(pats, m0)]
    cnt = Counter(keys)
    common = [p for p, n in cnt.most_common() if n >= 2]
    print(f"{len(common)} common (pattern,parity) states covering "
          f"{sum(cnt[p] for p in common)}/64 quads")
    state_of = {p: i for i, p in enumerate(common)}
    quad_state = [state_of.get(p, -1) for p in keys]

    # g0[s] candidates: parity fixed by data (m0 - g0 even), range [-2,2]
    par = {}
    for k, s in enumerate(quad_state):
        if s < 0:
            continue
        p = common[s][1]
        if s in par:
            assert par[s] == p, (s, par[s], p, k)
        par[s] = p
    print("state parity ok:", par)
    nst = len(common)
    cands = {}
    for s in range(nst):
        px, py = par[s]
        cands[s] = [(a, b) for a in range(-2, 3) for b in range(-2, 3)
                    if (a % 2, b % 2) == (px, py)]
        # g(0,s) is the offset of the FIRST child; plausibly small
    print("candidates per state:", {s: len(c) for s, c in cands.items()})

    # level-3 nodes: k' in 0..15; clean iff all 4 quads have known state
    nodes = []
    for kp in range(16):
        sts = quad_state[4 * kp:4 * kp + 4]
        if all(s >= 0 for s in sts):
            nodes.append((kp, sts, [m0[4 * kp + j] for j in range(4)]))
    print("clean level-3 nodes:", len(nodes), "/16")

    patset = set(common)

    def z3(mm, g0):
        return ((mm[0] - g0[0]) // 2, (mm[1] - g0[1]) // 2)

    # DFS over g0 assignments, constraint per clean node:
    # P3 = offsets of z3's relative to first must be in patset.
    # Process states in order of usage.
    sols = []

    def check_partial(g0s):
        for kp, sts, mms in nodes:
            if any(s not in g0s for s in sts):
                continue
            Z = [z3(mm, g0s[s]) for mm, s in zip(mms, sts)]
            p = tuple((z[0] - Z[0][0], z[1] - Z[0][1]) for z in Z[1:])
            if p not in patset:
                return False
        return True

    order = sorted(range(nst), key=lambda s: -sum(1 for _, sts, _ in nodes
                                                  for x in sts if x == s))

    def dfs(i, g0s):
        if i == len(order):
            sols.append(dict(g0s))
            return
        s = order[i]
        for c in cands[s]:
            g0s[s] = c
            if check_partial(g0s):
                dfs(i + 1, g0s)
            del g0s[s]

    dfs(0, {})
    print("solutions:", len(sols))
    for sol in sols[:10]:
        print("  g0:", {common[s]: v for s, v in sol.items()})
    pickle.dump({"common": common, "quad_state": quad_state, "sols": sols,
                 "nodes": nodes, "m0": m0},
                open("/root/repo/tools/curve/induce2.pkl", "wb"))


if __name__ == "__main__":
    main()
