"""Joint completion: assign pool cells to open slots (param-windowed),
choose intra-quad orders from the pattern library, validate with the
g0-gauge CSP. Enumerates full covers; survivors go to gauge filtering.
"""
import itertools
import pickle
import sys
from collections import Counter

import numpy as np

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))
PA = pickle.load(open("/root/repo/tools/curve/pa.pkl", "rb"))
TRI = set((zx, zy) for zy in range(16) for zx in range(zy + 1, 32 - zy))


def patterns_and_states():
    pats, m0s = [], []
    for k in range(64):
        q = SEQ[4 * k:4 * k + 4]
        pats.append(tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:]))
        m0s.append(q[0])
    keys = [(p, (m[0] % 2, m[1] % 2)) for p, m in zip(pats, m0s)]
    cnt = Counter(keys)
    common = [p for p, n in cnt.most_common() if n >= 2]
    st = {p: i for i, p in enumerate(common)}
    qs = [st.get(k, -1) for k in keys]
    return pats, m0s, qs, common


def main():
    pats, m0s, qs, common = patterns_and_states()
    trusted = [k for k in range(64) if qs[k] >= 0 and k != 56]
    unknown = [k for k in range(64) if k not in trusted]
    used = set()
    for k in trusted:
        used.update(SEQ[4 * k:4 * k + 4])
    pool = sorted(TRI - used)

    # pattern library: common patterns closed under axis reflections
    lib = set(p for p, _ in common)
    closure = set()
    for p in lib:
        for fx in (1, -1):
            for fy in (1, -1):
                closure.add(tuple((fx * a, fy * b) for a, b in p))
    print("library:", len(lib), "closure:", len(closure))

    # param windows per slot from trusted neighbors
    tp = {4 * k + j: PA[SEQ[4 * k + j]] for k in trusted for j in range(4)}
    tarr = np.array(sorted(tp))
    parr = np.array([tp[t] for t in sorted(tp)])

    def expected(t):
        return float(np.interp(t, tarr, parr))

    WIN = 45.0
    plaus = {k: [c for c in pool
                 if abs(PA[c] - expected(4 * k + 1.5)) <= WIN]
             for k in unknown}
    print("plausible cells per slot:", {k: len(v) for k, v in plaus.items()})

    # candidates: (ordered 4-tuple) per slot
    cands = {}
    for k in unknown:
        out = []
        for sub in itertools.combinations(plaus[k], 4):
            for perm in itertools.permutations(sub):
                p = tuple((m[0] - perm[0][0], m[1] - perm[0][1])
                          for m in perm[1:])
                if p in closure:
                    pref = 0 if (p, (perm[0][0] % 2, perm[0][1] % 2)) in \
                        [tuple(c) for c in common] else 1
                    out.append((pref, perm))
        out.sort(key=lambda x: x[0])
        cands[k] = [perm for _, perm in out]
        print("slot", k, "candidates:", len(cands[k]))

    order = sorted(unknown, key=lambda k: len(cands[k]))
    sols = []

    def dfs(i, usedc, assign):
        if len(sols) >= 5000:
            return
        if i == len(order):
            sols.append(dict(assign))
            return
        k = order[i]
        for perm in cands[k]:
            cs = set(perm)
            if cs & usedc:
                continue
            assign[k] = perm
            dfs(i + 1, usedc | cs, assign)
            del assign[k]

    dfs(0, set(), {})
    print("full covers:", len(sols))
    pickle.dump({"sols": sols, "unknown": unknown},
                open("/root/repo/tools/curve/cover2.pkl", "wb"))


if __name__ == "__main__":
    main()
