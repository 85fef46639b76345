"""Solve per-state g0 offsets so parent anchors tile a depth-3 triangle.

Z3(k) = (m0(k) - g0(s_k)) / 2 must be 64 distinct lattice points forming a
translated depth-3 triangle (base 16). Untrusted quads are excluded from
the hard constraints.
"""
import pickle
from collections import Counter

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))


def analyze(seq):
    pats, m0 = [], []
    for k in range(64):
        q = seq[4 * k:4 * k + 4]
        pats.append(tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:]))
        m0.append(q[0])
    keys = [(p, (m[0] % 2, m[1] % 2)) for p, m in zip(pats, m0)]
    cnt = Counter(keys)
    common = [p for p, n in cnt.most_common() if n >= 2]
    st = {p: i for i, p in enumerate(common)}
    qs = [st.get(k, -1) for k in keys]
    return pats, m0, qs, common


def tri_set(shift):
    sy, sx = shift
    return set((zx + sy, zy + sx) for zy in range(8)
               for zx in range(zy + 1, 16 - zy))


def main():
    pats, m0, qs, common = analyze(SEQ)
    nst = len(common)
    par = {s: common[s][1] for s in range(nst)}
    cands = {s: [(a, b) for a in range(-3, 4) for b in range(-3, 4)
                 if (a % 2, b % 2) == par[s]] for s in range(nst)}
    trusted = [k for k in range(64) if qs[k] >= 0]
    by_state = {}
    for k in trusted:
        by_state.setdefault(qs[k], []).append(k)
    order = sorted(by_state, key=lambda s: -len(by_state[s]))
    tris = [tri_set((sy, sx)) for sy in range(-3, 4) for sx in range(-3, 4)]

    sols = []

    def dfs(i, g0s, placed):
        if len(sols) > 200:
            return
        if i == len(order):
            # final: exists a triangle containing all placed points
            pts = set(placed.values())
            for tr in tris:
                if pts <= tr:
                    sols.append((dict(g0s), len(pts)))
                    return
            return
        s = order[i]
        for c in cands[s]:
            pts = {}
            used = set(placed.values())
            ok = True
            for k in by_state[s]:
                z = ((m0[k][0] - c[0]) // 2, (m0[k][1] - c[1]) // 2)
                if z in used:
                    ok = False
                    break
                used.add(z)
                pts[k] = z
            if not ok:
                continue
            allpts = used
            if not any(allpts <= tr for tr in tris):
                continue
            g0s[s] = c
            placed.update(pts)
            dfs(i + 1, g0s, placed)
            del g0s[s]
            for k in pts:
                del placed[k]

    dfs(0, {}, {})
    print("solutions:", len(sols))
    uniq = {}
    for g0s, n in sols:
        uniq[tuple(sorted(g0s.items()))] = n
    for k, v in list(uniq.items())[:20]:
        print(v, dict(k))
    if len(uniq) >= 1:
        pickle.dump({"sols": [dict(k) for k in uniq], "common": common,
                     "qs": qs, "m0": m0},
                    open("/root/repo/tools/curve/g0sol.pkl", "wb"))


if __name__ == "__main__":
    main()
