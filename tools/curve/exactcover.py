"""Complete the 13 untrusted quads by exact cover + gauge constraints.

Trusted quads (51) fix 204 cells and their parent anchors Z3. The other 13
quads must: tile the remaining 52 cells with known state patterns, have
integer in-triangle distinct Z3, and complete their level-3 nodes to
patterns in the observed level-3 alphabet (soft: allow new-class nodes,
minimized).
"""
import pickle
import sys
from collections import Counter

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))
G0 = {0: (-1, -2), 1: (-3, -1), 2: (-2, -1), 3: (-2, -1), 4: (-2, -2),
      5: (-3, -2), 6: (-3, -1), 7: (-1, 0), 8: (-3, -1), 9: (-2, -2),
      10: (-3, -3)}
ALPHA = {((2, 0), (1, -1), (3, 0)): (1, 0),
         ((-1, -1), (1, -1), (0, -1)): (1, 0),
         ((-1, 0), (-3, 0), (-2, 1)): (0, 1),
         ((-1, 0), (-1, 1), (-3, 1)): (0, 1)}
TRI = set((zx, zy) for zy in range(16) for zx in range(zy + 1, 32 - zy))
TRI3 = set((zx, zy) for zy in range(8) for zx in range(zy + 1, 16 - zy))


def main():
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
    trusted = [k for k in range(64) if qs[k] >= 0 and k != 56]
    unknown = [k for k in range(64) if k not in trusted]
    print("unknown quads:", unknown)

    used_cells = set()
    Z3 = {}
    for k in trusted:
        s = qs[k]
        for c in SEQ[4 * k:4 * k + 4]:
            used_cells.add(c)
        Z3[k] = ((m0s[k][0] - G0[s][0]) // 2, (m0s[k][1] - G0[s][1]) // 2)
    pool = TRI - used_cells
    zpool = TRI3 - set(Z3.values())
    print("cell pool:", len(pool), "Z3 pool:", len(zpool))
    assert len(pool) == 4 * len(unknown)

    # candidates per unknown quad: (state, m0, cells, z3)
    cands = {}
    for k in unknown:
        lst = []
        for s, (pat, par) in enumerate(common):
            for m0 in pool:
                if (m0[0] % 2, m0[1] % 2) != par:
                    continue
                cells = [m0] + [(m0[0] + a, m0[1] + b) for a, b in pat]
                if any(c not in pool for c in cells) or len(set(cells)) != 4:
                    continue
                z = ((m0[0] - G0[s][0]) // 2, (m0[1] - G0[s][1]) // 2)
                if z not in zpool:
                    continue
                lst.append((s, m0, frozenset(cells), z))
        cands[k] = lst
    print("candidates per slot:", {k: len(v) for k, v in cands.items()})

    # DFS exact cover, ordered by fewest candidates; node-alphabet soft check
    order = sorted(unknown, key=lambda k: len(cands[k]))
    sols = []

    def node_ok(assign):
        newc = 0
        for kp in range(16):
            ks = [4 * kp + j for j in range(4)]
            zz = []
            for k in ks:
                if k in Z3:
                    zz.append(Z3[k])
                elif k in assign:
                    zz.append(assign[k][3])
                else:
                    zz = None
                    break
            if zz is None:
                continue
            pat = tuple((a[0] - zz[0][0], a[1] - zz[0][1]) for a in zz[1:])
            if pat not in ALPHA:
                newc += 1
        return newc

    def dfs(i, usedc, usedz, assign, budget):
        if len(sols) >= 50:
            return
        if i == len(order):
            sols.append((dict(assign), budget))
            print("SOLUTION, new-class nodes used:", 4 - budget)
            return
        k = order[i]
        for cand in cands[k]:
            s, m0, cells, z = cand
            if cells & usedc or z in usedz:
                continue
            assign[k] = cand
            nb = node_ok(assign)
            if nb <= budget:
                dfs(i + 1, usedc | cells, usedz | {z}, assign, budget)
            del assign[k]

    for budget in (0, 1, 2, 4):
        sols.clear()
        dfs(0, set(), set(), {}, budget)
        print("budget", budget, "solutions:", len(sols))
        if sols:
            pickle.dump({"sols": sols, "trusted": trusted, "qs": qs,
                         "common": common, "Z3": Z3},
                        open("/root/repo/tools/curve/cover_sols.pkl", "wb"))
            break


if __name__ == "__main__":
    main()
