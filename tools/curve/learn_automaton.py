"""Learn a stationary quaternary walk automaton from the extracted sequence.

Model: z(d0 d1 d2 d3) = 8*c + sum_k 2^(3-k) * g[d_k][s_k],
       s_0 = 0 (root), s_{k+1} = tau[d_k][s_k].
Branch-and-bound: states discovered in canonical order, g entries bounded,
leaf mismatch budget. A solution must explain >= 256-BUDGET leaves exactly.
"""
import pickle
import sys
import time

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))
MAXSTATES = int(sys.argv[1]) if len(sys.argv) > 1 else 12
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 14
GRANGE = 3  # |g| component bound

best = {"cost": BUDGET + 1, "sol": None}
t0 = time.time()


def solve():
    # state of search: tau: dict (d, s) -> s', g: dict (d, s) -> (gy, gx),
    # nstates, c (root offset) — c folded by treating leaf formula with c.
    # We iterate leaves in S order; maintain for current prefix the partial
    # states. Because leaves are processed in order, the state chain for a
    # leaf shares prefixes with the previous; recompute per leaf (cheap).
    import itertools

    import os
    NL = int(os.environ.get("NLEAF", "256"))
    leaves = SEQ[:NL]  # index = S

    sys.setrecursionlimit(10000)

    def leafz(S, tau, g, c):
        s = 0
        acc = (8 * c[0], 8 * c[1])
        for k in range(4):
            d = (S >> (2 * (3 - k))) & 3
            if (d, s) not in g:
                return None, (d, s, k)
            gv = g[(d, s)]
            w = 1 << (3 - k)
            acc = (acc[0] + w * gv[0], acc[1] + w * gv[1])
            if k < 3:
                if (d, s) not in tau:
                    return None, (d, s, k)
                s = tau[(d, s)]
        return acc, None

    # c candidates: derived from leaf 0 once g[0][...] chain chosen; instead
    # simply allow c in a small box around seq[0]/8.
    c0y, c0x = SEQ[0]
    CC = [(a, b) for a in range(c0y // 8 - 1, c0y // 8 + 3)
          for b in range(c0x // 8 - 1, c0x // 8 + 3)]

    stats = {"nodes": 0}

    def dfs(S, tau, g, nst, c, cost):
        stats["nodes"] += 1
        if cost >= best["cost"]:
            return
        if stats["nodes"] % 4096 == 0 and time.time() - t0 > int(os.environ.get("TSEC", "1800")):
            raise TimeoutError
        if S == len(leaves):
            best["cost"] = cost
            best["sol"] = (dict(tau), dict(g), nst, c)
            print(f"  SOLUTION cost {cost} states {nst} "
                  f"({time.time()-t0:.0f}s, {stats['nodes']} nodes)")
            return
        z, missing = leafz(S, tau, g, c)
        if z is not None:
            newcost = cost + (0 if z == tuple(leaves[S]) else 1)
            dfs(S + 1, tau, g, nst, c, newcost)
            return
        d, s, k = missing
        if (d, s) not in g:
            # feasible g values that keep THIS leaf exactly reachable
            tgt = leaves[S]
            sacc = [8 * c[0], 8 * c[1]]
            ss = 0
            okwalk = True
            for kk in range(k):
                dd = (S >> (2 * (3 - kk))) & 3
                gv = g[(dd, ss)]
                w = 1 << (3 - kk)
                sacc[0] += w * gv[0]
                sacc[1] += w * gv[1]
                ss = tau[(dd, ss)]
            w = 1 << (3 - k)
            slack = (w - 1) * GRANGE
            opts = []
            for a in range(-GRANGE, GRANGE + 1):
                if abs(tgt[0] - sacc[0] - w * a) > slack:
                    continue
                for b in range(-GRANGE, GRANGE + 1):
                    if abs(tgt[1] - sacc[1] - w * b) > slack:
                        continue
                    opts.append((a, b))
            for gv in opts:
                g[(d, s)] = gv
                dfs(S, tau, g, nst, c, cost)
                del g[(d, s)]
            # or: this leaf is noise; defer defining g
            dfs(S + 1, tau, g, nst, c, cost + 1)
            return
        # missing tau
        for s2 in range(min(nst + 1, MAXSTATES)):
            tau[(d, s)] = s2
            dfs(S, tau, g, max(nst, s2 + 1), c, cost)
            del tau[(d, s)]

    for c in CC:
        print("root offset c =", c, flush=True)
        try:
            dfs(0, {}, {}, 1, c, 0)
        except TimeoutError:
            print("  timeout")
            break

    print("best:", best["cost"])
    if best["sol"]:
        pickle.dump(best, open("/root/repo/tools/curve/automaton.pkl", "wb"))


if __name__ == "__main__":
    solve()
