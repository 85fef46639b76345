"""Track C v2 — the solve_free.py family with SYMBOLIC eye-gauge unknowns.

Same model family as solve_free.py (free per-(digit,state) offset tables over
a group-translation flip automaton, per-axis scale signs, lazy E / kappa,
orbit-constrained g(0,*)).  v1's cost driver was enumerating the eye-walk
gauge entries concretely (up to 25^3 combos x ~1 s part-DFS per config).
v2 keeps every G entry appearing in an EYE walk (plus the eye-class offset
e3) as a per-axis SYMBOLIC unknown: candidate sets are numpy int arrays
filtered vectorially by each leaf equation, and ball pruning uses cached
per-coefficient-vector min/max ranges — one DFS per config instead of
thousands.

Per-axis separability: every positional constraint is componentwise; the
only cross-axis coupling is WHICH target a leaf matches, and that choice is
a DFS branch applied to both axis sets.  A solution exists iff both axis
candidate sets are nonempty at full assignment; any surviving pair is then
reconstructed and forward-verified on all 146 cells.

Config dedup: h-tables are canonicalized under the group's automorphisms
(state relabelings are absorbed by the free tables); scales (2,-2) and
(-2,2) are axis-swap equivalent (free tables absorb the swap).

Usage:
  python3 tools/lattice/solve_free2.py GROUP [budget_sec] [nworkers] [selftest]
  GROUP in {Z22, Z4, D4}
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.setrecursionlimit(400000)
sys.path.insert(0, os.path.dirname(__file__))
from solve_free import GT, digits_of, group, load_parts  # noqa: E402

T0 = time.time()
GROUP = sys.argv[1] if len(sys.argv) > 1 else "Z22"
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 86400.0
NWORK = int(sys.argv[3]) if len(sys.argv) > 3 else max(1, (os.cpu_count() or 8) - 8)
SELFTEST = len(sys.argv) > 4 and sys.argv[4] == "selftest"
# argv[5]: per-config time cap (seconds); argv[6]: optional comma-separated
# cfg-index subset (e.g. a TIMEOUT retry list from a prior sweep's log)
PER_CFG = float(sys.argv[5]) if len(sys.argv) > 5 else 900.0
CFG_SUBSET = (set(int(x) for x in sys.argv[6].split(","))
              if len(sys.argv) > 6 else None)
PROGRESS = os.environ.get("FREE2_PROGRESS", "tools/lattice/free2_progress.log")

GBOX = [(a, b) for a in range(-2, 3) for b in range(-2, 3)]
GAX = list(range(-2, 3))
EBOX = [(a, b) for a in range(-1, 3) for b in range(-1, 3)]
EAX = list(range(-1, 3))
EMAX = 2

GRP = group(GROUP)


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} grp={GROUP} {msg}\n")


def automorphisms(name):
    """State-relabeling maps sigma with sigma(a*b) = sigma(a)*sigma(b)."""
    els, mul = group(name)
    n = len(els)
    auts = []
    for perm in itertools.permutations(range(n)):
        if perm[0] != 0:
            continue
        if all(perm[mul(a, b)] == mul(perm[a], perm[b])
               for a in range(n) for b in range(n)):
            auts.append(perm)
    return auts


def canonical_configs(name, scales):
    els, _ = GRP
    auts = automorphisms(name)
    seen, out = set(), []
    for hv in itertools.product(range(len(els)), repeat=4):
        key = min(tuple(a[h] for h in hv) for a in auts)
        if key in seen:
            continue
        seen.add(key)
        for s in scales:
            out.append((hv, s[0], s[1]))
    return out


def solve_config(hv, sx, sy, parts, anchors, deadline):
    """One symbolic DFS.  Returns solution dict | None | 'TIMEOUT'."""
    els, mul = GRP
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    zorb = {0}
    s = hv[0]
    while s not in zorb:
        zorb.add(s)
        s = mul(s, hv[0])

    def walk_coeffs(suffix):
        s, co = f0, {}
        for k, d in enumerate(suffix):
            if not (d == 0 and s in zorb):
                cx, cy = co.get((d, s), (0, 0))
                co[(d, s)] = (cx + WX[k], cy + WY[k])
            s = mul(s, hv[d])
        return co, s

    (el_nm, el_sfx, el_cell), (er_nm, er_sfx, er_cell) = anchors
    coL, fL = walk_coeffs(el_sfx)
    coR, fR = walk_coeffs(er_sfx)
    ckL, ckR = (fL, el_sfx[-1]), (fR, er_sfx[-1])
    if ckL == ckR and el_cell[2] != er_cell[2]:
        return None

    SYM = sorted(set(coL) | set(coR))       # symbolic G keys
    m = len(SYM)
    sym_ix = {k: i for i, k in enumerate(SYM)}
    # candidate matrix per axis: columns = SYM values + e3 component
    grids = [GAX] * m + [EAX]
    VALS = np.array(list(itertools.product(*grids)), dtype=np.int64)
    N = len(VALS)

    def coefrow(co, axis):
        r = np.zeros(m + 1, dtype=np.int64)
        for k, c in co.items():
            r[sym_ix[k]] = c[axis]
        return r

    # eye_right filter: (coL-coR) . g == dy - e3   (per axis)
    dy = (2 * (el_cell[0] - er_cell[0]), 2 * (el_cell[1] - er_cell[1]))
    sel = []
    for axis in range(2):
        dr = coefrow(coL, axis) - coefrow(coR, axis)
        dr[m] = 1  # + e3 on the LHS: lin = (coL-coR).g + e3 == dy
        lin = VALS @ dr
        sel.append(np.nonzero(lin == dy[axis])[0])
        if sel[axis].size == 0:
            return None
    selx0, sely0 = sel
    # V linear form: V = y_el - z_L  (z_L = coL . g, no e3 term)
    vrow = [None, None]
    for axis in range(2):
        r = -coefrow(coL, axis)
        vrow[axis] = (r, 2 * el_cell[axis])  # coef, const

    # lin-cache: tuple(coef row) -> values over ALL N candidates
    lincache = {}

    def lvals(row):
        key = row.tobytes()
        v = lincache.get(key)
        if v is None:
            v = VALS @ row
            lincache[key] = v
        return v

    # class / E state
    E = {el_cell[2]: ("const", (0, 0))}
    E[er_cell[2]] = ("e3", None)  # symbolic: equals e3 per axis
    if el_cell[2] == er_cell[2]:
        # same class: e3 must equal (0,0) -> filter candidate sets
        for axis, s0 in ((0, selx0), (1, sely0)):
            e3v = VALS[s0, m]
            s0 = s0[e3v == 0]
            if s0.size == 0:
                return None
            if axis == 0:
                selx0 = s0
            else:
                sely0 = s0
        E[er_cell[2]] = ("const", (0, 0))
    KAP = {ckL: el_cell[2]}
    if KAP.get(ckR, er_cell[2]) != er_cell[2]:
        return None
    KAP[ckR] = er_cell[2]

    # parts data
    pdata = []
    for pname, slist, cells in parts:
        sfx = sorted(tuple(digits_of(s)[3:]) for s in slist)
        nleaf = len(sfx)
        span_rest = [[0] * 7 for _ in range(nleaf)]
        for li in range(nleaf):
            for k in range(7):
                mm = li
                while mm + 1 < nleaf and sfx[mm + 1][:k] == sfx[li][:k]:
                    mm += 1
                span_rest[li][k] = mm - li + 1
        pts = {(2 * i, 2 * j, c): (i, j, c) for (i, j, c) in cells}
        fx = [2 * i for (i, j, c) in cells]
        fy = [2 * j for (i, j, c) in cells]
        pdata.append((pname, sfx, span_rest, pts,
                      [tuple(c) for c in cells], fx, fy))

    G = {(0, s): (0, 0) for s in zorb}
    nodes = [0]

    def part_rec(pi, selx, sely):
        if pi == len(pdata):
            return (selx, sely)
        pname, sfx, span_rest, pts, cells, fxs, fys = pdata[pi]
        used = set()
        nleaf = len(sfx)

        def nxt(li, selx, sely):
            if li == nleaf:
                return part_rec(pi + 1, selx, sely)
            # walk leaf li: partial position = const + row . unknowns
            rowx = vrow[0][0].copy()
            rowy = vrow[1][0].copy()
            return go(li, 0, f0, vrow[0][1], vrow[1][1], rowx, rowy,
                      selx, sely)

        def go(li, k, s, cx, cy, rowx, rowy, selx, sely):
            nodes[0] += 1
            if not nodes[0] % 4096 and time.time() > deadline:
                raise TimeoutError
            if k == 6:
                d_last = sfx[li][5]
                ck = (s, d_last)
                classes = (KAP[ck],) if ck in KAP else (0, 1, 2, 3)
                lx = lvals(rowx)
                ly = lvals(rowy)
                for c in classes:
                    bound = E.get(c)
                    eopts = [bound] if bound is not None else \
                        [("const", e) for e in EBOX]
                    for eb in eopts:
                        for (tx, ty, tc), tgt in pts.items():
                            if tc != c or tgt in used:
                                continue
                            if eb[0] == "const":
                                ex, ey = eb[1]
                                sx2 = selx[lx[selx] + cx == tx + ex]
                                if sx2.size == 0:
                                    continue
                                sy2 = sely[ly[sely] + cy == ty + ey]
                                if sy2.size == 0:
                                    continue
                            else:  # symbolic e3 class offset
                                sx2 = selx[lx[selx] + cx
                                           == tx + VALS[selx, m]]
                                if sx2.size == 0:
                                    continue
                                sy2 = sely[ly[sely] + cy
                                           == ty + VALS[sely, m]]
                                if sy2.size == 0:
                                    continue
                            kf = ck not in KAP
                            ef = E.get(c) is None
                            if kf:
                                KAP[ck] = c
                            if ef:
                                E[c] = eb
                            used.add(tgt)
                            r = nxt(li + 1, sx2, sy2)
                            if r is not None:
                                return r
                            used.discard(tgt)
                            if ef:
                                del E[c]
                            if kf:
                                del KAP[ck]
                return None
            # ball prune using cached ranges over the CURRENT selections
            need = span_rest[li][k]
            bnd = 2 * ((1 << (6 - k)) - 1) + 2 * EMAX
            lx = lvals(rowx)
            ly = lvals(rowy)
            vx = lx[selx]
            vy = ly[sely]
            lox, hix = int(vx.min()) + cx - bnd, int(vx.max()) + cx + bnd
            loy, hiy = int(vy.min()) + cy - bnd, int(vy.max()) + cy + bnd
            avail = 0
            for t, tx, ty in zip(cells, fxs, fys):
                if t not in used and lox <= tx <= hix and loy <= ty <= hiy:
                    avail += 1
                    if avail >= need:
                        break
            if avail < need:
                return None
            d = sfx[li][k]
            s2 = mul(s, hv[d])
            key = (d, s)
            if key in sym_ix:
                r2x = rowx.copy()
                r2x[sym_ix[key]] += WX[k]
                r2y = rowy.copy()
                r2y[sym_ix[key]] += WY[k]
                return go(li, k + 1, s2, cx, cy, r2x, r2y, selx, sely)
            if d == 0 and s in zorb:
                return go(li, k + 1, s2, cx, cy, rowx, rowy, selx, sely)
            g = G.get(key)
            if g is not None:
                return go(li, k + 1, s2, cx + WX[k] * g[0],
                          cy + WY[k] * g[1], rowx, rowy, selx, sely)
            for g in GBOX:
                G[key] = g
                r = go(li, k + 1, s2, cx + WX[k] * g[0], cy + WY[k] * g[1],
                       rowx, rowy, selx, sely)
                if r is not None:
                    return r
            del G[key]
            return None

        return nxt(0, selx, sely)

    try:
        hit = part_rec(0, selx0, sely0)
    except TimeoutError:
        return "TIMEOUT"
    if hit is None:
        return None
    selx, sely = hit
    ix, iy = int(selx[0]), int(sely[0])
    Gfull = dict(G)
    for k, i in sym_ix.items():
        Gfull[k] = (int(VALS[ix, i]), int(VALS[iy, i]))
    e3 = (int(VALS[ix, m]), int(VALS[iy, m]))
    Eout = {}
    for c, eb in E.items():
        Eout[c] = list(e3) if eb[0] == "e3" else list(eb[1])
    return {"G": {f"{d},{st}": list(v) for (d, st), v in Gfull.items()},
            "E": {str(c): v for c, v in Eout.items()},
            "KAP": {f"{st},{d}": c for (st, d), c in KAP.items()},
            "h": list(hv), "sx": sx, "sy": sy, "group": GROUP,
            "e3": list(e3), "nodes": nodes[0]}


def verify_solution(sol, parts, anchors):
    """Forward-run the recovered tables over every S and set-match cells."""
    els, mul = GRP
    hv = tuple(sol["h"])
    sx, sy = sol["sx"], sol["sy"]
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])
    G = {tuple(map(int, k.split(","))): tuple(v) for k, v in sol["G"].items()}
    E = {int(c): tuple(v) for c, v in sol["E"].items()}
    KAP = {tuple(map(int, k.split(","))): c for k, c in sol["KAP"].items()}

    def fwd(sfx):
        s, zx, zy = f0, 0, 0
        for k, d in enumerate(sfx):
            g = G.get((d, s))
            if g is None:
                return None
            zx += WX[k] * g[0]
            zy += WY[k] * g[1]
            s = mul(s, hv[d])
        return zx, zy, (s, sfx[-1])

    # V from eye_left
    (el_nm, el_sfx, el_cell), (er_nm, er_sfx, er_cell) = anchors
    r = fwd(el_sfx)
    if r is None:
        return False
    zx, zy, ck = r
    exy = E.get(KAP.get(ck, -1), (0, 0))
    V = (2 * el_cell[0] + exy[0] - zx, 2 * el_cell[1] + exy[1] - zy)
    ok = True
    for nm, slist, cells in parts:
        got = set()
        for s in slist:
            r = fwd(tuple(digits_of(s)[3:]))
            if r is None:
                return False
            zx, zy, ck = r
            c = KAP.get(ck)
            if c is None:
                return False
            e = E.get(c)
            if e is None:
                return False
            got.add(((zx + V[0] - e[0]) // 2, (zy + V[1] - e[1]) // 2, c))
        if got != set(map(tuple, cells)):
            ok = False
    return ok


def worker(args):
    cfg_i, hv, sx, sy, per_cfg = args
    anchors, parts = load_parts()
    t0 = time.time()
    sol = solve_config(hv, sx, sy, parts, anchors, time.time() + per_cfg)
    dt = time.time() - t0
    return cfg_i, hv, sx, sy, sol, dt


def planted_selftest():
    import solve_free as v1
    # reuse v1's plant generation by monkeypatching its solve path
    import random

    els, mul = GRP
    for seed in range(40):
        rnd = random.Random(seed)
        hv = (0,) + tuple(rnd.randrange(len(els)) for _ in range(3))
        sx, sy = -2, -2
        rest = [(0, 1), (1, 1), (1, 0)]
        rnd.shuffle(rest)
        corner = {0: (0, 0), 1: rest[0], 2: rest[1], 3: rest[2]}

        def refl(p, s):
            fx, fyv = s & 1, (s >> 1) & 1
            return (1 - p[0] if fx else p[0], 1 - p[1] if fyv else p[1])

        Gp = {(d, s): refl(corner[d], s) for d in range(4) for s in els}
        Gp[(0, 0)] = (0, 0)
        Ep = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}
        par2c = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}
        WX = [sx ** (5 - k) for k in range(6)]
        WY = [sy ** (5 - k) for k in range(6)]
        f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])

        def fwd(sfx):
            s, zx, zy = f0, 0, 0
            for k, d in enumerate(sfx):
                g = Gp[(d, s)]
                zx += WX[k] * g[0]
                zy += WY[k] * g[1]
                s = mul(s, hv[d])
            return zx, zy, par2c[(zx & 1, zy & 1)]

        def to_cell(zx, zy, c):
            e = Ep[c]
            return ((zx - e[0]) // 2, (zy - e[1]) // 2, c)

        anchors, parts = load_parts()
        new_anchors, new_parts, bad = [], [], False
        for nm, sfx, _ in anchors:
            new_anchors.append((nm, sfx, to_cell(*fwd(sfx))))
        if new_anchors[0][2][2] == new_anchors[1][2][2]:
            continue
        for nm, slist, _ in parts:
            cells, seen = [], set()
            for s in slist:
                cell = to_cell(*fwd(tuple(digits_of(s)[3:])))
                if cell in seen:
                    bad = True
                    break
                seen.add(cell)
                cells.append(cell)
            if bad:
                break
            new_parts.append((nm, slist, cells))
        if bad:
            continue
        t0 = time.time()
        sol = solve_config(hv, sx, sy, new_parts, new_anchors,
                           time.time() + 900)
        found = isinstance(sol, dict)
        okv = found and verify_solution(sol, new_parts, new_anchors)
        print(f"selftest seed={seed} hv={hv}: "
              f"{'FOUND' if found else sol} verify={okv} "
              f"({time.time()-t0:.1f}s, nodes={sol.get('nodes') if found else '-'})")
        return found and okv
    print("selftest: no usable plant")
    return False


def main():
    if SELFTEST:
        sys.exit(0 if planted_selftest() else 1)
    scales = [(-2, -2), (2, 2), (2, -2)]
    cfgs = canonical_configs(GROUP, scales)
    # most-plausible first: the recovered level-8 quad rule is the x2-scaled
    # 180-degree-rotated lattice => scale (-2,-2)
    cfgs.sort(key=lambda c: scales.index((c[1], c[2])))
    log_progress(f"sweep start: {len(cfgs)} canonical configs, "
                 f"{NWORK} workers")
    anchors, parts = load_parts()
    # a solution-bearing config resolves fast (planted self-test: <1 s);
    # exhaustive refutation is the slow path — cap per-config time so the
    # sweep covers every config, and record TIMEOUTs honestly for a
    # later deeper pass
    per_cfg = PER_CFG
    jobs = [(i, hv, sx, sy, per_cfg) for i, (hv, sx, sy) in enumerate(cfgs)
            if CFG_SUBSET is None or i in CFG_SUBSET]
    log_progress(f"jobs={len(jobs)} per_cfg={per_cfg}")
    t0 = time.time()
    with mp.Pool(NWORK) as pool:
        for cfg_i, hv, sx, sy, sol, dt in pool.imap_unordered(worker, jobs):
            if isinstance(sol, dict):
                okv = verify_solution(sol, parts, anchors)
                log_progress(f"SOLUTION cfg={cfg_i} verify={okv} "
                             + json.dumps(sol))
                if okv:
                    json.dump(sol, open(
                        "tools/lattice/free2_solution.json", "w"), indent=1)
                    print("SOLUTION", json.dumps(sol))
                    pool.terminate()
                    return
            else:
                log_progress(f"cfg={cfg_i} h={hv} s=({sx},{sy}) "
                             f"{'TIMEOUT' if sol == 'TIMEOUT' else 'refuted'}"
                             f" ({dt:.1f}s)")
            if time.time() - T0 > BUDGET:
                log_progress("budget hit")
                pool.terminate()
                return
    log_progress(f"SWEEP DONE no solution ({len(cfgs)} configs, "
                 f"{time.time()-t0:.0f}s)")
    print("no solution", len(cfgs))


if __name__ == "__main__":
    main()
