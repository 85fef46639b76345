"""Track D — FRAMED unit-corner tables: g(d,s) = Binv @ t(d,s), t in
{-1,0,1}^2.

Motivation: Track C (solve_free2) sweeps free tables in the {-2..2}^2 box,
which absorbs integer frames only while the framed entries stay inside that
box — a frame row with |b11|+|b12| >= 3 maps unit corners OUTSIDE it.  The
upstream curve's offsets are plausibly unit lattice steps in ITS (sheared
KJ) basis, so the principled closure is: unit-corner tables composed with an
explicit integer frame.

Per-axis separability is preserved by working in the ADJUGATE-primed space:
with y = A z + V and B = adj(A) (so B A = det(A) I),

    y' := B y = det(A) z + B V =: z' + V',   z' = sum_k w_k * (det * t_k)

i.e. in primed coordinates the accumulated offset per axis depends ONLY on
that axis' t components (3-value grids), targets become y'_cell = B(2i + E),
and the whole Track C symbolic machinery applies with weights w_k * det.
The eye-class offset e3 couples axes through B, so it is enumerated
concretely per config (16 options) instead of riding in the candidate
vector.  Frames are enumerated directly as B (integer, entries [-2,2],
|det| in {1,2}), deduped up to left-multiplication by signed permutations
(which relabel the primed axes — absorbed by t-table relabeling).

Usage:
  python3 tools/lattice/solve_free3.py GROUP [budget_sec] [nworkers] [selftest]
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
from solve_free2 import automorphisms  # noqa: E402

T0 = time.time()
GROUP = sys.argv[1] if len(sys.argv) > 1 else "Z22"
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 86400.0
NWORK = int(sys.argv[3]) if len(sys.argv) > 3 else max(1, (os.cpu_count() or 8) - 8)
SELFTEST = len(sys.argv) > 4 and sys.argv[4] == "selftest"
PROGRESS = "tools/lattice/free3_progress.log"

TAX = (-1, 0, 1)
TBOX = [(a, b) for a in TAX for b in TAX]
EBOX = [(a, b) for a in range(-1, 3) for b in range(-1, 3)]

GRP = group(GROUP)


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} grp={GROUP} {msg}\n")


def frames():
    """Integer B, entries [-2,2], |det| in {1,2}, deduped up to LEFT-mult by
    the 8 signed permutation matrices.  Excludes frames already inside the
    Track C box (max row abs-sum <= 2): those table images were swept there."""
    sp = []
    for perm in ([[1, 0], [0, 1]], [[0, 1], [1, 0]]):
        for sx in (1, -1):
            for sy in (1, -1):
                sp.append(np.array(perm) * np.array([[sx], [sy]]))
    seen, out = set(), []
    rng = range(-2, 3)
    for a, b, c, d in itertools.product(rng, rng, rng, rng):
        B = np.array([[a, b], [c, d]])
        det = a * d - b * c
        if abs(det) not in (1, 2):
            continue
        if max(abs(a) + abs(b), abs(c) + abs(d)) <= 2:
            continue  # covered by Track C's {-2..2} free box
        key = min(tuple((P @ B).flatten()) for P in sp)
        if key in seen:
            continue
        seen.add(key)
        out.append(B)
    out.sort(key=lambda B: int(np.abs(B).sum()))
    return out


def solve_config(hv, sx, sy, B, parts, anchors, deadline):
    """Track C symbolic DFS in B-primed coordinates with unit t-tables."""
    els, mul = GRP
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])
    det = int(round(np.linalg.det(B)))
    WX = [sx ** (5 - k) * det for k in range(6)]
    WY = [sy ** (5 - k) * det for k in range(6)]
    absw = max(abs(det), 1)
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

    def prime(v):
        return (int(B[0, 0] * v[0] + B[0, 1] * v[1]),
                int(B[1, 0] * v[0] + B[1, 1] * v[1]))

    (el_nm, el_sfx, el_cell), (er_nm, er_sfx, er_cell) = anchors
    coL, fL = walk_coeffs(el_sfx)
    coR, fR = walk_coeffs(er_sfx)
    ckL, ckR = (fL, el_sfx[-1]), (fR, er_sfx[-1])
    if ckL == ckR and el_cell[2] != er_cell[2]:
        return None

    SYM = sorted(set(coL) | set(coR))
    m = len(SYM)
    sym_ix = {k: i for i, k in enumerate(SYM)}
    VALS = np.array(list(itertools.product(*([TAX] * m))), dtype=np.int64)

    def coefrow(co, axis):
        r = np.zeros(m, dtype=np.int64)
        for k, c in co.items():
            r[sym_ix[k]] = c[axis]
        return r

    ebox_p = [prime(e) for e in EBOX]
    emax_p = max(max(abs(e[0]), abs(e[1])) for e in ebox_p)
    dy_p = prime((2 * (el_cell[0] - er_cell[0]),
                  2 * (el_cell[1] - er_cell[1])))

    # parts data in primed coords
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
        pts = {}
        fxs, fys, keys = [], [], []
        for (i, j, c) in cells:
            fp = prime((2 * i, 2 * j))
            pts[(fp[0], fp[1], c)] = (i, j, c)
            fxs.append(fp[0])
            fys.append(fp[1])
            keys.append((i, j, c))
        pdata.append((pname, sfx, span_rest, pts, keys, fxs, fys))

    el_p = prime((2 * el_cell[0], 2 * el_cell[1]))
    er_p = prime((2 * er_cell[0], 2 * er_cell[1]))

    lincache = {}

    def lvals(row):
        key = row.tobytes()
        v = lincache.get(key)
        if v is None:
            v = VALS @ row
            lincache[key] = v
        return v

    drx = coefrow(coL, 0) - coefrow(coR, 0)
    dry = coefrow(coL, 1) - coefrow(coR, 1)
    e3_opts = ebox_p if er_cell[2] != el_cell[2] else [(0, 0)]

    nodes = [0]
    for e3 in e3_opts:
        # eye_right filter in primed coords: (coL-coR).t == dy' - e3'
        lin = lvals(drx)
        selx0 = np.nonzero(lin == dy_p[0] - e3[0])[0]
        if selx0.size == 0:
            continue
        liny = lvals(dry)
        sely0 = np.nonzero(liny == dy_p[1] - e3[1])[0]
        if sely0.size == 0:
            continue
        vrow = [(-coefrow(coL, 0), el_p[0]), (-coefrow(coL, 1), el_p[1])]
        E = {el_cell[2]: (0, 0), er_cell[2]: e3}
        if el_cell[2] == er_cell[2] and e3 != (0, 0):
            continue
        KAP = {ckL: el_cell[2]}
        if KAP.get(ckR, er_cell[2]) != er_cell[2]:
            continue
        KAP[ckR] = er_cell[2]
        G = {(0, s): (0, 0) for s in zorb}
        hit = None
        try:
            hit = _dfs(pdata, G, dict(E), dict(KAP), vrow, hv, WX, WY,
                       GRP[1], f0, sym_ix, lvals, VALS, m, selx0, sely0,
                       span_hint=absw, emax=emax_p, deadline=deadline,
                       nodes=nodes)
        except TimeoutError:
            return "TIMEOUT"
        if hit is not None:
            selx, sely, G, E, KAP = hit
            ix, iy = int(selx[0]), int(sely[0])
            Gfull = dict(G)
            for k, i in sym_ix.items():
                Gfull[k] = (int(VALS[ix, i]), int(VALS[iy, i]))
            return {"G": {f"{d},{st}": list(v) for (d, st), v in Gfull.items()},
                    "E": {str(c): list(v) for c, v in E.items()},
                    "KAP": {f"{st},{d}": c for (st, d), c in KAP.items()},
                    "h": list(hv), "sx": sx, "sy": sy, "group": GROUP,
                    "B": B.tolist(), "e3p": list(e3), "nodes": nodes[0],
                    "track": "D"}
    return None


def _dfs(pdata, G, E, KAP, vrow, hv, WX, WY, mul, f0, sym_ix, lvals, VALS,
         m, selx0, sely0, span_hint, emax, deadline, nodes):
    def part_rec(pi, selx, sely):
        if pi == len(pdata):
            return (selx, sely, G, E, KAP)
        pname, sfx, span_rest, pts, keys, fxs, fys = pdata[pi]
        used = set()
        nleaf = len(sfx)

        def nxt(li, selx, sely):
            if li == nleaf:
                return part_rec(pi + 1, selx, sely)
            rowx = vrow[0][0].copy()
            rowy = vrow[1][0].copy()
            return go(li, 0, f0, vrow[0][1], vrow[1][1], rowx, rowy,
                      selx, sely)

        def go(li, k, s, cx, cy, rowx, rowy, selx, sely):
            nodes[0] += 1
            if not nodes[0] % 4096 and time.time() > deadline:
                raise TimeoutError
            if k == 6:
                ck = (s, sfx[li][5])
                classes = (KAP[ck],) if ck in KAP else (0, 1, 2, 3)
                lx = lvals(rowx)
                ly = lvals(rowy)
                for c in classes:
                    bound = E.get(c)
                    eopts = [bound] if bound is not None else EBOXP[0]
                    for e in eopts:
                        for (tx, ty, tc), tgt in pts.items():
                            if tc != c or tgt in used:
                                continue
                            sx2 = selx[lx[selx] + cx == tx + e[0]]
                            if sx2.size == 0:
                                continue
                            sy2 = sely[ly[sely] + cy == ty + e[1]]
                            if sy2.size == 0:
                                continue
                            kf = ck not in KAP
                            ef = E.get(c) is None
                            if kf:
                                KAP[ck] = c
                            if ef:
                                E[c] = e
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
            need = span_rest[li][k]
            bnd = span_hint * ((1 << (6 - k)) - 1) + 2 * emax
            lx = lvals(rowx)
            ly = lvals(rowy)
            vx = lx[selx]
            vy = ly[sely]
            lox, hix = int(vx.min()) + cx - bnd, int(vx.max()) + cx + bnd
            loy, hiy = int(vy.min()) + cy - bnd, int(vy.max()) + cy + bnd
            avail = 0
            for t, tx, ty in zip(keys, fxs, fys):
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
            g = G.get(key)
            if g is not None:
                return go(li, k + 1, s2, cx + WX[k] * g[0],
                          cy + WY[k] * g[1], rowx, rowy, selx, sely)
            for g in TBOX:
                G[key] = g
                r = go(li, k + 1, s2, cx + WX[k] * g[0], cy + WY[k] * g[1],
                       rowx, rowy, selx, sely)
                if r is not None:
                    return r
            del G[key]
            return None

        return nxt(0, selx, sely)

    return part_rec(0, selx0, sely0)


EBOXP = [None]  # set per config before _dfs (primed E options)


def solve_config_wrapped(hv, sx, sy, B, parts, anchors, deadline):
    def prime(v):
        return (int(B[0, 0] * v[0] + B[0, 1] * v[1]),
                int(B[1, 0] * v[0] + B[1, 1] * v[1]))

    EBOXP[0] = [prime(e) for e in EBOX]
    return solve_config(hv, sx, sy, B, parts, anchors, deadline)


def worker(args):
    cfg_i, hv, sx, sy, Bl, per_cfg = args
    B = np.array(Bl)
    anchors, parts = load_parts()
    t0 = time.time()
    sol = solve_config_wrapped(hv, sx, sy, B, parts, anchors,
                               time.time() + per_cfg)
    return cfg_i, hv, sx, sy, Bl, sol, time.time() - t0


def planted_selftest():
    """Sheared plant: unit-corner reflection curve composed with a frame
    whose row sum exceeds 2 (outside Track C's box)."""
    import random

    els, mul = GRP
    A = np.array([[1, 2], [0, 1]])  # row sum 3 -> genuinely Track D
    det = int(round(np.linalg.det(A)))
    B = np.array([[1, -2], [0, 1]]) * (1 if det > 0 else -1)  # adj(A)
    assert np.array_equal(B @ A, det * np.eye(2, dtype=int))
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

        Tp = {(d, s): refl(corner[d], s) for d in range(4) for s in els}
        Tp[(0, 0)] = (0, 0)
        Ep = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}
        par2c = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}
        WX = [sx ** (5 - k) for k in range(6)]
        WY = [sy ** (5 - k) for k in range(6)]
        f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])

        def fwd(sfx):
            s, zx, zy = f0, 0, 0
            for k, d in enumerate(sfx):
                t = Tp[(d, s)]
                zx += WX[k] * t[0]
                zy += WY[k] * t[1]
                s = mul(s, hv[d])
            c = par2c[(zx & 1, zy & 1)]
            # pentagon position in OUR frame: y = A z + 0, cell = (y - E)/2
            yx = A[0, 0] * zx + A[0, 1] * zy
            yy = A[1, 0] * zx + A[1, 1] * zy
            return yx, yy, c

        def to_cell(yx, yy, c):
            e = Ep[c]
            ex = e[0] + ((yx - e[0]) % 2)
            ey = e[1] + ((yy - e[1]) % 2)
            return ((yx - ex) // 2, (yy - ey) // 2, c)

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
        sol = solve_config_wrapped(hv, sx, sy, B, new_parts, new_anchors,
                                   time.time() + 900)
        found = isinstance(sol, dict)
        print(f"selftest seed={seed} hv={hv} B={B.tolist()}: "
              f"{'FOUND' if found else sol} ({time.time()-t0:.1f}s, "
              f"nodes={sol.get('nodes') if found else '-'})")
        return found
    print("selftest: no usable plant")
    return False


def main():
    if SELFTEST:
        sys.exit(0 if planted_selftest() else 1)
    from solve_free2 import canonical_configs

    scales = [(-2, -2), (2, 2), (2, -2)]
    hcfgs = canonical_configs(GROUP, scales)
    FR = frames()
    cfgs = [(hv, sx, sy, B) for B in FR for (hv, sx, sy) in hcfgs]
    log_progress(f"sweep start: {len(hcfgs)} h-configs x {len(FR)} frames "
                 f"= {len(cfgs)} configs, {NWORK} workers")
    anchors, parts = load_parts()
    per_cfg = 600.0
    jobs = [(i, hv, sx, sy, B.tolist(), per_cfg)
            for i, (hv, sx, sy, B) in enumerate(cfgs)]
    with mp.Pool(NWORK) as pool:
        for cfg_i, hv, sx, sy, Bl, sol, dt in pool.imap_unordered(worker, jobs):
            if isinstance(sol, dict):
                log_progress("SOLUTION " + json.dumps(sol))
                json.dump(sol, open("tools/lattice/free3_solution.json", "w"),
                          indent=1)
                print("SOLUTION", json.dumps(sol))
                pool.terminate()
                return
            if sol == "TIMEOUT":
                log_progress(f"cfg={cfg_i} h={hv} s=({sx},{sy}) B={Bl} "
                             f"TIMEOUT ({dt:.1f}s)")
            elif cfg_i % 64 == 0:
                log_progress(f"cfg={cfg_i} done ({dt:.1f}s)")
            if time.time() - T0 > BUDGET:
                log_progress("budget hit")
                pool.terminate()
                return
    log_progress(f"SWEEP DONE no solution ({len(cfgs)} configs)")


if __name__ == "__main__":
    main()
