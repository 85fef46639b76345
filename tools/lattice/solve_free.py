"""Track C — group-translation flip automaton with FREE offset tables.

Family (strictly generalizes solve_flips Tracks A/B, closing their joint gap:
free per-(digit,state) tables WITH sheared frames absorbed, per-axis scale
signs, and a (state, last-digit) -> class map):

    state s in a small group G (Z2xZ2 | Z4 | D4), s' = s * h(d)
    z    = sum_k  diag(sx,sy)^(5-k) * g(d_k, s_k)        (suffix levels 0..5)
    y    = z + V                       (fine 2x grid, V learned from eye_left)
    cell = (i,j,c) with y == 2*(i,j) + E[c],  c = kappa(s_final, d_last)

  * g free per (digit, state) in {-2..2}^2  -> absorbs any unimodular /
    |det|=2 integer frame of a {-1,0,1}^2 table (Track A's shear x Track B's
    freedom combined);
  * (sx, sy) in {+-2}^2 -> per-axis alternating parent-lattice orientation;
  * E[c] free in {-1..2}^2 (E[class(eye_left)] pinned (0,0): V-degeneracy);
  * kappa free, learned lazily -> supports the observed duplicate-class quads
    and same-class-different-children "variants" (DESIGN.md v2), which a
    state<->class BIJECTION provably cannot produce;
  * g(0, s) = 0 ONLY for s in the <h(0)>-orbit of the identity (the res-27
    S=0 chain visits exactly those states and nests at the quintant corner
    at every level; other states' g(0,s) are free — reflection curves have
    nonzero absolute digit-0 offsets in flipped states);
  * WLOG start state = identity (left-translation gauge absorbed by free g).

The '300' prefix contributes a constant (absorbed by V); walks run over the
6 suffix digits with the state chain seeded by the prefix.

Exact constraints: two eye anchors (exact S->cell, difference equation solved
in closed form per axis), per-part 48-cell exact set matching, prefix-span
count-ball pruning.

Usage:
  python3 tools/lattice/solve_free.py GROUP [budget_sec] [skip] [selftest]
  GROUP in {Z22, Z4, D4}
"""
from __future__ import annotations

import itertools
import json
import sys
import time

sys.setrecursionlimit(200000)

T0 = time.time()
GROUP = sys.argv[1] if len(sys.argv) > 1 else "Z22"
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 86400.0
SKIP = int(sys.argv[3]) if len(sys.argv) > 3 else 0
SELFTEST = len(sys.argv) > 4 and sys.argv[4] == "selftest"
PROGRESS = "tools/lattice/free_progress.log"

GT = json.load(open("tools/lattice/groundtruth.json"))

GBOX = [(a, b) for a in range(-2, 3) for b in range(-2, 3)]
EBOX = [(a, b) for a in range(-1, 3) for b in range(-1, 3)]
EMAX = 2


def group(name):
    if name == "Z22":
        return list(range(4)), (lambda a, b: a ^ b)
    if name == "Z4":
        return list(range(4)), (lambda a, b: (a + b) % 4)

    def mul(a, b):  # D4, right action s*h; flip conjugates rotation
        ra, fa = a % 4, a // 4
        rb, fb = b % 4, b // 4
        r = (rb - ra) % 4 if fb else (ra + rb) % 4
        return (fa ^ fb) * 4 + r

    return list(range(8)), mul


def digits_of(s, n=9):
    return [(s >> (2 * (n - 1 - k))) & 3 for k in range(n)]


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} grp={GROUP} {msg}\n")


def axis_sols(coefs, target):
    """All value tuples v in {-2..2}^n with sum coefs[i]*v[i] == target."""
    out, n = [], len(coefs)
    sufmax = [0] * (n + 1)
    for i in range(n - 1, -1, -1):
        sufmax[i] = sufmax[i + 1] + 2 * abs(coefs[i])

    def rec(i, acc, vals):
        if abs(target - acc) > sufmax[i]:
            return
        if i == n:
            out.append(tuple(vals))
            return
        for v in range(-2, 3):
            vals.append(v)
            rec(i + 1, acc + coefs[i] * v, vals)
            vals.pop()

    rec(0, 0, [])
    return out


def solve_config(hv, sx, sy, parts, anchors, deadline):
    """hv: tuple h(0..3). parts: [(name, S_list, cells)], anchors:
    [(name, suffix, cell)] eye_left first. Returns dict | None | 'TIMEOUT'."""
    els, mul = GRP
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])  # state after '300' prefix
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    zorb = {0}  # <h(0)>-orbit of identity: g(0, s) == 0 exactly there
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

    keys = sorted(set(coL) | set(coR))
    dkeys, dcx, dcy = [], [], []
    for key in keys:
        ax, ay = coL.get(key, (0, 0))
        bx, by = coR.get(key, (0, 0))
        if ax != bx or ay != by:
            dkeys.append(key)
            dcx.append(ax - bx)
            dcy.append(ay - by)
    dy = (2 * (el_cell[0] - er_cell[0]), 2 * (el_cell[1] - er_cell[1]))

    # pre-flatten part data: per part sorted suffixes + span_rest counts
    pdata = []
    for pname, slist, cells in parts:
        sfx = sorted(tuple(digits_of(s)[3:]) for s in slist)
        nleaf = len(sfx)
        span_rest = [[0] * 7 for _ in range(nleaf)]
        for li in range(nleaf):
            for k in range(7):
                m = li
                while m + 1 < nleaf and sfx[m + 1][:k] == sfx[li][:k]:
                    m += 1
                span_rest[li][k] = m - li + 1
        pts = {(2 * i, 2 * j, c): (i, j, c) for (i, j, c) in cells}
        fine = [(2 * i, 2 * j) for (i, j, c) in cells]
        pdata.append((pname, sfx, span_rest, pts, fine,
                      [tuple(c) for c in cells]))

    e3opts = EBOX if er_cell[2] != el_cell[2] else [(0, 0)]
    for e3 in e3opts:
        if time.time() > deadline:
            return "TIMEOUT"
        # z_L - z_R = (2 i_L + E'[c_L]=0) - (2 i_R + e3)  =>  dy - e3
        for vx in axis_sols(dcx, dy[0] - e3[0]):
            for vy in axis_sols(dcy, dy[1] - e3[1]):
                Gfix = {(0, s): (0, 0) for s in zorb}
                for i, key in enumerate(dkeys):
                    Gfix[key] = (vx[i], vy[i])
                freeL = [k for k in coL if k not in Gfix]
                for combo in itertools.product(GBOX, repeat=len(freeL)):
                    G = dict(Gfix)
                    for k, g in zip(freeL, combo):
                        G[k] = g
                    zx = sum(c[0] * G[k][0] for k, c in coL.items())
                    zy = sum(c[1] * G[k][1] for k, c in coL.items())
                    V = (2 * el_cell[0] - zx, 2 * el_cell[1] - zy)
                    zrx = sum(c[0] * G[k][0] for k, c in coR.items()) + V[0]
                    zry = sum(c[1] * G[k][1] for k, c in coR.items()) + V[1]
                    if (zrx, zry) != (2 * er_cell[0] + e3[0],
                                      2 * er_cell[1] + e3[1]):
                        continue
                    E = {el_cell[2]: (0, 0)}
                    E[er_cell[2]] = e3
                    KAP = {ckL: el_cell[2], ckR: er_cell[2]}
                    if KAP[ckL] != el_cell[2] or KAP[ckR] != er_cell[2]:
                        continue
                    try:
                        sol = dfs_parts(pdata, G, E, KAP, V, hv,
                                        WX, WY, mul, f0, deadline)
                    except TimeoutError:
                        return "TIMEOUT"
                    if sol is not None:
                        sol.update(h=list(hv), sx=sx, sy=sy, V=list(V),
                                   group=GROUP, e3=list(e3))
                        return sol
    return None


def dfs_parts(pdata, G, E, KAP, V, hv, WX, WY, mul, f0, deadline):
    """Exact set-match every part; lazily bind G/E/KAP entries."""

    def part_rec(pi):
        if pi == len(pdata):
            return True
        pname, sfx, span_rest, pts, fine, cells = pdata[pi]
        used = set()
        nleaf = len(sfx)

        def nxt(li):
            if li == nleaf:
                return part_rec(pi + 1)
            return go(li, 0, f0, 0, 0)

        def go(li, k, s, zx, zy):
            if time.time() > deadline:
                raise TimeoutError
            if k == 6:
                yx, yy = zx + V[0], zy + V[1]
                ck = (s, sfx[li][5])
                classes = (KAP[ck],) if ck in KAP else (0, 1, 2, 3)
                for c in classes:
                    eopts = (E[c],) if c in E else EBOX
                    for e in eopts:
                        tgt = pts.get((yx - e[0], yy - e[1], c))
                        if tgt is None or tgt in used:
                            continue
                        kf = ck not in KAP
                        ef = c not in E
                        if kf:
                            KAP[ck] = c
                        if ef:
                            E[c] = e
                        used.add(tgt)
                        if nxt(li + 1):
                            return True
                        used.discard(tgt)
                        if ef:
                            del E[c]
                        if kf:
                            del KAP[ck]
                return False
            # count-ball prune: the span_rest[li][k] leaves sharing this
            # prefix (all still unassigned) must fit among unused targets
            # within the remaining-weight ball
            need = span_rest[li][k]
            bnd = 2 * ((1 << (6 - k)) - 1) + EMAX
            cx, cy = zx + V[0], zy + V[1]
            avail = 0
            for t, f in zip(cells, fine):
                if t not in used and abs(f[0] - cx) <= bnd \
                        and abs(f[1] - cy) <= bnd:
                    avail += 1
                    if avail >= need:
                        break
            if avail < need:
                return False
            d = sfx[li][k]
            s2 = mul(s, hv[d])
            key = (d, s)
            if key in G:
                g = G[key]
                return go(li, k + 1, s2, zx + WX[k] * g[0],
                          zy + WY[k] * g[1])
            for g in GBOX:
                G[key] = g
                if go(li, k + 1, s2, zx + WX[k] * g[0], zy + WY[k] * g[1]):
                    return True
            del G[key]
            return False

        return nxt(0)

    if not part_rec(0):
        return None
    return {"G": {f"{d},{s}": list(v) for (d, s), v in G.items()},
            "E": {str(c): list(v) for c, v in E.items()},
            "KAP": {f"{s},{d}": c for (s, d), c in KAP.items()}}


def load_parts():
    amap = {a["part"]: a for a in GT["anchors"]}
    anchors = [(nm, tuple(digits_of(amap[nm]["S"])[3:]), tuple(amap[nm]["cell"]))
               for nm in ("eye_left", "eye_right")]
    parts = [(nm, GT["parts"][nm]["S"],
              [tuple(c) for c in GT["parts"][nm]["cells"]])
             for nm in ("head_trunk", "ear_left", "ear_right")]
    return anchors, parts


def planted_selftest():
    """Generate cells from an in-family planted table over the REAL S sets;
    the solver must find a consistent solution."""
    import random

    els, mul = GRP
    for seed in range(40):
        rnd = random.Random(seed)
        # guaranteed-injective reflection curve: per state, the 4 digits
        # occupy the 4 distinct unit-quadrant corners (reflected by the
        # state's flip bits), so every level partitions space exactly.
        hv = (0,) + tuple(rnd.randrange(len(els)) for _ in range(3))
        sx, sy = -2, -2
        rest = [(0, 1), (1, 1), (1, 0)]
        rnd.shuffle(rest)
        # orbit rule: digit 0 at identity sits at the corner
        corner = {0: (0, 0), 1: rest[0], 2: rest[1], 3: rest[2]}

        def refl(p, s):
            fx, fy = s & 1, (s >> 1) & 1
            return (1 - p[0] if fx else p[0], 1 - p[1] if fy else p[1])

        Gp = {(d, s): refl(corner[d], s) for d in range(4) for s in els}
        Gp[(0, 0)] = (0, 0)
        Ep = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}
        WX = [sx ** (5 - k) for k in range(6)]
        WY = [sy ** (5 - k) for k in range(6)]
        f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])

        # class := fine parity (each class at a fixed parity corner, like
        # the recovered lattice); parity = f(s_final, d_last), so in-family
        par2c = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}

        def fwd(sfx):
            s, zx, zy = f0, 0, 0
            for k, d in enumerate(sfx):
                g = Gp[(d, s)]
                zx += WX[k] * g[0]
                zy += WY[k] * g[1]
                s = mul(s, hv[d])
            c = par2c[(zx & 1, zy & 1)]
            return zx, zy, c

        def to_cell(zx, zy, c):
            e = Ep[c]
            ex = e[0] + ((zx - e[0]) % 2)
            ey = e[1] + ((zy - e[1]) % 2)
            return ((zx - ex) // 2, (zy - ey) // 2, c)

        anchors, parts = load_parts()
        new_anchors, new_parts, bad = [], [], False
        for nm, sfx, _ in anchors:
            new_anchors.append((nm, sfx, to_cell(*fwd(sfx))))
        if new_anchors[0][2][2] == new_anchors[1][2][2]:
            continue  # want distinct eye classes like the real data
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
        print(f"selftest seed={seed} hv={hv}: "
              f"{'FOUND' if isinstance(sol, dict) else sol} "
              f"({time.time()-t0:.1f}s)")
        return isinstance(sol, dict)
    print("selftest: no usable plant found")
    return False


GRP = group(GROUP)


def main():
    if SELFTEST:
        sys.exit(0 if planted_selftest() else 1)
    anchors, parts = load_parts()
    els, _ = GRP
    n = 0
    scales = [(-2, -2), (2, 2), (2, -2), (-2, 2)]
    for hv in itertools.product(range(len(els)), repeat=4):
        for sx, sy in scales:
            n += 1
            if n <= SKIP:
                continue
            if time.time() - T0 > BUDGET:
                log_progress(f"budget hit at config {n}")
                print("budget hit", n)
                return
            deadline = min(T0 + BUDGET, time.time() + 1800)
            sol = solve_config(hv, sx, sy, parts, anchors, deadline)
            if sol == "TIMEOUT":
                log_progress(f"config {n} h={hv} s=({sx},{sy}) TIMEOUT")
            elif sol is not None:
                log_progress("SOLUTION " + json.dumps(sol))
                json.dump(sol, open("tools/lattice/free_solution.json", "w"),
                          indent=1)
                print("SOLUTION", json.dumps(sol))
                return
            if n % 64 == 0:
                log_progress(f"config {n} done ({time.time() - T0:.0f}s)")
    log_progress(f"SWEEP DONE no solution ({n} configs)")
    print("no solution after", n, "configs")


if __name__ == "__main__":
    main()
