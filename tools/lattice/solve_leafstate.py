"""Track E — per-(state, last-digit) LEAF OFFSETS (the "reflected pentagon
shift" model gap).

Every prior family (Tracks A-D, solve_free/free2/free3) assumed the leaf
cell position is y = z + V - E[class]: one offset per pentagon CLASS.  But
in an upstream-style anchor walk the pentagon drawn at an anchor is
REFLECTED according to the walk's final flip state, and a reflection about
the anchor point can move the pentagon's centroid into a different unit
cell.  The leaf offset is then a function of the final state (and the last
digit), NOT of the class alone:

    cell = (i, j, c)  with  2*(i,j) = z - T(s_final, d_last),
    c = kappa(s_final, d_last)

T subsumes E+kappa (T(s,d) = E[kappa(s,d)] + W(s)); since the global gauge
V folds into T, T values are unconstrained absolutely but must stay within
a small box RELATIVE to each other (|T(k) - T(k0)|_inf <= TMAX).

Two table modes:
  corner — G(d,s) = refl(corner_d, s), corners a permutation of the unit
           quadrants, refl about the cell center or about 0 (4 digits x 4
           flip-states, the natural Hilbert constructions; ~12k configs,
           no inner enumeration);
  free   — G free per (digit, state) in {-2..2}^2, enumerated lazily in a
           part-driven DFS (the full Track C family under the new leaf
           model).

State group: Z22 / Z4 / D4 translations s' = s * h(d), scales +-2 per axis.

Usage:
  python3 tools/lattice/solve_leafstate.py corner [nworkers]
  python3 tools/lattice/solve_leafstate.py free GROUP [budget] [nworkers] [per_cfg] [subset]
  python3 tools/lattice/solve_leafstate.py selftest
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

# solve_free/solve_free2 parse THEIR OWN sweep args at import time; shield
# them from this script's argv (e.g. 'free Z22 ...' crashes float('Z22'))
_argv = sys.argv
sys.argv = [_argv[0]]
from solve_free import digits_of, group, load_parts  # noqa: E402
from solve_free2 import automorphisms  # noqa: E402
sys.argv = _argv

TMAX = 3          # |T(k) - T(k0)|_inf bound (reflection shifts are local)
GBOX = [(a, b) for a in range(-2, 3) for b in range(-2, 3)]
PROGRESS = os.environ.get("LEAFSTATE_PROGRESS",
                          "tools/lattice/leafstate_progress.log")


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


class Budget(Exception):
    pass


def matpow_weights(M):
    """P_k = M^(5-k) for k=0..5, as ((a,b),(c,d)) int tuples."""
    def mmul(A, B):
        return ((A[0][0] * B[0][0] + A[0][1] * B[1][0],
                 A[0][0] * B[0][1] + A[0][1] * B[1][1]),
                (A[1][0] * B[0][0] + A[1][1] * B[1][0],
                 A[1][0] * B[0][1] + A[1][1] * B[1][1]))
    P = [((1, 0), (0, 1))]
    for _ in range(5):
        P.append(mmul(P[-1], M))
    return P[::-1]


def solve_tables(mul, hv, sx, sy, G, anchors, parts, deadline,
                 collect=None, M=None):
    """G fully known: leaf-state matching only.  Returns solution | None.
    Level scaling: diag(sx, sy) by default, or an arbitrary integer matrix
    M with |det| = 4 (rotated / sheared subdivision schemes)."""
    if M is None:
        M = ((sx, 0), (0, sy))
    P = matpow_weights(M)
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])

    def fwd(sfx):
        s, zx, zy = f0, 0, 0
        for k, d in enumerate(sfx):
            g = G.get((d, s))
            if g is None:
                return None
            (a, b), (c, e) = P[k]
            zx += a * g[0] + b * g[1]
            zy += c * g[0] + e * g[1]
            s = mul(s, hv[d])
        return zx, zy, (s, sfx[-1])

    DELTA = {}      # key -> (dx, dy): 2*cell = z - delta
    KAP = {}        # key -> class
    ref = [None]    # first-derived delta (V gauge)

    def set_delta(k, d):
        if ref[0] is None:
            ref[0] = d
        elif (abs(d[0] - ref[0][0]) > 2 * TMAX
              or abs(d[1] - ref[0][1]) > 2 * TMAX):
            return False
        DELTA[k] = d
        return True

    # eyes give two derived (key -> delta, class) seeds
    for nm, sfx, cell in anchors:
        r = fwd(sfx)
        if r is None:
            return None
        zx, zy, k = r
        d = (zx - 2 * cell[0], zy - 2 * cell[1])
        if k in DELTA:
            if DELTA[k] != d or KAP[k] != cell[2]:
                return None
        else:
            if not set_delta(k, d):
                return None
            KAP[k] = cell[2]

    # parts: group walks by key; per key one translation onto same-class
    # unused cells
    pdata = []
    for pname, slist, cells in parts:
        gw = defaultdict(list)
        for s in slist:
            r = fwd(tuple(digits_of(s)[3:]))
            if r is None:
                return None
            gw[r[2]].append((r[0], r[1]))
        pos_index = defaultdict(set)
        for (i, j, c) in cells:
            pos_index[c].add((2 * i, 2 * j))
        pdata.append((sorted(gw, key=lambda k: -len(gw[k])), dict(gw),
                      pos_index))

    nodes = [0]

    def solve_part(pi):
        if pi == len(pdata):
            return True
        keys, groups, pos_index = pdata[pi]
        used = set()

        def place(ki):
            nodes[0] += 1
            if nodes[0] % 8192 == 0 and time.time() > deadline:
                raise Budget
            if ki == len(keys):
                return solve_part(pi + 1)
            k = keys[ki]
            zs = groups[k]
            if k in DELTA:
                d, c = DELTA[k], KAP[k]
                tgts = [((z0 - d[0]), (z1 - d[1])) for z0, z1 in zs]
                if any((t, c) in used or t not in pos_index.get(c, ())
                       for t in tgts):
                    return False
                if len(set(tgts)) != len(tgts):
                    return False
                used.update((t, c) for t in tgts)
                if place(ki + 1):
                    return True
                used.difference_update((t, c) for t in tgts)
                return False
            # unknown key: branch over anchor target for member 0
            z0 = zs[0]
            for c, posset in pos_index.items():
                for t in posset:
                    if (t, c) in used:
                        continue
                    d = (z0[0] - t[0], z0[1] - t[1])
                    if ref[0] is not None and (
                            abs(d[0] - ref[0][0]) > 2 * TMAX
                            or abs(d[1] - ref[0][1]) > 2 * TMAX):
                        continue
                    tgts = [((z[0] - d[0]), (z[1] - d[1])) for z in zs]
                    if any((tt, c) in used or tt not in posset
                           for tt in tgts):
                        continue
                    if len(set(tgts)) != len(tgts):
                        continue
                    first_ref = ref[0] is None
                    if not set_delta(k, d):
                        continue
                    KAP[k] = c
                    used.update((tt, c) for tt in tgts)
                    if place(ki + 1):
                        return True
                    used.difference_update((tt, c) for tt in tgts)
                    del DELTA[k]
                    del KAP[k]
                    if first_ref:
                        ref[0] = None
            return False

        return place(0)

    if not solve_part(0):
        return None
    sol = {"h": list(hv), "sx": sx, "sy": sy,
           "M": [list(M[0]), list(M[1])],
           "G": {f"{d},{s}": list(v) for (d, s), v in G.items()},
           "T": {f"{s},{d}": list(v) for (s, d), v in DELTA.items()},
           "KAP": {f"{s},{d}": c for (s, d), c in KAP.items()},
           "nodes": nodes[0]}
    if collect is not None:
        collect.append(sol)
        return None  # keep searching for more
    return sol


# ---------------------------------------------------------------- corner
CORNERS = [(0, 1), (1, 0), (1, 1)]


def refl_center(p, s):
    return (1 - p[0] if s & 1 else p[0], 1 - p[1] if s & 2 else p[1])


def refl_sign(p, s):
    return (-p[0] if s & 1 else p[0], -p[1] if s & 2 else p[1])


def corner_configs():
    for action in (refl_center, refl_sign):
        for perm in itertools.permutations(CORNERS):
            corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
            for hv in itertools.product(range(4), repeat=4):
                for sx, sy in ((-2, -2), (2, 2), (2, -2), (-2, 2)):
                    yield corner, action, hv, sx, sy


def corner_worker(args):
    idx, corner, actname, hv, sx, sy = args
    action = refl_center if actname == "refl_center" else refl_sign
    anchors, parts = load_parts()
    els, mul = group("Z22")
    G = {(d, s): action(corner[d], s) for d in range(4) for s in range(4)}
    t0 = time.time()
    try:
        sol = solve_tables(mul, hv, sx, sy, G, anchors, parts,
                           time.time() + 120)
    except Budget:
        return idx, "TIMEOUT", time.time() - t0
    if sol:
        sol["corner"] = {str(d): list(corner[d]) for d in corner}
        sol["action"] = actname
    return idx, sol, time.time() - t0


def corner_main(nworkers):
    cfgs = [(i, c, a.__name__, hv, sx, sy)
            for i, (c, a, hv, sx, sy) in enumerate(corner_configs())]
    log_progress(f"corner sweep start: {len(cfgs)} configs")
    t0 = time.time()
    hits = []
    with mp.Pool(nworkers) as pool:
        for idx, sol, dt in pool.imap_unordered(corner_worker, cfgs,
                                                chunksize=16):
            if isinstance(sol, dict):
                hits.append(sol)
                log_progress(f"corner SOLUTION cfg={idx} {json.dumps(sol)}")
                print("SOLUTION", json.dumps(sol), flush=True)
            elif sol == "TIMEOUT":
                log_progress(f"corner cfg={idx} TIMEOUT ({dt:.1f}s)")
    log_progress(f"corner sweep done: {len(cfgs)} configs, {len(hits)} "
                 f"solutions, {time.time()-t0:.0f}s")
    if hits:
        json.dump(hits, open("tools/lattice/leafstate_corner_hits.json",
                             "w"), indent=1)
    print(f"corner sweep: {len(hits)} solutions over {len(cfgs)} configs")


# --------------------------------------------------------- framed corner
def frames():
    """Integer 2x2 frames A with entries in [-2,2], |det| in {1,2}."""
    out = []
    for a in range(-2, 3):
        for b in range(-2, 3):
            for c in range(-2, 3):
                for d in range(-2, 3):
                    if abs(a * d - b * c) in (1, 2):
                        out.append(((a, b), (c, d)))
    return out


def fcorner_configs():
    """(frame, corner, action, h, sx, sy).  Uniform scales commute with any
    frame; mixed scales (2,-2)/(-2,2) only with (anti)diagonal frames."""
    FR = frames()
    diagish = [f for f in FR
               if (f[0][1] == 0 and f[1][0] == 0)
               or (f[0][0] == 0 and f[1][1] == 0)]
    for action in (refl_center, refl_sign):
        for perm in itertools.permutations(CORNERS):
            corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
            for hv in itertools.product(range(4), repeat=4):
                for sx, sy in ((-2, -2), (2, 2)):
                    for A in FR:
                        yield A, corner, action, hv, sx, sy
                for sx, sy in ((2, -2), (-2, 2)):
                    for A in diagish:
                        yield A, corner, action, hv, sx, sy


def fcorner_worker(args):
    chunk = args
    anchors, parts = load_parts()
    els, mul = group("Z22")
    hits = []
    ntimeout = 0
    for A, corner, actname, hv, sx, sy in chunk:
        action = refl_center if actname == "refl_center" else refl_sign
        (a, b), (c, dd) = A
        G = {}
        for d in range(4):
            for s in range(4):
                gx, gy = action(corner[d], s)
                G[(d, s)] = (a * gx + b * gy, c * gx + dd * gy)
        try:
            sol = solve_tables(mul, hv, sx, sy, G, anchors, parts,
                               time.time() + 60)
        except Budget:
            ntimeout += 1
            continue
        if sol:
            sol["frame"] = [list(A[0]), list(A[1])]
            sol["corner"] = {str(d): list(corner[d]) for d in corner}
            sol["action"] = actname
            hits.append(sol)
    return hits, ntimeout


def fcorner_main(nworkers):
    cfgs = [(A, c, a.__name__, hv, sx, sy)
            for A, c, a, hv, sx, sy in fcorner_configs()]
    log_progress(f"fcorner sweep start: {len(cfgs)} configs")
    t0 = time.time()
    chunks = [cfgs[i::nworkers * 8] for i in range(nworkers * 8)]
    hits, ntimeout = [], 0
    with mp.Pool(nworkers) as pool:
        for hs, nt in pool.imap_unordered(fcorner_worker, chunks):
            hits.extend(hs)
            ntimeout += nt
            for sol in hs:
                log_progress(f"fcorner SOLUTION {json.dumps(sol)}")
                print("SOLUTION", json.dumps(sol), flush=True)
    log_progress(f"fcorner sweep done: {len(cfgs)} configs, {len(hits)} "
                 f"solutions, {ntimeout} TIMEOUTs, {time.time()-t0:.0f}s")
    if hits:
        json.dump(hits, open("tools/lattice/leafstate_fcorner_hits.json",
                             "w"), indent=1)
    print(f"fcorner sweep: {len(hits)} solutions over {len(cfgs)} configs")


# ---------------------------------------------- rotated/sheared scaling
def dets4():
    """Integer 2x2 level-scaling matrices, entries [-2,2], |det| = 4."""
    out = []
    for a in range(-2, 3):
        for b in range(-2, 3):
            for c in range(-2, 3):
                for d in range(-2, 3):
                    if abs(a * d - b * c) == 4:
                        out.append(((a, b), (c, d)))
    return out


def mcorner_configs():
    """(M, frame, corner, action, h): corner tables in any integer frame
    under any |det|=4 level scaling (90/60-degree rotated, sheared, ...).
    Scales sx/sy are subsumed by M (diag members)."""
    MS = dets4()
    FR = frames()
    for action in (refl_center, refl_sign):
        for perm in itertools.permutations(CORNERS):
            corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
            for hv in itertools.product(range(4), repeat=4):
                for M in MS:
                    for A in FR:
                        yield M, A, corner, action, hv


def mcorner_worker(args):
    """One (action, corner-perm, h) task; loops all M x frames inside."""
    actname, perm, hv = args
    anchors, parts = load_parts()
    els, mul = group("Z22")
    action = refl_center if actname == "refl_center" else refl_sign
    corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
    base = {(d, s): action(corner[d], s)
            for d in range(4) for s in range(4)}
    hits = []
    n = 0
    ntimeout = 0
    for A in frames():
        (a, b), (c, dd) = A
        G = {k: (a * gx + b * gy, c * gx + dd * gy)
             for k, (gx, gy) in base.items()}
        for M in dets4():
            n += 1
            try:
                sol = solve_tables(mul, hv, 0, 0, G, anchors, parts,
                                   time.time() + 60, M=M)
            except Budget:
                ntimeout += 1
                continue
            if sol:
                sol["frame"] = [list(A[0]), list(A[1])]
                sol["corner"] = {str(d): list(corner[d]) for d in corner}
                sol["action"] = actname
                hits.append(sol)
    return hits, n, ntimeout


def mcorner_main(nworkers, shard=0, nshards=1):
    tasks = [(a, perm, hv)
             for a in ("refl_center", "refl_sign")
             for perm in itertools.permutations(CORNERS)
             for hv in itertools.product(range(4), repeat=4)][shard::nshards]
    log_progress(f"mcorner sweep start: {len(tasks)} tasks x "
                 f"{len(frames()) * len(dets4())} (M,frame) combos "
                 f"(shard {shard}/{nshards})")
    t0 = time.time()
    hits, total, ntimeout, done = [], 0, 0, 0
    with mp.Pool(nworkers) as pool:
        for hs, n, nt in pool.imap_unordered(mcorner_worker, tasks):
            hits.extend(hs)
            total += n
            ntimeout += nt
            done += 1
            if done % 256 == 0:
                log_progress(f"mcorner progress {done}/{len(tasks)} tasks, "
                             f"{ntimeout} timeouts ({time.time()-t0:.0f}s)")
            for sol in hs:
                log_progress(f"mcorner SOLUTION {json.dumps(sol)}")
                print("SOLUTION", json.dumps(sol), flush=True)
    log_progress(f"mcorner sweep done: {total} configs, {len(hits)} "
                 f"solutions, {ntimeout} TIMEOUTs, {time.time()-t0:.0f}s")
    if hits:
        json.dump(hits, open("tools/lattice/leafstate_mcorner_hits.json",
                             "w"), indent=1)
    print(f"mcorner sweep: {len(hits)} solutions over {total} configs")


# ------------------------------------------- group-equivariant corners
def d4_action(s, p, variant):
    """Dihedral action of D4 element s (r = s%4 rots, f = s//4 refl) on a
    corner p.  variant: 'cRF'/'cFR' centered (about cell center),
    'oRF'/'oFR' about the origin; RF = rotate-then-flip, FR = flip-then-
    rotate."""
    r, f = s % 4, s // 4
    if variant[0] == "c":
        u, v = 2 * p[0] - 1, 2 * p[1] - 1
    else:
        u, v = p
    def rot(u, v, r):
        for _ in range(r):
            u, v = -v, u
        return u, v
    if variant[1:] == "RF":
        u, v = rot(u, v, r)
        if f:
            v = -v
    else:
        if f:
            v = -v
        u, v = rot(u, v, r)
    if variant[0] == "c":
        return ((u + 1) // 2, (v + 1) // 2)
    return (u, v)


def gcorner_worker(args):
    """One (variant, perm, hv) task over D4 states; loops M x small frames."""
    variant, perm, hv = args
    anchors, parts = load_parts()
    els, mul = group("D4")
    corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
    base = {(d, s): d4_action(s, corner[d], variant)
            for d in range(4) for s in range(8)}
    FR = [f for f in frames()
          if all(abs(x) <= 1 for row in f for x in row)]
    hits, n, ntimeout = [], 0, 0
    for A in FR:
        (a, b), (c, dd) = A
        G = {k: (a * gx + b * gy, c * gx + dd * gy)
             for k, (gx, gy) in base.items()}
        for M in dets4():
            n += 1
            try:
                sol = solve_tables(mul, hv, 0, 0, G, anchors, parts,
                                   time.time() + 60, M=M)
            except Budget:
                ntimeout += 1
                continue
            if sol:
                sol["frame"] = [list(A[0]), list(A[1])]
                sol["corner"] = {str(d): list(corner[d]) for d in corner}
                sol["variant"] = variant
                sol["group"] = "D4"
                hits.append(sol)
    return hits, n, ntimeout


def gcorner_main(nworkers, shard=0, nshards=1, skip=0):
    tasks = [(v, perm, hv)
             for v in ("cRF", "cFR", "oRF", "oFR")
             for perm in itertools.permutations(CORNERS)
             for hv in itertools.product(range(8), repeat=4)][shard::nshards]
    tasks = tasks[skip:]
    log_progress(f"gcorner(D4) sweep start: {len(tasks)} tasks "
                 f"(shard {shard}/{nshards})")
    t0 = time.time()
    hits, total, ntimeout, done = [], 0, 0, 0
    with mp.Pool(nworkers) as pool:
        for hs, n, nt in pool.imap_unordered(gcorner_worker, tasks):
            hits.extend(hs)
            total += n
            ntimeout += nt
            done += 1
            if done % 512 == 0:
                log_progress(f"gcorner progress {done}/{len(tasks)} tasks, "
                             f"{ntimeout} timeouts ({time.time()-t0:.0f}s)")
            for sol in hs:
                log_progress(f"gcorner SOLUTION {json.dumps(sol)}")
                print("SOLUTION", json.dumps(sol), flush=True)
    log_progress(f"gcorner sweep done: {total} configs, {len(hits)} "
                 f"solutions, {ntimeout} TIMEOUTs, {time.time()-t0:.0f}s")
    if hits:
        json.dump(hits, open("tools/lattice/leafstate_gcorner_hits.json",
                             "w"), indent=1)
    print(f"gcorner sweep: {len(hits)} solutions over {total} configs, "
          f"{ntimeout} timeouts")


# ------------------------------------------------------------------ free
def solve_free_config(grpname, hv, sx, sy, anchors, parts, deadline):
    """DFS over unknown G entries driven by the part walks, leaf-state
    matching at each completed leaf."""
    els, mul = group(grpname)
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])
    zorb = {0}
    s = hv[0]
    while s not in zorb:
        zorb.add(s)
        s = mul(s, hv[0])
    G = {(0, s): (0, 0) for s in zorb}
    DELTA, KAP = {}, {}
    ref = [None]
    nodes = [0]

    # leaves: eyes first (exact), then parts (set matching)
    # each leaf: (part_index or -1/-2 for eyes, suffix)
    pdata = []
    for pname, slist, cells in parts:
        sfx = sorted(tuple(digits_of(s)[3:]) for s in slist)
        pos_index = defaultdict(set)
        for (i, j, c) in cells:
            pos_index[c].add((2 * i, 2 * j))
        # remaining-suffix span counts for ball pruning
        nleaf = len(sfx)
        span = [[0] * 7 for _ in range(nleaf)]
        for li in range(nleaf):
            for k in range(7):
                mm = li
                while mm + 1 < nleaf and sfx[mm + 1][:k] == sfx[li][:k]:
                    mm += 1
                span[li][k] = mm - li + 1
        allpos = [(p, c) for c in pos_index for p in pos_index[c]]
        pdata.append((sfx, pos_index, span, allpos))

    def bound_rest(k):
        # max |remaining weighted offsets| per axis
        return 2 * sum(abs(WX[i]) for i in range(k, 6)), \
               2 * sum(abs(WY[i]) for i in range(k, 6))

    # ORDER: parts first (set matching prunes hard), eyes as tail checks —
    # under the leaf-state model the eyes alone barely constrain (their
    # walks' G entries and T keys are free until parts pin them).
    def eye_chain(ai):
        if ai == len(anchors):
            return True
        nm, sfx, cell = anchors[ai]

        def walk(k, s, zx, zy):
            if k == 6:
                key = (s, sfx[-1])
                d = (zx - 2 * cell[0], zy - 2 * cell[1])
                if key in DELTA:
                    if DELTA[key] != d or KAP[key] != cell[2]:
                        return False
                    return eye_chain(ai + 1)
                if ref[0] is not None and (
                        abs(d[0] - ref[0][0]) > 2 * TMAX
                        or abs(d[1] - ref[0][1]) > 2 * TMAX):
                    return False
                first = ref[0] is None
                if first:
                    ref[0] = d
                DELTA[key] = d
                KAP[key] = cell[2]
                if eye_chain(ai + 1):
                    return True
                del DELTA[key]
                del KAP[key]
                if first:
                    ref[0] = None
                return False
            dgt = sfx[k]
            s2 = mul(s, hv[dgt])
            g = G.get((dgt, s))
            if g is not None:
                return walk(k + 1, s2, zx + WX[k] * g[0], zy + WY[k] * g[1])
            for g in GBOX:
                G[(dgt, s)] = g
                if walk(k + 1, s2, zx + WX[k] * g[0], zy + WY[k] * g[1]):
                    return True
            del G[(dgt, s)]
            return False

        return walk(0, f0, 0, 0)

    def part_chain(pi):
        if pi == len(pdata):
            return eye_chain(0)
        sfx, pos_index, span, allpos = pdata[pi]
        used = set()
        nleaf = len(sfx)

        def leaf(li):
            nodes[0] += 1
            if nodes[0] % 4096 == 0 and time.time() > deadline:
                raise Budget
            if li == nleaf:
                return part_chain(pi + 1)
            return walk(li, 0, f0, 0, 0)

        def walk(li, k, s, zx, zy):
            if k == 6:
                key = (s, sfx[li][-1])
                if key in DELTA:
                    d, c = DELTA[key], KAP[key]
                    t = (zx - d[0], zy - d[1])
                    if (t, c) in used or t not in pos_index.get(c, ()):
                        return False
                    used.add((t, c))
                    if leaf(li + 1):
                        return True
                    used.discard((t, c))
                    return False
                for c, posset in pos_index.items():
                    for t in posset:
                        if (t, c) in used:
                            continue
                        d = (zx - t[0], zy - t[1])
                        if ref[0] is not None and (
                                abs(d[0] - ref[0][0]) > 2 * TMAX
                                or abs(d[1] - ref[0][1]) > 2 * TMAX):
                            continue
                        first = ref[0] is None
                        if first:
                            ref[0] = d
                        DELTA[key] = d
                        KAP[key] = c
                        used.add((t, c))
                        if leaf(li + 1):
                            return True
                        used.discard((t, c))
                        del DELTA[key]
                        del KAP[key]
                        if first:
                            ref[0] = None
                return False
            # ball prune: enough unused positions within reach?
            bx, by = bound_rest(k)
            if ref[0] is not None:
                lox = zx - bx - ref[0][0] - 2 * TMAX
                hix = zx + bx - ref[0][0] + 2 * TMAX
                loy = zy - by - ref[0][1] - 2 * TMAX
                hiy = zy + by - ref[0][1] + 2 * TMAX
                need = span[li][k]
                avail = 0
                for t, c in allpos:
                    if (t, c) not in used and lox <= t[0] <= hix \
                            and loy <= t[1] <= hiy:
                        avail += 1
                        if avail >= need:
                            break
                if avail < need:
                    return False
            dgt = sfx[li][k]
            s2 = mul(s, hv[dgt])
            g = G.get((dgt, s))
            if g is not None:
                return walk(li, k + 1, s2,
                            zx + WX[k] * g[0], zy + WY[k] * g[1])
            for g in GBOX:
                G[(dgt, s)] = g
                if walk(li, k + 1, s2,
                        zx + WX[k] * g[0], zy + WY[k] * g[1]):
                    return True
            del G[(dgt, s)]
            return False

        return leaf(0)

    if part_chain(0):
        return {"h": list(hv), "sx": sx, "sy": sy, "group": grpname,
                "G": {f"{d},{s}": list(v) for (d, s), v in G.items()},
                "T": {f"{s},{d}": list(v) for (s, d), v in DELTA.items()},
                "KAP": {f"{s},{d}": c for (s, d), c in KAP.items()},
                "nodes": nodes[0]}
    return None


def free_worker(args):
    cfg_i, grpname, hv, sx, sy, per_cfg = args
    anchors, parts = load_parts()
    t0 = time.time()
    try:
        sol = solve_free_config(grpname, hv, sx, sy, anchors, parts,
                                time.time() + per_cfg)
    except Budget:
        return cfg_i, hv, sx, sy, "TIMEOUT", time.time() - t0
    return cfg_i, hv, sx, sy, sol, time.time() - t0


def free_main(grpname, budget, nworkers, per_cfg, subset):
    els, _ = group(grpname)
    auts = automorphisms(grpname)
    seen, cfgs = set(), []
    for hv in itertools.product(range(len(els)), repeat=4):
        key = min(tuple(a[h] for h in hv) for a in auts)
        if key in seen:
            continue
        seen.add(key)
        for s in ((-2, -2), (2, 2), (2, -2)):
            cfgs.append((hv, s[0], s[1]))
    jobs = [(i, grpname, hv, sx, sy, per_cfg)
            for i, (hv, sx, sy) in enumerate(cfgs)
            if subset is None or i in subset]
    log_progress(f"free sweep start grp={grpname}: {len(jobs)}/{len(cfgs)} "
                 f"configs, per_cfg={per_cfg}, workers={nworkers}")
    t0 = time.time()
    with mp.Pool(nworkers) as pool:
        for cfg_i, hv, sx, sy, sol, dt in pool.imap_unordered(
                free_worker, jobs):
            if isinstance(sol, dict):
                log_progress(f"free SOLUTION cfg={cfg_i} {json.dumps(sol)}")
                json.dump(sol, open(
                    "tools/lattice/leafstate_solution.json", "w"), indent=1)
                print("SOLUTION", json.dumps(sol), flush=True)
            else:
                tag = "TIMEOUT" if sol == "TIMEOUT" else "refuted"
                log_progress(f"free grp={grpname} cfg={cfg_i} h={hv} "
                             f"s=({sx},{sy}) {tag} ({dt:.1f}s)")
            if time.time() - t0 > budget:
                log_progress("budget hit")
                pool.terminate()
                return
    log_progress(f"free sweep DONE grp={grpname} ({time.time()-t0:.0f}s)")


# -------------------------------------------------------------- selftest
def selftest():
    """Plant a corner table WITH a state-dependent leaf shift W(s) — the
    exact shape the E[class] model provably cannot represent — and check
    (a) the leaf-state matcher accepts it, (b) a perturbed h is rejected."""
    import random
    els, mul = group("Z22")
    anchors0, parts0 = load_parts()
    for seed in range(60):
        rnd = random.Random(seed)
        hv = (0,) + tuple(rnd.randrange(4) for _ in range(3))
        if set(hv[1:]) == {0}:      # want a plant that visits >1 state
            continue
        rest = [(0, 1), (1, 1), (1, 0)]
        rnd.shuffle(rest)
        corner = {0: (0, 0), 1: rest[0], 2: rest[1], 3: rest[2]}
        sx, sy = -2, -2
        G = {(d, s): refl_center(corner[d], s)
             for d in range(4) for s in range(4)}
        W = {0: (0, 0), 1: (1, 0), 2: (0, 1), 3: (1, 1)}  # leaf shift/state
        WXw = [sx ** (5 - k) for k in range(6)]
        WYw = [sy ** (5 - k) for k in range(6)]
        f0 = mul(mul(mul(0, hv[3]), hv[0]), hv[0])
        par2c = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}

        def fwd(sfx):
            s, zx, zy = f0, 0, 0
            for k, d in enumerate(sfx):
                g = G[(d, s)]
                zx += WXw[k] * g[0]
                zy += WYw[k] * g[1]
                s = mul(s, hv[d])
            w = W[s]
            y = (zx - w[0], zy - w[1])
            c = par2c[(y[0] & 1, y[1] & 1)]
            e = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}[c]
            return ((y[0] - e[0]) // 2, (y[1] - e[1]) // 2, c)

        anchors = [(nm, sfx, fwd(sfx)) for nm, sfx, _ in anchors0]
        new_parts, ok = [], True
        for nm, slist, _ in parts0:
            cells = [fwd(tuple(digits_of(s)[3:])) for s in slist]
            if len(set(cells)) != len(cells):
                ok = False
                break
            new_parts.append((nm, slist, cells))
        if ok:
            print(f"selftest plant seed={seed} hv={hv}")
            break
    else:
        print("selftest: no injective plant found")
        return False

    t0 = time.time()
    sol = solve_tables(mul, hv, sx, sy, G, anchors, new_parts,
                       time.time() + 300)
    print(f"selftest accept: {sol is not None} "
          f"({time.time()-t0:.1f}s, nodes={sol and sol['nodes']})")
    bad = solve_tables(mul, (hv[0], hv[1] ^ 2, hv[2], hv[3]), sx, sy, G,
                       anchors, new_parts, time.time() + 300)
    print(f"selftest reject perturbed h: {bad is None}")
    # the free DFS must also find it (same group/h/s config)
    t0 = time.time()
    free = solve_free_config("Z22", hv, sx, sy, anchors, new_parts,
                             time.time() + 600)
    print(f"selftest free-DFS: {free is not None} ({time.time()-t0:.1f}s, "
          f"nodes={free and free['nodes']})")
    return sol is not None and bad is None and free is not None


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "selftest"
    if mode == "selftest":
        sys.exit(0 if selftest() else 1)
    if mode == "corner":
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 12
        corner_main(nw)
    elif mode == "fcorner":
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 12
        fcorner_main(nw)
    elif mode == "mcorner":
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 12
        shard = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        nshards = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        mcorner_main(nw, shard, nshards)
    elif mode == "gcorner":
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 12
        shard = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        nshards = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        skip = int(sys.argv[5]) if len(sys.argv) > 5 else 0
        gcorner_main(nw, shard, nshards, skip)
    elif mode == "free":
        grp = sys.argv[2] if len(sys.argv) > 2 else "Z22"
        budget = float(sys.argv[3]) if len(sys.argv) > 3 else 86400.0
        nw = int(sys.argv[4]) if len(sys.argv) > 4 else 20
        per_cfg = float(sys.argv[5]) if len(sys.argv) > 5 else 900.0
        subset = (set(int(x) for x in sys.argv[6].split(","))
                  if len(sys.argv) > 6 else None)
        free_main(grp, budget, nw, per_cfg, subset)
