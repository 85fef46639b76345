"""Track G — anchor-parity walk solver.

New structural facts (round 4, derived in-session from the shape corpus):

1. The four pentagon classes are ONE base shape under axis reflections in an
   ORTHOGONAL lattice: shape1 = mirror-y(shape0), shape2 = rot180(shape0),
   shape3 = mirror-x(shape0), each with residual 0.0 (vs 0.08-0.28 for any
   other pairing).  So a cell (i,j,c) IS an anchor point on the doubled
   integer grid:  z = 2*(i,j) + p(c),  p a bijection classes -> parities.
   Centroid algebra pins p(c1).x = 1, p(c3).y = 1, and parity-bijectivity
   (each unit cell holds one anchor of each parity) leaves exactly THREE
   candidate parity maps.

2. The walk therefore needs NO free per-class offset table and NO free
   kappa:  z = sum_k w_k * g(d_k, s_k)  with w_k = sx^(5-k) per axis, and
   the leaf parity couples offsets to transitions:
       g(d,s) == chi(T(s,d))  (mod 2, componentwise)
   where chi: states -> parities is a bijection (the pentagon reflection
   state IS the anchor parity, up to the gauge V's parity).

3. Per-part parity COUNT filter: the multiset of chi(final state) over a
   part's walks must equal the multiset of target parities — a table-free
   config killer no earlier track could express (classes were free there).

Model family:
    state s in Z2xZ2;  T(s,d) = s XOR h[sigma(s,d)]  where sigma optionally
    reverses the digit (d -> 3-d) when a state predicate holds (the classic
    Hilbert "reflected traversal reverses child order", which is NOT a
    group-translation automaton and was outside Tracks A-E).
    g(0, s) = 0 for s in the digit-0 orbit from the root state (the S=0
    chain nests at the quintant corner at every level).
    Per-axis level scale sx, sy in {+2, -2} (the parent lattice is observed
    180-degree rotated, which +/-2 covers without enlarging the state).

Usage:
  python3 tools/lattice/solve_anchor.py selftest
  python3 tools/lattice/solve_anchor.py sweep [nworkers] [per_cfg_sec]
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

GT = json.load(open("tools/lattice/groundtruth.json"))
PROGRESS = os.environ.get("ANCHOR_PROGRESS", "tools/lattice/anchor_progress.log")
HITS = "tools/lattice/anchor_hits.jsonl"

PREFIX = (3, 0, 0)
NSUF = 6

PARITY_MAPS = [
    {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)},
    {0: (0, 0), 1: (1, 0), 2: (0, 1), 3: (1, 1)},
    {0: (0, 0), 1: (1, 1), 2: (1, 0), 3: (0, 1)},
]
PARITIES = [(0, 0), (1, 0), (0, 1), (1, 1)]
CHIS = [dict(zip(range(4), perm)) for perm in itertools.permutations(PARITIES)]
PREDS = {
    "none": lambda s: 0,
    "b0": lambda s: s & 1,
    "b1": lambda s: (s >> 1) & 1,
    "xor": lambda s: (s ^ (s >> 1)) & 1,
    "and": lambda s: (s & (s >> 1)) & 1,
    "or": lambda s: ((s | (s >> 1)) & 1),
}
SCALES = [(2, 2), (-2, -2), (2, -2), (-2, 2)]


def digits_of(S, n=9):
    return [(S >> (2 * (n - 1 - k))) & 3 for k in range(n)]


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


def load_corpus(gt):
    parts = {}
    for pname, v in gt["parts"].items():
        S_list = sorted(v["S"])
        parts[pname] = {
            "suffixes": [tuple(digits_of(S)[3:]) for S in S_list],
            "cells": [tuple(c) for c in v["cells"]],
        }
    anchors = [(a["part"], tuple(digits_of(a["S"])[3:]), tuple(a["cell"]))
               for a in gt["anchors"]]
    return parts, anchors


def targets_for(parts, pmap):
    out = {}
    for pname, v in parts.items():
        ts = set()
        for (i, j, c) in v["cells"]:
            px, py = pmap[c]
            ts.add((2 * i + px, 2 * j + py))
        assert len(ts) == len(v["cells"])
        out[pname] = ts
    return out


def make_T(h, pred):
    T = [[0] * 4 for _ in range(4)]
    for s in range(4):
        for d in range(4):
            eff = 3 - d if pred(s) else d
            T[s][d] = s ^ h[eff]
    return T


def orbit0(T, s_root):
    seen = []
    s = s_root
    while s not in seen:
        seen.append(s)
        s = T[s][0]
    return set(seen)


def solve_config(cfg, parts, anchors, targets3, deadline):
    """cfg = (pm_idx, chi_idx, h, pred_name, s_root, scale_idx)."""
    pm_idx, chi_idx, h, pred_name, s_root, scale_idx = cfg
    chi = CHIS[chi_idx]
    T = make_T(h, PREDS[pred_name])
    targets = targets3[pm_idx]
    sx, sy = SCALES[scale_idx]
    WX = [sx ** (NSUF - 1 - k) for k in range(NSUF)]
    WY = [sy ** (NSUF - 1 - k) for k in range(NSUF)]

    orb = orbit0(T, s_root)
    for s in orb:
        if chi[T[s][0]] != (0, 0):
            return None

    s_pref = s_root
    for d in PREFIX:
        s_pref = T[s_pref][d]

    # walk chains: (part, [(d, s)] x 6, final_state)
    walks = []
    for pname, v in parts.items():
        for suf in v["suffixes"]:
            s = s_pref
            steps = []
            for d in suf:
                steps.append((d, s))
                s = T[s][d]
            walks.append((pname, steps, s))

    # parity count filter
    for pname, v in parts.items():
        want = Counter((t[0] & 1, t[1] & 1) for t in targets[pname])
        got = Counter(chi[fs] for pn, _, fs in walks if pn == pname)
        if want != got:
            return None

    # variables = reachable (d,s) pairs minus corner-pinned zeros
    pinned = {(0, s) for s in orb}
    use = Counter()
    for _, steps, _ in walks:
        for k in steps:
            if k not in pinned:
                use[k] += 1

    # eye_left's variables first (determines the gauge V early)
    el_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_left")
    el_vars = []
    for k in walks[el_i][1]:
        if k not in pinned and k not in el_vars:
            el_vars.append(k)
    order = el_vars + [k for k, _ in use.most_common() if k not in el_vars]
    vidx = {k: n for n, k in enumerate(order)}
    nvar = len(order)
    nel = len(el_vars)

    cand = []
    for (d, s) in order:
        pxp, pyp = chi[T[s][d]]
        cand.append((
            [v for v in range(-2, 3) if (v & 1) == pxp],
            [v for v in range(-2, 3) if (v & 1) == pyp],
        ))

    nw = len(walks)
    cox = [[0] * nvar for _ in range(nw)]
    coy = [[0] * nvar for _ in range(nw)]
    for n, (_, steps, _) in enumerate(walks):
        for k, key in enumerate(steps):
            if key in pinned:
                continue
            i = vidx[key]
            cox[n][i] += WX[k]
            coy[n][i] += WY[k]

    # per-walk suffix slack: max |remaining contribution| from vars >= i
    sufx = [[0] * (nvar + 1) for _ in range(nw)]
    sufy = [[0] * (nvar + 1) for _ in range(nw)]
    for n in range(nw):
        for i in range(nvar - 1, -1, -1):
            sufx[n][i] = sufx[n][i + 1] + 2 * abs(cox[n][i])
            sufy[n][i] = sufy[n][i + 1] + 2 * abs(coy[n][i])

    # incremental partial sums
    zx = [0] * nw
    zy = [0] * nw
    tlist = {p: list(targets[p]) for p in targets}
    el_t = next(iter(targets["eye_left"]))

    wpart = [w[0] for w in walks]
    sol = [None]
    t_end = deadline

    def feasible(depth, Vx, Vy, strict):
        """Determined walks hit distinct targets; partial walks box-feasible."""
        used = {}
        for n in range(nw):
            smx, smy = sufx[n][depth], sufy[n][depth]
            p = wpart[n]
            ax, ay = zx[n] + Vx, zy[n] + Vy
            if smx == 0 and smy == 0:
                pt = (ax, ay)
                if pt not in targets[p]:
                    return False
                key = (p, pt)
                if key in used:
                    return False
                used[key] = n
            elif strict:
                ok = False
                for (tx, ty) in tlist[p]:
                    if abs(tx - ax) <= smx and abs(ty - ay) <= smy:
                        ok = True
                        break
                if not ok:
                    return False
        return True

    def rec(i, Vx, Vy):
        if sol[0] is not None or time.time() > t_end:
            return
        if i == nvar:
            if feasible(i, Vx, Vy, False):
                sol[0] = {
                    "g": {f"{d},{s}": (0, 0) for (d, s) in pinned}
                    | {f"{order[j][0]},{order[j][1]}": (gx[j], gy[j])
                       for j in range(nvar)},
                    "V": (Vx, Vy),
                }
            return
        xs, ys = cand[i]
        for vx in xs:
            for vy in ys:
                gx[i], gy[i] = vx, vy
                for n in range(nw):
                    zx[n] += cox[n][i] * vx
                    zy[n] += coy[n][i] * vy
                nVx, nVy = Vx, Vy
                ok = True
                if i + 1 == nel and Vx is None:
                    nVx, nVy = el_t[0] - zx[el_i], el_t[1] - zy[el_i]
                if nVx is not None:
                    ok = feasible(i + 1, nVx, nVy, True)
                if ok:
                    rec(i + 1, nVx, nVy)
                for n in range(nw):
                    zx[n] -= cox[n][i] * vx
                    zy[n] -= coy[n][i] * vy
                if sol[0] is not None:
                    return

    gx = [0] * nvar
    gy = [0] * nvar
    if nel == 0:
        rec(0, el_t[0], el_t[1])
    else:
        rec(0, None, None)
    if sol[0] is None and time.time() > t_end:
        return "TIMEOUT"
    return sol[0]


def run_config(args):
    cfg, per_cfg = args
    r = solve_config(cfg, _PARTS, _ANCHORS, _TARGETS3, time.time() + per_cfg)
    return cfg, r


_PARTS, _ANCHORS = load_corpus(GT)
_TARGETS3 = [targets_for(_PARTS, pm) for pm in PARITY_MAPS]


def sweep(nworkers, per_cfg=30.0):
    cfgs = []
    for pm_idx in range(len(PARITY_MAPS)):
        for chi_idx in range(len(CHIS)):
            for h in itertools.product(range(4), repeat=4):
                for pn in PREDS:
                    for s_root in range(4):
                        for sc in range(len(SCALES)):
                            cfgs.append((pm_idx, chi_idx, h, pn, s_root, sc))
    log_progress(f"anchor sweep start configs={len(cfgs)} per_cfg={per_cfg}")
    t0 = time.time()
    nhit = ntimeout = 0
    with mp.Pool(nworkers) as pool:
        for n, (cfg, r) in enumerate(
            pool.imap_unordered(run_config, ((c, per_cfg) for c in cfgs),
                                chunksize=256)
        ):
            if r == "TIMEOUT":
                ntimeout += 1
                log_progress(f"TIMEOUT cfg={cfg}")
            elif r is not None:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps({"cfg": list(cfg), "sol": r}) + "\n")
                log_progress(f"HIT cfg={cfg}")
            if (n + 1) % 50000 == 0:
                log_progress(f"{n+1}/{len(cfgs)} hits={nhit} "
                             f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")
    log_progress(f"anchor sweep done {len(cfgs)} hits={nhit} "
                 f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")


def selftest():
    import random

    rng = random.Random(11)
    pm_idx = 0
    pm = PARITY_MAPS[pm_idx]
    # corner consistency requires the digit-0 chain to stabilize on a fixed
    # state mapped to parity (0,0); h[0]=0 with pred 'b0' makes every even
    # state a digit-0 fixed point
    h = (0, 3, 1, 2)
    pred = "b0"
    s_root = 0
    sc = 0
    sx, sy = SCALES[sc]
    T = make_T(h, PREDS[pred])
    orb = orbit0(T, s_root)
    chi_idx = next(ci for ci, c in enumerate(CHIS)
                   if all(c[T[s][0]] == (0, 0) for s in orb))
    chi = CHIS[chi_idx]
    g = {}
    for d in range(4):
        for s in range(4):
            if d == 0 and s in orb:
                g[(d, s)] = (0, 0)
                continue
            pxp, pyp = chi[T[s][d]]
            g[(d, s)] = (rng.choice([v for v in range(-2, 3) if (v & 1) == pxp]),
                         rng.choice([v for v in range(-2, 3) if (v & 1) == pyp]))

    WX = [sx ** (NSUF - 1 - k) for k in range(NSUF)]
    WY = [sy ** (NSUF - 1 - k) for k in range(NSUF)]

    def walk(suf):
        s = s_root
        for d in PREFIX:
            s = T[s][d]
        zx = zy = 0
        for k, d in enumerate(suf):
            zx += WX[k] * g[(d, s)][0]
            zy += WY[k] * g[(d, s)][1]
            s = T[s][d]
        return zx, zy

    inv_pm = {v: k for k, v in pm.items()}

    def synth():
        fake = {"parts": {}, "anchors": []}
        for pname, v in GT["parts"].items():
            cells = []
            for S in sorted(v["S"]):
                suf = tuple(digits_of(S)[3:])
                zxv, zyv = walk(suf)
                tx, ty = zxv + 10, zyv + 20
                c = inv_pm[(tx & 1, ty & 1)]
                cells.append([(tx - (tx & 1)) // 2, (ty - (ty & 1)) // 2, c])
            if len({tuple(c) for c in cells}) != len(cells):
                return None
            fake["parts"][pname] = {"S": sorted(v["S"]), "cells": cells}
        return fake

    for seed in range(11, 200):
        rng = random.Random(seed)
        for d in range(4):
            for s in range(4):
                if d == 0 and s in orb:
                    continue
                pxp, pyp = chi[T[s][d]]
                g[(d, s)] = (
                    rng.choice([v for v in range(-2, 3) if (v & 1) == pxp]),
                    rng.choice([v for v in range(-2, 3) if (v & 1) == pyp]))
        fake = synth()
        if fake is not None:
            break
    assert fake is not None, "no injective plant found"
    for a in GT["anchors"]:
        p = a["part"]
        fake["anchors"].append(
            {"part": p, "S": a["S"], "cell": fake["parts"][p]["cells"][0]})

    parts2, anchors2 = load_corpus(fake)
    targets3 = [targets_for(parts2, p) for p in PARITY_MAPS]
    cfg = (pm_idx, chi_idx, h, pred, s_root, sc)
    t0 = time.time()
    r = solve_config(cfg, parts2, anchors2, targets3, time.time() + 120)
    assert r not in (None, "TIMEOUT"), f"selftest: planted config not found: {r}"
    gg = {k: tuple(v) for k, v in r["g"].items()}
    want = {f"{d},{s}": g[(d, s)] for d in range(4) for s in range(4)
            if not (d == 0 and s in orb)}
    mism = {k: (gg.get(k), want[k]) for k in want
            if k in gg and gg[k] != want[k]}
    print(f"selftest PASS in {time.time()-t0:.1f}s V={r['V']} "
          f"(table mismatches vs plant: {len(mism)})")
    cfg_bad = (pm_idx, chi_idx, (h[0] ^ 2, h[1], h[2], h[3]), pred, s_root, sc)
    r2 = solve_config(cfg_bad, parts2, anchors2, targets3, time.time() + 120)
    print("selftest perturbed-h:", "rejected OK" if r2 is None else f"UNEXPECTED {r2}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else max(1, (os.cpu_count() or 8) - 8)
        pc = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
        sweep(nw, pc)
