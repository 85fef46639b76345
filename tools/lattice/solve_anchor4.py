"""Track G v4 — 16-state anchor walk: visible Z2xZ2 flips x hidden Z4.

Geometric motivation (round 4, tested in tests/test_lattice_geometry.py and
this session's quintant-frame computation): in lattice coordinates the
quintant is an EXACT half-square — lattice x-axis parallel to the face edge,
tan(36 deg) * tan(54 deg) = 1, legs on the +-45-degree diagonals, base
2^res anchors wide.  The natural space-filling curves on a half-square are
BISECTION (Sierpinski–Knopp type) curves whose per-level linear parts are
+-2*rot90 compositions: their powers cycle with period FOUR, so absorbing
them into per-state offset tables needs a hidden Z4 level/rotation state.
v2 (4 states) and v3 (hidden Z2) provably cannot express that; round 2/3's
bisection sweeps used the since-refuted per-class leaf model.  This track
re-sweeps bisection-shaped automata under the anchor-parity leaf model.

States: s = f | (r << 2), f in 0..3 visible flips (couple to anchor parity
via pi as in v3), r in 0..3 hidden.  Group laws:
  z2z4     — abelian product (pure hidden rotation counter);
  swapflip — rotation swaps the flip components of later factors
             ((f,r)*(f2,r2) = (f ^ swap^r(f2), r+r2));
  reflrot  — additionally mirror-parity of f reverses rotation direction
             (the D8-on-the-square structure).
Transitions s' = s * h[sigma(s,d)], h in G^4, digit reversal by predicate.

Usage:
  python3 tools/lattice/solve_anchor4.py selftest
  python3 tools/lattice/solve_anchor4.py sweep [nworkers] [per_task] [group]
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import solve_anchor2 as v2  # noqa: E402

PARITY_MAPS = v2.PARITY_MAPS
PARITIES = v2.PARITIES
PIDX = v2.PIDX
PREFIX = v2.PREFIX
PROGRESS = os.environ.get("ANCHOR4_PROGRESS", "tools/lattice/anchor4_progress.log")
HITS = "tools/lattice/anchor4_hits.jsonl"

_PARTS = v2._PARTS
_TARGETS3 = v2._TARGETS3

NSTATE = 16


def _swap(f):
    return ((f & 1) << 1) | (f >> 1)


def mul_z2z4(a, b):
    return (a & 3) ^ (b & 3) | ((((a >> 2) + (b >> 2)) & 3) << 2)


def mul_swapflip(a, b):
    f, r = a & 3, a >> 2
    f2, r2 = b & 3, b >> 2
    if r & 1:
        f2 = _swap(f2)
    return (f ^ f2) | ((((r + r2) & 3)) << 2)


def mul_reflrot(a, b):
    f, r = a & 3, a >> 2
    f2, r2 = b & 3, b >> 2
    if r & 1:
        f2 = _swap(f2)
    par = (f ^ (f >> 1)) & 1  # mirror parity reverses rotation direction
    rr = (r + (r2 if par == 0 else (-r2) % 4)) & 3
    return (f ^ f2) | (rr << 2)


GROUPS = {"z2z4": mul_z2z4, "swapflip": mul_swapflip, "reflrot": mul_reflrot}

PREDS16 = {
    "none": lambda s: 0,
    "b0": lambda s: s & 1,
    "b1": lambda s: (s >> 1) & 1,
    "x01": lambda s: (s ^ (s >> 1)) & 1,
    "r0": lambda s: (s >> 2) & 1,
    "r1": lambda s: (s >> 3) & 1,
}


def make_T16(mul, h, pred):
    return [[mul(s, h[3 - d if pred(s) else d]) for d in range(4)]
            for s in range(NSTATE)]


def orbit0(T, s_root):
    seen = []
    s = s_root
    while s not in seen:
        seen.append(s)
        s = T[s][0]
    return seen


def solve_task(task, per_task):
    gname, h, pred_name, s_root = task
    mul = GROUPS[gname]
    T = make_T16(mul, h, PREDS16[pred_name])
    deadline = time.time() + per_task
    orb = orbit0(T, s_root)

    # corner chain: post-root digit-0 states must share ONE flip value
    cflips = set()
    s = T[s_root][0]
    for _ in range(20):
        cflips.add(s & 3)
        s = T[s][0]
    if v2.NOPIN:
        corner_flip = None
    elif len(cflips) != 1:
        return task, [], False
    else:
        corner_flip = next(iter(cflips))

    s_pref = s_root
    for d in PREFIX:
        s_pref = T[s_pref][d]

    parts = _PARTS
    pnames = list(parts)
    walks = []
    for pname in pnames:
        for suf in parts[pname]["suffixes"]:
            s = s_pref
            steps = []
            for d in suf:
                steps.append((d, s))
                s = T[s][d]
            walks.append((pname, steps, s))
    el_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_left")

    gotF = []
    for pname in pnames:
        g = [0, 0, 0, 0]
        for pn, _, fs in walks:
            if pn == pname:
                g[fs & 3] += 1
        gotF.append(g)

    sols = []
    for pm_idx in range(len(PARITY_MAPS)):
        targets = _TARGETS3[pm_idx]
        for Vp in range(4):
            vpx, vpy = Vp & 1, (Vp >> 1) & 1
            wants = []
            for pname in pnames:
                w = [0, 0, 0, 0]
                for (tx, ty) in targets[pname]:
                    w[PIDX[((tx ^ vpx) & 1, (ty ^ vpy) & 1)]] += 1
                wants.append(w)
            import solve_anchor3 as v3
            for pi in v3.feasible_pis(gotF, wants):
                if corner_flip is not None and pi[PIDX[(0, 0)]] != corner_flip:
                    continue
                A = tuple(frozenset(s for s in range(NSTATE)
                                    if (s & 3) == pi[q])
                          for q in range(4))
                if time.time() > deadline:
                    return task, sols, True
                r = v2.dfs_tables(T, walks, el_i, targets, A, Vp, 0, orb,
                                  deadline)
                if r is not None:
                    sols.append({"task": [gname, h, pred_name, s_root],
                                 "pm": pm_idx, "Vp": Vp, "pi": pi, **r})
    return task, sols, False


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


def run_task(args):
    task, per_task = args
    return solve_task(task, per_task)


def sweep(nworkers, per_task, only_group=None):
    tasks = []
    for gname in GROUPS:
        if only_group and gname != only_group:
            continue
        for h in itertools.product(range(NSTATE), repeat=4):
            for pn in PREDS16:
                for sr in range(NSTATE):
                    tasks.append((gname, h, pn, sr))
    log_progress(f"anchor4 sweep start group={only_group or 'all'} "
                 f"tasks={len(tasks)} per_task={per_task}")
    t0 = time.time()
    nhit = ntimeout = 0
    with mp.Pool(nworkers) as pool:
        for n, (task, sols, timed_out) in enumerate(
            pool.imap_unordered(run_task,
                                ((t, per_task) for t in tasks),
                                chunksize=256)
        ):
            if timed_out:
                ntimeout += 1
                log_progress(f"TIMEOUT task={task}")
            for s in sols:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps(s, default=str) + "\n")
                log_progress(f"HIT task={task}")
            if (n + 1) % 200000 == 0:
                log_progress(f"{n+1}/{len(tasks)} hits={nhit} "
                             f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")
    log_progress(f"anchor4 sweep done {len(tasks)} hits={nhit} "
                 f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")


def selftest():
    """Plant a swapflip automaton with a LIVE hidden Z4 (rotation parity
    affects flips of later digits) and recover it; verify v3's 8-state
    family cannot express it."""
    import random

    gname, pred, s_root = "swapflip", "none", 0
    mul = GROUPS[gname]
    # h rotating hidden counter and toggling flips: digit1 -> r+1, f^1
    h = (0, (1 << 2) | 1, (2 << 2) | 2, 3)
    T = make_T16(mul, h, PREDS16[pred])
    orb = orbit0(T, s_root)
    chain = []
    s = T[s_root][0]
    for _ in range(20):
        chain.append(s & 3)
        s = T[s][0]
    assert len(set(chain)) == 1, chain
    corner_flip = chain[0]
    pi = {PIDX[(0, 0)]: corner_flip}
    rest = [f for f in range(4) if f != corner_flip]
    pi[PIDX[(1, 0)]] = rest[0]
    pi[PIDX[(0, 1)]] = rest[1]
    pi[PIDX[(1, 1)]] = rest[2]

    pm = PARITY_MAPS[0]
    inv_pm = {v: k for k, v in pm.items()}
    WX = [2 ** (v2.NSUF - 1 - k) for k in range(v2.NSUF)]

    def digits_of(S, n=9):
        return [(S >> (2 * (n - 1 - k))) & 3 for k in range(n)]

    g = {}
    fake = None
    for seed in range(3, 500):
        rng = random.Random(seed)
        for d in range(4):
            for s in range(NSTATE):
                if d == 0 and s in orb:
                    g[(d, s)] = (0, 0)
                    continue
                f2 = T[s][d] & 3
                q = next(qq for qq, ff in pi.items() if ff == f2)
                pxp, pyp = PARITIES[q]
                g[(d, s)] = (
                    rng.choice([x for x in range(-2, 3) if (x & 1) == pxp]),
                    rng.choice([y for y in range(-2, 3) if (y & 1) == pyp]))

        def walk(suf):
            s = s_root
            for d in PREFIX:
                s = T[s][d]
            zx = zy = 0
            for k, d in enumerate(suf):
                zx += WX[k] * g[(d, s)][0]
                zy += WX[k] * g[(d, s)][1]
                s = T[s][d]
            return zx, zy

        trial = {"parts": {}}
        bad = False
        for pname, vv in v2.GT["parts"].items():
            cells = []
            for S in sorted(vv["S"]):
                zxv, zyv = walk(tuple(digits_of(S)[3:]))
                tx, ty = zxv + 6, zyv + 10
                c = inv_pm[(tx & 1, ty & 1)]
                cells.append([(tx - (tx & 1)) // 2, (ty - (ty & 1)) // 2, c])
            if len({tuple(c) for c in cells}) != len(cells):
                bad = True
                break
            trial["parts"][pname] = {"S": sorted(vv["S"]), "cells": cells}
        if not bad:
            fake = trial
            break
    assert fake is not None

    global _PARTS, _TARGETS3
    old = _PARTS, _TARGETS3, v2._PARTS, v2._TARGETS3
    _PARTS = v2.load_corpus(fake)
    _TARGETS3 = [v2.targets_for(_PARTS, p) for p in PARITY_MAPS]
    v2._PARTS, v2._TARGETS3 = _PARTS, _TARGETS3
    import solve_anchor3 as v3
    old3 = v3._PARTS, v3._TARGETS3
    v3._PARTS, v3._TARGETS3 = _PARTS, _TARGETS3
    try:
        t0 = time.time()
        task = (gname, h, pred, s_root)
        _, sols, to = solve_task(task, 600)
        assert sols, "selftest v4: planted 16-state config not recovered"
        print(f"selftest v4 PASS in {time.time()-t0:.1f}s ({len(sols)} sols)")
        # cross-check: hidden-Z4 plant must be outside v3's 8-state family
        bad_hits = 0
        t0 = time.time()
        for hh in itertools.product(range(8), repeat=2):
            _, s3, _ = v3.solve_task(("z23", (0, hh[0], hh[1], 3), "none", 0),
                                     2, "func")
            bad_hits += len(s3)
        print(f"v3 spot-check on v4 plant: {bad_hits} hits "
              f"({time.time()-t0:.1f}s, expected 0)")
    finally:
        _PARTS, _TARGETS3, v2._PARTS, v2._TARGETS3 = old
        v3._PARTS, v3._TARGETS3 = old3


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else max(1, (os.cpu_count() or 8) - 8)
        pt = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
        grp = sys.argv[4] if len(sys.argv) > 4 else None
        sweep(nw, pt, grp)
