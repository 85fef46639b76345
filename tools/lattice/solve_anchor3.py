"""Track G v3 — 8-state anchor walk: visible Z2xZ2 flips x one HIDDEN bit.

Motivation: the classic square Hilbert walk carries a TRANSPOSE state that
never shows in the drawn cell (the d2xy 'rotate' step swaps x/y); the
pentagon corpus shows exactly 4 reflection classes, so any extra walk state
must be pentagon-invisible.  v3 sweeps 8-state automata whose flip part is
visible (couples to anchor parity as in v2) and whose hidden bit is free:

  groups: Z2^3 (xor), D4 acting on flips by component swap (left and right
          translation actions);
  transitions: s' = s * h[sigma(s, d)], h in G^4, with optional digit
          reversal by a state predicate (8 predicates over the 3 bits);
  scale: fixed (2, 2) — a hidden level-parity bit provably absorbs all
          diag(+-2) and swap-matrix level scalings (g is free per state,
          so per-level sign/axis alternation folds into the odd-level
          entries), which is why v2 swept scales but v3 need not;
  leaf: A(q) = {s : flip(s) == pi(q)} for pi in (parities -> flip values),
          or positional (A = everything).

Filters before any table DFS: corner chain flip-constancy, per-part exact
count partition (function-pi makes Hall collapse to sum equality).

Usage:
  python3 tools/lattice/solve_anchor3.py selftest
  python3 tools/lattice/solve_anchor3.py sweep MODE [nworkers] [per_task_sec]
  MODE in {func, pos}
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

import solve_anchor2 as v2  # noqa: E402

GT = v2.GT
PARITY_MAPS = v2.PARITY_MAPS
PARITIES = v2.PARITIES
PIDX = v2.PIDX
PREFIX = v2.PREFIX
PROGRESS = os.environ.get("ANCHOR3_PROGRESS", "tools/lattice/anchor3_progress.log")
HITS = "tools/lattice/anchor3_hits.jsonl"

_PARTS = v2._PARTS
_TARGETS3 = v2._TARGETS3

# ---------------------------------------------------------------- groups
# state encoding: s = f | (t << 2), f in 0..3 (flip bits), t in {0,1}


def mul_z23(a, b):
    return a ^ b


def mul_d4r(a, b):
    """right action s*h where h's hidden bit transposes s's flips first?
    D4 = Z2^2 (flips) semidirect Z2 (swap): (f, t) * (f2, t2) =
    (f xor sw(f2, t), t xor t2) with sw swapping the two flip bits."""
    f, t = a & 3, a >> 2
    f2, t2 = b & 3, b >> 2
    if t:
        f2 = ((f2 & 1) << 1) | (f2 >> 1)
    return (f ^ f2) | ((t ^ t2) << 2)


def mul_d4l(a, b):
    return mul_d4r(b, a)


GROUPS = {"z23": mul_z23, "d4r": mul_d4r, "d4l": mul_d4l}

PREDS8 = {
    "none": lambda s: 0,
    "b0": lambda s: s & 1,
    "b1": lambda s: (s >> 1) & 1,
    "bt": lambda s: (s >> 2) & 1,
    "x01": lambda s: (s ^ (s >> 1)) & 1,
    "x0t": lambda s: (s ^ (s >> 2)) & 1,
    "x1t": lambda s: ((s >> 1) ^ (s >> 2)) & 1,
    "x01t": lambda s: (s ^ (s >> 1) ^ (s >> 2)) & 1,
}


def make_T8(mul, h, pred):
    return [[mul(s, h[3 - d if pred(s) else d]) for d in range(4)]
            for s in range(8)]


def orbit0(T, s_root):
    seen = []
    s = s_root
    while s not in seen:
        seen.append(s)
        s = T[s][0]
    return seen


def feasible_pis(gotF, wants):
    """All pi: parity(0..3) -> flip(0..3) with, for every part,
    sum(want[q] for pi(q)==f) == gotF[part][f].  DFS over 4 choices^4."""
    out = []
    nparts = len(gotF)

    def rec(q, acc):
        if q == 4:
            for p in range(nparts):
                for f in range(4):
                    if acc[p][f] != gotF[p][f]:
                        return
            out.append(tuple(pi))
            return
        for f in range(4):
            pi[q] = f
            for p in range(nparts):
                acc[p][f] += wants[p][q]
            bad = any(acc[p][f] > gotF[p][f] for p in range(nparts))
            if not bad:
                rec(q + 1, acc)
            for p in range(nparts):
                acc[p][f] -= wants[p][q]
        pi[q] = -1

    pi = [-1] * 4
    rec(0, [[0] * 4 for _ in range(nparts)])
    return out


def solve_task(task, per_task, mode):
    gname, h, pred_name, s_root = task
    mul = GROUPS[gname]
    T = make_T8(mul, h, PREDS8[pred_name])
    deadline = time.time() + per_task
    orb = orbit0(T, s_root)

    # corner chain: flips of post-root digit-0 chain must be constant
    corner_states = []
    s = T[s_root][0]
    for _ in range(12):
        corner_states.append(s)
        s = T[s][0]
    cflips = {cs & 3 for cs in corner_states}
    if v2.NOPIN:
        corner_flip = None
    else:
        if mode == "func" and len(cflips) != 1:
            return task, [], False
        corner_flip = next(iter(cflips)) if len(cflips) == 1 else None

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
    timed_out = False
    for pm_idx in range(len(PARITY_MAPS)):
        targets = _TARGETS3[pm_idx]
        if mode == "pos":
            A = tuple(frozenset(range(8)) for _ in range(4))
            for Vp in range(4):
                if time.time() > deadline:
                    return task, sols, True
                r = v2.dfs_tables(T, walks, el_i, targets, A, Vp, 0, orb,
                                  deadline)
                if r is not None:
                    sols.append({"task": [gname, h, pred_name, s_root],
                                 "pm": pm_idx, "Vp": Vp, "mode": mode, **r})
            continue
        for Vp in range(4):
            vpx, vpy = Vp & 1, (Vp >> 1) & 1
            wants = []
            for pname in pnames:
                w = [0, 0, 0, 0]
                for (tx, ty) in targets[pname]:
                    w[PIDX[((tx ^ vpx) & 1, (ty ^ vpy) & 1)]] += 1
                wants.append(w)
            for pi in feasible_pis(gotF, wants):
                if corner_flip is not None and pi[PIDX[(0, 0)]] != corner_flip:
                    continue
                A = tuple(frozenset(s for s in range(8) if (s & 3) == pi[q])
                          for q in range(4))
                if time.time() > deadline:
                    return task, sols, True
                r = v2.dfs_tables(T, walks, el_i, targets, A, Vp, 0, orb,
                                  deadline)
                if r is not None:
                    sols.append({"task": [gname, h, pred_name, s_root],
                                 "pm": pm_idx, "Vp": Vp, "pi": pi,
                                 "mode": mode, **r})
    return task, sols, timed_out


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


def run_task(args):
    task, per_task, mode = args
    return solve_task(task, per_task, mode)


def sweep(mode, nworkers, per_task):
    tasks = []
    for gname in GROUPS:
        for h in itertools.product(range(8), repeat=4):
            for pn in PREDS8:
                for sr in range(8):
                    tasks.append((gname, h, pn, sr))
    log_progress(f"anchor3 sweep start mode={mode} tasks={len(tasks)} "
                 f"per_task={per_task}")
    t0 = time.time()
    nhit = ntimeout = 0
    with mp.Pool(nworkers) as pool:
        for n, (task, sols, timed_out) in enumerate(
            pool.imap_unordered(run_task,
                                ((t, per_task, mode) for t in tasks),
                                chunksize=64)
        ):
            if timed_out:
                ntimeout += 1
                log_progress(f"TIMEOUT task={task}")
            for s in sols:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps(s, default=str) + "\n")
                log_progress(f"HIT task={task}")
            if (n + 1) % 20000 == 0:
                log_progress(f"{n+1}/{len(tasks)} hits={nhit} "
                             f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")
    log_progress(f"anchor3 sweep done mode={mode} {len(tasks)} hits={nhit} "
                 f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")


def selftest():
    """Plant a D4-right automaton with a live hidden transpose bit and a
    digit-reversal skew — inexpressible in v2's 4-state family — and
    recover it through the full v3 task path."""
    import random

    gname, pred, s_root = "d4r", "bt", 0
    mul = GROUPS[gname]
    # h with hidden-bit activity: digits 1,2 toggle transpose
    h = (0, 4 | 1, 4 | 2, 3)
    T = make_T8(mul, h, PREDS8[pred])
    orb = orbit0(T, s_root)
    cflips = {(T[s][0] if False else s) & 3 for s in orb}
    # ensure corner flip constancy for func mode
    chain = []
    s = T[s_root][0]
    for _ in range(12):
        chain.append(s & 3)
        s = T[s][0]
    assert len(set(chain)) == 1, f"plant corner chain not constant: {chain}"
    pi = {}
    pm = PARITY_MAPS[0]
    # pi: parity -> flip; corner parity (0,0) must map to the chain flip
    pi[PIDX[(0, 0)]] = chain[0]
    rest_flips = [f for f in range(4) if f != chain[0]]
    pi[PIDX[(1, 0)]] = rest_flips[0]
    pi[PIDX[(0, 1)]] = rest_flips[1]
    pi[PIDX[(1, 1)]] = rest_flips[2]

    WX = [2 ** (v2.NSUF - 1 - k) for k in range(v2.NSUF)]

    def digits_of(S, n=9):
        return [(S >> (2 * (n - 1 - k))) & 3 for k in range(n)]

    inv_pm = {v: k for k, v in pm.items()}
    g = {}
    fake = None
    for seed in range(3, 400):
        rng = random.Random(seed)
        for d in range(4):
            for s in range(8):
                if d == 0 and s in orb:
                    g[(d, s)] = (0, 0)
                    continue
                q = next(qq for qq, ff in pi.items() if ff == (T[s][d] & 3))
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
        for pname, vv in GT["parts"].items():
            cells = []
            for S in sorted(vv["S"]):
                zxv, zyv = walk(tuple(digits_of(S)[3:]))
                tx, ty = zxv + 4, zyv + 8
                c = inv_pm[(tx & 1, ty & 1)]
                cells.append([(tx - (tx & 1)) // 2, (ty - (ty & 1)) // 2, c])
            if len({tuple(c) for c in cells}) != len(cells):
                bad = True
                break
            trial["parts"][pname] = {"S": sorted(vv["S"]), "cells": cells}
        if not bad:
            fake = trial
            break
    assert fake is not None, "no injective plant"

    global _PARTS, _TARGETS3
    old = _PARTS, _TARGETS3, v2._PARTS, v2._TARGETS3
    _PARTS = v2.load_corpus(fake)
    _TARGETS3 = [v2.targets_for(_PARTS, p) for p in PARITY_MAPS]
    try:
        t0 = time.time()
        task = (gname, h, pred, s_root)
        _, sols, to = solve_task(task, 600, "func")
        assert sols, "selftest v3: planted 8-state config not recovered"
        print(f"selftest v3 func PASS in {time.time()-t0:.1f}s "
              f"({len(sols)} sols, V={sols[0]['V']}, timeout={to})")
        # sanity: the 4-state v2 family must NOT reproduce this corpus
        # (hidden bit is live) — spot-check a few hundred v2 configs
        import solve_anchor2 as _v2
        bad_hits = 0
        for hh in itertools.product(range(4), repeat=4):
            s2, _ = _v2.solve_config((hh, "none", 0), _TARGETS3,
                                     time.time() + 2, "func")
            bad_hits += len(s2)
        print(f"v2-family cross-check on v3 plant: {bad_hits} hits "
              f"(expected 0 or tiny)")
    finally:
        _PARTS, _TARGETS3, v2._PARTS, v2._TARGETS3 = old


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        mode = sys.argv[2] if len(sys.argv) > 2 else "func"
        nw = int(sys.argv[3]) if len(sys.argv) > 3 else max(1, (os.cpu_count() or 8) - 8)
        pt = float(sys.argv[4]) if len(sys.argv) > 4 else 60.0
        sweep(mode, nw, pt)
