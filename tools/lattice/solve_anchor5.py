"""Track G+ — anchor walks with a SECOND, UNSCALED accumulator.

The recalled upstream Anchor carries TWO vectors (offset AND k).  If the
final position is offset + L*k where `offset` doubles per level but `k`
accumulates UNSCALED (e.g. a curve-reversal counter applied as a constant
correction), the map is an automaton with an unbounded counter — provably
outside every finite-state family swept in Tracks A-G:

    z = sum_k 2^(5-k) g(d_k, s_k)  +  sum_k e(d_k, s_k)

with g free in {-2..2}^2 and e free in a small box.  States: Z2^2
translations with digit-reversal skews (the v2 transition family).  Leaf:
anchor-parity targets; no parity pins (the unscaled sum breaks the mod-2
factorization, and pins are only filters — set matching enforces parity
implicitly).  Gauge-free difference-space DFS as v2.

Usage:
  python3 tools/lattice/solve_anchor5.py selftest
  python3 tools/lattice/solve_anchor5.py sweep [nworkers] [per_cfg] [ebox]

STATUS: EXPERIMENTAL / INCOMPLETE.  Without the anchor-parity candidate
pins (which the unscaled term breaks) the DFS branching is 25 per entry and
planted selftests do not finish in minutes.  Restoring pins with per-walk
lambda-parity corrections is the known fix; not yet built.
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

PARITY_MAPS = v2.PARITY_MAPS
PREFIX = v2.PREFIX
NSUF = v2.NSUF
PROGRESS = os.environ.get("ANCHOR5_PROGRESS", "tools/lattice/anchor5_progress.log")
HITS = "tools/lattice/anchor5_hits.jsonl"

_PARTS = v2._PARTS
_TARGETS3 = v2._TARGETS3

GBOX = list(range(-2, 3))
EBOX = list(range(-1, 2))


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


def dfs_two_tables(T, walks, el_i, targets, deadline, ebox):
    """Difference-space DFS over BOTH tables (g scaled, e unscaled)."""
    WX = [2 ** (NSUF - 1 - k) for k in range(NSUF)]

    use = Counter()
    for _, steps, _ in walks:
        for k in steps:
            use[k] += 1
    el_keys = []
    for k in walks[el_i][1]:
        if k not in el_keys:
            el_keys.append(k)
    keyorder = el_keys + [k for k, _ in use.most_common() if k not in el_keys]
    # heavy scaled g-vars first (tight box pruning), weak unscaled e-vars
    # last (by then most walks are near-determined)
    order = [("g", k) for k in keyorder] + [("e", k) for k in keyorder]
    vidx = {v: n for n, v in enumerate(order)}
    nvar = len(order)

    cand = []
    for (kind, _) in order:
        box = GBOX if kind == "g" else ebox
        cand.append([(vx, vy) for vx in box for vy in box])

    nw = len(walks)
    coeff = [[0] * nvar for _ in range(nw)]
    for n, (_, steps, _) in enumerate(walks):
        for k, key in enumerate(steps):
            coeff[n][vidx[("g", key)]] += WX[k]
            coeff[n][vidx[("e", key)]] += 1
    el_co = coeff[el_i]
    dco = [[coeff[n][i] - el_co[i] for i in range(nvar)] for n in range(nw)]

    dsuf = [[0] * (nvar + 1) for _ in range(nw)]
    for n in range(nw):
        for i in range(nvar - 1, -1, -1):
            box = GBOX if order[i][0] == "g" else ebox
            mx = max(abs(b) for b in box)
            dsuf[n][i] = dsuf[n][i + 1] + mx * abs(dco[n][i])

    aff = [[] for _ in range(nvar)]
    det_at = [[] for _ in range(nvar)]
    last_var = [None] * nw
    for n in range(nw):
        if n == el_i:
            continue
        for i in range(nvar):
            if dco[n][i]:
                aff[i].append(n)
                last_var[n] = i
        if last_var[n] is not None:
            det_at[last_var[n]].append(n)
    always = [n for n in range(nw) if n != el_i and last_var[n] is None]

    wpart = [w[0] for w in walks]
    el_t = next(iter(targets["eye_left"]))
    dtargets = {}
    for p, ts in targets.items():
        dtargets[p] = [(tx - el_t[0], ty - el_t[1]) for (tx, ty) in ts]
    dtsets = {p: set(vv) for p, vv in dtargets.items()}

    zx = [0] * nw
    zy = [0] * nw
    gx = [0] * nvar
    gy = [0] * nvar
    used = set()
    sol = [None]

    for n in always:
        if (0, 0) not in dtsets[wpart[n]]:
            return None

    def rec(i):
        if sol[0] is not None or time.time() > deadline:
            return
        if i == nvar:
            sol[0] = {"vars": {f"{order[j][0]}:{order[j][1]}": (gx[j], gy[j])
                               for j in range(nvar)}}
            return
        for vx, vy in cand[i]:
            gx[i], gy[i] = vx, vy
            for n in aff[i]:
                zx[n] += dco[n][i] * vx
                zy[n] += dco[n][i] * vy
            ok = True
            added = []
            for n in det_at[i]:
                p = wpart[n]
                dt = (zx[n], zy[n])
                if dt not in dtsets[p] or (p, dt) in used:
                    ok = False
                    break
                used.add((p, dt))
                added.append((p, dt))
            if ok:
                for n in aff[i]:
                    if last_var[n] == i:
                        continue
                    sm = dsuf[n][i + 1]
                    ax, ay = zx[n], zy[n]
                    hit = False
                    for (dtx, dty) in dtargets[wpart[n]]:
                        if abs(dtx - ax) <= sm and abs(dty - ay) <= sm:
                            hit = True
                            break
                    if not hit:
                        ok = False
                        break
            if ok:
                rec(i + 1)
            for kk in added:
                used.discard(kk)
            for n in aff[i]:
                zx[n] -= dco[n][i] * vx
                zy[n] -= dco[n][i] * vy
            if sol[0] is not None:
                return

    rec(0)
    return sol[0]


def solve_task(task, per_cfg, ebox, scalar_m=True):
    """scalar_m=True: instead of a free unscaled table e(d,s), use a single
    reversal-counter correction z += lambda * m(walk), m = number of steps
    whose skew predicate fired (an unbounded counter, still outside every
    finite-state family, but with only 2 unknowns)."""
    h, pred_name, s_root = task
    pred = v2.PREDS[pred_name]
    T = v2.make_T(h, pred)
    deadline = time.time() + per_cfg
    s_pref = s_root
    for d in PREFIX:
        s_pref = T[s_pref][d]
    walks = []
    mcounts = []
    for pname, v in _PARTS.items():
        for suf in v["suffixes"]:
            s = s_pref
            steps = []
            m = 0
            for d in suf:
                steps.append((d, s))
                m += 1 if pred(s) else 0
                s = T[s][d]
            walks.append((pname, steps, s))
            mcounts.append(m)
    el_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_left")
    sols = []
    timed_out = False
    for pm_idx in range(3):
        if time.time() > deadline:
            timed_out = True
            break
        if scalar_m:
            r = dfs_scalar_m(T, walks, mcounts, el_i, _TARGETS3[pm_idx],
                             deadline)
        else:
            r = dfs_two_tables(T, walks, el_i, _TARGETS3[pm_idx], deadline,
                               ebox)
        if r is not None:
            sols.append({"task": [h, pred_name, s_root], "pm": pm_idx, **r})
    return task, sols, timed_out


def dfs_scalar_m(T, walks, mcounts, el_i, targets, deadline):
    """v2-style single-table DFS with one extra variable pair (lambda):
    every walk carries the known coefficient m_n - m_el on lambda."""
    WX = [2 ** (NSUF - 1 - k) for k in range(NSUF)]
    use = Counter()
    for _, steps, _ in walks:
        for k in steps:
            use[k] += 1
    el_keys = []
    for k in walks[el_i][1]:
        if k not in el_keys:
            el_keys.append(k)
    keyorder = el_keys + [k for k, _ in use.most_common() if k not in el_keys]
    order = [("g", k) for k in keyorder] + [("lam", None)]
    vidx = {v: n for n, v in enumerate(order)}
    nvar = len(order)
    LBOX = list(range(-3, 4))
    cand = [[(vx, vy) for vx in GBOX for vy in GBOX]
            for _ in range(nvar - 1)] + [[(vx, vy) for vx in LBOX
                                          for vy in LBOX]]

    nw = len(walks)
    coeff = [[0] * nvar for _ in range(nw)]
    for n, (_, steps, _) in enumerate(walks):
        for k, key in enumerate(steps):
            coeff[n][vidx[("g", key)]] += WX[k]
        coeff[n][nvar - 1] = mcounts[n]
    el_co = coeff[el_i]
    dco = [[coeff[n][i] - el_co[i] for i in range(nvar)] for n in range(nw)]

    dsuf = [[0] * (nvar + 1) for _ in range(nw)]
    for n in range(nw):
        for i in range(nvar - 1, -1, -1):
            mx = 2 if i < nvar - 1 else 3
            dsuf[n][i] = dsuf[n][i + 1] + mx * abs(dco[n][i])

    aff = [[] for _ in range(nvar)]
    det_at = [[] for _ in range(nvar)]
    last_var = [None] * nw
    for n in range(nw):
        if n == el_i:
            continue
        for i in range(nvar):
            if dco[n][i]:
                aff[i].append(n)
                last_var[n] = i
        if last_var[n] is not None:
            det_at[last_var[n]].append(n)
    always = [n for n in range(nw) if n != el_i and last_var[n] is None]

    wpart = [w[0] for w in walks]
    el_t = next(iter(targets["eye_left"]))
    dtargets = {p: [(tx - el_t[0], ty - el_t[1]) for (tx, ty) in ts]
                for p, ts in targets.items()}
    dtsets = {p: set(vv) for p, vv in dtargets.items()}

    zx = [0] * nw
    zy = [0] * nw
    gx = [0] * nvar
    gy = [0] * nvar
    used = set()
    sol = [None]

    for n in always:
        if (0, 0) not in dtsets[wpart[n]]:
            return None

    def rec(i):
        if sol[0] is not None or time.time() > deadline:
            return
        if i == nvar:
            sol[0] = {"vars": {str(order[j]): (gx[j], gy[j])
                               for j in range(nvar)}}
            return
        for vx, vy in cand[i]:
            gx[i], gy[i] = vx, vy
            for n in aff[i]:
                zx[n] += dco[n][i] * vx
                zy[n] += dco[n][i] * vy
            ok = True
            added = []
            for n in det_at[i]:
                p = wpart[n]
                dt = (zx[n], zy[n])
                if dt not in dtsets[p] or (p, dt) in used:
                    ok = False
                    break
                used.add((p, dt))
                added.append((p, dt))
            if ok:
                for n in aff[i]:
                    if last_var[n] == i:
                        continue
                    sm = dsuf[n][i + 1]
                    ax, ay = zx[n], zy[n]
                    hit = False
                    for (dtx, dty) in dtargets[wpart[n]]:
                        if abs(dtx - ax) <= sm and abs(dty - ay) <= sm:
                            hit = True
                            break
                    if not hit:
                        ok = False
                        break
            if ok:
                rec(i + 1)
            for kk in added:
                used.discard(kk)
            for n in aff[i]:
                zx[n] -= dco[n][i] * vx
                zy[n] -= dco[n][i] * vy
            if sol[0] is not None:
                return

    rec(0)
    return sol[0]


def run_task(args):
    task, per_cfg, ebox = args
    return solve_task(task, per_cfg, ebox)


def sweep(nworkers, per_cfg, emax):
    ebox = list(range(-emax, emax + 1))
    tasks = [(h, pn, sr)
             for h in itertools.product(range(4), repeat=4)
             for pn in v2.PREDS
             for sr in range(4)]
    log_progress(f"anchor5 sweep start tasks={len(tasks)} per_cfg={per_cfg} "
                 f"emax={emax}")
    t0 = time.time()
    nhit = ntimeout = 0
    with mp.Pool(nworkers) as pool:
        for n, (task, sols, timed_out) in enumerate(
            pool.imap_unordered(run_task,
                                ((t, per_cfg, ebox) for t in tasks),
                                chunksize=16)
        ):
            if timed_out:
                ntimeout += 1
                log_progress(f"TIMEOUT task={task}")
            for s in sols:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps(s, default=str) + "\n")
                log_progress(f"HIT task={task}")
            if (n + 1) % 512 == 0:
                log_progress(f"{n+1}/{len(tasks)} hits={nhit} "
                             f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")
    log_progress(f"anchor5 sweep done {len(tasks)} hits={nhit} "
                 f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")


def selftest():
    """Plant a two-table walk with a LIVE unscaled component and recover."""
    import random

    h = (0, 3, 1, 2)
    pred = "b0"
    s_root = 0
    T = v2.make_T(h, v2.PREDS[pred])
    pm = PARITY_MAPS[0]
    inv_pm = {vv: kk for kk, vv in pm.items()}
    WX = [2 ** (NSUF - 1 - k) for k in range(NSUF)]

    def digits_of(S, n=9):
        return [(S >> (2 * (n - 1 - k))) & 3 for k in range(n)]

    lam = (2, -1)
    pred_fn = v2.PREDS[pred]
    fake = None
    for seed in range(5, 300):
        rng = random.Random(seed)
        g = {}
        for d in range(4):
            for s in range(4):
                g[(d, s)] = (rng.choice(GBOX), rng.choice(GBOX))

        def walk(suf):
            s = s_root
            for d in PREFIX:
                s = T[s][d]
            zx = zy = 0
            for k, d in enumerate(suf):
                zx += WX[k] * g[(d, s)][0] + (lam[0] if pred_fn(s) else 0)
                zy += WX[k] * g[(d, s)][1] + (lam[1] if pred_fn(s) else 0)
                s = T[s][d]
            return zx, zy

        trial = {"parts": {}}
        bad = False
        for pname, vv in v2.GT["parts"].items():
            cells = []
            for S in sorted(vv["S"]):
                zxv, zyv = walk(tuple(digits_of(S)[3:]))
                tx, ty = zxv + 8, zyv + 12
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
    old = _PARTS, _TARGETS3
    _PARTS = v2.load_corpus(fake)
    _TARGETS3 = [v2.targets_for(_PARTS, p) for p in PARITY_MAPS]
    try:
        t0 = time.time()
        _, sols, to = solve_task((h, pred, s_root), 600, EBOX)
        print(f"selftest: {len(sols)} sols in {time.time()-t0:.1f}s "
              f"timeout={to} -> {'PASS' if sols else 'FAIL'}")
        assert sols
    finally:
        _PARTS, _TARGETS3 = old


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        pc = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0
        em = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        sweep(nw, pc, em)
