"""Track G v2 — anchor-parity walk solver with generalized state<->parity
coupling.

v1 (solve_anchor.py) assumed the walk's final flip state maps BIJECTIVELY to
the anchor parity (pentagon reflection == walk flips).  Zero hits over the
full 1.77M-config family.  v2 relaxes that one assumption: the compatibility
between final state s and anchor parity q is a swept relation A:

  mode 'func': A(q) = {pi(q)} for every function pi: parities -> states
               (256; includes the 24 bijections = v1, and non-injective
               maps where two parities share a flip state);
  mode 'pos' : A(q) = all states (the pentagon reflection is POSITIONAL —
               intrinsic to the lattice, wallpaper-style — and the walk
               state only steers traversal; then g has no parity pin at
               all).  This variant is expressible in NO earlier track:
               Tracks C/E forced class = kappa(state, last digit).

Everything else as v1: z = sum_k w_k g(d_k, s_k), per-axis scale +-2,
g(0, digit-0 orbit) = 0 (quintant-corner nesting), two exact eye anchors,
exact per-part set matching on z targets (cells ARE anchor points:
z = 2*(i,j) + p(class), three viable parity maps p).

Usage:
  python3 tools/lattice/solve_anchor2.py selftest
  python3 tools/lattice/solve_anchor2.py sweep MODE [nworkers] [per_cfg_sec]
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

GT = json.load(open("tools/lattice/groundtruth.json"))
PROGRESS = os.environ.get("ANCHOR2_PROGRESS", "tools/lattice/anchor2_progress.log")
HITS = "tools/lattice/anchor2_hits.jsonl"

PREFIX = (3, 0, 0)
NSUF = 6

PARITY_MAPS = [
    {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)},
    {0: (0, 0), 1: (1, 0), 2: (0, 1), 3: (1, 1)},
    {0: (0, 0), 1: (1, 1), 2: (1, 0), 3: (0, 1)},
]
PARITIES = [(0, 0), (1, 0), (0, 1), (1, 1)]
PIDX = {q: n for n, q in enumerate(PARITIES)}
PREDS = {
    "none": lambda s: 0,
    "b0": lambda s: s & 1,
    "b1": lambda s: (s >> 1) & 1,
    "xor": lambda s: (s ^ (s >> 1)) & 1,
    "and": lambda s: (s & (s >> 1)) & 1,
    "or": lambda s: ((s | (s >> 1)) & 1),
}
SCALES = [(2, 2), (-2, -2), (2, -2), (-2, 2)]
GBOX = range(-2, 3)


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
    return parts


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
    return [[s ^ h[3 - d if pred(s) else d] for d in range(4)]
            for s in range(4)]


def orbit0(T, s_root):
    seen = []
    s = s_root
    while s not in seen:
        seen.append(s)
        s = T[s][0]
    return seen


def hall_ok(got, want_by_parity, A):
    """got[s] = #walks ending in state s; want_by_parity[q] = #targets of
    parity q; edge (s, q) iff s in A[q].  Exact bipartite feasibility via
    Hall over the 16 subsets of states (degrees are tiny)."""
    states = range(4)
    tot_w = sum(got)
    tot_t = sum(want_by_parity)
    if tot_w != tot_t:
        return False
    for mask in range(1, 16):
        sub = [s for s in states if mask & (1 << s)]
        supply = sum(got[s] for s in sub)
        # parities reachable from sub
        cap = sum(want_by_parity[qi] for qi, q in enumerate(PARITIES)
                  if any(s in A[qi] for s in sub))
        if supply > cap:
            return False
    return True


def solve_config(task, targets3, deadline, mode):
    """task = (h, pred_name, s_root).  Inner-sweeps (pm, A, Vp, scale).
    Returns list of solutions."""
    h, pred_name, s_root = task
    T = make_T(h, PREDS[pred_name])
    orb = orbit0(T, s_root)

    s_pref = s_root
    for d in PREFIX:
        s_pref = T[s_pref][d]

    parts = _PARTS
    walks = []
    for pname, v in parts.items():
        for suf in v["suffixes"]:
            s = s_pref
            steps = []
            for d in suf:
                steps.append((d, s))
                s = T[s][d]
            walks.append((pname, steps, s))
    el_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_left")

    # A-set families
    if mode == "pos":
        A_list = [tuple(frozenset(range(4)) for _ in range(4))]
    else:
        A_list = [tuple(frozenset({pi[q]}) for q in range(4))
                  for pi in itertools.product(range(4), repeat=4)]

    # corner chain finals (states after each 0 step from root)
    corner_states = set(orb[1:]) | {T[orb[-1]][0]} if orb else set()
    corner_states = set()
    s = s_root
    for _ in range(8):
        s = T[s][0]
        corner_states.add(s)

    got_by_part = {}
    for pname in parts:
        g = [0, 0, 0, 0]
        for pn, _, fs in walks:
            if pn == pname:
                g[fs] += 1
        got_by_part[pname] = g

    sols = []
    for pm_idx in range(len(PARITY_MAPS)):
        targets = targets3[pm_idx]
        want_by_part = {}
        for pname in parts:
            w = [0, 0, 0, 0]
            for (tx, ty) in targets[pname]:
                w[PIDX[(tx & 1, ty & 1)]] += 1
            want_by_part[pname] = w
        for A in A_list:
            # corner: parity (0,0) must be compatible with every corner state
            q0 = PIDX[(0, 0)]
            if any(cs not in A[q0] for cs in corner_states):
                continue
            for Vp in range(4):
                vpx, vpy = Vp & 1, (Vp >> 1) & 1
                # want with V-shifted parities
                ok = True
                for pname in parts:
                    w = [0, 0, 0, 0]
                    for (tx, ty) in targets[pname]:
                        w[PIDX[((tx ^ vpx) & 1, (ty ^ vpy) & 1)]] += 1
                    if not hall_ok(got_by_part[pname], w, A):
                        ok = False
                        break
                if not ok:
                    continue
                for sc in range(len(SCALES)):
                    if time.time() > deadline:
                        return sols, True
                    r = dfs_tables(T, walks, el_i, targets, A, Vp, sc, orb,
                                   deadline)
                    if r is not None:
                        sols.append({
                            "h": h, "pred": pred_name, "s_root": s_root,
                            "pm": pm_idx,
                            "A": [sorted(a) for a in A], "Vp": Vp,
                            "scale": SCALES[sc], **r})
    return sols, False


def dfs_tables(T, walks, el_i, targets, A, Vp, sc, orb, deadline):
    sx, sy = SCALES[sc]
    WX = [sx ** (NSUF - 1 - k) for k in range(NSUF)]
    WY = [sy ** (NSUF - 1 - k) for k in range(NSUF)]
    vpx, vpy = Vp & 1, (Vp >> 1) & 1

    er_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_right")

    pinned = {(0, s) for s in orb}
    use = Counter()
    for _, steps, _ in walks:
        for k in steps:
            if k not in pinned:
                use[k] += 1
    eye_vars = []
    for n in (el_i, er_i):
        for k in walks[n][1]:
            if k not in pinned and k not in eye_vars:
                eye_vars.append(k)
    order = eye_vars + [k for k, _ in use.most_common() if k not in eye_vars]
    vidx = {k: n for n, k in enumerate(order)}
    nvar = len(order)

    # candidate (vx, vy) pairs per entry: target parity of the entry must be
    # in the allowed set for the successor state
    cand = []
    for (d, s) in order:
        s2 = T[s][d]
        # allowed anchor parities q (V-shifted into walk space):
        # walk z parity == q XOR Vp for target parity q; entry sets z parity.
        allowed = [q for q in range(4) if s2 in A[q]]
        pairs = []
        for vx in GBOX:
            for vy in GBOX:
                qw = ((vx & 1) ^ vpx, (vy & 1) ^ vpy)
                if PIDX[qw] in allowed:
                    pairs.append((vx, vy))
        if not pairs:
            return None
        cand.append(pairs)

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
    sufx = [[0] * (nvar + 1) for _ in range(nw)]
    sufy = [[0] * (nvar + 1) for _ in range(nw)]
    for n in range(nw):
        for i in range(nvar - 1, -1, -1):
            sufx[n][i] = sufx[n][i + 1] + 2 * abs(cox[n][i])
            sufy[n][i] = sufy[n][i + 1] + 2 * abs(coy[n][i])

    # per-variable: affected walks; walks that become determined after it
    aff = [[] for _ in range(nvar)]
    det_at = [[] for _ in range(nvar)]
    last_var = [None] * nw
    for n in range(nw):
        for i in range(nvar):
            if cox[n][i] or coy[n][i]:
                aff[i].append(n)
                last_var[n] = i
        if last_var[n] is not None:
            det_at[last_var[n]].append(n)
    always_det = [n for n in range(nw) if last_var[n] is None]

    zx = [0] * nw
    zy = [0] * nw
    wpart = [w[0] for w in walks]
    wfinal = [w[2] for w in walks]
    tlist = {p: list(targets[p]) for p in targets}
    el_t = next(iter(targets["eye_left"]))
    er_t = next(iter(targets["eye_right"]))
    dx_t = el_t[0] - er_t[0]
    dy_t = el_t[1] - er_t[1]
    el_last = last_var[el_i] if last_var[el_i] is not None else -1
    sol = [None]
    gx = [0] * nvar
    gy = [0] * nvar
    used = set()

    def check_det(n, Vx, Vy):
        """Validate a fully determined walk; returns key added to `used`
        or None on failure."""
        p = wpart[n]
        pt = (zx[n] + Vx, zy[n] + Vy)
        if pt not in targets[p]:
            return None
        if wfinal[n] not in A[PIDX[(pt[0] & 1, pt[1] & 1)]]:
            return None
        key = (p, pt)
        if key in used:
            return None
        used.add(key)
        return key

    def box_ok(n, depth, Vx, Vy):
        smx, smy = sufx[n][depth], sufy[n][depth]
        ax, ay = zx[n] + Vx, zy[n] + Vy
        for (tx, ty) in tlist[wpart[n]]:
            if abs(tx - ax) <= smx and abs(ty - ay) <= smy:
                return True
        return False

    def rec(i, Vx, Vy, ndet):
        if sol[0] is not None or time.time() > deadline:
            return
        if i == nvar:
            sol[0] = {
                "g": {f"0,{s}": (0, 0) for s in orb}
                | {f"{order[j][0]},{order[j][1]}": (gx[j], gy[j])
                   for j in range(nvar)},
                "V": (Vx, Vy),
            }
            return
        for vx, vy in cand[i]:
            gx[i], gy[i] = vx, vy
            for n in aff[i]:
                zx[n] += cox[n][i] * vx
                zy[n] += coy[n][i] * vy
            nVx, nVy = Vx, Vy
            added = []
            ok = True
            if Vx is None:
                # V-free eye-difference pruning
                ddx = zx[el_i] - zx[er_i]
                ddy = zy[el_i] - zy[er_i]
                sl = sufx[el_i][i + 1] + sufx[er_i][i + 1]
                if abs(ddx - dx_t) > sl:
                    ok = False
                else:
                    sl = sufy[el_i][i + 1] + sufy[er_i][i + 1]
                    if abs(ddy - dy_t) > sl:
                        ok = False
                if ok and i == el_last:
                    nVx, nVy = el_t[0] - zx[el_i], el_t[1] - zy[el_i]
                    if ((nVx & 1) != vpx) or ((nVy & 1) != vpy):
                        ok = False
                    else:
                        # validate every walk already determined
                        for n2 in always_det:
                            k2 = check_det(n2, nVx, nVy)
                            if k2 is None:
                                ok = False
                                break
                            added.append(k2)
                        if ok:
                            for j in range(i + 1):
                                for n2 in det_at[j]:
                                    k2 = check_det(n2, nVx, nVy)
                                    if k2 is None:
                                        ok = False
                                        break
                                    added.append(k2)
                                if not ok:
                                    break
            else:
                for n2 in det_at[i]:
                    k2 = check_det(n2, nVx, nVy)
                    if k2 is None:
                        ok = False
                        break
                    added.append(k2)
                if ok:
                    for n2 in aff[i]:
                        if last_var[n2] != i and not box_ok(n2, i + 1, nVx, nVy):
                            ok = False
                            break
            if ok:
                rec(i + 1, nVx, nVy, ndet + len(added))
            for k2 in added:
                used.discard(k2)
            for n in aff[i]:
                zx[n] -= cox[n][i] * vx
                zy[n] -= coy[n][i] * vy
            if sol[0] is not None:
                return

    if el_last == -1:
        Vx0, Vy0 = el_t
        if ((Vx0 & 1) == vpx) and ((Vy0 & 1) == vpy):
            ok0 = True
            for n2 in always_det:
                if check_det(n2, Vx0, Vy0) is None:
                    ok0 = False
                    break
            if ok0:
                rec(0, Vx0, Vy0, 0)
            used.clear()
    else:
        rec(0, None, None, 0)
    return sol[0]


_PARTS = load_corpus(GT)
_TARGETS3 = [targets_for(_PARTS, pm) for pm in PARITY_MAPS]


def run_task(args):
    task, per_cfg, mode = args
    sols, timed_out = solve_config(task, _TARGETS3, time.time() + per_cfg, mode)
    return task, sols, timed_out


def sweep(mode, nworkers, per_cfg):
    tasks = [(h, pn, sr)
             for h in itertools.product(range(4), repeat=4)
             for pn in PREDS
             for sr in range(4)]
    log_progress(f"anchor2 sweep start mode={mode} tasks={len(tasks)} "
                 f"per_cfg={per_cfg}")
    t0 = time.time()
    nhit = ntimeout = 0
    with mp.Pool(nworkers) as pool:
        for n, (task, sols, timed_out) in enumerate(
            pool.imap_unordered(run_task,
                                ((t, per_cfg, mode) for t in tasks),
                                chunksize=16)
        ):
            if timed_out:
                ntimeout += 1
                log_progress(f"TIMEOUT task={task}")
            for s in sols:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps({"mode": mode, "sol": s},
                                        default=str) + "\n")
                log_progress(f"HIT task={task}")
            if (n + 1) % 512 == 0:
                log_progress(f"{n+1}/{len(tasks)} hits={nhit} "
                             f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")
    log_progress(f"anchor2 sweep done mode={mode} {len(tasks)} hits={nhit} "
                 f"timeouts={ntimeout} ({time.time()-t0:.0f}s)")


def selftest():
    """The v1 selftest plant must be recovered through the v2 path (its
    bijective chi is inside mode 'func')."""
    import solve_anchor as v1
    import random

    h = (0, 3, 1, 2)
    pred = "b0"
    s_root = 0
    T = make_T(h, PREDS[pred])
    orb = orbit0(T, s_root)
    chi_idx = next(ci for ci, c in enumerate(v1.CHIS)
                   if all(c[T[s][0]] == (0, 0) for s in orb))
    chi = v1.CHIS[chi_idx]
    pm = PARITY_MAPS[0]
    g = {}
    WX = [2 ** (NSUF - 1 - k) for k in range(NSUF)]

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

    inv_pm = {v: k for k, v in pm.items()}
    fake = None
    for seed in range(11, 200):
        rng = random.Random(seed)
        for d in range(4):
            for s in range(4):
                if d == 0 and s in orb:
                    g[(d, s)] = (0, 0)
                    continue
                pxp, pyp = chi[T[s][d]]
                g[(d, s)] = (
                    rng.choice([v for v in GBOX if (v & 1) == pxp]),
                    rng.choice([v for v in GBOX if (v & 1) == pyp]))
        trial = {"parts": {}}
        bad = False
        for pname, v in GT["parts"].items():
            cells = []
            for S in sorted(v["S"]):
                zxv, zyv = walk(tuple(digits_of(S)[3:]))
                tx, ty = zxv + 10, zyv + 20
                c = inv_pm[(tx & 1, ty & 1)]
                cells.append([(tx - (tx & 1)) // 2, (ty - (ty & 1)) // 2, c])
            if len({tuple(c) for c in cells}) != len(cells):
                bad = True
                break
            trial["parts"][pname] = {"S": sorted(v["S"]), "cells": cells}
        if not bad:
            fake = trial
            break
    assert fake is not None

    global _PARTS, _TARGETS3
    old = _PARTS, _TARGETS3
    _PARTS = load_corpus(fake)
    _TARGETS3 = [targets_for(_PARTS, p) for p in PARITY_MAPS]
    try:
        t0 = time.time()
        sols, to = solve_config((h, pred, s_root), _TARGETS3,
                                time.time() + 300, "func")
        assert sols, "selftest: planted config not recovered in mode func"
        print(f"selftest func PASS in {time.time()-t0:.1f}s "
              f"({len(sols)} solutions, V={sols[0]['V']}, timeout={to})")
        t0 = time.time()
        sols2, to2 = solve_config((h, pred, s_root), _TARGETS3,
                                  time.time() + 120, "pos")
        print(f"selftest pos: {len(sols2)} solutions in {time.time()-t0:.1f}s "
              f"timeout={to2} (plant findable here too: "
              f"{'PASS' if sols2 else 'not found in budget'})")
    finally:
        _PARTS, _TARGETS3 = old


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        mode = sys.argv[2] if len(sys.argv) > 2 else "func"
        nw = int(sys.argv[3]) if len(sys.argv) > 3 else max(1, (os.cpu_count() or 8) - 8)
        pc = float(sys.argv[4]) if len(sys.argv) > 4 else 120.0
        sweep(mode, nw, pc)
