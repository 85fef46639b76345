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
GBOX = range(-2, 3)  # overridden below once FRAME is known


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


# Optional integer frame applied to anchor targets (z' = F z): the upstream
# walk may accumulate offsets in a SHEARED basis (KJ coords) relative to the
# orthogonal pentagon frame, which pushes table entries outside the +-2 box
# unless the targets are pre-transformed.  5 coset representatives of
# {entries<=1, det +-1} modulo signed permutations (those are absorbed by the
# table/parity sweeps); index via env ANCHOR2_FRAME.
FRAMES = [
    ((1, 0), (0, 1)),
    ((1, 1), (0, 1)),
    ((1, 0), (1, 1)),
    ((1, 1), (1, 0)),
    ((1, 0), (1, -1)),
    # extended set (round-4 half-square discovery): the quintant's legs lie
    # on the +-45-degree diagonals, so upstream KJ coordinates are plausibly
    # the 45-degree rotated frame w = (x+y, x-y) — determinant 2 — or a
    # shear-by-2.  8 unimodular entries<=2 reps + 23 |det|=2 reps, all
    # modulo signed permutations.
    ((-2, -1), (-1, -1)),
    ((-2, -1), (-1, 0)),
    ((-2, 1), (-1, 0)),
    ((-2, 1), (-1, 1)),
    ((-1, -2), (-1, -1)),
    ((-1, -2), (0, -1)),
    ((-1, 1), (-1, 2)),
    ((-1, 2), (0, -1)),
    ((-2, -2), (-2, -1)),
    ((-2, -2), (-1, -2)),
    ((-2, -2), (-1, 0)),
    ((-2, -2), (0, -1)),
    ((-2, -1), (-2, 0)),
    ((-2, -1), (0, -1)),
    ((-2, 0), (-2, 1)),
    ((-2, 0), (-1, -1)),
    ((-2, 0), (-1, 1)),
    ((-2, 0), (0, -1)),
    ((-2, 1), (-2, 2)),
    ((-2, 1), (0, -1)),
    ((-2, 2), (-1, 0)),
    ((-2, 2), (-1, 2)),
    ((-2, 2), (0, -1)),
    ((-1, -2), (-1, 0)),
    ((-1, -2), (0, -2)),
    ((-1, -1), (-1, 1)),
    ((-1, -1), (0, -2)),
    ((-1, 0), (-1, 2)),
    ((-1, 0), (0, -2)),
    ((-1, 1), (0, -2)),
    ((-1, 2), (0, -2)),
]
FRAME = FRAMES[int(os.environ.get("ANCHOR2_FRAME", "0"))]
# The table box is a hypothesis about UPSTREAM's own coordinates (the frame
# maps extraction coords into upstream coords, where the +-2 box applies).
# ANCHOR2_GBOX widens it as an explicit, separate degree of freedom.
_GB = int(os.environ.get("ANCHOR2_GBOX", "2"))
GBOX = range(-_GB, _GB + 1)
# The corner pin g(0, digit-0 orbit) = 0 assumed the S=0 chain nests at the
# quintant corner at EVERY level.  The res-27 doc golden refutes the strong
# form: its S digits are 0 only down to res ~11, then 3001113002220311 — the
# chain only APPROACHES the corner.  ANCHOR2_NOPIN=1 drops the pin and every
# filter derived from it.
NOPIN = os.environ.get("ANCHOR2_NOPIN", "0") == "1"


def targets_for(parts, pmap):
    (fa, fb), (fc, fd) = FRAME
    out = {}
    for pname, v in parts.items():
        ts = set()
        for (i, j, c) in v["cells"]:
            px, py = pmap[c]
            zx, zy = 2 * i + px, 2 * j + py
            ts.add((fa * zx + fb * zy, fc * zx + fd * zy))
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
            if not NOPIN and any(cs not in A[q0] for cs in corner_states):
                continue
            # Vp pins nothing when A is unconstrained (pos mode)
            for Vp in (range(1) if mode == "pos" else range(4)):
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
    """Table DFS in DIFFERENCE space relative to the eye_left walk.

    The gauge V never enters: every walk is matched as
        z(w) - z(eye_left)  in  {t - t(eye_left) : t in targets[part(w)]}
    so pruning bites from the very first variable (the old formulation
    could not prune anything until eye_left's ~6 variables fixed V, an
    up-to-12^6-node blind prefix PER COMBO).  The Vp consistency is
    implied by the parity pins, so no explicit V check is needed.
    """
    sx, sy = SCALES[sc]
    WX = [sx ** (NSUF - 1 - k) for k in range(NSUF)]
    WY = [sy ** (NSUF - 1 - k) for k in range(NSUF)]
    vpx, vpy = Vp & 1, (Vp >> 1) & 1

    pinned = set() if NOPIN else {(0, s) for s in orb}
    use = Counter()
    for _, steps, _ in walks:
        for k in steps:
            if k not in pinned:
                use[k] += 1
    el_steps = walks[el_i][1]
    el_keys = []
    for k in el_steps:
        if k not in pinned and k not in el_keys:
            el_keys.append(k)
    order = el_keys + [k for k, _ in use.most_common() if k not in el_keys]
    vidx = {k: n for n, k in enumerate(order)}
    nvar = len(order)

    # candidate (vx, vy) pairs per entry, parity-pinned via the successor
    cand = []
    for (d, s) in order:
        s2 = T[s][d]
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
    el_cox = [0] * nvar
    el_coy = [0] * nvar
    for k, key in enumerate(el_steps):
        if key in pinned:
            continue
        i = vidx[key]
        el_cox[i] += WX[k]
        el_coy[i] += WY[k]

    dcox = [[0] * nvar for _ in range(nw)]
    dcoy = [[0] * nvar for _ in range(nw)]
    for n, (_, steps, _) in enumerate(walks):
        cx = dcox[n]
        cy = dcoy[n]
        for k, key in enumerate(steps):
            if key in pinned:
                continue
            i = vidx[key]
            cx[i] += WX[k]
            cy[i] += WY[k]
        for i in range(nvar):
            cx[i] -= el_cox[i]
            cy[i] -= el_coy[i]

    dsufx = [[0] * (nvar + 1) for _ in range(nw)]
    dsufy = [[0] * (nvar + 1) for _ in range(nw)]
    for n in range(nw):
        for i in range(nvar - 1, -1, -1):
            dsufx[n][i] = dsufx[n][i + 1] + 2 * abs(dcox[n][i])
            dsufy[n][i] = dsufy[n][i + 1] + 2 * abs(dcoy[n][i])

    aff = [[] for _ in range(nvar)]
    det_at = [[] for _ in range(nvar)]
    last_var = [None] * nw
    for n in range(nw):
        if n == el_i:
            continue
        for i in range(nvar):
            if dcox[n][i] or dcoy[n][i]:
                aff[i].append(n)
                last_var[n] = i
        if last_var[n] is not None:
            det_at[last_var[n]].append(n)
    always_det = [n for n in range(nw)
                  if n != el_i and last_var[n] is None]

    wpart = [w[0] for w in walks]
    wfinal = [w[2] for w in walks]
    el_t = next(iter(targets["eye_left"]))
    elx, ely = el_t

    # difference targets, with the A-compatible final states precomputed:
    # part -> list of (dtx, dty); compat checked via target parity
    dtargets = {}
    tpar = {}
    for p, ts in targets.items():
        lst = []
        for (tx, ty) in ts:
            dt = (tx - elx, ty - ely)
            lst.append(dt)
            tpar[(p, dt)] = PIDX[(tx & 1, ty & 1)]
        dtargets[p] = lst
    dtsets = {p: set(v) for p, v in dtargets.items()}

    zx = [0] * nw
    zy = [0] * nw
    sol = [None]
    gx = [0] * nvar
    gy = [0] * nvar
    used = set()

    def rec(i):
        if sol[0] is not None or time.time() > deadline:
            return
        if i == nvar:
            sol[0] = {
                "g": {f"0,{s}": (0, 0) for s in orb}
                | {f"{order[j][0]},{order[j][1]}": (gx[j], gy[j])
                   for j in range(nvar)},
                "V_note": "gauge-free (difference space)",
            }
            return
        ax = aff[i]
        dax = det_at[i]
        for vx, vy in cand[i]:
            gx[i], gy[i] = vx, vy
            for n in ax:
                zx[n] += dcox[n][i] * vx
                zy[n] += dcoy[n][i] * vy
            ok = True
            added = []
            for n in dax:
                p = wpart[n]
                dt = (zx[n], zy[n])
                if dt not in dtsets[p]:
                    ok = False
                    break
                if wfinal[n] not in A[tpar[(p, dt)]]:
                    ok = False
                    break
                key = (p, dt)
                if key in used:
                    ok = False
                    break
                used.add(key)
                added.append(key)
            if ok:
                for n in ax:
                    if last_var[n] == i:
                        continue
                    smx = dsufx[n][i + 1]
                    smy = dsufy[n][i + 1]
                    wx_, wy_ = zx[n], zy[n]
                    hit = False
                    for (dtx, dty) in dtargets[wpart[n]]:
                        if abs(dtx - wx_) <= smx and abs(dty - wy_) <= smy:
                            hit = True
                            break
                    if not hit:
                        ok = False
                        break
            if ok:
                rec(i + 1)
            for key in added:
                used.discard(key)
            for n in ax:
                zx[n] -= dcox[n][i] * vx
                zy[n] -= dcoy[n][i] * vy
            if sol[0] is not None:
                return

    # walks with no free variables at all must match immediately
    for n in always_det:
        p = wpart[n]
        dt = (0, 0) if n == el_i else (zx[n], zy[n])
        if dt not in dtsets[p] or wfinal[n] not in A[tpar[(p, dt)]]:
            return None
    rec(0)
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
    log_progress(f"anchor2 sweep start mode={mode} frame={FRAME} "
                 f"tasks={len(tasks)} per_cfg={per_cfg}")
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
              f"({len(sols)} solutions, V={sols[0].get('V_note')}, timeout={to})")
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
