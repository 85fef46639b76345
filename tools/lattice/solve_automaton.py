"""Restricted affine-automaton CSP for the elephant-block curve.

Model (top-down over the 6 suffix digits of the '300' block):
    state sigma in {0..n-1};  L in the dihedral group (accumulated twist);
    z += 2^level * (L @ t[sigma, d]);  L <- L @ U[sigma, d];
    sigma <- tau[sigma, d],
with per-entry unknowns t in {-1,0,1}^2, U in a dihedral subset,
tau in {0..n-1}; leaf class = kappa(sigma_final, L_final) (learned greedily).
Observed cells map to targets y = G @ (2*(i,j) + e[class]) with G dihedral
and e a class->{0,1}^2 bijection (outer loop); v is defined by the eye_left
walk, so real pruning starts at eye_right (exact target, shared prefix).

Pruning: |z_final - z_partial|_inf <= 2^level - 1 (dihedral preserves the
inf-norm, |t|_inf <= 1) against the exact eye target / nearest unused cell.

Usage:  python3 tools/lattice/solve_automaton.py [n_states] [budget_sec] [nU]
        nU = 2 -> U in {I, -I};  8 -> full dihedral
"""
from __future__ import annotations

import itertools
import json
import sys
import time

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])

DIH = [np.array(m) for m in (
    [[1, 0], [0, 1]], [[-1, 0], [0, -1]], [[0, 1], [1, 0]], [[0, -1], [-1, 0]],
    [[1, 0], [0, -1]], [[-1, 0], [0, 1]], [[0, 1], [-1, 0]], [[0, -1], [1, 0]])]
T_OPTS = [(a, b) for a in (-1, 0, 1) for b in (-1, 0, 1)]
DIH_MUL = [[next(k for k, M in enumerate(DIH) if (M == DIH[i] @ DIH[j]).all())
            for j in range(8)] for i in range(8)]
# action of dihedral L on each t option: STEP[L][ti] = (dx, dy)
STEP = [[tuple(int(x) for x in (DIH[L] @ np.array(t))) for t in T_OPTS]
        for L in range(8)]

N_STATES = int(sys.argv[1]) if len(sys.argv) > 1 else 2
BUDGET = float(sys.argv[2]) if len(sys.argv) > 2 else 1800.0
N_U = int(sys.argv[3]) if len(sys.argv) > 3 else 2
SKIP = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # resume: skip N configs
T0 = time.time()
PROGRESS = "tools/lattice/automaton_progress.log"


def log_progress(msg):
    with open(PROGRESS, "a") as f:
        f.write(f"{time.strftime('%F %T')} n={N_STATES} nU={N_U} {msg}\n")


def digits_of(s):
    return [(s >> (2 * k)) & 3 for k in range(5, -1, -1)]


def main():
    anchors = {a["part"]: tuple(a["cell"]) for a in GT["anchors"]}
    walks = []
    for p in PART_NAMES:
        for s in GT["parts"][p]["S"]:
            walks.append((p, digits_of(s), p in anchors, anchors.get(p)))
    walks.sort(key=lambda w: (not w[2], w[1]))

    cells_by_part = {p: [tuple(c) for c in GT["parts"][p]["cells"]] for p in PART_NAMES}

    n_outer = 0
    for Gi, G in enumerate(DIH):
        for eperm in itertools.permutations(range(4)):
            E = [((0, 0), (1, 0), (0, 1), (1, 1))[eperm[c]] for c in range(4)]
            n_outer += 1
            if n_outer <= SKIP:
                continue
            if time.time() - T0 > BUDGET:
                print(f"budget hit after {n_outer - 1} outer configs "
                      f"({time.time() - T0:.0f}s)")
                return
            targets = {}
            eye_y = {}
            for p in PART_NAMES:
                targets[p] = {}
                for (i, j, c) in cells_by_part[p]:
                    y = G @ (2 * np.array([i, j]) + np.array(E[c]))
                    targets[p][(int(y[0]), int(y[1]))] = (i, j, c)
                if p in anchors:
                    cell = anchors[p]
                    y = G @ (2 * np.array([cell[0], cell[1]]) + np.array(E[cell[2]]))
                    eye_y[p] = (int(y[0]), int(y[1]))
            if solve(walks, targets, eye_y):
                print("SOLUTION with G#", Gi, "eperm=", eperm)
                log_progress(f"SOLUTION G#{Gi} eperm={eperm}")
                return
            log_progress(f"refuted outer config {n_outer} (G#{Gi} eperm={eperm})")
    print(f"no solution in restricted family (n={N_STATES}, nU={N_U}; "
          f"{n_outer} outer configs, {time.time() - T0:.0f}s)")


def solve(walks, targets, eye_y):
    tab = {}
    kappa = {}
    kappa_stack = []
    used = {p: set() for p in PART_NAMES}
    V = [None]
    START = [0]
    nw = len(walks)
    # per-walk precomputation
    tkeys = {p: list(targets[p].keys()) for p in PART_NAMES}

    def walk(wi, lev, sigma, Lidx, zx, zy):
        if time.time() - T0 > BUDGET:
            return False
        part, digs, is_eye, cell = walks[wi]
        if lev < 0:
            if V[0] is None:
                y = eye_y[part]
                V[0] = (y[0] - zx, y[1] - zy)
                used[part].add(cell)
                ck = (sigma, Lidx)
                fresh_k = ck not in kappa
                if fresh_k:
                    kappa[ck] = cell[2]
                if kappa[ck] == cell[2]:
                    if wi + 1 == nw or start_walk(wi + 1):
                        return True
                if fresh_k:
                    del kappa[ck]
                used[part].discard(cell)
                V[0] = None
                return False
            zz = (zx + V[0][0], zy + V[0][1])
            hit = targets[part].get(zz)
            if hit is None or hit in used[part]:
                return False
            if is_eye and hit != cell:
                return False
            ck = (sigma, Lidx)
            fresh_k = ck not in kappa
            if fresh_k:
                kappa[ck] = hit[2]
            elif kappa[ck] != hit[2]:
                return False
            used[part].add(hit)
            if wi + 1 == nw or start_walk(wi + 1):
                return True
            used[part].discard(hit)
            if fresh_k:
                del kappa[ck]
            return False
        d = digs[5 - lev]
        key = (sigma, d)
        bound_entry = tab.get(key)
        if bound_entry is not None:
            opts = (bound_entry,)
        else:
            opts = OPTS
        bnd = (1 << lev) - 1
        vv = V[0]
        for opt in opts:
            ti, ui, tu = opt
            dx, dy = STEP[Lidx][ti]
            z2x = zx + (1 << lev) * dx
            z2y = zy + (1 << lev) * dy
            # prune
            if vv is not None:
                if is_eye:
                    y = eye_y[part]
                    tx, ty = y[0] - vv[0], y[1] - vv[1]
                    if abs(tx - z2x) > bnd or abs(ty - z2y) > bnd:
                        continue
                else:
                    zzx, zzy = z2x + vv[0], z2y + vv[1]
                    up = used[part]
                    tp = targets[part]
                    ok = False
                    for k in tkeys[part]:
                        if abs(k[0] - zzx) <= bnd and abs(k[1] - zzy) <= bnd \
                           and tp[k] not in up:
                            ok = True
                            break
                    if not ok:
                        continue
            if bound_entry is None:
                tab[key] = opt
            if walk(wi, lev - 1, tu, DIH_MUL[Lidx][ui], z2x, z2y):
                return True
            if bound_entry is None:
                del tab[key]
        return False

    def start_walk(wi):
        if wi == 0:
            for s0 in range(N_STATES):
                START[0] = s0
                if walk(0, 5, s0, 0, 0, 0):
                    return True
            return False
        return walk(wi, 5, START[0], 0, 0, 0)

    OPTS = tuple((ti, ui, tu) for ti in range(9)
                 for ui in ([0, 1] if N_U == 2 else range(8))
                 for tu in range(N_STATES))
    return start_walk(0)


if __name__ == "__main__":
    main()
