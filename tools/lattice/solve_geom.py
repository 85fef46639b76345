"""Track H — CONTINUOUS geometric-descent hypothesis.

Every Track A–G family assumed the S -> anchor map is a constant-table
automaton.  All were refuted.  This track tests the remaining natural
hypothesis: upstream computes S by recursive subdivision of the CONTINUOUS
quintant triangle (a half-square in lattice coordinates — round-4 result),
assigning a cell to the child region CONTAINING its anchor point.  Such a
map is an automaton almost everywhere but has boundary exceptions wherever
an anchor lies near an internal subdivision edge — precisely the behaviour
that produced round 2's "both quad variants at the same position parity"
evidence and that no constant-table CSP can express.

Model:
  canonical domain: triangle entry E=(0,0), exit X=(1,0), apex A=(1/2,h)
  (h = +1/2 apex-up); children = 4 similar copies (scale 1/2), given by a
  geometry family:
    mid4   — midpoint split: corner triangles + INVERTED middle;
    bisect — two altitude bisections (Sierpinski-Knopp);
  curve order + child orientations enumerated as all chains of similarity
  maps with exit_i == entry_{i+1}, entry_0 = E, exit_3 = X (continuity),
  or relaxed (no continuity) on demand.
  gauge: V (real 2-vector) = position of the triangle's entry corner in the
  extraction z-frame; res-10 triangle has base 1024 anchor units.
  membership point: the cell's anchor z (integer) or its pentagon centroid.

Search: variants x V-grid; exact per-part S-set matching + the two eyes.

Usage:
  python3 tools/lattice/solve_geom.py selftest
  python3 tools/lattice/solve_geom.py sweep [nworkers] [family]
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

GT = json.load(open("tools/lattice/groundtruth.json"))
PROGRESS = os.environ.get("GEOM_PROGRESS", "tools/lattice/geom_progress.log")
HITS = "tools/lattice/geom_hits.jsonl"

RES = 10
NDIG = RES - 1           # 9 quaternary digits
BASE = 1 << RES          # 1024 anchor units

PARITY_MAPS = [
    {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)},
    {0: (0, 0), 1: (1, 0), 2: (0, 1), 3: (1, 1)},
    {0: (0, 0), 1: (1, 1), 2: (1, 0), 3: (0, 1)},
]
# measured class centroid offsets (lattice units; extraction gauge folds
# into V) — membership mode 'centroid' uses 2*(i,j) + 2*delta_c directly,
# independent of the parity-map choice
DELTA = {0: (0.0149, 0.0030), 1: (0.5149, 0.1675),
         2: (0.6477, 0.6675), 3: (0.1477, 0.5030)}


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


# ---------------------------------------------------------------- variants
# canonical triangle: E=(0,0), X=(1,0), apex=(0.5, 0.5)
E = np.array([0.0, 0.0])
X = np.array([1.0, 0.0])
AP = np.array([0.5, 0.5])


def _similarity_maps(tri_from, tri_to):
    """All affine maps (M, b) sending the unordered triangle tri_from onto
    tri_to as SIMILARITIES (rotation/reflection + uniform scale)."""
    out = []
    A0, B0, C0 = tri_from
    for perm in itertools.permutations(range(3)):
        P = [tri_to[k] for k in perm]
        # solve affine from 3 point pairs
        S = np.array([[A0[0], A0[1], 1], [B0[0], B0[1], 1], [C0[0], C0[1], 1]])
        try:
            coef = np.linalg.solve(S, np.array(P))
        except np.linalg.LinAlgError:
            continue
        M = coef[:2].T
        b = coef[2]
        # similarity check: M^T M = s^2 I
        G = M.T @ M
        if abs(G[0, 1]) > 1e-9 or abs(G[0, 0] - G[1, 1]) > 1e-9:
            continue
        out.append((M, b))
    return out


def child_regions(family):
    """4 child triangles (vertex triples) of the canonical triangle."""
    m01 = (E + X) / 2
    m0a = (E + AP) / 2
    m1a = (X + AP) / 2
    if family == "mid4":
        return [
            (E, m01, m0a),
            (m01, X, m1a),
            (m0a, m1a, AP),
            (m01, m1a, m0a),   # inverted middle
        ]
    if family == "bisect":
        # altitude foot from apex to base midpoint, then each half again:
        # halves: (E, m01, AP) and (m01, X, AP); their own altitude feet
        f1 = (E + AP) / 2    # foot in left half (hypotenuse E-AP midpoint)
        f2 = (X + AP) / 2
        return [
            (E, m01, f1)[:3],
            (f1, AP, m01)[:3],
            (AP, f2, m01)[:3],
            (f2, X, m01)[:3],
        ]
    raise ValueError(family)


CANON = (E, X, AP)


def enumerate_variants(family, require_continuity=True):
    """All (order-fixed) chains: children visited in digit order 0..3, each
    with a similarity map canonical->child.  Continuity: the image of E in
    child 0 is E, image of X in child 3 is X, and exit_i == entry_{i+1}."""
    regions = child_regions(family)
    per_child = []
    for reg in regions:
        per_child.append(_similarity_maps(CANON, reg))
    variants = []
    for combo in itertools.product(*[range(len(m)) for m in per_child]):
        maps = [per_child[k][combo[k]] for k in range(4)]
        ents = [M @ E + b for (M, b) in maps]
        exts = [M @ X + b for (M, b) in maps]
        if require_continuity:
            ok = (np.allclose(ents[0], E) and np.allclose(exts[3], X)
                  and all(np.allclose(exts[i], ents[i + 1]) for i in range(3)))
            if not ok:
                continue
        variants.append(maps)
    return variants


def variants_with_orders(family, require_continuity=True):
    """Child regions can be visited in any digit order: permute regions."""
    regions = child_regions(family)
    out = []
    for perm in itertools.permutations(range(4)):
        per_child = [_similarity_maps(CANON, regions[perm[k]])
                     for k in range(4)]
        for combo in itertools.product(*[range(len(m)) for m in per_child]):
            maps = [per_child[k][combo[k]] for k in range(4)]
            ents = [M @ E + b for (M, b) in maps]
            exts = [M @ X + b for (M, b) in maps]
            if require_continuity:
                ok = (np.allclose(ents[0], E) and np.allclose(exts[3], X)
                      and all(np.allclose(exts[i], ents[i + 1])
                              for i in range(3)))
                if not ok:
                    continue
            out.append(maps)
    return out


def digits_of(S, n=NDIG):
    return [(S >> (2 * (n - 1 - k))) & 3 for k in range(n)]


def make_eval(maps, maps_odd=None):
    """Vectorized digit extractor: points (N,2) in canonical coords ->
    digit arrays (N, NDIG).  Each level: find the child whose inverse map
    keeps the point inside the canonical triangle (with small tolerance),
    descend.  maps_odd, if given, is used at odd levels (level-alternating
    curves, e.g. chirality-flipping Sierpinski)."""
    invs = [(np.linalg.inv(M), b) for (M, b) in maps]
    invs_odd = (invs if maps_odd is None else
                [(np.linalg.inv(M), b) for (M, b) in maps_odd])

    def inside(p, tol=1e-9):
        # canonical triangle: y >= -tol, y <= x + tol, y <= 1 - x + tol
        return ((p[:, 1] >= -tol) & (p[:, 1] <= p[:, 0] + tol)
                & (p[:, 1] <= 1 - p[:, 0] + tol))

    def run(P):
        n = len(P)
        p = P.copy()
        digs = np.full((n, NDIG), -1, dtype=np.int8)
        alive = np.ones(n, dtype=bool)
        for lev in range(NDIG):
            assigned = np.zeros(n, dtype=bool)
            newp = p.copy()
            for d, (Mi, b) in enumerate(invs if lev % 2 == 0 else invs_odd):
                q = (p - b) @ Mi.T
                ok = alive & ~assigned & inside(q)
                digs[ok, lev] = d
                newp[ok] = q[ok]
                assigned |= ok
            alive &= assigned
            p = newp
        return digs, alive

    return run


def corpus_z(pm, mode="anchor"):
    def pt(i, j, c):
        if mode == "anchor":
            px, py = pm[c]
            return (2 * i + px, 2 * j + py)
        dx, dy = DELTA[c]
        return (2 * i + 2 * dx, 2 * j + 2 * dy)

    parts = {}
    for pname, v in GT["parts"].items():
        parts[pname] = {"S": sorted(v["S"]),
                        "z": [pt(*c) for c in v["cells"]]}
    anchors = [(a["part"], a["S"], pt(*a["cell"])) for a in GT["anchors"]]
    return parts, anchors


def eval_variant(run, parts, anchors, Vx, Vy, orient):
    """orient: (sx, sy, swap) applied to z before gauging (the extraction
    frame's axes may be any signed permutation of the curve frame)."""
    sx, sy, swap = orient
    allz = []
    split = []
    for pname, v in parts.items():
        for (zx, zy) in v["z"]:
            ax, ay = sx * zx, sy * zy
            if swap:
                ax, ay = ay, ax
            allz.append((ax, ay))
        split.append((pname, len(v["z"])))
    P = (np.array(allz, dtype=float) - np.array([Vx, Vy])) / BASE
    digs, alive = run(P)
    if not alive.all():
        return False
    # S values
    w = 4 ** np.arange(NDIG - 1, -1, -1, dtype=np.int64)
    Sv = digs.astype(np.int64) @ w
    pos = 0
    for pname, cnt in split:
        got = sorted(Sv[pos:pos + cnt].tolist())
        if got != parts[pname]["S"]:
            return False
        pos += cnt
    return True


def quick_prefix_filter(run, parts, anchors, Vx, Vy, orient, nlev=4):
    """Cheap reject: the two EYES must produce their exact first nlev
    digits."""
    sx, sy, swap = orient
    pts = []
    want = []
    for (_, S, (zx, zy)) in anchors:
        ax, ay = sx * zx, sy * zy
        if swap:
            ax, ay = ay, ax
        pts.append((ax, ay))
        want.append(digits_of(S)[:nlev])
    P = (np.array(pts, dtype=float) - np.array([Vx, Vy])) / BASE
    digs, alive = run(P)
    if not alive.all():
        return False
    for n in range(len(pts)):
        if digs[n, :nlev].tolist() != want[n]:
            return False
    return True


ORIENTS = [(sx, sy, sw) for sx in (1, -1) for sy in (1, -1)
           for sw in (False, True)]


RV = (np.array([[-1.0, 0.0], [0.0, 1.0]]), np.array([1.0, 0.0]))


def mirror_maps(maps):
    """Conjugate every child map by the vertical-axis reflection of the
    canonical triangle (x -> 1-x)."""
    Mv, bv = RV
    out = []
    for (M, b) in maps:
        M2 = Mv @ M @ Mv
        b2 = Mv @ (M @ bv + b) + bv
        out.append((M2, b2))
    return out


def derive_odd(maps, alt):
    if alt == "none":
        return None
    if alt == "mirror":
        return mirror_maps(maps)
    if alt == "rev":
        return maps[::-1]
    if alt == "mirrorrev":
        return mirror_maps(maps)[::-1]
    raise ValueError(alt)


def eye_V_region(maps, S_eye, maps_odd=None):
    """Compose the child maps along the eye's 9-digit path; return the
    image triangle of the canonical domain (in canonical units).  The eye's
    position must lie inside it, which pins V to a ~2-anchor-unit region."""
    mo = maps if maps_odd is None else maps_odd
    M = np.eye(2)
    b = np.zeros(2)
    for lev, d in enumerate(digits_of(S_eye)):
        Md, bd = (maps if lev % 2 == 0 else mo)[d]
        b = M @ bd + b
        M = M @ Md
    return [M @ v + b for v in (E, X, AP)]


def solve_variant(args):
    (family, vi, pm_idx, step, mode, alt) = args
    maps = _VARIANTS[(family)][vi]
    maps_odd = derive_odd(maps, alt)
    run = make_eval(maps, maps_odd)
    parts, anchors = corpus_z(PARITY_MAPS[pm_idx], mode)
    hits = []
    el = next(a for a in anchors if a[0] == "eye_left")
    tri = eye_V_region(maps, el[1], maps_odd)
    txs = [v[0] for v in tri]
    tys = [v[1] for v in tri]
    for orient in ORIENTS:
        sx, sy, sw = orient
        ax, ay = sx * el[2][0], sy * el[2][1]
        if sw:
            ax, ay = ay, ax
        # (a - V)/BASE in tri  =>  V in a - BASE*tri (scan its bbox)
        vx0, vx1 = ax - BASE * max(txs), ax - BASE * min(txs)
        vy0, vy1 = ay - BASE * max(tys), ay - BASE * min(tys)
        for Vx in np.arange(vx0 - step, vx1 + step + 1e-9, step):
            for Vy in np.arange(vy0 - step, vy1 + step + 1e-9, step):
                if not quick_prefix_filter(run, parts, anchors,
                                           Vx + 1e-4, Vy + 1e-4, orient,
                                           nlev=NDIG):
                    continue
                if eval_variant(run, parts, anchors, Vx + 1e-4, Vy + 1e-4,
                                orient):
                    hits.append({"family": family, "variant": vi,
                                 "pm": pm_idx, "mode": mode, "alt": alt,
                                 "orient": orient,
                                 "V": (float(Vx), float(Vy))})
    return args, hits


_VARIANTS = {}


def sweep(nworkers, family=None):
    fams = [family] if family else ["mid4", "bisect"]
    tasks = []
    for fam in fams:
        _VARIANTS[fam] = variants_with_orders(fam, require_continuity=False)
        log_progress(f"family {fam}: {len(_VARIANTS[fam])} variants")
        alts = os.environ.get("GEOM_ALTS", "none").split(",")
        for vi in range(len(_VARIANTS[fam])):
            for alt in alts:
                tasks.append((fam, vi, 0, 0.0625, "centroid", alt))
                for pm_idx in range(3):
                    tasks.append((fam, vi, pm_idx, 0.0625, "anchor", alt))
    log_progress(f"geom sweep start tasks={len(tasks)}")
    t0 = time.time()
    nhit = 0
    with mp.Pool(nworkers) as pool:
        for n, (args, hits) in enumerate(
            pool.imap_unordered(solve_variant, tasks, chunksize=1)
        ):
            for hsol in hits:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps(hsol) + "\n")
                log_progress(f"HIT {hsol}")
            if (n + 1) % 50 == 0:
                log_progress(f"{n+1}/{len(tasks)} hits={nhit} "
                             f"({time.time()-t0:.0f}s)")
    log_progress(f"geom sweep done {len(tasks)} hits={nhit} "
                 f"({time.time()-t0:.0f}s)")


def selftest():
    """Plant: pick a variant + V, synthesize the corpus's S values from its
    z's, recover the plant."""
    global GT
    fam = "mid4"
    _VARIANTS[fam] = variants_with_orders(fam, require_continuity=False)
    assert _VARIANTS[fam], "no mid4 variants"
    print(f"{fam}: {len(_VARIANTS[fam])} continuous variants")
    maps = _VARIANTS[fam][0]
    run = make_eval(maps)
    pm = PARITY_MAPS[0]
    parts, anchors = corpus_z(pm)
    Vx, Vy = -510.3, -250.6
    orient = (1, 1, False)
    # synthesize S for every cell from its z
    fake = {"parts": {}, "anchors": []}
    ok_all = True
    for pname, v in parts.items():
        zs = np.array(v["z"], dtype=float)
        P = (zs - np.array([Vx, Vy])) / BASE
        digs, alive = run(P)
        if not alive.all():
            ok_all = False
            break
        w = 4 ** np.arange(NDIG - 1, -1, -1, dtype=np.int64)
        Sv = (digs.astype(np.int64) @ w).tolist()
        fake["parts"][pname] = {
            "S": Sv, "cells": GT["parts"][pname]["cells"]}
    assert ok_all, "plant V places cells outside the triangle; move V"
    for pname in ("eye_left", "eye_right"):
        fake["anchors"].append({
            "part": pname, "S": fake["parts"][pname]["S"][0],
            "cell": GT["parts"][pname]["cells"][0]})

    old = GT
    GT = fake
    try:
        parts2, anchors2 = corpus_z(pm)
        t0 = time.time()
        found = []
        for Vx2 in np.arange(Vx - 2, Vx + 2.01, 0.25):
            for Vy2 in np.arange(Vy - 2, Vy + 2.01, 0.25):
                if quick_prefix_filter(run, parts2, anchors2, Vx2, Vy2,
                                       orient) and \
                   eval_variant(run, parts2, anchors2, Vx2, Vy2, orient):
                    found.append((Vx2, Vy2))
        print(f"selftest: {len(found)} V hits near plant in "
              f"{time.time()-t0:.1f}s (expected >= 1)")
        assert found, "plant not recovered"
        # wrong variant must fail at the planted V
        maps_bad = _VARIANTS[fam][1] if len(_VARIANTS[fam]) > 1 else None
        if maps_bad is not None:
            run_bad = make_eval(maps_bad)
            bad = eval_variant(run_bad, parts2, anchors2, Vx, Vy, orient)
            print("wrong-variant check:", "rejected OK" if not bad
                  else "UNEXPECTED PASS")
        print("selftest PASS")
    finally:
        GT = old


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else max(1, (os.cpu_count() or 8) - 8)
        fam = sys.argv[3] if len(sys.argv) > 3 else None
        sweep(nw, fam)
