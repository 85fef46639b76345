"""Direct forward-verification of 'upstream-shape' Hilbert anchor tables.

Rationale (round 4): the refuted Track A/B sweeps covered sign-flip tables
G(d,s) = diag(s) @ t_d (flips around 0).  A reflected-corner table
G(d,s) = refl(corner_d, s) with refl around the unit-cell CENTER
(x -> 1-x) is the other natural Hilbert construction (it is what a curve
anchored at sub-square corners actually uses), and it is NOT in the
diag-family (the state-dependent +1 shift is additive).  It IS inside
solve_free's free-table family, but much of that Z22 space TIMED OUT in
the round-4 sweep.  Here we enumerate the corner-shape candidates
explicitly (~12k configs) and forward-verify each against the full
ground truth in milliseconds — no DFS.

Model per candidate:
    state s in Z2xZ2 (bit0 = flip-k, bit1 = flip-j), s' = s XOR h[d]
    walk  z = sum_k diag(sx,sy)^(5-k) * G(d_k, s_k)   (MSB-first, 6 suffix
          digits; state seeded by the shared '300' prefix from identity)
    leaf  class c = kappa(state_final, d_last)  [fitted greedily]
    cell  2*(i,j) = z + V - E[c]                [V, E fitted from data]

Usage: python tools/lattice/direct_corner_test.py
"""
from __future__ import annotations

import itertools
import json
import os
import sys
import time
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from solve_free import digits_of, load_parts  # noqa: E402

CORNERS = [(0, 1), (1, 0), (1, 1)]


def refl_center(p, s):
    return (1 - p[0] if s & 1 else p[0], 1 - p[1] if s & 2 else p[1])


def refl_sign(p, s):
    return (-p[0] if s & 1 else p[0], -p[1] if s & 2 else p[1])


def candidates():
    """(corner_map, action, h, sx, sy) tuples, prior-ordered."""
    for action in (refl_center, refl_sign):
        for perm in itertools.permutations(CORNERS):
            corner = {0: (0, 0), 1: perm[0], 2: perm[1], 3: perm[2]}
            for hv in itertools.product(range(4), repeat=4):
                for sx, sy in ((-2, -2), (2, 2), (2, -2), (-2, 2)):
                    yield corner, action, hv, sx, sy


class NodeBudget(Exception):
    pass


def check(corner, action, hv, sx, sy, anchors, parts, max_nodes=200_000):
    nodes = [0]
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    f0 = 0
    for d in (3, 0, 0):
        f0 ^= hv[d]

    def fwd(sfx):
        s, zx, zy = f0, 0, 0
        for k, d in enumerate(sfx):
            gx, gy = action(corner[d], s)
            zx += WX[k] * gx
            zy += WY[k] * gy
            s ^= hv[d]
        return zx, zy, s, sfx[-1]

    # ---- eyes: pin V up to per-class E gauge -------------------------
    (nl, sl, cl), (nr, sr, cr) = anchors
    zl = fwd(sl)
    zr = fwd(sr)
    ckl, ckr = (zl[2], zl[3]), (zr[2], zr[3])
    if ckl == ckr and cl[2] != cr[2]:
        return None
    # kappa seeds
    KAP = {ckl: cl[2], ckr: cr[2]}
    if KAP[ckl] != cl[2] or KAP[ckr] != cr[2]:
        return None
    # delta_c := E[c] - V  satisfies  z(w) - 2*cell(w) = delta_{c(w)}
    DELTA = {cl[2]: (zl[0] - 2 * cl[0], zl[1] - 2 * cl[1]),
             cr[2]: (zr[0] - 2 * cr[0], zr[1] - 2 * cr[1])}
    if cl[2] == cr[2] and DELTA[cl[2]] != (zr[0] - 2 * cr[0],
                                           zr[1] - 2 * cr[1]):
        return None

    # ---- parts: class-translation multiset matching ------------------
    # one DFS across ALL parts so kappa/delta choices backtrack globally
    pdata = []
    for pname, slist, cells in parts:
        gw = defaultdict(list)
        for s in slist:
            w = fwd(tuple(digits_of(s)[3:]))
            gw[(w[2], w[3])].append((w[0], w[1]))
        cbc = defaultdict(list)
        for (i, j, c) in cells:
            cbc[c].append((2 * i, 2 * j))
        target_n = {c: len(v) for c, v in cbc.items()}
        if sum(len(v) for v in gw.values()) != sum(target_n.values()):
            return None
        keys = sorted(gw, key=lambda k: -len(gw[k]))
        pdata.append((keys, dict(gw), cbc, target_n))

    def verify_part(class_pts, cbc):
        """All keys of a part assigned: check per-class translations."""
        for c, pts in class_pts.items():
            tgt = cbc.get(c, [])
            if len(pts) != len(tgt):
                return None
            if not pts:
                continue
            d = DELTA.get(c)
            if d is None:
                pc = Counter(pts)
                tc = Counter(tgt)
                p0 = min(pc)
                for t0 in tc:
                    dd = (p0[0] - t0[0], p0[1] - t0[1])
                    if Counter((x - dd[0], y - dd[1])
                               for x, y in pts) == tc:
                        DELTA[c] = dd
                        break
                else:
                    return None
            else:
                if Counter((x - d[0], y - d[1])
                           for x, y in pts) != Counter(tgt):
                    return None
        return True

    def solve_part(pi):
        if pi == len(pdata):
            return True
        keys, groups, cbc, target_n = pdata[pi]
        counts = {c: 0 for c in range(4)}

        def assign(ki, class_pts):
            nodes[0] += 1
            if nodes[0] > max_nodes:
                raise NodeBudget
            if ki == len(keys):
                saved = dict(DELTA)
                if verify_part(class_pts, cbc) and solve_part(pi + 1):
                    return True
                DELTA.clear()
                DELTA.update(saved)
                return False
            k = keys[ki]
            opts = [KAP[k]] if k in KAP else list(range(4))
            gsz = len(groups[k])
            for c in opts:
                if counts[c] + gsz > target_n.get(c, 0):
                    continue
                new = k not in KAP
                if new:
                    KAP[k] = c
                counts[c] += gsz
                class_pts.setdefault(c, []).extend(groups[k])
                if assign(ki + 1, class_pts):
                    return True
                counts[c] -= gsz
                for _ in groups[k]:
                    class_pts[c].pop()
                if new:
                    del KAP[k]
            return False

        return assign(0, {})

    if not solve_part(0):
        return None
    return {"corner": {d: corner[d] for d in corner},
            "action": action.__name__, "h": list(hv),
            "sx": sx, "sy": sy, "KAP": {str(k): v for k, v in KAP.items()},
            "DELTA": {str(c): v for c, v in DELTA.items()}}


def selftest():
    """Plant a refl-center corner table over the REAL S sets; the direct
    tester must accept the planted config and find it in a full scan."""
    import random
    rnd = random.Random(7)
    hv = (0,) + tuple(rnd.randrange(4) for _ in range(3))
    rest = [(0, 1), (1, 1), (1, 0)]
    rnd.shuffle(rest)
    corner = {0: (0, 0), 1: rest[0], 2: rest[1], 3: rest[2]}
    sx, sy = -2, -2
    WX = [sx ** (5 - k) for k in range(6)]
    WY = [sy ** (5 - k) for k in range(6)]
    f0 = hv[3] ^ hv[0] ^ hv[0]

    def fwd(sfx):
        s, zx, zy = f0, 0, 0
        for k, d in enumerate(sfx):
            gx, gy = refl_center(corner[d], s)
            zx += WX[k] * gx
            zy += WY[k] * gy
            s ^= hv[d]
        return zx, zy, s, sfx[-1]

    par2c = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}
    Ep = {0: (0, 0), 1: (1, 0), 2: (1, 1), 3: (0, 1)}

    def to_cell(zx, zy):
        c = par2c[(zx & 1, zy & 1)]
        e = Ep[c]
        return ((zx - e[0]) // 2, (zy - e[1]) // 2, c)

    anchors, parts = load_parts()
    anchors = [(nm, sfx, to_cell(*fwd(sfx)[:2])) for nm, sfx, _ in anchors]
    new_parts = []
    for nm, slist, _ in parts:
        cells = [to_cell(*fwd(tuple(digits_of(s)[3:]))[:2]) for s in slist]
        assert len(set(cells)) == len(cells), "plant not injective"
        new_parts.append((nm, slist, cells))
    r = check(corner, refl_center, hv, sx, sy, anchors, new_parts)
    assert r is not None, "direct tester rejected its own plant"
    print("selftest: plant accepted:", json.dumps(r)[:120])
    # and a wrong config must be rejected
    bad = check(corner, refl_center, (hv[0], hv[1] ^ 1, hv[2], hv[3]),
                sx, sy, anchors, new_parts)
    print("selftest: perturbed h rejected:", bad is None)
    return r is not None and bad is None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        sys.exit(0 if selftest() else 1)
    anchors, parts = load_parts()
    t0 = time.time()
    n = 0
    deferred = []
    for corner, action, hv, sx, sy in candidates():
        n += 1
        try:
            r = check(corner, action, hv, sx, sy, anchors, parts)
        except NodeBudget:
            deferred.append((corner, action, hv, sx, sy))
            continue
        if r:
            print("SOLUTION", json.dumps(r))
            json.dump(r, open("tools/lattice/direct_corner_solution.json",
                              "w"), indent=1)
            return
        if n % 2000 == 0:
            print(f"{n} tested, {len(deferred)} deferred "
                  f"({time.time()-t0:.1f}s)", flush=True)
    print(f"pass 1: no fast solution among {n} candidates, "
          f"{len(deferred)} deferred ({time.time()-t0:.1f}s)", flush=True)
    for ci, (corner, action, hv, sx, sy) in enumerate(deferred):
        try:
            r = check(corner, action, hv, sx, sy, anchors, parts,
                      max_nodes=100_000_000)
        except NodeBudget:
            print(f"deferred {ci}: still over budget "
                  f"h={hv} s=({sx},{sy}) {action.__name__}", flush=True)
            continue
        if r:
            print("SOLUTION", json.dumps(r))
            json.dump(r, open("tools/lattice/direct_corner_solution.json",
                              "w"), indent=1)
            return
        if ci % 20 == 0:
            print(f"deferred {ci}/{len(deferred)} ({time.time()-t0:.1f}s)",
                  flush=True)
    print(f"no solution among {n} corner-shape candidates "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
