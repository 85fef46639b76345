"""Chirality-extended bisection-curve search (background sweep).

Extends solve_bisect.py: curve state = (entry_role, exit_role, chirality);
rule tables keyed on all 12 states, each state choosing among its valid
(first-child, junction) options — up to 2^12 variants — plus optional
bit-pair swap of S.  Prefilter: every (part, orientation, parity) leaf group
must embed 100% by translation into a single pentagon class; survivors get
the full cross-part consistent fit (per-(orient,parity) offsets + class map,
exact set bijection per part).

Writes hits to tools/lattice/bisect2_hits.jsonl as they are found.

Run:  python3 tools/lattice/solve_bisect2.py [--quick]
"""
from __future__ import annotations

import itertools
import json
import sys
from collections import defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])
SUFF = {p: list(GT["parts"][p]["S"]) for p in PART_NAMES}
CELLS = {p: [tuple(c) for c in GT["parts"][p]["cells"]] for p in PART_NAMES}

SC = 1 << 18
V0 = {0: (0, 0), 1: (2 * SC, 0), 2: (SC, SC)}


def child_role_map(which):
    if which == 0:
        return {0: 0, 2: 1, "M": 2}
    return {2: 0, 1: 1, "M": 2}


def chi_of(V):
    ax, ay = V[0]
    bx, by = V[1]
    rx, ry = V[2]
    cr = (bx - ax) * (ry - ay) - (by - ay) * (rx - ax)
    return 1 if cr > 0 else -1


def options_for_state(e, x):
    opts = []
    for first in (0, 1):
        rm_f = child_role_map(first)
        rm_s = child_role_map(1 - first)
        if e not in rm_f or x not in rm_s:
            continue
        for j in ("M", 2):
            if j == e or j == x:
                continue
            if j not in rm_f or j not in rm_s:
                continue
            ef, xf = rm_f[e], rm_f[j]
            es, xs = rm_s[j], rm_s[x]
            if ef == xf or es == xs:
                continue
            opts.append((first, (ef, xf), (es, xs)))
    return opts


ROLES = [(e, x) for e in range(3) for x in range(3) if e != x]
BASE_OPTS = {st: options_for_state(*st) for st in ROLES}
STATES = [(e, x, chi) for (e, x) in ROLES for chi in (1, -1)]


def walk(S, nbits, rule, st0, swap_pairs=False):
    """rule: dict (e,x,chi) -> option; returns (R_vertex, orient, ok)."""
    if swap_pairs:
        s2 = 0
        for k in range(nbits // 2):
            d = (S >> (2 * k)) & 3
            d = ((d & 1) << 1) | (d >> 1)
            s2 |= d << (2 * k)
        S = s2
    V = dict(V0)
    e, x = None, None
    st = st0
    for b in range(nbits - 1, -1, -1):
        bit = (S >> b) & 1
        chi = chi_of(V)
        opt = rule.get((st[0], st[1], chi))
        if opt is None:
            return None
        first, st_f, st_s = opt
        M = ((V[0][0] + V[1][0]) // 2, (V[0][1] + V[1][1]) // 2)
        which = first if bit == 0 else 1 - first
        rm = child_role_map(which)
        newV = {}
        for pv, cr in rm.items():
            newV[cr] = M if pv == "M" else V[pv]
        V = newV
        st = st_f if bit == 0 else st_s
    d1 = (V[0][0] - V[2][0], V[0][1] - V[2][1])
    d2 = (V[1][0] - V[2][0], V[1][1] - V[2][1])
    o = (int(np.sign(d1[0])), int(np.sign(d1[1])), int(np.sign(d2[0])), int(np.sign(d2[1])))
    return V[2], o


def main():
    quick = "--quick" in sys.argv
    bases = [np.array([[a, b], [c, d]])
             for a, b, c, d in itertools.product(range(-2, 3), repeat=4)
             if abs(a * d - b * c) == 1]
    # enumerate rule tables: per state the option list (same options for both
    # chiralities structurally)
    per_state_opts = {st: BASE_OPTS[(st[0], st[1])] for st in STATES}
    state_list = [st for st in STATES if per_state_opts[st]]
    nopts = [len(per_state_opts[st]) for st in state_list]
    total = 1
    for n in nopts:
        total *= n
    print(f"variant space: {total} rule tables x {len(ROLES)} starts x 2 bitorders")

    out = open("tools/lattice/bisect2_hits.jsonl", "a")
    tried = 0
    for combo in itertools.product(*[range(n) for n in nopts]):
        rule = {st: per_state_opts[st][ci] for st, ci in zip(state_list, combo)}
        for swap in (False, True):
            for st0 in ROLES:
                tried += 1
                if quick and tried > 200:
                    print("quick mode stop")
                    return
                # leaves
                leaves = defaultdict(list)
                dead = False
                for p in PART_NAMES:
                    for s in SUFF[p]:
                        r = walk(s, 18, rule, st0, swap)
                        if r is None:
                            dead = True
                            break
                        (rx, ry), o = r
                        nx, remx = divmod(rx - 512, 1024)
                        ny, remy = divmod(ry - 512, 1024)
                        if remx or remy:
                            dead = True
                            break
                        leaves[p].append(((nx, ny), o, s))
                    if dead:
                        break
                if dead:
                    continue
                for B in bases:
                    if check_candidate(leaves, B):
                        hit = {"rule": {str(k): v for k, v in rule.items()},
                               "st0": st0, "swap": swap, "B": B.tolist()}
                        out.write(json.dumps(hit) + "\n")
                        out.flush()
                        print("HIT:", hit)
    print(f"done; tried {tried}")


def check_candidate(leaves, B):
    """Every (part, orient, parity-variant) group must embed by translation
    into one class; then global consistency (same offset per (o,par) across
    parts, class map consistent, exact bijections)."""
    # transform positions
    tl = {}
    for p, items in leaves.items():
        tl[p] = [((int(B[0, 0] * n[0] + B[0, 1] * n[1]),
                   int(B[1, 0] * n[0] + B[1, 1] * n[1])), o, s) for n, o, s in items]
    # parity in TRANSFORMED coords: (x+y)%2 is basis-invariant-ish; try x,y,x+y
    for pf in (lambda z: z[0] % 2, lambda z: z[1] % 2, lambda z: (z[0] + z[1]) % 2,
               lambda z: 0):
        groups = defaultdict(lambda: defaultdict(list))  # (o,par) -> part -> [pos]
        for p, items in tl.items():
            for pos, o, s in items:
                groups[(o, pf(pos))][p].append(pos)
        if len(groups) > 8:
            continue
        # fit offset+class per group, consistent across parts, bijective cells
        cell_sets = {p: defaultdict(set) for p in PART_NAMES}
        for p in PART_NAMES:
            for (i, j, c) in CELLS[p]:
                cell_sets[p][c].add((i, j))
        gkeys = sorted(groups.keys(), key=lambda g: -sum(len(v) for v in groups[g].values()))

        def fit(k, used):
            if k == len(gkeys):
                return True
            g = gkeys[k]
            gparts = groups[g]
            p0 = max(gparts, key=lambda p: len(gparts[p]))
            z0 = gparts[p0][0]
            for c in range(4):
                for tgt in cell_sets[p0][c]:
                    u = (tgt[0] - z0[0], tgt[1] - z0[1])
                    claimed = set()
                    ok = True
                    for p, zs in gparts.items():
                        for z in zs:
                            key = (p, z[0] + u[0], z[1] + u[1], c)
                            if key in used or key in claimed or \
                               (z[0] + u[0], z[1] + u[1]) not in cell_sets[p][c]:
                                ok = False
                                break
                            claimed.add(key)
                        if not ok:
                            break
                    if ok and fit(k + 1, used | claimed):
                        return True
            return False

        if fit(0, set()):
            return True
    return False


if __name__ == "__main__":
    main()
