"""Triangle-bisection space-filling-curve search (Sierpinski/H-curve family).

Curve space: the quintant is a right-isosceles triangle; each S bit bisects
by the median from the right-angle vertex R to the hypotenuse midpoint M.
Curve state: (entry, exit) vertices.  At each step the two children are
{hypA, M, R} and {hypB, M, R} (right angle at M); valid transitions follow
from continuity (entry in first child, exit in second, junction a shared
vertex).  A curve VARIANT is a stationary choice function state -> transition.

Pentagon correspondence: leaf triangle (18 bisections deep, from the 18-bit
res-10 S) maps to pentagon via  pent_center = Glin @ anchor(T) + u[orient],
Glin = B^-1 (B integer, |det|=2), per-orientation offsets u fitted greedily,
pentagon class = f(orient) fitted greedily.  Validation: exact part-set
match for all 146 elephant cells + the two eye anchors.

Run:  python3 tools/lattice/solve_bisect.py
"""
from __future__ import annotations

import itertools
import json
from collections import defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
PART_NAMES = sorted(GT["parts"])
SUFF = {p: list(GT["parts"][p]["S"]) for p in PART_NAMES}
CELLS = {p: [tuple(c) for c in GT["parts"][p]["cells"]] for p in PART_NAMES}
ANCH = {a["part"]: (a["S"], tuple(a["cell"])) for a in GT["anchors"]}
DELTA = {c: np.array(GT["shapes"][str(c)]).mean(0) for c in range(4)}

# ---------------------------------------------------------------- curve
# Vertex roles in a triangle: 0 = hypA, 1 = hypB, 2 = R (right angle).
# State: (e, x) role indices of entry and exit, e != x.
# One bisection: M = mid(hypA, hypB).  Children (unordered):
#   CA = {hypA, M, R} with roles: hypA_child = hypA, hypB_child = R, R_child = M
#   CB = {hypB, M, R} with roles: hypA_child = R,  hypB_child = hypB, R_child = M
# (child hypotenuse = old vertex .. R; right angle always at M.)
# Wait: child CA vertices hypA, M, R; legs: M-hypA and M-R; hypotenuse hypA-R.
# So child roles: hyp ends = {hypA, R}, right angle = M.
#
# A transition for state (e, x): pick first child F in {CA, CB} containing e
# (if e == R both contain it -> branch), junction j in shared {M, R} minus
# used, with x in second child.  Express child states in child roles.

# We enumerate transitions as data: for each state, a list of options:
#   (first_child, junction)  with first_child in {0 (CA), 1 (CB)}.
ROLES = [(e, x) for e in range(3) for x in range(3) if e != x]


def child_role_map(which):
    """Map parent vertex -> (present?, role in child).  Roles: 0 hypA, 1 hypB,
    2 R.  which=0 -> CA={hypA,M,R}: hypA->hypA(0), R->hypB(1), M->R(2).
    which=1 -> CB={hypB,M,R}: R->hypA(0), hypB->hypB(1), M->R(2)."""
    if which == 0:
        return {0: 0, 2: 1, "M": 2}
    return {2: 0, 1: 1, "M": 2}


def options_for_state(e, x):
    opts = []
    for first in (0, 1):
        rm_f = child_role_map(first)
        rm_s = child_role_map(1 - first)
        # entry must be in first child
        if e not in rm_f:
            continue
        # exit must be in second child
        if x not in rm_s:
            continue
        # junction: vertex shared by both children: M or R(parent role 2)
        for j in ("M", 2):
            if j == e or j == x:
                # junction may not coincide with entry of first? it is exit of
                # first child; must differ from entry e; and as entry of second
                # child must differ from exit x.
                if j == e and e in rm_f and rm_f.get(j) == rm_f.get(e):
                    continue
            if j not in rm_f or j not in rm_s:
                continue
            ef, xf = rm_f[e], rm_f[j]
            es, xs = rm_s[j], rm_s[x]
            if ef == xf or es == xs:
                continue
            opts.append((first, (ef, xf), (es, xs)))
    return opts


STATE_OPTS = {st: options_for_state(*st) for st in ROLES}


def all_variants():
    """Cartesian product of per-state option choices (stationary rules)."""
    keys = ROLES
    choice_lists = [STATE_OPTS[k] for k in keys]
    for combo in itertools.product(*[range(len(cl)) if cl else [None] for cl in choice_lists]):
        rule = {}
        dead = False
        for k, ci in zip(keys, combo):
            if ci is None:
                rule[k] = None
            else:
                rule[k] = STATE_OPTS[k][ci]
        yield rule


def leaf_of(S, nbits, rule, V0, st0):
    """Walk nbits MSB-first; V = dict role->coord (np int64, scaled);
    st=(e,x).  Returns (V, st) at leaf, or None if rule missing."""
    V = dict(V0)
    st = st0
    for b in range(nbits - 1, -1, -1):
        bit = (S >> b) & 1
        opt = rule[st]
        if opt is None:
            return None
        first, st_f, st_s = opt
        M = (V[0] + V[1]) // 2
        which = first if bit == 0 else 1 - first
        rm = child_role_map(which)
        newV = {}
        for pv, cr in rm.items():
            newV[cr] = M if pv == "M" else V[pv]
        V = newV
        st = st_f if bit == 0 else st_s
    return V, st


def orient_key(V):
    """Orientation class of a leaf triangle: direction of legs."""
    d1 = V[0] - V[2]
    d2 = V[1] - V[2]
    return (int(np.sign(d1[0])), int(np.sign(d1[1])),
            int(np.sign(d2[0])), int(np.sign(d2[1])))


def main():
    # quintant in curve space, coords scaled by 2^18 for integer midpoints
    SC = 1 << 18
    V0 = {0: np.array([0, 0], dtype=object), 1: np.array([SC, SC], dtype=object),
          2: np.array([SC, 0], dtype=object)}
    # actually place: hypA=(0,0), hypB=(2,0)*? use right isosceles:
    V0 = {0: np.array([0, 0], dtype=object), 1: np.array([2 * SC, 0], dtype=object),
          2: np.array([SC, SC], dtype=object)}

    allS = []
    for p in PART_NAMES:
        for s in SUFF[p]:
            allS.append((p, s))

    bases = []
    for a, b, c, d in itertools.product(range(-2, 3), repeat=4):
        if abs(a * d - b * c) == 1:
            bases.append(np.array([[a, b], [c, d]], dtype=float))

    variants = list(all_variants())
    print(f"{len(variants)} curve variants; {len(bases)} bases")
    nhit = 0
    results = []
    for vi, rule in enumerate(variants):
        # start state: try all (e, x)
        for st0 in ROLES:
            # compute leaves for all S at res 10 (18 bits)
            leaves = {}
            dead = False
            for p, s in allS:
                r = leaf_of(s, 18, rule, V0, st0)
                if r is None:
                    dead = True
                    break
                V, st = r
                # anchor = right-angle vertex, in leaf units (coords are
                # multiples of SC/512... leaf legs = 2*SC/2^9?): normalize
                r = np.array([int(V[2][0]), int(V[2][1])])
                n, rem = divmod(r - 512, 1024)
                if rem[0] or rem[1]:
                    dead = True
                    break
                leaves[(p, s)] = (n, orient_key(V))
            if dead:
                continue
            pitch = 1.0  # n is already the integer position index
            for B in bases:
                Glin = B  # unimodular position map (i,j) = B @ n + u[orient]
                # greedy fit of u[orient] and class f[orient] with backtracking
                # over per-part bijections is expensive; use set-based check:
                # predicted pentagon = Glin @ (r/pitch) + u[o]; for each part,
                # multiset of (Glin r/pitch) grouped by orient must align to
                # cell multiset by per-orient translation. Try to fit u via
                # candidate offsets from the largest part.
                if not fit_and_check(leaves, Glin, pitch):
                    continue
                nhit += 1
                results.append((vi, st0, B.tolist()))
                print("HIT:", vi, st0, B.tolist())
    print("hits:", nhit)
    if results:
        json.dump(results, open("tools/lattice/bisect_solution.json", "w"), indent=1)


def fit_and_check(leaves, Glin, pitch):
    # group observed S by (part, orient); predicted base position per S
    base = {}
    for (p, s), (r, o) in leaves.items():
        q = Glin @ (r / pitch)
        base[(p, s)] = (q, o)
    # orientations present
    orients = sorted({o for (_, o) in base.values()})
    if len(orients) > 8:
        return False
    # per part, cells by class
    part_cells = {p: defaultdict(list) for p in PART_NAMES}
    for p in PART_NAMES:
        for (i, j, c) in CELLS[p]:
            part_cells[p][c].append(np.array([i, j], dtype=float))

    # try assignments orient -> class (consistent globally)
    # count per part per orient how many S; per part per class how many cells
    cnt_o = {p: defaultdict(int) for p in PART_NAMES}
    for (p, s), (q, o) in base.items():
        cnt_o[p][o] += 1
    cnt_c = {p: {c: len(v) for c, v in part_cells[p].items()} for p in PART_NAMES}

    # orientation classes must map to pentagon classes many-to-one such that
    # per-part counts match: sum of orient counts mapping to class c ==
    # cnt_c[p][c] for all p.  With <=8 orients and 4 classes enumerate 4^|o|.
    for assign in itertools.product(range(4), repeat=len(orients)):
        amap = dict(zip(orients, assign))
        ok = True
        for p in PART_NAMES:
            agg = defaultdict(int)
            for o, n in cnt_o[p].items():
                agg[amap[o]] += n
            for c in range(4):
                if agg.get(c, 0) != cnt_c[p].get(c, 0):
                    ok = False
                    break
            if not ok:
                break
        if not ok:
            continue
        # now fit per-orient offset u_o: for each orient, the predicted
        # positions (q) of that orient across parts must equal (by translation)
        # the per-part cell subsets of class amap[o] jointly... fit u from one
        # sample then verify globally.
        if fit_offsets(base, amap, part_cells):
            return True
    return False


def fit_offsets(base, amap, part_cells):
    orients = sorted({o for (_, o) in base.values()})
    # candidate u for each orient from first sample matched to any cell of the
    # right class in the same part; then verify all samples; cells must be
    # consumed exactly (bijection) per part.
    samples = defaultdict(list)
    for (p, s), (q, o) in base.items():
        samples[o].append((p, q))

    def try_orient(k, used):
        if k == len(orients):
            return True
        o = orients[k]
        cls = amap[o]
        p0, q0 = samples[o][0]
        for cell in part_cells[p0][cls]:
            u = cell - q0
            if np.abs(u - np.round(u)).max() > 1e-6:
                continue
            # verify all samples of this orient
            claimed = []
            ok = True
            for p, q in samples[o]:
                tgt = q + u
                key = (p, round(tgt[0]), round(tgt[1]), cls)
                if key in used or key in claimed:
                    ok = False
                    break
                # exists?
                if not any(abs(tgt[0] - c[0]) < 1e-6 and abs(tgt[1] - c[1]) < 1e-6
                           for c in part_cells[p][cls]):
                    ok = False
                    break
                claimed.append(key)
            if not ok:
                continue
            used2 = used | set(claimed)
            if try_orient(k + 1, used2):
                return True
        return False

    return try_orient(0, set())


if __name__ == "__main__":
    main()
