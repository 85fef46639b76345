"""Harvest exact S<->cell bindings from the level-8 quad rule.

The confirmed rule (reconstruct.py step 5): cells sharing S>>2 form groups
that coincide with centroid-containment groups in the x2-scaled, 180-rotated
pentagon lattice at some offset t.  For each part, match geometric groups to
S>>2 groups; wherever group sizes are unique within a part, the match is
forced.  Singleton matched groups yield EXACT (S, cell) anchors.

Outputs tools/lattice/anchors.json:
  exact:   [[S, [i,j,c]] ...]
  groups:  [{part, S_list, cells, parent} ...]  (matched groups, any size)

Run:  python3 tools/lattice/anchors.py
"""
from __future__ import annotations

import json
from collections import Counter, defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
SHAPES = {int(c): np.array(v) for c, v in GT["shapes"].items()}


def pip(pt, ring):
    x, y = pt
    inside = False
    for a, b in zip(ring[:-1], ring[1:]):
        if (a[1] > y) != (b[1] > y):
            if a[0] + (y - a[1]) / (b[1] - a[1]) * (b[0] - a[0]) > x:
                inside = not inside
    return inside


def locate(y):
    i0, j0 = int(np.floor(y[0])), int(np.floor(y[1]))
    for i in (i0 - 1, i0, i0 + 1):
        for j in (j0 - 1, j0, j0 + 1):
            for c in range(4):
                ring = SHAPES[c] + np.array([i, j])
                if pip(y, np.vstack([ring, ring[:1]])):
                    return (i, j, c)
    return None


def quad_groups(cells, t, M):
    """Group cells by parent pentagon under x2-scaled M-transformed lattice."""
    groups = defaultdict(list)
    for (i, j, c) in cells:
        y = np.linalg.solve(2 * M, SHAPES[c].mean(0) + np.array([i, j]) - t)
        p = locate(y)
        if p is None:
            return None
        groups[p].append((i, j, c))
    return dict(groups)


def main():
    parts = GT["parts"]
    M = -np.eye(2)
    # find all offsets t matching every part's S>>2 size signature
    sigs = {
        p: sorted(Counter(s >> 2 for s in d["S"]).values()) for p, d in parts.items()
    }
    viable = []
    for tx in np.arange(0, 2.0, 0.1):
        for ty in np.arange(0, 2.0, 0.1):
            ok = True
            allg = {}
            for p, d in parts.items():
                g = quad_groups([tuple(c) for c in d["cells"]], np.array([tx, ty]), M)
                if g is None or sorted(len(v) for v in g.values()) != sigs[p]:
                    ok = False
                    break
                allg[p] = g
            if ok:
                viable.append((round(tx, 2), round(ty, 2), allg))
    print(f"viable offsets: {[(t[0], t[1]) for t in viable]}")

    # For each viable offset, compute forced matches.  Keep bindings that are
    # IDENTICAL across all viable offsets (robust to the offset ambiguity).
    per_offset_exact = []
    per_offset_groups = []
    for tx, ty, allg in viable:
        exact = []
        matched = []
        for p, d in parts.items():
            sgroups = defaultdict(list)
            for s in d["S"]:
                sgroups[s >> 2].append(s)
            scount = Counter(len(v) for v in sgroups.values())
            gcount = Counter(len(v) for v in allg[p].values())
            assert scount == gcount
            for size in scount:
                if scount[size] == 1:  # unique size -> forced match
                    sg = next(v for v in sgroups.values() if len(v) == size)
                    gg_key = next(k for k, v in allg[p].items() if len(v) == size)
                    gg = allg[p][gg_key]
                    matched.append(
                        {"part": p, "S_list": sorted(sg), "cells": sorted(gg),
                         "parent": list(gg_key)}
                    )
                    if size == 1:
                        exact.append((sg[0], gg[0]))
        per_offset_exact.append(set(exact))
        per_offset_groups.append(matched)

    robust = set.intersection(*per_offset_exact) if per_offset_exact else set()
    print(f"exact bindings robust across offsets: {len(robust)}")
    for s, cell in sorted(robust):
        print(f"  S={s} ({np.base_repr(s, 4)}) <-> {cell}")
    out = {
        "exact": sorted([s, list(c)] for s, c in robust),
        "groups": per_offset_groups[0] if per_offset_groups else [],
        "viable_offsets": [(t[0], t[1]) for t in viable],
    }
    json.dump(out, open("tools/lattice/anchors.json", "w"), indent=1)
    print(f"matched groups (first offset): {len(out['groups'])}")


if __name__ == "__main__":
    main()
