"""Verify the recursive quad hierarchy and build the geometric ancestor tree.

Hypothesis: the level-8 rule recurses — a level-L parent pentagon's center,
unscaled by (x - t)/(-2), lands in the SAME unit pentagon lattice, so the
ancestor chain of every leaf is computable by iterating locate().
Validation: for each part and each depth k, the size signature of leaf groups
sharing S >> 2k must equal the size signature of groups sharing the level-(9-k)
geometric ancestor.

Run:  python3 tools/lattice/hierarchy.py
"""
from __future__ import annotations

import json
from collections import Counter, defaultdict

import numpy as np

GT = json.load(open("tools/lattice/groundtruth.json"))
SHAPES = {int(c): np.array(v) for c, v in GT["shapes"].items()}
T = np.array([0.3, 1.5])


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
    best = None
    for i in (i0 - 2, i0 - 1, i0, i0 + 1, i0 + 2):
        for j in (j0 - 2, j0 - 1, j0, j0 + 1, j0 + 2):
            for c in range(4):
                ring = SHAPES[c] + np.array([i, j])
                if pip(y, np.vstack([ring, ring[:1]])):
                    if best is not None:
                        raise RuntimeError(f"ambiguous locate {y}")
                    best = (i, j, c)
    return best


def center(cell):
    i, j, c = cell
    return SHAPES[c].mean(0) + np.array([i, j])


def parent(cell):
    return locate((center(cell) - T) / -2.0)


def main():
    parts = GT["parts"]
    max_depth = 6
    chains = {}  # leaf cell -> [ancestor at depth 1, 2, ...]
    for pname, d in parts.items():
        for cell in d["cells"]:
            cur = tuple(cell)
            ch = []
            ok = True
            for _ in range(max_depth):
                cur = parent(cur)
                if cur is None:
                    ok = False
                    break
                ch.append(cur)
            chains[tuple(cell)] = ch if ok else None

    n_bad = sum(1 for v in chains.values() if v is None)
    print(f"ancestor chains: {len(chains)} leaves, {n_bad} failed")

    for pname, d in parts.items():
        cells = [tuple(c) for c in d["cells"]]
        S = d["S"]
        print(f"\n{pname} ({len(cells)} cells):")
        for k in range(1, max_depth + 1):
            ssig = sorted(Counter(s >> (2 * k) for s in S).values())
            gg = defaultdict(int)
            bad = False
            for c in cells:
                ch = chains[c]
                if ch is None or len(ch) < k:
                    bad = True
                    break
                gg[ch[k - 1]] += 1
            gsig = sorted(gg.values())
            status = "MATCH" if (not bad and ssig == gsig) else "MISMATCH"
            print(f"  depth {k}: S-sig {ssig}")
            print(f"           G-sig {gsig}  -> {status}")


if __name__ == "__main__":
    main()
