"""Extract the full S->anchor order via recursive triangle decomposition.

The quintant triangle of anchors T(c, B, up) = rows zy' in [0, B/2) with
zx' in [zy'+1, B-1-zy'] (for 'up'); it splits into four half-size
triangles: L (left corner), R (right corner), A (apex), M (middle,
opposite orientation). Child visit order per node from mean color params.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")

PA = pickle.load(open("/root/repo/tools/curve/pa.pkl", "rb"))


def tri_cells(ox, oy, B, up):
    """Anchor set of triangle with base row at zy=oy, base zx span
    [ox+1, ox+B-1], apex pointing +zy if up else -zy."""
    out = []
    for r in range(B // 2):
        zy = oy + r if up else oy - r
        for zx in range(ox + r + 1, ox + B - r):
            out.append((zx, zy))
    return out


def children(ox, oy, B, up):
    h = B // 2
    s = 1 if up else -1
    return {
        "L": (ox, oy, h, up),
        "R": (ox + h, oy, h, up),
        "A": (ox + h // 2, oy + s * (h // 2), h, up),
        "M": (ox + h // 2, oy + s * (h // 2 - 1), h, not up),
    }


def mean_param(cells):
    return float(np.mean([PA[c] for c in cells]))


def recurse(node, depth, path, out):
    ox, oy, B, up = node
    cells = tri_cells(ox, oy, B, up)
    if B == 4:
        # 4 cells: order by individual params
        order = sorted(cells, key=lambda c: PA[c])
        out.append((path, node, None, order))
        return order
    ch = children(ox, oy, B, up)
    # sanity: children partition the cells
    union = []
    for k, c in ch.items():
        cc = tri_cells(*c)
        assert all(x in cells for x in cc), (node, k, c)
        union.extend(cc)
    assert sorted(union) == sorted(cells), (node, len(union), len(cells))
    ranked = sorted(ch, key=lambda k: mean_param(tri_cells(*ch[k])))
    seq = []
    for k in ranked:
        seq.extend(recurse(ch[k], depth + 1, path + k, out))
    out.append((path, node, ranked, None))
    return seq


def main():
    root = (0, 0, 32, True)
    out = []
    seq = recurse(root, 0, "", out)
    assert len(seq) == 256 and len(set(seq)) == 256
    # validate: consecutive anchors are near each other
    steps = [(seq[t + 1][0] - seq[t][0], seq[t + 1][1] - seq[t][1])
             for t in range(255)]
    from collections import Counter
    cnt = Counter(steps)
    big = [(t, seq[t], seq[t + 1], s) for t, s in enumerate(steps)
           if max(abs(s[0]), abs(s[1])) > 1]
    print("step histogram:", cnt.most_common(12))
    print("non-adjacent steps:", len(big))
    for b in big[:20]:
        print("  ", b)
    # child-order patterns per orientation
    pats = Counter()
    for path, node, ranked, leaf in out:
        if ranked:
            pats[(node[3], "".join(ranked))] += 1
    print("child-order patterns:", pats)
    pickle.dump({"seq": seq, "nodes": out},
                open("/root/repo/tools/curve/hier_order.pkl", "wb"))


if __name__ == "__main__":
    main()
