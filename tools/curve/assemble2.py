"""Globally order chains by color parameter, then verify graph adjacency.

The colormap is monotone along the curve, so sorting chains by mean
parameter gives the traversal order directly; the chain graph then only
has to confirm consecutive chains share a junction (and fix direction).
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
from trace2 import param_of  # noqa: E402

G = pickle.load(open("/root/repo/tools/curve/graph.pkl", "rb"))
CHAINS = G["chains"]
CLUSTERS = G["clusters"]


def main():
    # drop degenerate self-loop chains
    keep = [i for i, (a, b, p) in enumerate(CHAINS)
            if not (a == b and len(p) <= 4)]
    stats = []
    for i in keep:
        a, b, path = CHAINS[i]
        ps = np.array([param_of(*p) for p in path])
        stats.append((float(ps.mean()), i))
    stats.sort()
    order = [i for _, i in stats]

    # direction within each chain: end with lower param first
    seq = []
    for i in order:
        a, b, path = CHAINS[i]
        k = max(2, len(path) // 4)
        pa = np.mean([param_of(*p) for p in path[:k]])
        pb = np.mean([param_of(*p) for p in path[-k:]])
        seq.append((i, pa <= pb))

    # adjacency check: consecutive chains should share a junction node
    def nodes(i):
        a, b, _ = CHAINS[i]
        return {a, b}

    bad = []
    for t in range(len(seq) - 1):
        i, _ = seq[t]
        j, _ = seq[t + 1]
        shared = nodes(i) & nodes(j)
        if not shared:
            bad.append((t, i, j))
    print(f"chains {len(seq)}, non-adjacent consecutive pairs: {len(bad)}")
    for t, i, j in bad[:30]:
        mi = np.mean([param_of(*p) for p in CHAINS[i][2]])
        mj = np.mean([param_of(*p) for p in CHAINS[j][2]])
        print(f"  t={t} chain{i}{CHAINS[i][0]}->{CHAINS[i][1]} len{len(CHAINS[i][2])} "
              f"p={mi:.1f} | chain{j} {CHAINS[j][0]}->{CHAINS[j][1]} "
              f"len{len(CHAINS[j][2])} p={mj:.1f}")
    with open("/root/repo/tools/curve/order2.pkl", "wb") as f:
        pickle.dump({"seq": seq, "bad": bad}, f)


if __name__ == "__main__":
    main()
