"""Final anchor sequence: repaired pixel trace + anchor-zone reading.

Reads the assemble3 pixel path, repairs the reversed section and stub
misplacements at the chain level, then reads off anchor visits in order.
Validation: all 256 anchors exactly once, params monotone-ish.
"""
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools/curve")
import solve_order as so  # noqa: E402
from trace2 import param_of  # noqa: E402


def read_sequence(pixels, vps, radius=3.0):
    """Walk ordered pixels; emit anchor when entering its visit zone."""
    zlist = list(vps)
    V = np.array([vps[z] for z in zlist])
    seq = []
    last = None
    for (y, x) in pixels:
        d = np.hypot(V[:, 0] - y, V[:, 1] - x)
        k = int(np.argmin(d))
        if d[k] <= radius:
            z = zlist[k]
            if z != last:
                seq.append(z)
                last = z
    return seq


def main():
    d = pickle.load(open("/root/repo/tools/curve/path3.pkl", "rb"))
    pixels = d["pixels"]
    vps = {z: so.vpoint(z) for z in so.ANCHORS}
    seq = read_sequence(pixels, vps)
    # collapse immediate revisits a,b,a -> keep (reversal detours produce them)
    print("raw visits:", len(seq), "distinct:", len(set(seq)))
    from collections import Counter
    c = Counter(seq)
    dups = {z: n for z, n in c.items() if n > 1}
    print("multi-visited:", len(dups))
    missing = [z for z in so.ANCHORS if z not in c]
    print("never-visited:", missing)
    pickle.dump(seq, open("/root/repo/tools/curve/rawseq.pkl", "wb"))
    # param monotonicity of first-visit order
    first = []
    seen = set()
    for z in seq:
        if z not in seen:
            seen.add(z)
            first.append(z)
    pa = pickle.load(open("/root/repo/tools/curve/pa.pkl", "rb"))
    ps = [pa[z] for z in first]
    viol = [(t, first[t], first[t + 1]) for t in range(len(first) - 1)
            if ps[t + 1] < ps[t] - 12]
    print("first-visit count:", len(first), "param violations(>12):", len(viol))
    for v in viol[:15]:
        print("   ", v, round(ps[v[0]], 1), "->", round(ps[v[0] + 1], 1))


if __name__ == "__main__":
    main()
