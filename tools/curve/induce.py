"""Induce the curve's recursion tables from the extracted level sequences.

Node = (depth, index). Frames: local coord map parent->child per slot:
  L: c -> c ;  R: c -> c + (B/2, 0) ;  A: c -> c + (B/4, B/4)
  M: c -> (3B/4, B/4-1) - c     (inverted)
A node's rule = the digit->slot permutation observed in ITS local frame.
Frames compose down the tree (sign s = +-1, offset t): parent = s*c + t.
"""
import pickle
import sys
from collections import Counter, defaultdict

LEV = pickle.load(open("/root/repo/tools/curve/levels.pkl", "rb"))


def slots(B):
    return {
        "L": (1, (0, 0)),
        "R": (1, (B // 2, 0)),
        "A": (1, (B // 4, B // 4)),
        "M": (-1, (3 * B // 4, B // 4 - 1)),
    }


def tri(d):
    B = 2 ** (d + 1)
    return set((zx, zy) for zy in range(B // 2) for zx in range(zy + 1, B - zy))


def to_local(z, frame):
    s, (ty, tx) = frame
    # frame: parent = s*c + t  => c = s*(parent - t)
    return (s * (z[0] - ty), s * (z[1] - tx))


def main():
    # frames per node, keyed (depth, index). root frame: identity at depth 0..
    frames = {(0, 0): (1, (0, 0))}
    rules = {}
    issues = []
    for d in range(0, 4):
        segs = LEV[d + 1]
        for idx in range(4 ** d):
            fr = frames[(d, idx)]
            B = 2 ** (d + 2)  # child-level coordinates live in base 2^(d+2)
            # node's cells at depth d+1, local coords
            children = [segs[4 * idx + j] for j in range(4)]
            # local coords of children at depth d+1: need frame scaled:
            # parent frame maps child-level coords: local = s*(z - t') where
            # t' is the frame offset expressed at depth d+1 scale.
            loc = [to_local(z, fr) for z in children]
            # determine which slot each child occupies
            sl = slots(B)
            got = []
            for j, c in enumerate(loc):
                found = None
                for name, (s2, t2) in sl.items():
                    cc = to_local(c, (s2, t2))
                    if cc in tri(d_child_of(B)):
                        found = name
                        break
                got.append(found)
            if None in got or len(set(got)) != 4:
                issues.append(((d, idx), loc, got))
                continue
            rules[(d, idx)] = "".join(got)
            # set child frames: compose
            s, (ty, tx) = fr
            for j, name in enumerate(got):
                s2, (t2y, t2x) = sl[name]
                # child local c: parent-local = s2*c + t2 ; global z = s*(parent-local) + t
                # => z = s*s2*c + (s*t2 + t)... careful: to_local inverse:
                # z = s*c_local + t  (since c_local = s*(z-t), s*s=1)
                # parent-local p = s2*c + t2; z = s*p + t = s*s2*c + s*t2 + t
                nfr = (s * s2, (s * t2y + (ty if True else 0), s * t2x + tx))
                # frame offsets must be at the child-level scale: they are,
                # because slot offsets are expressed in child-level coords
                # when B is the child-level base.
                nfr = (s * s2, (s * t2y + ty * 2, s * t2x + tx * 2))
                frames[(d + 1, 4 * idx + j)] = nfr
    print("issues:", len(issues))
    for i in issues[:10]:
        print("  ", i)
    cnt = Counter(rules.values())
    print("rule histogram:", cnt)
    # transitions: rule of node -> (digit -> rule of child)
    trans = defaultdict(Counter)
    for (d, idx), r in rules.items():
        if d == 0:
            continue
        parent = rules.get((d - 1, idx // 4))
        if parent:
            trans[(parent, idx % 4)][r] += 1
    for k in sorted(trans):
        print(k, dict(trans[k]))
    pickle.dump({"rules": rules, "frames": frames},
                open("/root/repo/tools/curve/rules.pkl", "wb"))


def d_child_of(B):
    # tri() depth whose base is B/2 (child triangle inside base-B node)
    import math
    return int(math.log2(B // 2)) - 1


if __name__ == "__main__":
    main()
