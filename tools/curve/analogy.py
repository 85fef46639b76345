"""Analogy-completion of the polished sequence.

Level-3 nodes that share their known (state, rel-offset) entries are clones
under the stationary automaton; merge their templates to repair the quads
the extraction got wrong. Hard check: result must be a permutation of the
256 anchors.
"""
import pickle
from collections import Counter

SEQ = pickle.load(open("/root/repo/tools/curve/seq_polished.pkl", "rb"))
ANCHORS = set((zx, zy) for zy in range(16) for zx in range(zy + 1, 32 - zy))


def analyze(seq):
    pats, m0 = [], []
    for k in range(64):
        q = seq[4 * k:4 * k + 4]
        pats.append(tuple((m[0] - q[0][0], m[1] - q[0][1]) for m in q[1:]))
        m0.append(q[0])
    keys = [(p, (m[0] % 2, m[1] % 2)) for p, m in zip(pats, m0)]
    cnt = Counter(keys)
    common = [p for p, n in cnt.most_common() if n >= 2]
    st = {p: i for i, p in enumerate(common)}
    qs = [st.get(k, -1) for k in keys]
    return pats, m0, qs, common


def main():
    seq = list(SEQ)
    for rounds in range(4):
        pats, m0, qs, common = analyze(seq)
        changed = 0
        # node entries: (j, state, reloff) known where qs>=0
        nodes = []
        for kp in range(16):
            ent = {}
            for j in range(4):
                k = 4 * kp + j
                if qs[k] >= 0:
                    off = (m0[k][0] - m0[4 * kp][0], m0[k][1] - m0[4 * kp][1])
                    ent[j] = (qs[k], off)
            nodes.append(ent)
        # group nodes: agree on all mutually-known j (require >=2 shared)
        for a in range(16):
            if len(nodes[a]) == 4:
                continue
            # find template candidates
            cands = []
            for b in range(16):
                if b == a or len(nodes[b]) != 4:
                    continue
                shared = [j for j in nodes[a] if j in nodes[b]]
                if len(shared) >= 2 and all(nodes[a][j] == nodes[b][j]
                                            for j in shared):
                    cands.append(b)
            if not cands:
                continue
            # all templates must agree on the missing entries
            missing = [j for j in range(4) if j not in nodes[a]]
            fills = {}
            ok = True
            for j in missing:
                vals = set()
                for b in cands:
                    vals.add(nodes[b][j])
                if len(vals) != 1:
                    ok = False
                    break
                fills[j] = vals.pop()
            if not ok:
                continue
            # apply: rebuild quads j of node a
            newseq = list(seq)
            base = m0[4 * a]
            for j, (s, off) in fills.items():
                pat = common[s][0]
                mm = (base[0] + off[0], base[1] + off[1])
                cells = [mm] + [(mm[0] + p[0], mm[1] + p[1]) for p in pat]
                newseq[16 * a + 4 * j:16 * a + 4 * j + 4] = cells
            if sorted(newseq) == sorted(ANCHORS):
                if newseq != seq:
                    seq = newseq
                    changed += 1
                    print(f"round {rounds}: repaired node {a} "
                          f"(template {cands}) quads {sorted(fills)}")
            else:
                print(f"round {rounds}: node {a} repair broke permutation "
                      f"— skipped")
        if not changed:
            break
    pats, m0, qs, common = analyze(seq)
    print("remaining unknown quads:", [k for k, s in enumerate(qs) if s < 0])
    cnt = Counter((p, par) for (p, par) in
                  [(pats[k], (m0[k][0] % 2, m0[k][1] % 2)) for k in range(64)])
    for p, n in cnt.most_common():
        print(n, p)
    pickle.dump(seq, open("/root/repo/tools/curve/seq_repaired.pkl", "wb"))


if __name__ == "__main__":
    main()
