"""Exact child-order extraction: label each positional child block by which
integer child-triangle its cells overlap most. Overlap count = confidence."""
import pickle, sys
import numpy as np
from hierarchy_extract import tri_cells, children

seq = pickle.load(open(sys.argv[1] if len(sys.argv)>1 else "seq_polished.pkl","rb"))
ROOT = (0, 0, 32, True)

def blocks(l, i):
    w = 4**l
    return [set(map(tuple, seq[(i*4+j)*w//4:(i*4+j+1)*w//4])) for j in range(4)]
    
def walk(node, l, i, path, out):
    ch = children(*node)
    tri = {k: set(tri_cells(*v)) for k, v in ch.items()}
    bl = blocks(l, i)
    labels = []
    confs = []
    for j, b in enumerate(bl):
        best = max(tri, key=lambda k: len(tri[k] & b))
        labels.append(best)
        confs.append(len(tri[best] & b) / len(b))
    out.append((l, i, path, "".join(labels), [round(c,2) for c in confs]))
    if l - 1 >= 1:
        for j, lab in enumerate(labels):
            walk(ch[lab], l-1, i*4+j, path + lab, out)
    else:
        # leaf quad: order of the 4 cells by label
        for j, lab in enumerate(labels):
            pass
    return out

out = []
walk(ROOT, 4, 0, "", out)
pickle.dump(out, open("orders_exact.pkl","wb"))
for l,i,path,lab,confs in out:
    flag = "" if all(c>=0.9 for c in confs) else "  <-- NOISY"
    print(f"L{l} i{i:2d} path={path:4s} order={lab} conf={confs}{flag}")
# leaf level: quads (l=1 handled inside? no) — handle B=4 separately
print("--- leaf quads (B=4): cell order by label ---")
def leaf_quads():
    res = []
    # reconstruct each L1 node's triangle by walking the labels
    idx = {(l,i):(path,lab) for l,i,path,lab,_ in out}
    def tri_of(l, i):
        if l == 4: return ROOT
        pl, pi, slot = l+1, i//4, i%4
        parent_tri = tri_of(pl, pi)
        lab = idx[(pl,pi)][1][slot]
        return children(*parent_tri)[lab]
    for i in range(64):
        t = tri_of(1, i)
        ch = children(*t)
        cells = {k: tri_cells(*v)[0] for k,v in ch.items()}
        inv = {v:k for k,v in cells.items()}
        labs = []
        for j in range(4):
            c = tuple(seq[i*4+j])
            labs.append(inv.get(c, "?"))
        res.append((i, "".join(labs)))
    return res
lq = leaf_quads()
pickle.dump(lq, open("leaf_quads.pkl","wb"))
from collections import Counter
print(Counter(l for _,l in lq).most_common())
for i,l in lq:
    if "?" in l: print("  leaf quad", i, l)
