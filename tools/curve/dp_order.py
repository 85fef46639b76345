"""Globally optimal recursive traversal vs color params, by tree DP.

f(node, s0) = min over the 24 child orders of sum of child costs at their
implied start offsets; leaf cost (cell at curve position s) = (rank(cell)-s)^2.
Margins (best vs second-best order at the optimal s0) flag ambiguous nodes.
"""
import itertools, pickle
import numpy as np
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
cells_sorted = sorted(PA, key=lambda c: PA[c])
RANK = {c: r for r, c in enumerate(cells_sorted)}
ROOT = (0,0,32,True)
PERMS = list(itertools.permutations("LRAM"))

cache = {}
def f(node, s0):
    key = (node, s0)
    if key in cache: return cache[key]
    B = node[2]
    if B == 2:
        cell = tri_cells(*node)[0]
        res = (float((RANK[cell]-s0)**2), "", None)
        cache[key] = res
        return res
    ch = children(*node)
    w = (B//2)**2 // 4  # cells per child = (B/2)^2/4? tri of size B has B^2/4 cells
    w = (B//2)**2 // 4
    best = None; second = None
    for perm in PERMS:
        tot = 0.0
        for j,k in enumerate(perm):
            tot += f(ch[k], s0 + j*w)[0]
        if best is None or tot < best[0]:
            second = best; best = (tot, "".join(perm))
        elif second is None or tot < second[0]:
            second = (tot, "".join(perm))
    res = (best[0], best[1], round(second[0]-best[0],1))
    cache[key] = res
    return res

# verify cell count: tri B has B^2/4 cells
assert len(tri_cells(*ROOT)) == 256
cost, order, margin = f(ROOT, 0)
print("root cost", cost, "order", order, "margin", margin)

# walk the optimal tree, print orders + margins
rows=[]
def walk(node, s0, path):
    B = node[2]
    if B == 2: return
    _, order, margin = f(node, s0)
    rows.append((path, B, order, margin))
    ch = children(*node)
    w = (B//2)**2//4
    for j,k in enumerate(order):
        walk(ch[k], s0+j*w, path+k)
walk(ROOT, 0, "")
pickle.dump(rows, open("dp_orders.pkl","wb"))
amb = [r for r in rows if r[3] <= 2.0]
print(f"total nodes {len(rows)}, ambiguous (margin<=2) {len(amb)}")
for path,B,order,margin in rows:
    tag = " <-- AMBIG" if margin<=2.0 else ""
    print(f"{path:5s} B={B:2d} {order} margin={margin}{tag}")
