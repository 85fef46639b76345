"""Node visit orders from mean color-params over exact triangles, with
confidence = min gap between consecutive ranked means (in param units).
Leaf quads: per-cell params, gap-based confidence."""
import pickle
import numpy as np
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
ROOT = (0,0,32,True)

def mean_param(cells): return float(np.mean([PA[c] for c in cells]))

rows = []
def walk(node, path):
    B = node[2]
    ch = children(*node)
    stats = {k: mean_param(tri_cells(*v)) for k,v in ch.items()}
    order = sorted(stats, key=lambda k: stats[k])
    vals = [stats[k] for k in order]
    gap = min(b-a for a,b in zip(vals, vals[1:]))
    rows.append((path, B, "".join(order), round(gap,1), [round(v,1) for v in vals]))
    if B > 4:
        for k in order:
            walk(ch[k], path + k)
    else:
        cells_of = {k: tri_cells(*v)[0] for k,v in ch.items()}
        cs = sorted(cells_of, key=lambda k: PA[cells_of[k]])
        vals2 = [PA[cells_of[k]] for k in cs]
        gap2 = min(b-a for a,b in zip(vals2, vals2[1:]))
        rows.append((path+"*", 2, "".join(cs), round(gap2,1), [round(v,1) for v in vals2]))

walk(ROOT, "")
pickle.dump(rows, open("orders_param.pkl","wb"))
for path,B,order,gap,vals in rows:
    if B > 2:
        print(f"{path:5s} B={B:2d} order={order} gap={gap}")
print("--- leaf quads, sorted by confidence gap ---")
leafs = [r for r in rows if r[1]==2]
for path,B,order,gap,vals in sorted(leafs, key=lambda r:-r[3]):
    print(f"{path:6s} order={order} gap={gap:6.1f} vals={vals}")
