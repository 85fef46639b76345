"""Empirical entry/exit-corner analysis per node of the DP-optimal traversal."""
import pickle
import numpy as np
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
cells_sorted = sorted(PA, key=lambda c: PA[c])
RANK = {c:r for r,c in enumerate(cells_sorted)}
POS = {r:c for c,r in RANK.items()}   # position -> cell (by rank; leaf-noisy)
ROOT=(0,0,32,True)
dp={r[0]:r for r in pickle.load(open("dp_orders.pkl","rb"))}

def corners(node):
    ox,oy,B,up = node
    s = 1 if up else -1
    # base row: zy=oy, zx in [ox+1, ox+B-1]; apex row zy=oy+s*(B/2-1)
    L=(ox+1,oy); R=(ox+B-1,oy); A=(ox+B//2,oy+s*(B//2-1))
    # wait apex row r=B//2-1: zx in [ox+r+1, ox+B-r-1] -> two cells if B>2?
    return {"L":np.array(L,float),"R":np.array(R,float),"A":np.array(A,float)}

rows=[]
def walk(node,s0,path):
    B=node[2]
    n = B*B//4
    first, last = POS[s0], POS[s0+n-1]
    co = corners(node)
    ec = min(co, key=lambda k: np.hypot(*(np.array(first,float)-co[k])))
    xc = min(co, key=lambda k: np.hypot(*(np.array(last,float)-co[k])))
    ed = min(np.hypot(*(np.array(first,float)-co[k])) for k in co)
    xd = min(np.hypot(*(np.array(last,float)-co[k])) for k in co)
    order = dp[path][2] if B>=4 else ""
    rows.append((path,B,order,ec,xc,round(ed,1),round(xd,1)))
    if B>4:
        ch=children(*node); w=(B//2)**2//4
        for j,k in enumerate(order):
            walk(ch[k],s0+j*w,path+k)
walk(ROOT,0,"")
for path,B,order,ec,xc,ed,xd in rows:
    if B>=4:
        print(f"{path:5s} B={B:2d} {order}  entry={ec}({ed}) exit={xc}({xd})")
