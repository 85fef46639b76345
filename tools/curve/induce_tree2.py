"""Robust grammar induction: match children to geometric quarters by
optimal assignment against predicted quarter centroids from the parent's
fitted triangle, recursing orientation down the tree."""
import itertools, pickle, sys
import numpy as np

seq = pickle.load(open(sys.argv[1] if len(sys.argv)>1 else "seq_polished.pkl","rb"))
P = np.array(seq, float)
DEPTH=4

def leaves(l,i):
    w=4**l; return P[i*w:(i+1)*w]

def tri_vertices(leaves, ud):
    """fit triangle vertices from leaf extent; ud=+1 apex up."""
    x0,x1 = leaves[:,0].min(), leaves[:,0].max()
    y0,y1 = leaves[:,1].min(), leaves[:,1].max()
    if ud > 0:
        return np.array([[x0,y0],[x1,y0],[(x0+x1)/2, y1]])
    else:
        return np.array([[x0,y1],[x1,y1],[(x0+x1)/2, y0]])

def updown(le):
    y=le[:,1]; med=(y.max()+y.min())/2
    return 1 if (y>med).sum() < (y<med).sum() else -1

LBL = ["L","R","A","M"]  # v0=left-base, v1=right-base, v2=apex, M=middle

results={}
for l in (3,2,1):
    for i in range(4**(DEPTH-l)):
        le = leaves(l,i); ud = updown(le)
        V = tri_vertices(le, ud)
        cen = V.mean(0)
        # child quarter centroids: corner children 2vi/3 + (vj+vk)/6, middle = cen
        qc = []
        for k in range(3):
            vi=V[k]; vj,vk = V[(k+1)%3], V[(k+2)%3]
            qc.append((2*vi + (vj+vk)/2)/3)
        qc.append(cen)
        qc=np.array(qc)
        ch = np.array([leaves(l-1, i*4+j).mean(0) for j in range(4)])
        best=None
        for perm in itertools.permutations(range(4)):
            cost = sum(np.hypot(*(ch[j]-qc[perm[j]])) for j in range(4))
            if best is None or cost<best[0]: best=(cost,perm)
        cost,perm = best
        order = "".join(LBL[perm[j]] for j in range(4))
        results[(l,i)] = (ud, order, cost)
        print(f"L{l} n{i:2d}: ud={ud:+d} order={order} cost={cost:.2f}")
pickle.dump(results, open("tree_orders.pkl","wb"))
