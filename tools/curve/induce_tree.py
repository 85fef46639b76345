"""Top-down structure induction from the extracted visit order.

Hierarchy is positional: node at level l, index i owns s in [i*4^l, (i+1)*4^l).
Centroids of leaf anchors are robust to the ~13 suspect leaves.
For each internal node: classify its 4 children by geometric label
(A=apex-ward, M=center, L/R=base corners) in the node's own up/down frame.
"""
import pickle, sys
import numpy as np

seq = pickle.load(open(sys.argv[1] if len(sys.argv)>1 else "seq_polished.pkl","rb"))
P = np.array(seq, float)  # (256,2) anchor coords in visit order
DEPTH = 4

def node_leaves(l, i):
    w = 4**l
    return P[i*w:(i+1)*w]

def updown(leaves):
    """up-triangle: apex at +y (fewer points near max y). Return +1 up, -1 down."""
    y = leaves[:,1]
    med = (y.max()+y.min())/2
    ntop = (y > med).sum(); nbot = (y < med).sum()
    if ntop == nbot: return 0
    return 1 if ntop < nbot else -1

for l in (3,2):
    print(f"--- level {l} nodes (children are level {l-1}) ---")
    for i in range(4**(DEPTH-l)):
        leaves = node_leaves(l,i)
        c = leaves.mean(0); ud = updown(leaves)
        labels=[]
        for j in range(4):
            ch = node_leaves(l-1, i*4+j)
            d = ch.mean(0)-c
            dy = d[1]*ud if ud!=0 else d[1]
            if np.hypot(*d) < (leaves[:,0].max()-leaves[:,0].min())/8:
                lab="M"
            elif dy > abs(d[0])*0.7: lab="A"
            elif d[0] < 0: lab="L"
            else: lab="R"
            labels.append(lab)
        print(f"node {i}: ud={ud:+d} c=({c[0]:.1f},{c[1]:.1f}) order={''.join(labels)}")
