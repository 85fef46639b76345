import pickle, sys
import numpy as np
from foldtest import unfold
seq = pickle.load(open("seq_polished.pkl","rb"))
for v in (1,):
    pts = [unfold(zx,zy,v) for zx,zy in seq]
    steps = np.array([abs(pts[k+1][0]-pts[k][0])+abs(pts[k+1][1]-pts[k][1]) for k in range(255)])
    for m in range(4):
        sel = steps[np.arange(255)%4==m]
        print(f"v{v} k%4=={m}: unit {int((sel==1).sum())}/{len(sel)} mean {sel.mean():.2f}")
    # per-m parity alternation fold
def unfold2(zx, zy, rev_even, rev_odd, swap):
    m = zy; t = zx - zy - 1; arm = 15 - m
    rev = rev_even if m % 2 == 0 else rev_odd
    if rev: t = (30 - 2*m) - t
    if t <= arm: i,j = m, m+t
    else: i,j = m + (t-arm), m
    return (j,i) if swap else (i,j)
best=[]
for re_ in (0,1):
    for ro in (0,1):
        for sw in (0,1):
            pts=[unfold2(zx,zy,re_,ro,sw) for zx,zy in seq]
            if len(set(pts))!=256: continue
            steps=[abs(pts[k+1][0]-pts[k][0])+abs(pts[k+1][1]-pts[k][1]) for k in range(255)]
            u=sum(1 for s in steps if s==1)
            best.append((u,re_,ro,sw))
best.sort(reverse=True)
print("parity-fold variants:", best)
