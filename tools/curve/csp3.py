import itertools, pickle, sys
from csp_struct import (nodes, paths, dp, S3, apply_g, comp, ID, out_of, slot_of)

NTYPES=3
VARIANTS=("gh_rev","gh_plain","hg_rev","hg_plain")
OPTS=[(t,h,e) for t in range(NTYPES) for h in S3 for e in (1,-1)]
base_candidates=["".join(p) for p in itertools.permutations("LRAM")]

def run(bases, variant, sols, cap=200):
    table={}; states={"":(0,ID,1)}
    if out_of(states[""],bases) not in nodes[""]: return
    def rec(idx):
        if len(sols)>=cap: return
        if idx==len(paths):
            sols.append((tuple(bases),dict(table),variant)); return
        p=paths[idx]
        if p=="": rec(idx+1); return
        pp,slot=slot_of(p)
        t,g,d=states[pp]
        eff=(slot if d>0 else 3-slot) if "rev" in variant else slot
        key=(t,eff)
        opts=[table[key]] if key in table else OPTS
        for opt in opts:
            t2,h,e=opt
            g2=comp(g,h) if variant.startswith("gh") else comp(h,g)
            st=(t2,g2,d*e)
            if out_of(st,bases) not in nodes[p]: continue
            had=key in table
            if not had: table[key]=opt
            states[p]=st
            rec(idx+1)
            del states[p]
            if not had: del table[key]
    rec(0)

# canonical: base1's family chosen up to S3xZ2 -> enumerate REPRESENTATIVES:
# families are determined by M position + the cyclic class; to be safe, sweep all,
# but fix base1 <= base2 to halve.
for variant in VARIANTS:
    sols=[]
    for b1 in base_candidates:
        for b2 in base_candidates:
            if b2 < b1: continue
            run(["AMRL",b1,b2], variant, sols)
            if len(sols)>=200: break
        if len(sols)>=200: break
    print(f"{variant}: {len(sols)} sols")
    if sols:
        pickle.dump(sols, open(f"csp3_{variant}.pkl","wb"))
