"""csp_struct with composition-convention variants + failure diagnostics."""
import itertools, pickle, sys
from csp_struct import (nodes, paths, dp, S3, apply_g, comp, ID, out_of, slot_of)

NTYPES=int(sys.argv[1]) if len(sys.argv)>1 else 2
VAR=sys.argv[2] if len(sys.argv)>2 else "gh_rev"
OPTS=[(t,h,e) for t in range(NTYPES) for h in S3 for e in (1,-1)]
base_candidates=["".join(p) for p in itertools.permutations("LRAM")]

def run(bases, variant, stats):
    table={}; states={"":(0,ID,1)}
    sols=[]
    if out_of(states[""],bases) not in nodes[""]: return sols
    def rec(idx):
        if len(sols)>=200: return
        if idx==len(paths):
            sols.append((tuple(bases),dict(table))); return
        stats[0]=max(stats[0],idx)
        p=paths[idx]
        if p=="": rec(idx+1); return
        pp,slot=slot_of(p)
        t,g,d=states[pp]
        eff = (slot if d>0 else 3-slot) if "rev" in variant else slot
        key=(t,eff)
        opts=[table[key]] if key in table else OPTS
        for opt in opts:
            t2,h,e=opt
            g2 = comp(g,h) if variant.startswith("gh") else comp(h,g)
            st=(t2,g2,d*e)
            if out_of(st,bases) not in nodes[p]: continue
            had=key in table
            if not had: table[key]=opt
            states[p]=st
            rec(idx+1)
            del states[p]
            if not had: del table[key]
    rec(0)
    return sols

best={}
for variant in ("gh_rev","gh_plain","hg_rev","hg_plain"):
    allsols=[]
    stats=[0]
    if NTYPES==1:
        allsols+=run(["AMRL"],variant,stats)
    else:
        for b2 in base_candidates:
            allsols+=run(["AMRL",b2],variant,stats)
    print(f"variant {variant}: {len(allsols)} sols, deepest idx {stats[0]}/{len(paths)} (path {paths[min(stats[0],len(paths)-1)]})")
    if allsols: pickle.dump(allsols, open(f"csp_sols_{variant}.pkl","wb"))
