"""Structured automaton CSP: state=(type,g,dir), out=(apply g to base[type],
reverse if dir<0); transition(q, slot)=(t', g*h, d*e) from table[(t, eff_slot)]
where eff_slot = slot if d>0 else 3-slot.  Fit to observation tree."""
import itertools, pickle, sys
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
cells_sorted = sorted(PA, key=lambda c: PA[c])
RANK = {c: r for r,c in enumerate(cells_sorted)}
ROOT=(0,0,32,True)
PERMS=["".join(p) for p in itertools.permutations("LRAM")]
DELTA=float(sys.argv[1]) if len(sys.argv)>1 else 8.0
NTYPES=int(sys.argv[2]) if len(sys.argv)>2 else 2

dp = {r[0]: r for r in pickle.load(open("dp_orders.pkl","rb"))}
nodes={}
def build(node,s0,path):
    B=node[2]; ch=children(*node); order=dp[path][2]
    if B==4:
        cells_of={k:tri_cells(*v)[0] for k,v in ch.items()}
        costs={p:sum((RANK[cells_of[k]]-(s0+j))**2 for j,k in enumerate(p)) for p in PERMS}
        m=min(costs.values())
        nodes[path]=frozenset(p for p,c in costs.items() if c<=m+DELTA)
        return
    nodes[path]=frozenset([order])
    w=(B//2)**2//4
    for j,k in enumerate(order): build(ch[k],s0+j*w,path+k)
build(ROOT,0,"")
paths=sorted(nodes,key=lambda p:(len(p),p))

S3=list(itertools.permutations("LRA"))  # g maps (L,R,A) -> permuted
def apply_g(g, s):
    m={"L":g[0],"R":g[1],"A":g[2],"M":"M"}
    return "".join(m[ch] for ch in s)
def comp(g1,g2):
    """(g1*g2): apply g2 then g1."""
    m2={"L":g2[0],"R":g2[1],"A":g2[2]}
    m1={"L":g1[0],"R":g1[1],"A":g1[2]}
    return tuple(m1[m2[x]] for x in "LRA")
ID=("L","R","A")
OPTS=[(t,h,e) for t in range(NTYPES) for h in S3 for e in (1,-1)]

def out_of(state, bases):
    t,g,d = state
    s = apply_g(g, bases[t])
    return s if d>0 else s[::-1]

def slot_of(p):
    pp,letter=p[:-1],p[-1]
    return pp, dp[pp][2].index(letter)

solutions=[]
base_candidates = [ "".join(p) for p in itertools.permutations("LRAM") ]
def run(bases):
    table={}   # (t, eff_slot) -> (t', h, e)
    states={"":(0,ID,1)}
    if out_of(states[""],bases) not in nodes[""]: return
    def rec(idx):
        if len(solutions)>=500: return
        if idx==len(paths):
            solutions.append((tuple(bases), dict(table))); return
        p=paths[idx]
        if p=="":
            rec(idx+1); return
        pp,slot=slot_of(p)
        t,g,d = states[pp]
        eff = slot if d>0 else 3-slot
        key=(t,eff)
        opts=[table[key]] if key in table else OPTS
        for opt in opts:
            t2,h,e = opt
            st=(t2, comp(g,h), d*e)
            if out_of(st,bases) not in nodes[p]:
                continue
            had = key in table
            if not had: table[key]=opt
            states[p]=st
            rec(idx+1)
            del states[p]
            if not had: del table[key]
    rec(0)

if NTYPES==1:
    run(["AMRL"])
else:
    for b2 in base_candidates:
        run(["AMRL", b2])
print(f"solutions: {len(solutions)}")
pickle.dump(solutions, open("csp_sols.pkl","wb"))
for bases,table in solutions[:5]:
    print("bases",bases)
    for k in sorted(table): print("  ",k,"->",table[k])
