"""Exact DFA identification from the traversal observation tree (clean)."""
import itertools, pickle, sys
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
cells_sorted = sorted(PA, key=lambda c: PA[c])
RANK = {c: r for r, c in enumerate(cells_sorted)}
ROOT = (0,0,32,True)
PERMS = ["".join(p) for p in itertools.permutations("LRAM")]
DELTA = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
KMAX  = int(sys.argv[2]) if len(sys.argv) > 2 else 12
MAXSOLS = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

dp = {r[0]: r for r in pickle.load(open("dp_orders.pkl","rb"))}
nodes = {}
def build(node, s0, path):
    B = node[2]; ch = children(*node)
    order = dp[path][2]
    if B == 4:
        cells_of = {k: tri_cells(*v)[0] for k,v in ch.items()}
        costs = {p: sum((RANK[cells_of[k]]-(s0+j))**2 for j,k in enumerate(p)) for p in PERMS}
        m = min(costs.values())
        nodes[path] = frozenset(p for p,c in costs.items() if c<=m+DELTA)
        return
    nodes[path] = frozenset([order])
    w = (B//2)**2//4
    for j,k in enumerate(order):
        build(ch[k], s0+j*w, path+k)
build(ROOT, 0, "")
paths = sorted(nodes, key=lambda p:(len(p),p))

def slot_of(p):
    pp, letter = p[:-1], p[-1]
    return pp, dp[pp][2].index(letter)

def search(K):
    color, outs, tr, sols = {}, [], [], []
    def assign(idx):
        if len(sols) >= MAXSOLS: return
        if idx == len(paths):
            sols.append(([frozenset(o) for o in outs], [dict(t) for t in tr], dict(color)))
            return
        p = paths[idx]
        if p == "":
            outs.append(set(nodes[p])); tr.append({}); color[p] = 0
            assign(idx+1)
            outs.pop(); tr.pop(); del color[p]
            return
        pp, slot = slot_of(p)
        pc = color[pp]
        forced = tr[pc].get(slot)
        cand = [forced] if forced is not None else list(range(len(outs))) + ([len(outs)] if len(outs) < K else [])
        for c in cand:
            new = c == len(outs)
            if new:
                outs.append(set(nodes[p])); tr.append({})
            else:
                inter = outs[c] & nodes[p]
                if not inter: continue
                saved = outs[c]; outs[c] = inter
            had = forced is not None
            if not had: tr[pc][slot] = c
            color[p] = c
            assign(idx+1)
            del color[p]
            if not had: del tr[pc][slot]
            if new: outs.pop(); tr.pop()
            else: outs[c] = saved
    assign(0)
    return sols

for K in range(1, KMAX+1):
    sols = [s for s in search(K) if len(s[0]) == K]
    print(f"K={K}: {len(sols)} machines (cap {MAXSOLS})", flush=True)
    if sols:
        pickle.dump(sols, open(f"dfa_K{K}.pkl","wb"))
        break
