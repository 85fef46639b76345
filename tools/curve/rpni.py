"""State-merging induction over the traversal observation tree (clean impl).

Classes carry: output candidate set + per-slot transition (class or None).
Merging classes intersects outputs and recursively merges transitions.
"""
import itertools, pickle
from hierarchy_extract import tri_cells, children

PA = pickle.load(open("pa.pkl","rb"))
cells_sorted = sorted(PA, key=lambda c: PA[c])
RANK = {c: r for r, c in enumerate(cells_sorted)}
ROOT = (0,0,32,True)
PERMS = ["".join(p) for p in itertools.permutations("LRAM")]
DELTA = 4.0

dp = {r[0]: r for r in pickle.load(open("dp_orders.pkl","rb"))}

nodes = {}
def build(node, s0, path):
    B = node[2]; ch = children(*node)
    order = dp[path][2]
    if B == 4:
        cells_of = {k: tri_cells(*v)[0] for k,v in ch.items()}
        costs = {p: sum((RANK[cells_of[k]]-(s0+j))**2 for j,k in enumerate(p)) for p in PERMS}
        m = min(costs.values())
        nodes[path] = dict(B=B, cands=frozenset(p for p,c in costs.items() if c<=m+DELTA))
        return
    nodes[path] = dict(B=B, cands=frozenset([order]))
    w = (B//2)**2//4
    for j,k in enumerate(order):
        build(ch[k], s0+j*w, path+k)
build(ROOT, 0, "")
paths = sorted(nodes, key=lambda p: (len(p), p))

class UF:
    def __init__(self):
        self.par = {p: p for p in paths}
        self.out = {p: set(nodes[p]["cands"]) for p in paths}
        self.tr = {p: {} for p in paths}
        for p in paths:
            if nodes[p]["B"] > 4:
                for j,k in enumerate(dp[p][2]):
                    self.tr[p][j] = p+k
    def find(self, x):
        while self.par[x]!=x:
            self.par[x]=self.par[self.par[x]]; x=self.par[x]
        return x
    def clone(self):
        u = UF.__new__(UF)
        u.par = dict(self.par)
        u.out = {k:set(v) for k,v in self.out.items()}
        u.tr = {k:dict(v) for k,v in self.tr.items()}
        return u
    def merge(self, a, b):
        stack=[(a,b)]
        while stack:
            x,y = stack.pop()
            rx,ry = self.find(x), self.find(y)
            if rx==ry: continue
            inter = self.out[rx] & self.out[ry]
            if not inter: return False
            self.par[ry]=rx
            self.out[rx]=inter
            for j in range(4):
                tx, ty = self.tr[rx].get(j), self.tr[ry].get(j)
                if tx and ty: stack.append((tx,ty))
                elif ty: self.tr[rx][j]=ty
        return True

uf = UF()
red = [""]
queue = [p for p in paths if len(p)==1]
while queue:
    b = queue.pop(0)
    if uf.find(b)!=b:
        continue
    merged=False
    for r in red:
        trial = uf.clone()
        if trial.merge(r, b):
            uf = trial; merged=True; break
    if not merged:
        red.append(b)
    for p in paths:
        if len(p)==len(b)+1 and p.startswith(b) and uf.find(p)==p and p not in red and p not in queue:
            queue.append(p)
    queue.sort(key=lambda p:(len(p),p))

classes = sorted(set(uf.find(p) for p in paths), key=lambda p:(len(p),p))
print(f"states: {len(classes)}")
for s in classes:
    members=[p for p in paths if uf.find(p)==s]
    outs = sorted(uf.out[s])
    print(f"state '{s or 'ROOT'}': out={outs} n={len(members)} members={members[:8]}")
print("--- transitions ---")
for s in classes:
    row = [uf.find(uf.tr[s][j]) if j in uf.tr[s] else "?" for j in range(4)]
    print(f"{s or 'ROOT'}: {row}")
pickle.dump(dict(classes=classes,
                 out={s:sorted(uf.out[s]) for s in classes},
                 tr={s:{j:uf.find(v) for j,v in uf.tr[s].items()} for s in classes},
                 assign={p: uf.find(p) for p in paths}),
            open("rpni_machine.pkl","wb"))
