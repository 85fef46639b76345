"""Variant sweep: report TOP inlier counts; allow level-dependent K tables."""
import itertools, pickle, sys
import numpy as np
from fit_automaton import MUL, digits_of, DEPTH

def state_seq(ds, g, order, timing):
    st = 0; used = []
    for d in ds:
        if timing == "post":
            st = MUL[st, g[d]] if order == "sg" else MUL[g[d], st]
            used.append(st)
        else:
            used.append(st)
            st = MUL[st, g[d]] if order == "sg" else MUL[g[d], st]
    return used

def run(seq, level_dep, revdig):
    pairs = [(s, np.array(xy, float)) for s, xy in enumerate(seq)]
    nk = 4*8*(DEPTH if level_dep else 1)
    tops = []
    for g in itertools.product(range(8), repeat=4):
        for order in ("sg","gs"):
            for timing in ("pre","post"):
                A = np.zeros((len(pairs), nk+1)); Y = np.zeros((len(pairs),2))
                for r,(s,xy) in enumerate(pairs):
                    ds = digits_of(s)
                    if revdig: ds = ds[::-1]
                    sts = state_seq(ds, g, order, timing)
                    for l,(d,st) in enumerate(zip(ds,sts)):
                        col = (d*8+st) + (l*32 if level_dep else 0)
                        A[r,col] += 2**(DEPTH-1-l)
                    A[r,nk]=1.0; Y[r]=xy
                sol,*_ = np.linalg.lstsq(A,Y,rcond=None)
                resid = np.abs(A@sol - Y).max(axis=1)
                # robust refit: drop worst 16, refit, recount
                keep = np.argsort(resid)[:len(pairs)-16]
                sol2,*_ = np.linalg.lstsq(A[keep],Y[keep],rcond=None)
                n = int((np.abs(A@sol2-Y).max(axis=1) < 0.25).sum())
                tops.append((n,g,order,timing))
    tops.sort(key=lambda t:-t[0])
    return tops[:6]

seqfile = sys.argv[1]
seq = pickle.load(open(seqfile,"rb"))
for level_dep in (False,True):
    for revdig in (False,):
        tops = run(seq, level_dep, revdig)
        print(f"level_dep={level_dep} rev={revdig} top:", [(t[0],t[1],t[2],t[3]) for t in tops])
