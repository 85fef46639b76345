"""Track G-closure — ALL free-transition 4-state anchor walks.

Every 4-state sweep so far used group-translation transitions s' = s^h[d]
(optionally digit-reversal-skewed).  This sweep closes the 4-state family
for good: transitions T: (state, digit) -> state FREE over all 4^16 tables,
with s_root = 0 WLOG (state relabeling is absorbed by sweeping T and the
parity coupling pi).  Everything else as Track G v2 NOPIN: anchor-parity
leaf model, all 256 pi couplings x 4 V-parities x 3 parity maps, gauge-free
difference-space DFS, no corner pin.

Vectorized pre-filter: for a numpy batch of B tables, advance all 146 state
chains, build per-part final-state histograms, and join them by hash against
the 256 x 12 feasible 'want' histograms.  Survivors go to the exact table
DFS (solve_anchor2.dfs_tables).

Usage:
  python3 tools/lattice/solve_freet.py selftest
  python3 tools/lattice/solve_freet.py sweep [nworkers] [start_block] [nblocks]
  (blocks of 2^16 tables over the low 8 T-entries; 65536 blocks total)

STATUS: WORKS but infeasible at full scale (~0.5% of tables pass the
signature filter => ~22M DFS calls over all 4^16).  Usable for targeted
blocks.
"""
from __future__ import annotations

import itertools
import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("ANCHOR2_NOPIN", "1")
import solve_anchor2 as v2  # noqa: E402

assert v2.NOPIN, "freet requires ANCHOR2_NOPIN=1 (set before import)"

PARITY_MAPS = v2.PARITY_MAPS
PARITIES = v2.PARITIES
PIDX = v2.PIDX
PREFIX = v2.PREFIX
PROGRESS = os.environ.get("FREET_PROGRESS", "tools/lattice/freet_progress.log")
HITS = "tools/lattice/freet_hits.jsonl"

_PARTS = v2._PARTS
_TARGETS3 = v2._TARGETS3


def log_progress(msg):
    with open(PROGRESS, "a") as fh:
        fh.write(f"{time.strftime('%F %T')} {msg}\n")


# ---- corpus as digit matrix -------------------------------------------
def corpus_digits():
    pnames = list(_PARTS)
    rows = []
    part_of = []
    for pi, pname in enumerate(pnames):
        for suf in _PARTS[pname]["suffixes"]:
            rows.append(list(PREFIX) + list(suf))
            part_of.append(pi)
    return pnames, np.array(rows, dtype=np.int64), np.array(part_of)


PNAMES, DIGMAT, PART_OF = corpus_digits()
NWALK, NLEV = DIGMAT.shape  # 146 x 9


def want_signatures():
    """For each (pm, Vp, pi): the per-part 4-histogram of required final
    states, hashed.  Returns dict hash -> list of (pm, Vp, pi)."""
    sigs = {}
    nparts = len(PNAMES)
    for pm_idx in range(3):
        targets = _TARGETS3[pm_idx]
        for Vp in range(4):
            vpx, vpy = Vp & 1, (Vp >> 1) & 1
            wants = np.zeros((nparts, 4), dtype=np.int16)
            for pi_, pname in enumerate(PNAMES):
                for (tx, ty) in targets[pname]:
                    wants[pi_, PIDX[((tx ^ vpx) & 1, (ty ^ vpy) & 1)]] += 1
            for pi_map in itertools.product(range(4), repeat=4):
                # got[f] must equal sum of wants[q] over pi(q)==f
                sig = np.zeros((nparts, 4), dtype=np.int16)
                for q in range(4):
                    sig[:, pi_map[q]] += wants[:, q]
                key = sig.tobytes()
                sigs.setdefault(key, []).append((pm_idx, Vp, pi_map))
    return sigs


SIGS = want_signatures()


def batch_filter(Tbatch):
    """Tbatch: (B, 16) int8, T[s*4+d].  Returns list of (row, matches)."""
    B = len(Tbatch)
    s = np.zeros((B, NWALK), dtype=np.int8)
    for lev in range(NLEV):
        d = DIGMAT[:, lev].astype(np.int8)          # (NWALK,)
        idx = (s.astype(np.int32) * 4) + d[None, :]
        s = np.take_along_axis(Tbatch, idx, axis=1).astype(np.int8)
    # histograms per part
    nparts = len(PNAMES)
    got = np.zeros((B, nparts, 4), dtype=np.int16)
    for pi_ in range(nparts):
        mask = PART_OF == pi_
        sub = s[:, mask]
        for f in range(4):
            got[:, pi_, f] = (sub == f).sum(ax1 := 1)
    out = []
    for b in range(B):
        key = got[b].tobytes()
        m = SIGS.get(key)
        if m:
            out.append((b, m))
    return out


def full_check(Ttab, combos):
    """Exact DFS for one table over its matching (pm, Vp, pi) combos."""
    T = [[int(Ttab[s * 4 + d]) for d in range(4)] for s in range(4)]
    walks = []
    for pname in PNAMES:
        for suf in _PARTS[pname]["suffixes"]:
            s = 0
            for d in PREFIX:
                s = T[s][d]
            steps = []
            for d in suf:
                steps.append((d, s))
                s = T[s][d]
            walks.append((pname, steps, s))
    el_i = next(n for n, (p, _, _) in enumerate(walks) if p == "eye_left")
    sols = []
    for (pm_idx, Vp, pi_map) in combos:
        targets = _TARGETS3[pm_idx]
        A = tuple(frozenset({pi_map[q]}) for q in range(4))
        r = v2.dfs_tables(T, walks, el_i, targets, A, Vp, 0, [],
                          time.time() + 30)
        if r is not None:
            sols.append({"T": [list(row) for row in T], "pm": pm_idx,
                         "Vp": Vp, "pi": list(pi_map), **r})
    return sols


def run_block(args):
    block, = args
    # T entries: low 8 entries from block-local counter, high 8 from block id
    hi = block
    lo_count = 1 << 16
    base = np.zeros((lo_count, 16), dtype=np.int8)
    # fill high 8 entries (indices 8..15) from hi
    for k in range(8):
        base[:, 8 + k] = (hi >> (2 * k)) & 3
    lo = np.arange(lo_count, dtype=np.int64)
    for k in range(8):
        base[:, k] = ((lo >> (2 * k)) & 3).astype(np.int8)
    nsol = 0
    sols_out = []
    hits = batch_filter(base)
    for (b, combos) in hits:
        sols = full_check(base[b], combos)
        for s in sols:
            nsol += 1
            sols_out.append(s)
    return block, len(hits), sols_out


def sweep(nworkers, start_block=0, nblocks=65536):
    blocks = list(range(start_block, min(65536, start_block + nblocks)))
    log_progress(f"freet sweep start blocks={len(blocks)} "
                 f"(from {start_block})")
    t0 = time.time()
    nhit = ncand = 0
    with mp.Pool(nworkers) as pool:
        for n, (block, ncands, sols) in enumerate(
            pool.imap_unordered(run_block, ((b,) for b in blocks),
                                chunksize=4)
        ):
            ncand += ncands
            for s in sols:
                nhit += 1
                with open(HITS, "a") as fh:
                    fh.write(json.dumps(s, default=str) + "\n")
                log_progress(f"HIT block={block}")
            if (n + 1) % 256 == 0:
                log_progress(f"{n+1}/{len(blocks)} cands={ncand} hits={nhit} "
                             f"({time.time()-t0:.0f}s)")
    log_progress(f"freet sweep done {len(blocks)} blocks cands={ncand} "
                 f"hits={nhit} ({time.time()-t0:.0f}s)")


def selftest():
    """The batch filter must pass a table whose final-state histograms match
    some want signature, and run_block must reproduce a v2-style planted
    solution embedded as a free table."""
    # plant: translation table T(s,d) = s ^ h[d] with h=(0,3,1,2) is inside
    # the free family; verify the filter finds candidate rows in its block
    h = (0, 3, 1, 2)
    Ttab = np.array([ (s ^ h[d]) for s in range(4) for d in range(4)],
                    dtype=np.int8)
    # which block holds it?
    hi = 0
    for k in range(8):
        hi |= int(Ttab[8 + k]) << (2 * k)
    lo = 0
    for k in range(8):
        lo |= int(Ttab[k]) << (2 * k)
    res = batch_filter(Ttab[None, :])
    print("selftest: plant passes signature filter:",
          bool(res), f"(block {hi}, row {lo})")
    t0 = time.time()
    block, ncands, sols = run_block((hi,))
    print(f"selftest: block {hi} scanned in {time.time()-t0:.1f}s, "
          f"{ncands} signature candidates, {len(sols)} full solutions "
          f"(real corpus — 0 expected unless the curve is 4-state)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "selftest":
        selftest()
    else:
        nw = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sb = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        nb = int(sys.argv[4]) if len(sys.argv) > 4 else 65536
        sweep(nw, sb, nb)
