"""Host CPU-scaling calibration — no Spark, no engine code.

Runs K identical pure-Python spin workers in parallel processes and reports
aggregate throughput at K=1, 8, 32.  If the HOST's own compute scales at
< 1.0 per core from 8 → 32 (hypervisor overcommit / turbo / aggregate cap),
that ceiling bounds ANY engine's measurable 8→32 efficiency on this box —
the engine cannot out-scale the silicon it runs on.  Used to normalize the
scale_pair.py protocol numbers in BENCH/BASELINE.md.

Usage: python3 tools/cpu_calibrate.py [iters_per_worker]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000


def spin(_):
    t0 = time.time()
    s = 0
    for i in range(ITERS):
        s += i * i
    return time.time() - t0


def run(k: int) -> dict:
    with mp.Pool(k) as p:
        t0 = time.time()
        times = p.map(spin, range(k))
        wall = time.time() - t0
    agg = k * ITERS / wall
    return {"k": k, "wall_s": round(wall, 2),
            "per_worker_s": [round(t, 2) for t in times[:4]],
            "agg_iters_per_s": round(agg)}


def main() -> None:
    out = {}
    for k in (1, 8, 32):
        out[k] = run(k)
        print(json.dumps(out[k]), flush=True)
    eff = out[32]["agg_iters_per_s"] / (4.0 * out[8]["agg_iters_per_s"])
    print(json.dumps({"host_8_to_32_efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
