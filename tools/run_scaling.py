"""Run the BASELINE.md two-parallelism scaling protocol:

1. build the deterministic images table once (fixed seed),
2. run tools/scaling_job.py via spark-submit at --master local[8] and
   local[32] with otherwise identical configs,
3. write BENCH/scaling.json + BENCH/BASELINE.md with throughput at both
   levels and efficiency = thr_32 / (4 × thr_8).

Usage: python tools/run_scaling.py [n_images]
"""

import json
import os
import re
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "BENCH", "data", "images.parquet")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 40000

COMMON = [
    "--conf", "spark.sql.adaptive.enabled=true",
    "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
    "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
    "--conf", "spark.sql.shuffle.partitions=64",
    "--conf", "spark.driver.memory=24g",
    "--conf", "spark.ui.enabled=false",
]


def build_data():
    marker = DATA + ".meta.json"
    if os.path.exists(marker) and json.load(open(marker)).get("n") == N:
        print(f"images table present ({N})")
        return
    print(f"building images table n={N} …")
    sys.path.insert(0, REPO)
    from a5pg_spark.session import get_spark
    from a5pg_spark.sources.images import build_images_df

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(DATA, ignore_errors=True)
    build_images_df(spark, N, slices=64).write.mode("overwrite").parquet(DATA)
    spark.stop()
    json.dump({"n": N, "seed": 42}, open(marker, "w"))


def make_zip() -> str:
    zpath = os.path.join(REPO, "BENCH", "a5pg_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "a5pg_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_one(master: str, zpath: str) -> dict:
    cmd = [
        "spark-submit", "--master", master, "--py-files", zpath,
        *COMMON, os.path.join(REPO, "tools", "scaling_job.py"),
    ]
    env = dict(os.environ, SCALING_DATA=DATA)
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO,
                       timeout=3600)
    m = re.search(r"SCALING_RESULT (\{.*\})", p.stdout)
    if not m:
        sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-3000:] + "\n")
        raise RuntimeError(f"no result from {master}")
    out = json.loads(m.group(1))
    out["submit_wall_sec"] = round(time.time() - t0, 1)
    print(master, "→", out)
    return out


def main():
    os.makedirs(os.path.join(REPO, "BENCH", "data"), exist_ok=True)
    build_data()
    zpath = make_zip()
    # interleaved repeats + median: the host VM shows large run-to-run noise
    # (first-touch fault cost varies with host memory pressure)
    runs8, runs32 = [], []
    for _ in range(3):
        runs8.append(run_one("local[8]", zpath))
        runs32.append(run_one("local[32]", zpath))
    med = lambda rs: sorted(rs, key=lambda r: r["images_per_sec"])[len(rs) // 2]
    r8, r32 = med(runs8), med(runs32)
    eff = r32["images_per_sec"] / (4.0 * r8["images_per_sec"])
    result = {
        "protocol": "BASELINE.md two-parallelism proxy (local[8] vs local[32])",
        "n_images": N,
        "local8": r8,
        "local32": r32,
        "all_runs_8": [r["images_per_sec"] for r in runs8],
        "all_runs_32": [r["images_per_sec"] for r in runs32],
        "throughput_8": r8["images_per_sec"],
        "throughput_32": r32["images_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=1)
    md = f"""# BENCH/BASELINE.md — two-cluster-size scaling evidence

Protocol (BASELINE.md): identical spatial-join + tiling job
(`tools/scaling_job.py`, via `spark-submit --py-files`) on the same
deterministic {N}-image table at two parallelism levels; only the master
string differs.

| run | master | wall (s) | images/sec | join rows | caption invariant |
|---|---|---|---|---|---|
| 1 | local[8] | {r8['wall_sec']} | {r8['images_per_sec']} | {r8['join_rows']} | {r8['caption_invariant_ok']} |
| 2 | local[32] | {r32['wall_sec']} | {r32['images_per_sec']} | {r32['join_rows']} | {r32['caption_invariant_ok']} |

**Scaling efficiency = throughput_32 / (4 × throughput_8) =
{result['scaling_efficiency']}** (target ≥ 0.8 → {"PASS" if result['pass'] else "FAIL"}).

Configs: AQE + skew-join on, Arrow on, shuffle partitions 64 (identical in
both runs).  Results machine-readable in `BENCH/scaling.json`.
Identical outputs across runs (join rows, mosaic cells) evidence determinism.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
