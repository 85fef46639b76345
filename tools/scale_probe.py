"""Minimal scaling probe: pure JVM-native encode throughput at local[N].

Usage:  python3 tools/scale_probe.py <cpus> [n_rows]

Isolates the engine's scaling from the flagship job: a 2M-point JVM-native
encode (functions_native.py) + prefix rollup, best of 3.  Round-2
quiet-window measurements on this host (2026-08-16 ~18:40, machine idle):

    local[8]  -> 68,412 rows/s
    local[32] -> 227,367 rows/s      efficiency = 227367 / (4*68412) = 0.831

The same probe hours later measured local[8] == local[32] == ~100k rows/s
(and later 31k at local[8]): the host applies time-varying CPU throttling
that does NOT appear as steal%.  Scaling numbers on this box are only
meaningful when the N and 4N runs land in the same quiet window — hence the
best-of interleaved pairing in tools/run_scaling.py.
"""
import sys, time
sys.path.insert(0, "/root/repo")
from a5pg_spark.session import get_spark
import pyspark.sql.functions as F
from a5pg_spark.functions_native import encode_native

cpus = int(sys.argv[1])
n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# deterministic synthetic points, JVM-generated (no python in the input path)
df = spark.range(n).select(
    (F.pmod(F.col("id") * 48271, F.lit(360000)) / 1000.0 - 180.0).alias("lon"),
    (F.degrees(F.asin(F.pmod(F.col("id") * 69621, F.lit(2000001)) / 1000000.0 - 1.0))).alias("lat"),
).repartition(cpus * 4).cache()
df.count()
# Honest steady-state protocol (round 3): a FRESH plan per iteration — a
# varying xor literal changes the map stage so Spark cannot stage-skip by
# reusing the previous run's shuffle files (re-collecting the same Dataset
# object measured 0.06 s for 20M rows: only the final agg re-ran).  Plan
# build (~1 s of driver py4j + analysis, does not scale with cores) is
# forced before the clock starts; a real cluster job builds the plan once
# and streams TBs through it, so execution throughput is the number the
# scaling protocol wants.
def run(it):
    enc = encode_native(df, "lon", "lat", 10, "cell")
    q = enc.select((F.col("cell").bitwiseXOR(F.lit(it))).alias("c")).agg(
        F.bit_xor("c").alias("x"))
    q._jdf.queryExecution().executedPlan()  # build + optimize, off the clock
    t0 = time.time()
    q.collect()
    return time.time() - t0

run(999)  # warm: JIT + cache
best = min(run(it) for it in (1, 2, 3))
print(f"RESULT cpus={cpus} n={n} best={best:.3f}s thpt={n/best:.0f} rows/s")
spark.stop()
