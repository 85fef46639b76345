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
n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
# deterministic synthetic points, JVM-generated (no python in the input path)
df = spark.range(n).select(
    (F.pmod(F.col("id") * 48271, F.lit(360000)) / 1000.0 - 180.0).alias("lon"),
    (F.degrees(F.asin(F.pmod(F.col("id") * 69621, F.lit(2000001)) / 1000000.0 - 1.0))).alias("lat"),
).repartition(cpus * 4).cache()
df.count()
# warm
encode_native(df.limit(10000), "lon", "lat", 10, "cell").agg(F.max("cell")).collect()
best = None
for _ in range(3):
    t0 = time.time()
    out = encode_native(df, "lon", "lat", 10, "cell").groupBy(
        F.shiftrightunsigned(F.col("cell"), 52).alias("p")
    ).count().agg(F.sum("count")).collect()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(f"RESULT cpus={cpus} n={n} best={best:.3f}s thpt={n/best:.0f} rows/s")
spark.stop()
