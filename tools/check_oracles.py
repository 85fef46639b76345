"""Simulate the driver's correctness gate: run every __spark_entry__ query on
Spark and its DuckDB oracle side-by-side at sf0.01, compare row count, column
names, and order-insensitive values (4-decimal float tolerance in the diff
report; the driver hashes exact values, so we flag ANY bitwise difference).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from a5pg_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None

spark = get_spark(shuffle_partitions=16)
con = duckdb.connect()
for t in E.TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = E.queries()
os_ = E.oracle_sql()

print(f"checking {len(qs)} queries ({len(os_)} with oracles) at {SF_DIR}")
fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    sdf = fn(spark, SF_DIR).toPandas()
    t1 = time.time()
    if name not in os_:
        print(f"  {name:28s} rows={len(sdf):6d}  (rows-only, {t1-t0:.1f}s)")
        continue
    ddf = con.execute(os_[name]).fetchdf()
    # normalize: sort columns by name, sort rows by all columns
    def norm(df):
        df = df[sorted(df.columns)].copy()
        return df.sort_values(list(df.columns)).reset_index(drop=True)
    s, d = norm(sdf), norm(ddf)
    ok = True
    if list(s.columns) != list(d.columns):
        ok = False; msg = f"columns {list(s.columns)} vs {list(d.columns)}"
    elif len(s) != len(d):
        ok = False; msg = f"rows {len(s)} vs {len(d)}"
    else:
        msg = ""
        for c in s.columns:
            a, b = s[c].to_numpy(), d[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                same = np.array_equal(a.astype(np.float64), b.astype(np.float64))
            else:
                same = list(map(str, a)) == list(map(str, b))
            if not same:
                ok = False
                bad = next(i for i in range(len(a)) if str(a[i]) != str(b[i]))
                msg += f" col {c} first-diff row {bad}: {a[bad]!r} vs {b[bad]!r};"
    print(f"  {name:28s} rows={len(sdf):6d}  {'OK' if ok else 'FAIL ' + msg}  ({t1-t0:.1f}s)")
    if not ok:
        fails.append(name)

print("entry() smoke:", end=" ")
edf = E.entry(spark)
rows = edf.collect()
print(f"{len(rows)} rows, schema {[f.name for f in edf.schema.fields]}")
print("FAILURES:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
