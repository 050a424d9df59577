#!/usr/bin/env python
"""Mirror of the driver's correctness gate: run every oracle-backed query
side-by-side with its DuckDB twin at the given sf dir (default sf0.01) and
report row-count + value equality and timings. Usage:

    python scripts/parity_sweep.py [/root/testdata/sf0.01]
"""
import os, sys, time, duckdb, pandas as pd
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False, log_to_driver=False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as m
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
Q, O = m.queries(), m.oracle_sql()
def to_pd(r):
    import pyarrow as pa, ray.data
    if isinstance(r, ray.data.Dataset): return r.to_pandas()
    if isinstance(r, pa.Table): return r.to_pandas()
    return r
def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
fails = []
for name in sorted(O):
    t0 = time.time()
    rdf = canon(to_pd(Q[name](SF)))
    t1 = time.time()
    sdf = canon(con.execute(O[name]).fetch_df())
    t2 = time.time()
    ok = list(rdf.columns)==list(sdf.columns) and len(rdf)==len(sdf)
    if ok:
        ok = rdf.astype(str).equals(sdf.astype(str))
    print(f"{name:24s} {'OK ' if ok else 'FAIL'} rows={len(rdf):8d} ray={t1-t0:6.2f}s sql={t2-t1:6.2f}s")
    if not ok: fails.append(name)
print("FAILS:", fails)
ray.shutdown()
