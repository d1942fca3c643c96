"""Local mirror of the driver CORRECTNESS gate: run queries() vs oracle_sql()
side-by-side in DuckDB. Usage: python parity_all.py <sf_dir> [entry...].
Owns its Ray session (scripts may; library code must not).
"""
import ray, logging, duckdb, pandas as pd, sys, time, traceback
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
sys.path.insert(0, "/root/repo")

import importlib
entry_mod = importlib.import_module("__ray_entry__")

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
only = set(sys.argv[2:])
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

Q = entry_mod.queries()
O = entry_mod.oracle_sql()
fails = 0
for name, fn in Q.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        res = fn(sf)
        got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    except Exception:
        print(f"{name}: RAY ERROR"); traceback.print_exc(); fails += 1; continue
    if name not in O:
        print(f"{name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
        continue
    try:
        exp = con.sql(O[name]).df()
    except Exception:
        print(f"{name}: SQL ERROR"); traceback.print_exc(); fails += 1; continue
    cols = sorted(got.columns)
    if cols != sorted(exp.columns):
        print(f"{name}: SCHEMA MISMATCH ray={sorted(got.columns)} sql={sorted(exp.columns)}"); fails += 1; continue
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    try:
        # dtype-strict: the driver's value hash is type-sensitive (int64 vs
        # float64 hash differently), so the local gate must be too.
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
        print(f"{name}: MATCH ({len(g)} rows) [{time.time()-t0:.1f}s]")
    except AssertionError as ex:
        fails += 1
        print(f"{name}: VALUE MISMATCH ray={len(g)} sql={len(e)}")
        print(str(ex)[:300])
        print(" ray:", g.head(3).to_dict("records"))
        print(" sql:", e.head(3).to_dict("records"))
print("FAILS:", fails)
ray.shutdown()
