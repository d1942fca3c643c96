"""Local mirror of the driver CORRECTNESS gate: run queries() vs oracle_sql()
side-by-side in DuckDB. Usage: python parity_one.py <sf_dir> [entry...].
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
sf = sys.argv[1]; names = sys.argv[2:]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
Q = entry_mod.queries(); O = entry_mod.oracle_sql()
for name in names:
    got = Q[name](sf)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    if name not in O:
        print(name, "rows-only", len(got)); continue
    exp = con.sql(O[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns), (cols, sorted(exp.columns))
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        print(name, "MATCH", len(g))
    except AssertionError as ex:
        print(name, "MISMATCH"); print(str(ex)[:300])
        print(" ray:", g.head(5).to_dict("records"))
        print(" sql:", e.head(5).to_dict("records"))
ray.shutdown()
