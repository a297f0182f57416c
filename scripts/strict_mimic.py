"""Strict driver-mimic: run every oracle_sql() query AND its DuckDB
oracle at $GRAFT_SF_DIR (default sf0.01), compare row count, column
set, and the ROW-ORDER-SENSITIVE value hash (the real driver hashes
rows in returned order — sorted-row comparisons hide ordering bugs).
Exit code 1 on any mismatch."""
import ray, sys, os, hashlib
ray.init(address="local",
         num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import duckdb, pandas as pd
import __ray_entry__ as e
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
def vhash(df):
    df = df[sorted(df.columns)]
    return hashlib.md5(pd.util.hash_pandas_object(df.astype(str), index=False).values.tobytes()).hexdigest()
bad = []
qs, os_ = e.queries(), e.oracle_sql()
for name in sorted(os_):
    got = qs[name](SF)
    if hasattr(got, "to_pandas"): got = got.to_pandas()
    want = con.sql(os_[name]).df()
    ok_rows = len(got) == len(want)
    ok_cols = sorted(got.columns) == sorted(want.columns)
    ok_hash = ok_rows and ok_cols and vhash(got) == vhash(want)
    status = "OK" if ok_hash else "FAIL"
    if not ok_hash: bad.append((name, len(got), len(want), ok_cols))
    print(f"{status} {name} rows={len(got)}")
print("FAILURES:", bad)
ray.shutdown()
sys.exit(1 if bad else 0)
