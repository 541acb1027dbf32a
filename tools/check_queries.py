import sys, time, traceback
import duckdb
import pandas as pd
import numpy as np
import ray

sys.path.insert(0, "/root/repo")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=8, include_dashboard=False)
from refined_ray.pipelines.queries import QUERIES, oracles

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

ORACLES = oracles()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)

results = {}
for name, fn in QUERIES.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        res = fn(SF)
        if hasattr(res, "to_pandas"):
            mine = res.to_pandas()
        else:
            mine = pd.DataFrame(res)
        wall = time.time() - t0
        if name not in ORACLES:
            results[name] = f"ROWS-ONLY rows={len(mine)} wall={wall:.1f}s"
            continue
        theirs = con.execute(ORACLES[name]).fetchdf()
        a, b = canon(mine), canon(theirs)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH mine={list(a.columns)} oracle={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH mine={len(a)} oracle={len(b)}"
            continue
        bad = []
        for c in a.columns:
            x, y = a[c], b[c]
            if x.dtype.kind == 'f' or y.dtype.kind == 'f':
                eq = np.allclose(x.astype(float), y.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = (x.astype(float).values == y.astype(float).values).all()
                if not exact:
                    bad.append((c, "float-not-bitexact"))
            else:
                if not (x.astype(str).values == y.astype(str).values).all():
                    bad.append((c, "value"))
        if str(a.dtypes.to_dict()) != str(b.dtypes.to_dict()):
            dt = f" DTYPES mine={a.dtypes.to_dict()} oracle={b.dtypes.to_dict()}"
        else:
            dt = ""
        results[name] = ("OK" if not bad else f"VALUE-MISMATCH {bad}") + f" rows={len(a)} wall={wall:.1f}s{dt}"
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {e}"
        traceback.print_exc()

print("=" * 70, flush=True)
for k, v in results.items():
    print(f"{k:24s} {v}", flush=True)
ray.shutdown()
