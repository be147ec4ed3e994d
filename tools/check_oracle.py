#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the same parquet tables, compare to the Spark result parquet
(columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # a table is either a single parquet file (driver testdata) or a
    # directory of part files (Spark-written, e.g. ScaleGen sf1 output)
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
    try:
        exp = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    # exact compare incl. dtypes-insensitive value equality
    mismatch = None
    for c in got.columns:
        a, b = got[c], exp[c]
        try:
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                # normalize unit (us vs ns) — .equals is dtype-sensitive
                eq = (pd.to_datetime(a).astype("datetime64[ns]")
                      .equals(pd.to_datetime(b).astype("datetime64[ns]")))
            elif a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = ((a.astype(float) == b.astype(float)) | (a.isna() & b.isna())).all()
            else:
                av = a.astype(object).where(~a.isna(), None)
                bv = b.astype(object).where(~b.isna(), None)
                eq = ((av == bv) | (a.isna() & b.isna())).all()
        except Exception as e:
            eq = False
        if not eq:
            mismatch = c
            break
    if mismatch:
        print(f"FAIL {name}: column {mismatch} differs")
        d = pd.DataFrame({"got": got[mismatch], "exp": exp[mismatch]})
        print(d[d.got != d.exp].head(5))
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
# rows-only queries (no oracle): check >0 rows
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name in oracle: continue
    files = glob.glob(f"{d}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"{'OK  ' if n > 0 else 'FAIL'} {name} (rows-only, {n} rows)")
    if n == 0: fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
