#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir> [query ...]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<query>/ parquet dirs and <outDir>/oracle_sql.json. Runs each
oracle SQL in DuckDB over views named after the parquet tables in sfDir,
sorts columns by name and rows by value on both sides, and compares
exactly (NaN-safe). Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import duckdb
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total order + exact compare; floats via repr (full precision)
    def cell(v):
        if pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    rows = sorted([tuple(cell(v) for v in row) for row in df.itertuples(index=False)])
    return list(df.columns), rows

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    import os
    # memory budget gate (VERDICT r13 item 7): the sf100 winnowing oracle
    # peaks ~106 GB with DuckDB's default 80%-of-RAM limit, which killed a
    # co-resident probe JVM detail-less. GRAFT_DUCK_MEM caps the oracle so
    # heavy compares can share the box (spill goes to GRAFT_DUCK_TMP or the
    # outdir, on the big partition).
    if os.environ.get("GRAFT_DUCK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['GRAFT_DUCK_MEM']}'")
        tmp = os.environ.get("GRAFT_DUCK_TMP", f"{outdir}/.duck_tmp")
        os.makedirs(tmp, exist_ok=True)
        con.sql(f"SET temp_directory='{tmp}'")
    if os.environ.get("GRAFT_DUCK_TMP_MAX"):
        # bounded-spill measurement mode (VERDICT r14 item 7): cap the
        # spill so an infeasibility probe dies at a MEASURED temp-size
        # bound instead of filling the box's free space and destabilizing
        # co-resident work; the error message carries the number.
        con.sql(f"SET max_temp_directory_size="
                f"'{os.environ['GRAFT_DUCK_TMP_MAX']}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver corpora are single parquet FILES; the ScaleProbe sf1
        # corpus writes Spark parquet DIRECTORIES — glob those
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    npass = nfail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            nfail += 1
            continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            nfail += 1
            continue
        scols, srows = normalize(spark_df)
        dcols, drows = normalize(duck_df)
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            nfail += 1
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            nfail += 1
        elif srows != drows:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print(f"FAIL {name}: {sum(a != b for a, b in zip(srows, drows))} differing rows, first: {diff}")
            nfail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            npass += 1
    # rows-only checks for queries without oracle
    import os
    for name in sorted(os.listdir(outdir)):
        # dot-dirs are tooling scratch (e.g. the .duck_tmp spill dir the
        # GRAFT_DUCK_MEM gate defaults into the outdir), not query dumps
        if name.startswith(".") or name in oracle \
                or not os.path.isdir(f"{outdir}/{name}"):
            continue
        if only and name not in only:
            continue
        df = load_spark(outdir, name)
        n = 0 if df is None else len(df)
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only: {n} rows)")
        if n > 0:
            npass += 1
        else:
            nfail += 1
    print(f"== {npass} pass, {nfail} fail ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
