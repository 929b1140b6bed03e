#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run every oracleSql
in DuckDB against the shared parquet tables and compare with the Spark
results Verify dumped to outDir. Mirrors the driver: sort columns by name,
sort rows, compare values exactly."""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # shortest round-trip repr → exact double compare
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = sorted(glob.glob(f"{out_dir}/*/"))
    names = [r.rstrip("/").split("/")[-1] for r in results]
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_fail += 1
            continue
        mine = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            status = "rows-only" + (" OK" if len(mine) > 0 else " EMPTY!")
            print(f"---- {name}: no oracle ({status}, {len(mine)} rows)")
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        sa = a.map(cell)
        sb = b.map(cell)
        neq = (sa != sb)
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1)
            i = idx[idx].index[0]
            print(f"FAIL {name}: {int(neq.sum().sum())} cell diffs in {bad_cols}; "
                  f"first row {i}: spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(a)} rows)")
        n_pass += 1
    # subset mode (CHECK_ONLY_DUMPED=1): a Verify run under
    # SPARK_GRAFT_ONLY dumps a few queries — don't fail the rest
    import os
    missing = set(oracle) - set(names)
    if os.environ.get("CHECK_ONLY_DUMPED") == "1":
        missing = set()
    for m in sorted(missing):
        print(f"FAIL {m}: oracle exists but no spark output")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len([n for n in names if n not in oracle])} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
