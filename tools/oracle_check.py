#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result) and <outDir>/oracle_sql.json,
runs the oracle SQL in DuckDB against the sfDir parquet tables, sorts columns
by name, sorts rows, and compares values (exact for ints/strings, tiny epsilon
for floats to spot near-boundary rounding hazards — the driver hashes, so any
epsilon hit here is a real risk and is reported).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Verify records builder crashes here (round-5 contract): report them
    # as failures up front so a broken query can never pass by omission.
    errors = {}
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            errors = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        pdir = os.path.join(out_dir, name)
        if name in errors:
            print(f"FAIL {name}: builder error: {errors[name][:200]}")
            n_fail += 1
            continue
        if not glob.glob(os.path.join(pdir, "*.parquet")):
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM '{pdir}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        if len(s) == 0:
            print(f"WARN {name}: 0 rows on both sides (rows>0 check may fail)")
        s = s.sort_values(by=list(s.columns), ignore_index=True)
        d = d.sort_values(by=list(d.columns), ignore_index=True)
        bad = None
        for c in s.columns:
            sc, dc = s[c], d[c]
            if sc.dtype.kind == "f" or dc.dtype.kind == "f":
                import numpy as np
                sa = sc.astype(float).to_numpy()
                da = dc.astype(float).to_numpy()
                if not np.allclose(sa, da, rtol=0, atol=0, equal_nan=True):
                    exact_bad = (~((sa == da) | (np.isnan(sa) & np.isnan(da)))).sum()
                    bad = f"col {c}: {exact_bad} float mismatches (max diff " \
                          f"{np.nanmax(np.abs(sa - da)):.3e})"
                    break
            else:
                if not sc.astype(str).equals(dc.astype(str)):
                    diff = (sc.astype(str) != dc.astype(str)).sum()
                    i = (sc.astype(str) != dc.astype(str)).idxmax()
                    bad = f"col {c}: {diff} mismatches, first at row {i}: " \
                          f"{sc[i]!r} vs {dc[i]!r}"
                    break
        # also report dtype mismatches (schema check risk)
        dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)]
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            note = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(s)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
