#!/usr/bin/env python3
"""Local pre-commit gate replicating the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracles.py <sfDir> <outDir> [query ...]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json.
"""
import json
import sys
import glob

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = []
        for c in got.columns:
            a, b = got[c].values, exp[c].values
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = pd.Series(a).astype(object).fillna("\0NULL").values == \
                     pd.Series(b).astype(object).fillna("\0NULL").values
            if not np.all(eq):
                i = int(np.argmin(eq))
                bad.append(f"{c}[{i}]: {a[i]!r} != {b[i]!r}")
        if bad:
            print(f"FAIL {name}: {'; '.join(bad[:3])}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
