#!/usr/bin/env python3
"""Local pre-commit gate replicating the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracles.py <sfDir> <outDir> [query ...]
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<name>/ parquet dirs + <outDir>/oracle_sql.json.
"""
import json
import os
import sys
import glob
import warnings

warnings.filterwarnings("ignore", category=FutureWarning)

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_type(t):
    """Collapse an Arrow type to the physical family the driver's typed
    hash distinguishes. The point is to catch family leaks (int64 vs
    HUGEINT/decimal128, string vs int, float vs decimal) BEFORE the value
    comparison, which silently coerces via pandas. Integer types keep
    their concrete bit width (int32 vs int64 is reported, not collapsed)
    — DuckDB SUM() widens to HUGEINT which arrives as decimal128(38,0),
    the exact round-8/round-11 failure class (SURVEY §4), and plain
    INTEGER arithmetic stays 32-bit where Spark produces 64-bit."""
    if pa.types.is_dictionary(t):
        t = t.value_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        # Keep tz-ness: UTC-adjusted micros (TIMESTAMPTZ in DuckDB) vs
        # naive INT96/NTZ is exactly the r13 driver failure the old
        # tz-blind collapse could not reproduce locally.
        return ("timestamp", t.tz is not None)
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int%d" % (t.bit_width,)
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", _norm_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, _norm_type(f.type)) for f in t))
    if pa.types.is_map(t):
        return ("map", _norm_type(t.key_type), _norm_type(t.item_type))
    return str(t)


def type_mismatches(got_tbl, exp_tbl):
    """Return list of 'col: sparkType != oracleType' family mismatches."""
    bad = []
    gs = {f.name: f.type for f in got_tbl.schema}
    es = {f.name: f.type for f in exp_tbl.schema}
    for c in sorted(set(gs) & set(es)):
        if _norm_type(gs[c]) != _norm_type(es[c]):
            bad.append(f"{c}: spark {gs[c]} != oracle {es[c]}")
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one FILE per table; Spark-written corpora
        # (e.g. the ScaleSynth sweep) are DIRECTORIES of part-files
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
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
        got_at = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        try:
            exp_at = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        # Physical-type gate: fail before value compare on family leaks
        # (e.g. DuckDB HUGEINT/decimal vs Spark BIGINT) that the pandas
        # value path would silently coerce but the driver's typed hash
        # would flag.
        tbad = type_mismatches(got_at, exp_at)
        if tbad:
            print(f"FAIL {name}: arrow type mismatch: {'; '.join(tbad[:3])}")
            failures += 1
            continue
        got = got_at.to_pandas()
        exp = exp_at.to_pandas()
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
