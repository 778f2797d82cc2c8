#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each test table as a DuckDB
view over <sfDir>/<table>.parquet, runs every oracle SQL, and compares it to
the Spark-written parquet in <verifyOutDir>/<name>/. Columns are sorted by
name and values compared exactly (mirroring a hash comparison).

Uses only the driver-side python stack (duckdb/pyarrow) — not part of the
Scala library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — bit-exact comparison
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: load/run error: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        # dtype strictness: if the driver's hash is type-sensitive, an
        # int32-vs-int64 mismatch would pass a value compare but fail there.
        dg, de = list(got.dtypes.astype(str)), list(exp.dtypes.astype(str))
        if dg != de:
            print(f"FAIL {name}: dtypes differ\n  spark : {dict(zip(got.columns, dg))}\n  oracle: {dict(zip(exp.columns, de))}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        bad = None
        gv, ev = got.values.tolist(), exp.values.tolist()
        for i, (g, e) in enumerate(zip(gv, ev)):
            if [canon(x) for x in g] != [canon(x) for x in e]:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs\n  spark : {g}\n  oracle: {e}")
            # show dtypes to debug type mismatches
            print(f"  dtypes spark={dict(got.dtypes.astype(str))}")
            print(f"  dtypes oracle={dict(exp.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
