#!/usr/bin/env python3
"""Embedded-engine bound: time every oracle SQL in DuckDB on one SF dir.

Usage: duckdb_bound.py <sfDir> <verifyOutDir-with-oracle_sql.json>

The reproducible BASELINE proxy (BASELINE.md): DuckDB executing the SAME
SQL the correctness gate uses, on the same host and scale factor, min over
3 passes per query. Driver-side python stack only — not part of the
library.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(3):
            t0 = time.monotonic()
            try:
                con.sql(sql).fetchall()
            except Exception as e:
                print(f"ERR {name}: {e}")
                best = None
                break
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        if best is not None:
            times[name] = best
    total = sum(times.values())
    slow = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print(f"queries={len(times)} total={total:.1f}s "
          f"mean={total / max(1, len(times)):.2f}s")
    for k, v in slow:
        print(f"  {k}: {v:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
