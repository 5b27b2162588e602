#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the same
parquet tables, sorts columns by name and rows by value, and compares
cell-by-cell. Exit 1 on any mismatch. Dev-side only (the real gate is
driver-run); duckdb/pyarrow are container-provided for this purpose.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr: driver-style hashing tolerates no fuzz
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures, passed, weak = [], 0, 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*/"))):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            failures.append((name, "no parquet output"))
            continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            weak += 1
            print(f"  ~ {name}: rows-only check, {len(got)} rows")
            if len(got) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            exp = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            failures.append((name, f"columns differ: spark={gc} oracle={ec}"))
            continue
        g = [tuple(canon(v) for v in row) for row in got[gc].itertuples(index=False)]
        e = [tuple(canon(v) for v in row) for row in exp[ec].itertuples(index=False)]
        g.sort()
        e.sort()
        if len(g) != len(e):
            failures.append((name, f"row count: spark={len(g)} oracle={len(e)}"))
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i, a, b = bad[0]
            failures.append((name, f"{len(bad)}/{len(g)} rows differ; first@{i}:\n    spark : {a}\n    oracle: {b}"))
        else:
            passed += 1
            print(f"  ✓ {name}: {len(g)} rows match")

    print(f"\n{passed} exact-match, {weak} rows-only, {len(failures)} FAILED")
    for name, why in failures:
        print(f"  ✗ {name}: {why}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
