#!/usr/bin/env python3
"""Self-check mimicking the driver's correctness gate: run graft.Verify at a
scale factor, then run each oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows sorted, values hashed).

Usage: python3 scripts/selfcheck.py [sfdir] [outdir]
"""
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify-out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def table_digest(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in data:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), data


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
            got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {e}"))
            continue
        if sorted(want_cols) != sorted(got_cols):
            bad.append((name, f"schema {sorted(got_cols)} != {sorted(want_cols)}"))
            continue
        wh, wd = table_digest(want_rows, want_cols)
        gh, gd = table_digest(got_rows, got_cols)
        if wh != gh:
            diff = next(((i, a, b) for i, (a, b) in enumerate(zip(wd, gd)) if a != b),
                        ("len", len(wd), len(gd)))
            bad.append((name, f"hash mismatch rows={len(gd)}/{len(wd)} first_diff={diff}"))
        else:
            ok.append((name, len(gd)))
    for name, n in ok:
        print(f"OK   {name} ({n} rows)")
    for name, why in bad:
        print(f"FAIL {name}: {str(why)[:400]}")
    print(f"\n{len(ok)} ok, {len(bad)} fail")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
