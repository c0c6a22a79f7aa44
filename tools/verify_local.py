#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs `graft.Verify <sfDir> <outDir>` results against the DuckDB oracle SQL
dumped alongside them, comparing per query: row count, column names/types,
and value hash (columns sorted by name, rows sorted, doubles rounded).

Usage: python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]
"""
import json, os, subprocess, sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_spark():
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT_DIR}"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print("SPARK VERIFY FAILED")
        print(r.stdout[-3000:])
        sys.exit(1)


def canon(rows, cols):
    """Sort columns by name, round floats, sort rows -> canonical list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(repr(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    failures = []
    # A query that THREW in graft.Verify has an oracle entry but no output
    # dir — without this check the loop below silently skips it and the
    # gate lies "ALL MATCH" (the round driver records it as an err row)
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(OUT_DIR, name)):
            failures.append((name, "no spark output dir (query threw in Verify?)"))
    for name in sorted(os.listdir(OUT_DIR)):
        d = os.path.join(OUT_DIR, name)
        if not os.path.isdir(d):
            continue
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            grows, gcols = got.fetchall(), [c.lower() for c in got.columns]
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            continue
        if name not in oracle:
            print(f"  ~ {name}: rows-only check ({len(grows)} rows)")
            if len(grows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            want = con.sql(oracle[name])
            wrows, wcols = want.fetchall(), [c.lower() for c in want.columns]
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        if sorted(gcols) != sorted(wcols):
            failures.append((name, f"columns differ: spark={sorted(gcols)} oracle={sorted(wcols)}"))
            continue
        if len(grows) != len(wrows):
            failures.append((name, f"row count differs: spark={len(grows)} oracle={len(wrows)}"))
            continue
        g, w = canon(grows, gcols), canon(wrows, wcols)
        if g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            failures.append((name, f"value mismatch, first diffs: {diff}"))
            continue
        print(f"  ✓ {name}: {len(grows)} rows match")
    print()
    if failures:
        print(f"FAILURES ({len(failures)}):")
        for n, msg in failures:
            print(f"  ✗ {n}: {msg}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
