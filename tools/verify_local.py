#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs `graft.Verify <sfDir> <outDir>` results against the DuckDB oracle SQL
dumped alongside them, comparing per query: row count, column names/types,
and value hash (columns sorted by name, rows sorted, doubles rounded).

Usage: python3 tools/verify_local.py [sfDir] [outDir] [--skip-spark]
                                     [--only q1,q2,...] [--timeout SECS]

--only restricts BOTH the Spark run (graft.Verify's third arg) and the
DuckDB compare to the named queries — the tool for gating a subset at a
scale where the full surface is too slow (e.g. the sf1 mining family).
"""
import json, os, subprocess, sys

import duckdb

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
OUT_DIR = args[1] if len(args) > 1 else "/tmp/graft_verify"
ONLY = None
if "--only" in sys.argv:
    ONLY = set(sys.argv[sys.argv.index("--only") + 1].split(","))
TIMEOUT = 1800
if "--timeout" in sys.argv:
    TIMEOUT = int(sys.argv[sys.argv.index("--timeout") + 1])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_spark():
    cmd = f"runMain graft.Verify {SF_DIR} {OUT_DIR}"
    if ONLY:
        cmd += " " + ",".join(sorted(ONLY))
    r = subprocess.run(
        ["sbt", "-batch", cmd],
        cwd="/root/repo", capture_output=True, text=True, timeout=TIMEOUT)
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


def fresh_con():
    """One connection PER QUERY: the sf1 mining oracles (PPJoin/simhash/
    CC replays in pure SQL) can hit DuckDB's memory ceiling, and a single
    OOM poisons the connection's buffer pool so every LATER query
    cascade-fails with tiny allocation errors — per-query isolation keeps
    one heavy oracle's failure from voiding the rest of the gate. Spill
    directory + a limit under the 80%-of-RAM default + bounded threads
    (peak memory scales with parallel hash tables) give each query its
    best shot first."""
    con = duckdb.connect()
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET memory_limit='100GB'")
    con.sql(f"SET threads={os.environ.get('VERIFY_DUCKDB_THREADS', '32')}")
    for t in TABLES:
        # driver-generated tables are single files; ScaleGen output (e.g.
        # the sf1 twin) is a Spark-written DIRECTORY of part files
        path = f"{SF_DIR}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    return con


def main():
    if "--skip-spark" not in sys.argv:
        run_spark()
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    if ONLY:  # Verify dumps the FULL oracle map even when filtered
        oracle = {k: v for k, v in oracle.items() if k in ONLY}
    failures = []
    # A query that THREW in graft.Verify has an oracle entry but no output
    # dir — without this check the loop below silently skips it and the
    # gate lies "ALL MATCH" (the round driver records it as an err row)
    for name in sorted(oracle):
        if not os.path.isdir(os.path.join(OUT_DIR, name)):
            failures.append((name, "no spark output dir (query threw in Verify?)"))
    for name in sorted(os.listdir(OUT_DIR)):
        d = os.path.join(OUT_DIR, name)
        if not os.path.isdir(d) or (ONLY and name not in ONLY):
            continue
        con = fresh_con()
        try:
            got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
            grows, gcols = got.fetchall(), [c.lower() for c in got.columns]
        except Exception as e:
            failures.append((name, f"spark result unreadable: {e}"))
            con.close()
            continue
        if name not in oracle:
            print(f"  ~ {name}: rows-only check ({len(grows)} rows)")
            if len(grows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            con.close()
            continue
        try:
            want = con.sql(oracle[name])
            wrows, wcols = want.fetchall(), [c.lower() for c in want.columns]
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        finally:
            con.close()
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
