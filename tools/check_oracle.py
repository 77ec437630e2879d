#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Runs graft.Verify at a given SF dir (via sbt), then for each query with an
oracle: executes the oracle SQL in DuckDB over the same parquet tables and
compares row count, column names/order-insensitive schema, and exact values
against the engine's parquet output.

Dev tool only — the shipped Scala library does not depend on this.
Usage: python3 tools/check_oracle.py [sfdir] [outdir] [--no-verify] [names...]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FLAGS = set(a for a in sys.argv[3:] if a.startswith("--"))
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    names = " ".join(ONLY)
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {names}'.strip()]
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        sys.exit(1)


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, sql, con):
    got_dir = Path(OUT) / name
    if not got_dir.exists():
        return f"MISSING output dir"
    try:
        ours = con.execute(
            f"SELECT * FROM read_parquet('{got_dir}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        return f"READ FAIL {e}"
    try:
        oracle = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return f"ORACLE SQL FAIL {e}"

    if ours.num_rows != oracle.num_rows:
        return f"ROWS {ours.num_rows} != oracle {oracle.num_rows}"
    a_names, o_names = sorted(ours.column_names), sorted(oracle.column_names)
    if a_names != o_names:
        return f"COLS {a_names} != {o_names}"
    ours_d = {c: ours.column(c).to_pylist() for c in a_names}
    orac_d = {c: oracle.column(c).to_pylist() for c in a_names}
    for c in a_names:
        av, ov = ours_d[c], orac_d[c]
        for i, (x, y) in enumerate(zip(av, ov)):
            if canon(x) != canon(y):
                return (f"VALUE col={c} row={i}: ours={x!r} oracle={y!r}")
    # schema (arrow types) comparison — informational strictness
    at = {f.name: str(f.type) for f in ours.schema}
    ot = {f.name: str(f.type) for f in oracle.schema}
    mism = {k: (at[k], ot[k]) for k in at if at[k] != ot[k]}
    if mism:
        return f"OK-VALUES/SCHEMA-DIFF {mism}"
    return "OK"


def main():
    if "--no-verify" not in FLAGS:
        run_verify()
    sqls = json.loads((Path(OUT) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    fails = 0
    for name in sorted(sqls):
        if ONLY and name not in ONLY:
            continue
        res = compare(name, sqls[name], con)
        status = "PASS" if res == "OK" else res
        if res != "OK" and not res.startswith("OK-VALUES"):
            fails += 1
        print(f"{name:28s} {status}")
    # rows-only queries
    for d in sorted(Path(OUT).iterdir()):
        if d.is_dir() and d.name not in sqls and (not ONLY or d.name in ONLY):
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"{d.name:28s} rows-only ({n} rows)")
    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
