#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (columns sorted by name, rows sorted, exact values).

Usage: tools/check.py [sfdir] [outdir] [--no-verify] [names...]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
args = sys.argv[3:]
run_verify = "--no-verify" not in args
only = [a for a in args if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if run_verify:
    r = subprocess.run(["/root/repo/tools/run.sh", "graft.Verify", SF, OUT])
    if r.returncode != 0:
        print("Verify failed rc=", r.returncode)
        sys.exit(1)

oracles = json.loads(Path(f"{OUT}/oracle_sql.json").read_text())

if only:
    unknown = [n for n in only if n not in oracles]
    if unknown:
        print(f"ERROR: unknown query name(s): {unknown}")
        sys.exit(2)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

ok = fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    pdir = Path(OUT) / name
    marker = Path(OUT) / f"{name}._ERROR"
    if marker.exists():
        print(f"FAIL {name}: Spark threw: {marker.read_text().strip()[:160]}")
        fail += 1
        continue
    if not pdir.exists():
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        mine = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
        mcols = [d[0] for d in mine.description]
        mrows = mine.fetchall()
        oracle = con.execute(sql)
        ocols = [d[0] for d in oracle.description]
        orows = oracle.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {str(e).splitlines()[0][:160]}")
        fail += 1
        continue
    mc, mr = normalize(mcols, mrows)
    oc, orr = normalize(ocols, orows)
    if mc != oc:
        print(f"FAIL {name}: schema {mc} vs {oc}")
        fail += 1
    elif mr != orr:
        diffs = [(a, b) for a, b in zip(mr, orr) if a != b][:3]
        print(f"FAIL {name}: rows {len(mr)} vs {len(orr)}; first diffs: {diffs}"
              f"{' (extra mine: ' + str(mr[len(orr):][:2]) + ')' if len(mr) > len(orr) else ''}"
              f"{' (extra oracle: ' + str(orr[len(mr):][:2]) + ')' if len(orr) > len(mr) else ''}")
        fail += 1
    else:
        print(f"ok   {name} ({len(mr)} rows)")
        ok += 1

# queries without oracle → weak rows-only check
weak = [d.name for d in Path(OUT).iterdir() if d.is_dir() and d.name not in oracles]
for w in sorted(weak):
    print(f"weak {w} (no oracle)")
print(f"\n{ok} ok, {fail} FAIL, {len(weak)} weak")
sys.exit(1 if fail else 0)
