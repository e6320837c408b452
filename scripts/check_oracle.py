#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev aid only;
engine code never depends on this). Usage:
  check_oracle.py <sfDir> <verifyOutDir> [query ...]
Loads each <verifyOutDir>/<name> parquet, runs oracle_sql.json[name] in
DuckDB with harness tables registered as views, sorts columns by name,
compares row-by-row with float tolerance. Pass --strict to require
bit-exact float equality (replicates the driver's hash gate — a query
that is [OK] here but [STRICT-FAIL] is one partial-agg reorder away
from a red driver row)."""
import sys, json, glob, math
import duckdb

args = [a for a in sys.argv[1:] if a != "--strict"]
STRICT = "--strict" in sys.argv[1:]
sf, out = args[0], args[1]
only = set(args[2:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only: continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"[MISS] {name}: no spark output"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = con.execute(sql).fetchdf()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"[FAIL] {name}: columns {list(got.columns)} != {list(exp.columns)}"); fail += 1; continue
    if len(got) != len(exp):
        print(f"[FAIL] {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
    ok = True
    for c in got.columns:
        for i, (a, b) in enumerate(zip(got[c], exp[c])):
            if a is None and b is None: continue
            try:
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb): continue
                if STRICT:
                    if fa != fb:
                        print(f"[FAIL] {name}: col {c} row {i}: {a!r} != {b!r}"); ok = False; break
                elif not math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
                    print(f"[FAIL] {name}: col {c} row {i}: {a!r} != {b!r}"); ok = False; break
            except (TypeError, ValueError):
                if str(a) != str(b):
                    print(f"[FAIL] {name}: col {c} row {i}: {a!r} != {b!r}"); ok = False; break
        if not ok: break
    if ok: print(f"[OK]   {name}: {len(got)} rows")
    else: fail += 1
sys.exit(1 if fail else 0)
