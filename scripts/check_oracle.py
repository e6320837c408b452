#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev aid only;
engine code never depends on this). Usage:
  check_oracle.py <sfDir> <verifyOutDir> [query ...]
Loads each <verifyOutDir>/<name> parquet, runs oracle_sql.json[name] in
DuckDB with harness tables registered as views, sorts columns by name,
compares row-by-row with float tolerance. Pass --strict to require
bit-exact float equality AND matching numeric dtype kinds (int vs
float) — together these approximate the driver's hash gate: a query
that is [OK] here but fails --strict is one partial-agg reorder or
one un-CAST DuckDB integer sum away from a red driver row."""
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
    # dtype-kind gate: the value loop coerces through float(), which
    # erases int-vs-float differences (DuckDB sum(INTEGER) -> HUGEINT
    # rendered 1435.0 vs Spark BIGINT 1435) — exactly the class the
    # driver's hash gate fails on. Compare pandas dtype kinds first;
    # treat int ('i','u') vs float ('f') as a mismatch under --strict.
    if STRICT:
        NUM_KINDS = {"i": "int", "u": "int", "f": "float"}
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            gn, en = NUM_KINDS.get(gk), NUM_KINDS.get(ek)
            if gn and en and gn != en:
                print(f"[FAIL] {name}: col {c} dtype kind {gk!r} != {ek!r} "
                      f"(int-vs-float oracle typing bug — CAST the DuckDB sum)")
                ok = False
    for c in got.columns:
        if not ok: break
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
