#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (column names sorted, rows compared exactly).

Usage: python3 scripts/check.py [sfDir] [--skip-verify]
"""
import duckdb, json, math, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
# per-SF dump dir: a long sf0.1 run and a quick sf0.01 gate must not
# clobber each other's Spark outputs mid-compare. --out=DIR points the
# compare at a targeted DumpOne dir instead.
OUT = "/tmp/graft_verify_" + os.path.basename(SF.rstrip("/"))
for a in sys.argv[1:]:
    if a.startswith("--out="):
        OUT = a[len("--out="):]
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        sys.exit(f"Verify failed rc={r.returncode}")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
try:
    names = json.load(open(f"{OUT}/queries.json"))
except FileNotFoundError:
    names = sorted(n for n in os.listdir(OUT) if os.path.isdir(f"{OUT}/{n}"))
fails = 0
for name in names:
    try:
        grel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        got = grel.df()
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fails += 1; continue
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows"); continue
    try:
        erel = con.sql(oracle[name])
        exp = erel.df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    # DuckDB-NATIVE type compare — the driver's hash is type-sensitive
    # (HUGEINT vs BIGINT hashes differently even for identical values),
    # while the pandas value-compare below is not. Round 3's three red
    # rows all lived in exactly this gap.
    gtypes = dict(zip(grel.columns, (str(t) for t in grel.types)))
    etypes = dict(zip(erel.columns, (str(t) for t in erel.types)))
    tmism = [(c, gtypes.get(c), etypes.get(c))
             for c in sorted(set(gtypes) & set(etypes))
             if gtypes[c] != etypes[c]]
    if tmism:
        for c, gt, et in tmism:
            print(f"FAIL {name}: col {c} TYPE spark={gt} oracle={et}")
        fails += 1; continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: schema {gcols} vs {ecols}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    g, e = got[gcols].reset_index(drop=True), exp[ecols].reset_index(drop=True)
    ok = True
    for c in gcols:
        for i, (a, b) in enumerate(zip(g[c], e[c])):
            an = a is None or (isinstance(a, float) and math.isnan(a))
            bn = b is None or (isinstance(b, float) and math.isnan(b))
            if an and bn:
                continue
            eq = (not an and not bn) and \
                (a == b or (isinstance(a, float) and isinstance(b, float) and a == b))
            if not eq:
                print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
                ok = False; fails += 1; break
        if not ok:
            break
    if ok:
        print(f"OK   {name}: {len(got)} rows")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
