#!/usr/bin/env python3
"""Builder-side oracle check (mirrors the driver): for each entry in
oracle_sql.json, run the DuckDB twin over the testdata parquet tables and
compare against the Verify parquet output (row count, column names, sorted
row values). Usage: oracle_check.py <sfdir> <verify_out_dir> [entries...]"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("documents", "embeddings", "events", "lineitem", "orders",
          "customer", "part", "nation", "region", "supplier"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:24s} MISSING spark output"); fail += 1; continue
    try:
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
    except Exception as e:
        print(f"{name:24s} ORACLE ERR {str(e)[:120]}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    gcols = [d[0] for d in con.description]
    if gcols != wcols:
        print(f"{name:24s} SCHEMA got={gcols} want={wcols}"); fail += 1; continue
    def norm(rows):
        out = []
        for r in rows:
            out.append(tuple(
                (round(v, 4) if isinstance(v, float) and math.isfinite(v) else v)
                for v in r))
        return sorted(out, key=repr)
    g, w = norm(got), norm(want)
    if g != w:
        diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
        print(f"{name:24s} ROWS got={len(g)} want={len(w)} first_diffs="
              f"{[(g[i], w[i]) for i in diff] if diff and len(g)==len(w) else '(count)'}")
        fail += 1
    else:
        print(f"{name:24s} OK rows={len(g)}")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
