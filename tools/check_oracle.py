#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run DuckDB oracle SQL
against the sfDir tables and compare (rows, schema-ish, values) with the
parquet results Verify.scala dumped.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
# spill outside the repo (a cwd-relative .tmp/ once filled the disk and
# polluted git status) and cap it so a runaway plan fails fast instead
con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
con.execute("SET max_temp_directory_size='20GiB'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return round(v, 9)
    return v

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchall()
        want_cols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"ORACLE SQL ERROR: {e}"))
        continue
    try:
        got_rel = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        got = got_rel.fetchall()
        got_cols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"SPARK RESULT MISSING: {e}"))
        continue
    if sorted(map(str.lower, got_cols)) != sorted(map(str.lower, want_cols)):
        fails.append((name, f"COLUMNS differ: spark={got_cols} duckdb={want_cols}"))
        continue
    # compare as multisets of column-name-sorted tuples
    gidx = [got_cols.index(c) for c in sorted(got_cols, key=str.lower)]
    widx = [want_cols.index(c) for c in sorted(want_cols, key=str.lower)]
    gset = sorted([tuple(norm(r[i]) for i in gidx) for r in got], key=str)
    wset = sorted([tuple(norm(r[i]) for i in widx) for r in want], key=str)
    if len(gset) != len(wset):
        fails.append((name, f"ROWS differ: spark={len(gset)} duckdb={len(wset)}"))
        continue
    bad = [i for i, (g, w) in enumerate(zip(gset, wset)) if g != w]
    if bad:
        i = bad[0]
        fails.append((name, f"VALUES differ at {len(bad)}/{len(gset)} rows; first: spark={gset[i]} duckdb={wset[i]}"))
    else:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
missing = set(json.load(open(f'{outdir}/oracle_sql.json'))) - set(passes) - {f[0] for f in fails}
sys.exit(1 if fails else 0)
