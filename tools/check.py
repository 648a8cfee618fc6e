#!/usr/bin/env python3
"""Local mimic of the driver's correctness harness: runs each oracle SQL in
DuckDB over the same parquet tables and compares against the Verify.scala
parquet dumps (columns sorted by name, rows sorted, exact value equality).

Usage: python3 tools/check.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, os, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            # The driver hashes value REPRESENTATIONS, so 32.0 (DOUBLE) vs
            # 32 (INTEGER) is a mismatch even though Python == says equal.
            # Tag numeric values with their kind to mimic that strictness.
            elif isinstance(v, bool):
                pass
            elif isinstance(v, float):
                v = ("f", v)
            elif isinstance(v, int):
                v = ("i", v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [cols[i] for i in order]

n_pass = n_fail = 0
names = sorted(d for d in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, d)))
for name in names:
    spark_rel = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
    s_cols = [d[0] for d in spark_rel.description]
    s_rows, s_cols_sorted = canon(spark_rel.fetchall(), s_cols)
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(s_rows)} rows, cols={s_cols_sorted}")
        continue
    try:
        o_rel = con.execute(oracle[name])
        o_cols = [d[0] for d in o_rel.description]
        o_rows, o_cols_sorted = canon(o_rel.fetchall(), o_cols)
    except Exception as e:
        print(f"  [FAIL-sql ] {name}: oracle error: {e}")
        n_fail += 1
        continue
    if s_cols_sorted != o_cols_sorted:
        print(f"  [FAIL-cols] {name}: spark={s_cols_sorted} oracle={o_cols_sorted}")
        n_fail += 1
        continue
    if len(s_rows) != len(o_rows):
        print(f"  [FAIL-rows] {name}: spark={len(s_rows)} oracle={len(o_rows)}")
        n_fail += 1
        continue
    bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
    if bad:
        print(f"  [FAIL-vals] {name}: {len(bad)}/{len(s_rows)} differing rows; first:")
        for a, b in bad[:3]:
            print(f"     spark : {a}\n     oracle: {b}")
        n_fail += 1
    else:
        print(f"  [PASS     ] {name}: {len(s_rows)} rows")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, "
      f"{len(names) - n_pass - n_fail} rows-only, {len(names)} total")
sys.exit(1 if n_fail else 0)
