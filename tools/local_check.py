#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf dir's parquet tables and compare with the Verify dump
(columns sorted by name, rows sorted, values compared with float tolerance
AND exact — exact-diff count shows hash-compare risk)."""
import json, sys, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(x.split("/")[-1] for x in glob.glob(f"{outdir}/q*"))

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in idx]

fails = []
for name in names:
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        grows, gcols = got.fetchall(), [d[0] for d in got.description]
    except Exception as e:
        print(f"{name}: READ-FAIL {e}"); fails.append(name); continue
    if name not in oracle:
        print(f"{name}: rows-only ({len(grows)} rows)" + (" EMPTY!" if not grows else ""))
        if not grows: fails.append(name)
        continue
    try:
        exp = con.sql(oracle[name])
        erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
    except Exception as e:
        print(f"{name}: ORACLE-FAIL {e}"); fails.append(name); continue
    g, gc = canon(grows, gcols)
    e, ec = canon(erows, ecols)
    if gc != ec:
        print(f"{name}: SCHEMA MISMATCH spark={gc} duck={ec}"); fails.append(name); continue
    # Type-level check: the driver's hasher is type-sensitive, so an oracle
    # column typed HUGEINT/DECIMAL where Spark wrote BIGINT/DOUBLE hash-fails
    # even when every value matches. Compare DuckDB's inferred type for the
    # Spark parquet (= the Spark type) against the oracle expression's type.
    gtypes = dict(zip(got.columns, [str(t) for t in got.types]))
    etypes = dict(zip(exp.columns, [str(t) for t in exp.types]))
    tdiff = [(c, gtypes[c], etypes[c]) for c in gtypes
             if c in etypes and gtypes[c] != etypes[c]]
    if tdiff:
        print(f"{name}: TYPE MISMATCH " +
              "; ".join(f"{c}: spark={a} oracle={b}" for c, a, b in tdiff))
        fails.append(name); continue
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT {len(g)} vs {len(e)}"); fails.append(name); continue
    diff = sum(1 for a, b in zip(g, e) if a != b)
    if diff:
        print(f"{name}: {diff}/{len(g)} rows differ")
        for a, b in list(zip(g, e))[:500]:
            if a != b:
                print(f"   spark: {a}\n   duck : {b}"); break
        fails.append(name)
    else:
        print(f"{name}: OK ({len(g)} rows)")
print(f"\n{len(names)-len(fails)}/{len(names)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
