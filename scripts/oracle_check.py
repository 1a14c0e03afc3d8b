#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each <name>.parquet in
the Verify output dir, look up its oracle SQL (under either the bare name or
the "<name>.parquet" key), run it in DuckDB against the sf parquet tables,
and compare rows / schema (column names) / a value hash with columns sorted
by name. Exits non-zero if any oracle-equipped entry mismatches, so a dark
gate fails the build instead of silently passing.

Usage: scripts/oracle_check.py <verify_out_dir> <sf_dir>
(Driver-side tooling only — python/duckdb are not dependencies of the
library itself.)
"""
import sys, os, json, math, hashlib
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in ("documents", "embeddings", "lineitem", "orders", "customer",
          "supplier", "part", "nation", "region", "events"):
    p = os.path.join(sf_dir, f"{t}.parquet")
    if os.path.isdir(p):  # Spark-written directory (SfGen output)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # fixed 6-dp repr (not %.6g): both pipelines round scores to 6
        # decimal places, so any 6-dp difference must fail the hash even
        # for values >= 10 where %.6g would compare fewer decimals
        return repr(round(v, 6))
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

fail, no_oracle, ok = [], [], []
for d in sorted(os.listdir(out_dir)):
    if not d.endswith(".parquet"):
        continue
    name = d[: -len(".parquet")]
    sql = oracles.get(name) or oracles.get(d)
    spark_rel = con.sql(f"SELECT * FROM '{os.path.join(out_dir, d)}/*.parquet'")
    s_cols, s_rows = list(spark_rel.columns), spark_rel.fetchall()
    if not sql:
        no_oracle.append((name, len(s_rows)))
        continue
    try:
        o = con.sql(sql)
        o_cols, o_rows = list(o.columns), o.fetchall()
    except Exception as e:
        fail.append((name, f"oracle SQL error: {e}"))
        continue
    if len(s_rows) != len(o_rows):
        fail.append((name, f"rows {len(s_rows)} != oracle {len(o_rows)}"))
    elif sorted(s_cols) != sorted(o_cols):
        fail.append((name, f"schema {sorted(s_cols)} != {sorted(o_cols)}"))
    elif table_hash(s_cols, s_rows) != table_hash(o_cols, o_rows):
        fail.append((name, f"hash mismatch ({len(s_rows)} rows)"))
    else:
        ok.append((name, len(s_rows)))

for name, n in ok:
    print(f"PASS  {name} ({n} rows)")
for name, n in no_oracle:
    print(f"SKIP  {name} (no SQL oracle; {n} rows)")
for name, why in fail:
    print(f"FAIL  {name}: {why}")
print(f"\n{len(ok)} pass, {len(no_oracle)} no-oracle, {len(fail)} fail")
sys.exit(1 if fail else 0)
