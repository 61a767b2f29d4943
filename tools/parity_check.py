#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, executes the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compares
(rows, schema column names, sorted-row value hash).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return f"{v:.6f}" if v == v else "NaN"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

results = {}
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    tbl = pq.read_table(files[0])
    spark_cols = sorted(tbl.column_names)
    spark_rows = [tuple(r[c] for c in tbl.column_names) for r in tbl.to_pylist()]
    if name not in oracle:
        results[name] = f"ROWS_ONLY({len(spark_rows)})"
        continue
    try:
        cur = con.execute(oracle[name])
        duck_cols = [c[0] for c in cur.description]
        duck_rows = cur.fetchall()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    if sorted(duck_cols) != spark_cols:
        results[name] = f"SCHEMA_MISMATCH spark={spark_cols} duck={sorted(duck_cols)}"
        continue
    if len(duck_rows) != len(spark_rows):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        continue
    hs = table_digest(tbl.column_names, spark_rows)
    hd = table_digest(duck_cols, duck_rows)
    results[name] = f"OK({len(spark_rows)})" if hs == hd else "HASH_MISMATCH"

ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
for k, v in sorted(results.items()):
    print(f"{'PASS' if v.startswith(('OK','ROWS_ONLY')) else 'FAIL':4} {k:28} {v}")
print(f"\n{ok}/{len(results)} pass")
sys.exit(0 if ok == len(results) else 1)
