#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, executes the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compares
(rows, schema column names, sorted-row value hash).

Hardening (round 8):
- Oracle results are fetched via fetch_arrow_table(), the same path the
  driver's canonicalizer uses — fetchall() coerces DuckDB HUGEINT to
  Python int and silently hides decimal/int64 divergence (the round-7
  c_data_card red: uncast sum(BIGINT) -> HUGEINT -> decimal128 in Arrow).
- Any oracle whose Arrow schema contains a decimal type FAILS outright:
  cast the SQL (::BIGINT / round(...,k)) instead.
- Per-oracle wall time is printed and capped (ORACLE_BUDGET_S): a slow
  oracle pushes the driver's whole gate into timeout (what blinded
  round 6), so it is a failure here even when values match.
- A token-expression self-test pins the canonical whitespace-token SQL
  (empty-filtered) to Spark's TextAnalysis.tokens semantics on
  adversarial strings the corpus does not currently contain.
"""
import sys, json, glob, os, time
import duckdb
import pyarrow.parquet as pq

ORACLE_BUDGET_S = 10.0

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()

# Self-test: the canonical oracle token expression must agree with Spark's
# TextAnalysis.tokens (non-empty maximal runs of non-whitespace) on inputs
# where the old trim()-based form diverged (DuckDB trim strips 0x20 only).
TOK = "len(list_filter(string_split_regex(s, '\\s+'), x -> x <> ''))"
for s, want in [("a b\nc\n", 3), ("", 0), (" x ", 1), ("\t\n", 0), ("a  b", 2)]:
    got = con.execute(f"SELECT {TOK} FROM (SELECT ? AS s)", [s]).fetchone()[0]
    assert got == want, f"token self-test: {s!r} -> {got}, want {want}"

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

def arrow_rows(tbl):
    cols = tbl.column_names
    return [tuple(r[c] for c in cols) for r in tbl.to_pylist()]

results, times = {}, {}
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    tbl = pq.read_table(files[0])
    spark_cols = sorted(tbl.column_names)
    spark_rows = arrow_rows(tbl)
    if name not in oracle:
        results[name] = f"ROWS_ONLY({len(spark_rows)})"
        continue
    t0 = time.monotonic()
    try:
        duck = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        results[name] = f"ORACLE_SQL_ERROR: {e}"
        continue
    times[name] = time.monotonic() - t0
    dec = [f.name for f in duck.schema
           if "decimal" in str(f.type)]
    if dec:
        results[name] = f"DECIMAL_ORACLE_OUTPUT {dec} — cast to ::BIGINT/round()"
        continue
    duck_cols = duck.column_names
    duck_rows = arrow_rows(duck)
    if sorted(duck_cols) != spark_cols:
        results[name] = f"SCHEMA_MISMATCH spark={spark_cols} duck={sorted(duck_cols)}"
        continue
    if len(duck_rows) != len(spark_rows):
        results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
        continue
    if times[name] > ORACLE_BUDGET_S:
        results[name] = f"ORACLE_TOO_SLOW {times[name]:.1f}s > {ORACLE_BUDGET_S}s"
        continue
    hs = table_digest(tbl.column_names, spark_rows)
    hd = table_digest(duck_cols, duck_rows)
    results[name] = f"OK({len(spark_rows)})" if hs == hd else "HASH_MISMATCH"

ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
for k, v in sorted(results.items()):
    t = f"{times[k]:6.2f}s" if k in times else "      -"
    print(f"{'PASS' if v.startswith(('OK','ROWS_ONLY')) else 'FAIL':4} {k:28} {t} {v}")
slow = sorted(times.items(), key=lambda kv: -kv[1])[:5]
print("\nslowest oracles: " + ", ".join(f"{k}={v:.2f}s" for k, v in slow))
print(f"oracle total: {sum(times.values()):.1f}s")
print(f"{ok}/{len(results)} pass")
sys.exit(0 if ok == len(results) else 1)
