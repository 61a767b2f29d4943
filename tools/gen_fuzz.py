#!/usr/bin/env python3
"""Adversarial fuzz corpus: same schemas and rough sizes as the driver's
sf0.01 tables, but hostile distributions the driver data lacks — the
shapes where a Spark query and its DuckDB oracle could coincidentally
agree on friendly data and diverge on real data:

- Zipf-skewed join keys (hot customers/parts) — skew/AQE paths
- clustered order dates with CALENDAR GAPS and heavy ties — the
  gap-correct time-series claims (ACF, STL, as-of ties)
- tied event timestamps (same µs, same user) — deterministic tie-breaks
- single-event users, heavily skewed event types
- documents with tabs/newlines/multi-spaces/leading+trailing blanks,
  single-word docs, all-same-word docs, planted EXACT duplicates at a
  high rate, and unicode tokens (é, ñ, 中文, emoji) — tokenizer parity
- part names duplicated and near-duplicated within a brand — fuzzy
  blocking ties
- embeddings with exact duplicate vectors, tight clusters, and one
  all-zero vector — zero-norm cosine conventions

Everything stays INSIDE the documented data contract (2-decimal money,
standard discount grid, same column types/domains), so a mismatch is a
genuine engine/oracle divergence, not a contract violation.

Usage:
  python3 tools/gen_fuzz.py /tmp/sffuzz [seed] [mult]
  # mult scales row counts (default 1 = sf0.01-ish; 100 = sf1-ish) while
  # hot-key cardinalities stay FIXED, so skew DEEPENS with scale - the
  # axis the uniform gen_sf.py corpus cannot probe
  sbt -batch 'runMain graft.Verify /tmp/sffuzz /tmp/vfuzz'
  python3 tools/parity_check.py /tmp/sffuzz /tmp/vfuzz
"""
import sys, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sffuzz"
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
# the seed salts every per-row hash draw (setseed alone would be
# cosmetic: no random() is ever called)
con.execute(f"CREATE MACRO SEEDV() AS {seed * 1000003}")

def save(name, sql):
    sql = sql.replace("{mult}", str(mult))
    con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT parquet)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n}")

save("region", "SELECT i::INT r_regionkey, 'REGION_'||i r_name FROM range(5) t(i)")
save("nation", "SELECT i::INT n_nationkey, 'NATION_'||i n_name, "
     "(i % 5)::INT n_regionkey FROM range(25) t(i)")

# hash-deterministic per-row draws (setseed alone is not stable across
# CTE re-evaluation — the gen_sf.py lesson)
save("customer", """
  SELECT i::BIGINT c_custkey, 'Customer#'||lpad(i::VARCHAR, 9, '0') c_name,
    (hash(SEEDV() + i * 13 + 1) % 25)::INT c_nationkey,
    round(((hash(SEEDV() + i * 17 + 3) % 1000000)::DOUBLE / 100.0) - 2500.0, 2)
      ::DOUBLE c_acctbal,
    ['BUILDING', 'MACHINERY', 'AUTOMOBILE', 'HOUSEHOLD', 'FURNITURE']
      [(hash(SEEDV() + i * 7 + 5) % 5 + 1)::INT] c_mktsegment
  FROM range(1500 * {mult}) t(i)""")

save("supplier", """
  SELECT i::BIGINT s_suppkey, 'Supplier#'||i s_name,
    (hash(SEEDV() + i * 11 + 2) % 25)::INT s_nationkey,
    round((hash(SEEDV() + i * 3 + 9) % 100000)::DOUBLE / 100.0, 2)::DOUBLE s_acctbal
  FROM range(100 * {mult}) t(i)""")

# part names: heavy intra-brand duplication + near-duplication (widget /
# widgets / widgit) and unicode names
save("part", """
  SELECT i::BIGINT p_partkey,
    CASE WHEN i % 11 = 0 THEN 'café widgét'
         WHEN i % 7 = 0 THEN 'red widget'
         WHEN i % 7 = 1 THEN 'red widgets'
         WHEN i % 7 = 2 THEN 'red widgit'
         ELSE ['small ring','blue bolt','green gear','tiny nut','long rod']
           [(hash(SEEDV() + i * 5 + 4) % 5 + 1)::INT] END p_name,
    'Brand#'||(hash(SEEDV() + i * 19 + 6) % 25) p_brand,
    ['ECONOMY','SMALL','STANDARD','LARGE','PROMO']
      [(hash(SEEDV() + i * 23 + 8) % 5 + 1)::INT] p_type,
    (hash(SEEDV() + i * 29) % 50 + 1)::INT p_size,
    round((hash(SEEDV() + i * 31) % 100000)::DOUBLE / 100.0 + 1.0, 2)::DOUBLE p_retailprice
  FROM range(2000 * {mult}) t(i)""")

# orders: zipf-ish skew on custkey (20% of orders on 10 hot customers),
# dates clustered in 3 windows with month-long gaps, many exact date ties
save("orders", """
  SELECT i::BIGINT o_orderkey,
    CASE WHEN i % 5 = 0 THEN (hash(SEEDV() + i) % 10)::BIGINT
         ELSE (hash(SEEDV() + i * 37 + 11) % (1500 * {mult}))::BIGINT END o_custkey,
    ['F','O','P'][(hash(SEEDV() + i * 41) % 3 + 1)::INT] o_orderstatus,
    round((hash(SEEDV() + i * 43 + 13) % 49000000)::DOUBLE / 100.0 + 1000.0, 2)
      ::DOUBLE o_totalprice,
    (TIMESTAMP '1995-01-01 00:00:00'
      + INTERVAL (CASE WHEN i % 3 = 0 THEN (hash(SEEDV() + i * 3) % 90)
                       WHEN i % 3 = 1 THEN 180 + (hash(SEEDV() + i * 3) % 90)
                       ELSE 420 + (hash(SEEDV() + i * 3) % 90) END) DAY) o_orderdate,
    ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']
      [(hash(SEEDV() + i * 47 + 15) % 5 + 1)::INT] o_orderpriority
  FROM range(15000 * {mult}) t(i)""")

# lineitem: zipf partkey (hot parts), standard discount grid, shipdate
# near the order window
save("lineitem", """
  SELECT (i % (15000 * {mult}))::BIGINT l_orderkey,
    CASE WHEN i % 4 = 0 THEN (hash(SEEDV() + i) % 20)::BIGINT
         ELSE (hash(SEEDV() + i * 53 + 17) % (2000 * {mult}))::BIGINT END l_partkey,
    (hash(SEEDV() + i * 59 + 19) % (100 * {mult}))::BIGINT l_suppkey,
    (i // (15000 * {mult}) + 1)::INT l_linenumber,
    ((hash(SEEDV() + i * 61) % 50) + 1)::DOUBLE l_quantity,
    round((hash(SEEDV() + i * 67 + 21) % 9000000)::DOUBLE / 100.0 + 100.0, 2)
      ::DOUBLE l_extendedprice,
    ((hash(SEEDV() + i * 71) % 11)::DOUBLE / 100.0)::DOUBLE l_discount,
    ((hash(SEEDV() + i * 73) % 9)::DOUBLE / 100.0)::DOUBLE l_tax,
    ['A','N','R'][(hash(SEEDV() + i * 79) % 3 + 1)::INT] l_returnflag,
    ['F','O'][(hash(SEEDV() + i * 83) % 2 + 1)::INT] l_linestatus,
    (TIMESTAMP '1995-01-01 00:00:00'
      + INTERVAL ((hash((i % 15000) * 3) % 510) + (hash(SEEDV() + i * 89) % 30)) DAY)
      l_shipdate
  FROM range(60000 * {mult}) t(i)""")

# events: tied timestamps (bursts share one µs), skewed types, 30% of
# users have exactly one event
save("events", """
  SELECT i::BIGINT event_id,
    (TIMESTAMP '2024-01-01 00:00:00'
      + INTERVAL ((hash(SEEDV() + i // 4) % 2600000)) SECOND) ts,
    CASE WHEN i % 10 < 3 THEN (1000 + i)::BIGINT
         ELSE (hash(SEEDV() + i * 97 + 23) % (150 * {mult}))::BIGINT END user_id,
    CASE WHEN i % 100 < 55 THEN 'view' WHEN i % 100 < 80 THEN 'click'
         WHEN i % 100 < 90 THEN 'signup' WHEN i % 100 < 97 THEN 'purchase'
         ELSE 'error' END event_type,
    round((hash(SEEDV() + i * 101 + 29) % 49000)::DOUBLE / 100.0 + 0.01, 2)
      ::DOUBLE "value",
    '{"k": '||(hash(SEEDV() + i * 103) % 100)||'}' props
  FROM range(10000 * {mult}) t(i)""")

# documents: hostile whitespace, planted exact dups, single-word and
# repeated-word docs, unicode tokens
save("documents", """
  WITH base AS (
    SELECT i,
      CASE
        WHEN i % 10 = 0 THEN 'dup dup  canonical\ttext with   gaps'
        WHEN i % 10 = 1 THEN 'solo'
        WHEN i % 10 = 2 THEN repeat('same ', 40)
        WHEN i % 10 = 3 THEN '  leading and trailing  '
        WHEN i % 10 = 4 THEN 'café naïve 中文 emoji 😀 ñandú'
        WHEN i % 10 = 5 THEN 'tab\there\tnewline here'
        ELSE array_to_string(list_transform(
          range(1, 11 + (hash(SEEDV() + i * 7) % 40)::INT),
          j -> ['batch','part','spark','line','column','order','small',
                'sort','fast','value','scan','hash','café','中文']
            [(hash(SEEDV() + i * 1000 + j) % 14 + 1)::INT]), ' ')
      END AS txt
    FROM range(500 * {mult}) t(i))
  SELECT i::BIGINT doc_id, txt AS "text",
    ['en','de','fr','es','zh'][(hash(SEEDV() + i * 107) % 5 + 1)::INT] lang,
    'src'||(hash(SEEDV() + i * 109) % 20) source,
    length(txt)::BIGINT n_chars
  FROM base""")

# embeddings: 4 tight clusters + exact duplicates + one zero vector
save("embeddings", """
  SELECT i::BIGINT vec_id,
    CASE WHEN i = 499 THEN list_transform(range(64), x -> 0.0::FLOAT)
         WHEN i % 10 = 9 THEN list_transform(range(64),
           x -> (0.5 + 0.1 * ((i // 100) % 4))::FLOAT)
         ELSE list_transform(range(64),
           x -> (0.1 * ((i // 125) + 1)
                 + (hash(SEEDV() + i * 64 + x) % 1000)::DOUBLE / 10000.0)::FLOAT)
    END embedding,
    ((i // 125) % 4)::INT AS label
  FROM range(500 * {mult}) t(i)""")

print(f"fuzz corpus (seed {seed}, mult {mult}) at {out}")
