#!/usr/bin/env python3
"""Degenerate-corpus generator for the crash-robustness sweep.

Builds a tiny, near-constant corpus (2-4 rows per table, one event type,
one shipping day, constant prices, 64-dim embeddings) — the shapes that
zero out variances, empty one class of a label, and collapse time series
to a point. Under Spark 4's ANSI semantics a raw 0/0 double division is a
runtime DIVIDE_BY_ZERO error, so any unguarded statistic CRASHES here
instead of quietly returning NaN.

Usage:
  python3 tools/gen_degen.py /tmp/sfdegen            # near-constant rows
  python3 tools/gen_degen.py /tmp/sfempty --empty    # same schemas, 0 rows
  python3 tools/gen_degen.py /tmp/sfzero --zero-price # every money col 0.00
  # (0.00 is legal under the 2-decimal money contract and zeroes every
  #  revenue total — the q_abc_classes share-by-max(t_rev) crash class)
  sbt -batch 'runMain graft.Verify /tmp/sfdegen /tmp/vdegen'
  # expectation: zero '[verify] ... failed' lines — every query either
  # returns (possibly empty / NULL-statistic) rows or raises one of the
  # documented requires; see SCALING.md 'degenerate-corpus sweep'.

The sweep found 12 real crashes when first run (round 10): constant
series (q_acf, q_trend_fit, q_stl_anomalies), zero-variance groups
(q_zscore_outliers, q_corr_matrix, t_zipf_fit r2), single-user arms
(q_msprt, q_ab_cuped), one-class labels (t_lr_auc), single-period types
(q_psi_drift, q_incrementality), zero-weight replicates (q_bootstrap_ci),
one-level contingency tables (q_cramers_v). All now degrade to NULL
statistics via nullif guards mirrored in the oracles.
"""
import sys, os
import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdegen"
empty = "--empty" in sys.argv
zero_price = "--zero-price" in sys.argv
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# every money-typed column collapses to 0.00 under --zero-price
P = (lambda _: "0.0") if zero_price else (lambda v: v)

def save(name, sql):
    suffix = " LIMIT 0" if empty else ""
    con.execute(f"COPY ({sql}{suffix}) TO '{out}/{name}.parquet' (FORMAT parquet)")

save("region", "SELECT 0::INT r_regionkey, 'R' r_name")
save("nation", "SELECT i::INT n_nationkey, 'N'||i n_name, 0::INT n_regionkey FROM range(2) t(i)")
save("customer", "SELECT i::BIGINT c_custkey, 'C'||i c_name, (i % 2)::INT c_nationkey, "
     f"{P('100.0')}::DOUBLE c_acctbal, 'BUILDING' c_mktsegment FROM range(3) t(i)")
save("supplier", "SELECT i::BIGINT s_suppkey, 'S'||i s_name, (i % 2)::INT s_nationkey, "
     f"{P('10.0')}::DOUBLE s_acctbal FROM range(2) t(i)")
save("part", "SELECT i::BIGINT p_partkey, 'P'||i p_name, 'B#1' p_brand, 'T' p_type, "
     f"1::INT p_size, {P('10.0')}::DOUBLE p_retailprice FROM range(3) t(i)")
save("orders", "SELECT i::BIGINT o_orderkey, (i % 3)::BIGINT o_custkey, 'F' o_orderstatus, "
     f"{P('1000.0')}::DOUBLE o_totalprice, TIMESTAMP '1996-06-01 00:00:00' o_orderdate, "
     "'1-URGENT' o_orderpriority FROM range(4) t(i)")
save("lineitem", "SELECT i::BIGINT l_orderkey, (i % 3)::BIGINT l_partkey, "
     "(i % 2)::BIGINT l_suppkey, 1::INT l_linenumber, 1.0::DOUBLE l_quantity, "
     f"{P('100.0')}::DOUBLE l_extendedprice, 0.0::DOUBLE l_discount, 0.0::DOUBLE l_tax, "
     "'N' l_returnflag, 'O' l_linestatus, TIMESTAMP '1996-06-01 00:00:00' l_shipdate "
     "FROM range(4) t(i)")
save("events", "SELECT i::BIGINT event_id, TIMESTAMP '2024-01-01 00:00:00' ts, "
     f"(i % 2)::BIGINT user_id, 'click' event_type, {P('1.0')}::DOUBLE \"value\", "
     "'{\"k\": 1}' props FROM range(4) t(i)")
save("documents", 'SELECT i::BIGINT doc_id, \'a b c\' "text", \'en\' lang, '
     "'web' source, 5::BIGINT n_chars FROM range(3) t(i)")
con.execute(f"""COPY (
  SELECT i::BIGINT vec_id,
    list_transform(range(64), x -> (0.1 + 0.01*i + 0.001*x)::FLOAT) embedding,
    (i % 2)::INT AS label
  FROM range(3) t(i) {"LIMIT 0" if empty else ""})
  TO '{out}/embeddings.parquet' (FORMAT parquet)""")
print(f"{'empty' if empty else ('zero-price' if zero_price else 'degenerate')} corpus at {out}")
