#!/usr/bin/env python3
"""Synthesize an sf1-scale star schema from the driver's sf0.1 tables.

The driver's TESTDATA tops out at sf0.1, so the 2x bench gate against the
reference engine was only ever evidenced there. This clones each b_*-
relevant table x10 under SHIFTED keys (copy k adds k*(max_key+1) to every
primary/foreign key), which preserves the join structure exactly: each
copy's orders point at that copy's customers, so per-key fan-outs match
sf0.1 while totals are x10 — the same shape real TPC-H sf1 has. Value
columns (prices, balances, dates, strings) are cloned verbatim, so
selectivity of every b_* predicate is unchanged.

Writes ONLY the four tables the 8 b_* shapes read (orders, customer,
supplier, lineitem). Output lands under target/ (gitignored — this is a
~150 MB measurement artifact, regenerate on demand).

Usage: python3 tools/refbaseline/synth_sf1.py [srcDir] [dstDir] [copies]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()


def key_base(table, col):
    return con.sql(
        f"SELECT max({col}) + 1 FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]


omax = key_base("orders", "o_orderkey")
cmax = key_base("customer", "c_custkey")
smax = key_base("supplier", "s_suppkey")
pmax = key_base("lineitem", "l_partkey")
g = f"(SELECT unnest(range({K}))::BIGINT AS k) g"

copies = {
    "customer": f"""
        SELECT c_custkey + k*{cmax} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM read_parquet('{src}/customer.parquet') CROSS JOIN {g}""",
    "orders": f"""
        SELECT o_orderkey + k*{omax} AS o_orderkey,
               o_custkey + k*{cmax} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet') CROSS JOIN {g}""",
    "supplier": f"""
        SELECT s_suppkey + k*{smax} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM read_parquet('{src}/supplier.parquet') CROSS JOIN {g}""",
    "lineitem": f"""
        SELECT l_orderkey + k*{omax} AS l_orderkey,
               l_partkey + k*{pmax} AS l_partkey,
               l_suppkey + k*{smax} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet') CROSS JOIN {g}""",
}

for t, q in copies.items():
    con.sql(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"wrote {dst}")
