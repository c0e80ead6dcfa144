"""Build an Nx key-offset replication of a testdata dir — the scaling-
evidence fixture behind README.md's 10x/100x tables.

Usage: python tools/make_scale_fixture.py [R] [SRC] [DST]
       (defaults: 100 /root/testdata/sf0.1 /tmp/scale100x)

Same linear-cardinality design as the 10x fixture, with stronger
embedding decorrelation (100 replicas > 64 dims, so rotation alone would
alias): replica i gets rotate(embedding, i % 64) and a global negation
for i >= 64 — 100 mutually distinct orientations.
"""
import os

import duckdb

import sys

R = int(sys.argv[1]) if len(sys.argv) > 1 else 100
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scale100x"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 8")

def mx(table, col):
    return con.execute(
        f"SELECT MAX({col}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]

offsets = {
    "o": mx("orders", "o_orderkey"),
    "c": mx("customer", "c_custkey"),
    "p": mx("part", "p_partkey"),
    "s": mx("supplier", "s_suppkey"),
    "d": mx("documents", "doc_id"),
    "v": mx("embeddings", "vec_id"),
    "e": mx("events", "event_id"),
    "u": mx("events", "user_id"),
}

def build(table, select_tpl, extra=None):
    parts = " UNION ALL ".join(
        select_tpl.format(i=i, sgn=(-1.0 if i >= 64 else 1.0),
                          rot=(i % 64), **offsets)
        for i in range(R)
    )
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{DST}/{table}.parquet')"
    ).fetchone()[0]
    print(table, n, flush=True)

for t in ("region", "nation"):
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
    )
    print(t, "copied", flush=True)

build("customer", f"""
SELECT c_custkey + {{i}} * {{c}} AS c_custkey, c_name, c_nationkey,
       c_acctbal, c_mktsegment
FROM read_parquet('{SRC}/customer.parquet')""")

build("supplier", f"""
SELECT s_suppkey + {{i}} * {{s}} AS s_suppkey, s_name, s_nationkey,
       s_acctbal
FROM read_parquet('{SRC}/supplier.parquet')""")

build("part", f"""
SELECT p_partkey + {{i}} * {{p}} AS p_partkey, p_name, p_brand, p_type,
       p_size, p_retailprice
FROM read_parquet('{SRC}/part.parquet')""")

build("orders", f"""
SELECT o_orderkey + {{i}} * {{o}} AS o_orderkey,
       o_custkey + {{i}} * {{c}} AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM read_parquet('{SRC}/orders.parquet')""")

# q11-aware replication (VERDICT r11 item 3): uniform key-offset
# replication multiplies the q11 national total by R while every
# per-key sum stays constant, so `value > 0.001 * total` excludes
# everything and the SF-scale witness was agreement-on-empty.  Boost
# replica 0's l_extendedprice by 20*R on the sparse deterministic key
# set l_partkey % 997 = 0 (~0.1% of keys): the pass condition becomes
# 20*m > 1 + 20*s (m = key's original value/threshold margin, s = the
# boosted keys' value share) — independent of R — so ~10 keys qualify
# at any replication factor and the filter is witnessed non-trivially.
# (Source-column binding: DuckDB resolves `l_partkey` in the CASE to
# the table column, not the offset alias — verified.)
build("lineitem", f"""
SELECT l_orderkey + {{i}} * {{o}} AS l_orderkey,
       l_partkey + {{i}} * {{p}} AS l_partkey,
       l_suppkey + {{i}} * {{s}} AS l_suppkey,
       l_linenumber, l_quantity,
       l_extendedprice * (CASE WHEN {{i}} = 0 AND l_partkey % 997 = 0
                               THEN {20 * R} ELSE 1 END)
         AS l_extendedprice,
       l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM read_parquet('{SRC}/lineitem.parquet')""")

build("events", f"""
SELECT event_id + {{i}} * {{e}} AS event_id, ts,
       user_id + {{i}} * {{u}} AS user_id, event_type, value, props
FROM read_parquet('{SRC}/events.parquet')""")

build("documents", f"""
SELECT doc_id + {{i}} * {{d}} AS doc_id,
       replace(text, ' ', '_r{{i}} ') || '_r{{i}}' AS text,
       lang, source,
       length(replace(text, ' ', '_r{{i}} ') || '_r{{i}}') AS n_chars
FROM read_parquet('{SRC}/documents.parquet')""")

build("embeddings", f"""
SELECT vec_id + {{i}} * {{v}} AS vec_id,
       CAST(list_transform(
              list_concat(embedding[{{rot}}+1:], embedding[1:{{rot}}]),
              x -> x * {{sgn}}) AS FLOAT[]) AS embedding,
       label
FROM read_parquet('{SRC}/embeddings.parquet')""")
print("done ->", DST, flush=True)
