"""Synthesize the sf1 correctness tier (VERDICT r5 item 4): x10 the
driver-generated sf0.1 tables with disjoint key spaces per copy, so the
dedup/ANN/window relational tails can be DuckDB-checked at ~10x the
largest driver tier (6M lineitem rows, 50k documents, 20k embeddings).

Design notes (correctness-tier, not a load generator):
- every copy shifts its KEY columns by copy * 1e7 (1e8 for order/event
  ids) so cross-copy joins stay consistent (o_custkey tracks c_custkey)
  and window tie-breaks (q3/q4) stay deterministic on distinct keys;
- dimension tables (region/nation) are NOT duplicated - fact foreign
  keys reference them unchanged, exactly like a production star schema;
- document texts are kept byte-identical across copies ON PURPOSE: the
  dedup family then faces planted 10-way exact duplicates at scale;
- embeddings get a per-copy exactly-float-representable perturbation
  (first coordinate += copy * 2^-9) so ANN oracles keep distinct
  cosines - planted EXACT duplicate vectors would tie ranks at ~1 ulp
  and flip rows between engines (CLAUDE.md known-gap note).

Usage: python3 tools/make_sf1.py [/tmp/graft_sf1]
"""
import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
SRC = "/root/testdata/sf0.1"
COPIES = 10
K1 = 10_000_000    # entity-key shift (custkey/partkey/suppkey/doc/vec/user)
K2 = 100_000_000   # event/order/lineitem-id shift

con = duckdb.connect()


def gen(table: str, select: str) -> None:
    sql = (
        f"COPY (SELECT {select} FROM read_parquet('{SRC}/{table}.parquet'), "
        f"range({COPIES}) r(copy) ORDER BY ALL) "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
    )
    con.execute(sql)
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n}")


def copy_as_is(table: str) -> None:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
        f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)"
    )
    print(f"{table}: dims kept as-is")


os.makedirs(OUT, exist_ok=True)

copy_as_is("region")
copy_as_is("nation")
gen("customer",
    f"c_custkey + copy*{K1} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
gen("supplier",
    f"s_suppkey + copy*{K1} AS s_suppkey, s_name, s_nationkey, s_acctbal")
gen("part",
    f"p_partkey + copy*{K1} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
gen("orders",
    f"o_orderkey + copy*{K2} AS o_orderkey, o_custkey + copy*{K1} AS o_custkey, "
    "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
gen("lineitem",
    f"l_orderkey + copy*{K2} AS l_orderkey, l_partkey + copy*{K1} AS l_partkey, "
    f"l_suppkey + copy*{K1} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
gen("events",
    f"event_id + copy*{K2} AS event_id, ts, user_id + copy*{K1} AS user_id, "
    "event_type, value, props")
gen("documents",
    f"doc_id + copy*{K1} AS doc_id, text, lang, source, n_chars")
# first coordinate += copy * 2^-9 (exactly representable in FLOAT):
# distinct cosines per copy, same dimension, same label
gen("embeddings",
    f"vec_id + copy*{K1} AS vec_id, "
    "list_transform(embedding, (x, i) -> "
    "CASE WHEN i = 1 THEN CAST(x + copy * 0.001953125 AS FLOAT) ELSE x END) AS embedding, "
    "label")
print(f"sf1 tier written to {OUT}")
