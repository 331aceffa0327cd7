#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing fixture directory by
deterministic replication — the local stand-in for driver-generated data
when measuring how operator wall-clock scales PAST the largest shipped
fixture (SCALE.md "measured growth" sections).

Each replica r in 1..R-1 is the base fixture with:
  - every key column offset by r * (max_key + 1), so joins/groupings see
    genuinely new entities (no accidental key collisions across replicas);
  - document TEXT word-rotated by r positions, so shingle/minhash
    similarity ACROSS replicas stays low (verbatim copies would plant
    R-sized duplicate cliques and measure an adversarial dup-explosion
    regime, not organic growth — rotation preserves token counts and
    per-doc statistics while shifting every word 3-gram);
  - embeddings rotated by r dimensions (norm-preserving, neighborhoods
    shuffled, no cross-replica near-identity pairs).

region/nation are dimension tables with fixed public cardinality and are
copied as-is. Usage:
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys
import duckdb

src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
import os
os.makedirs(dst, exist_ok=True)

def gen(table, sql_tpl, copy_only=False):
    parts = []
    for r in range(reps):
        parts.append(sql_tpl.format(r=r, src=src))
        if copy_only:
            break
    union = "\nUNION ALL\n".join(parts)
    con.execute(f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

gen("region", "SELECT * FROM '{src}/region.parquet'", copy_only=True)
gen("nation", "SELECT * FROM '{src}/nation.parquet'", copy_only=True)

gen("supplier", """
SELECT s_suppkey + {r} * 1000 AS s_suppkey,
       concat(s_name, '_R{r}') AS s_name, s_nationkey, s_acctbal
FROM '{src}/supplier.parquet'""")

gen("customer", """
SELECT c_custkey + {r} * 15000 AS c_custkey,
       concat(c_name, '_R{r}') AS c_name, c_nationkey, c_acctbal, c_mktsegment
FROM '{src}/customer.parquet'""")

gen("part", """
SELECT p_partkey + {r} * 20000 AS p_partkey,
       concat(p_name, '_R{r}') AS p_name, p_brand, p_type, p_size, p_retailprice
FROM '{src}/part.parquet'""")

gen("orders", """
SELECT o_orderkey + {r} * 150000 AS o_orderkey,
       o_custkey + {r} * 15000 AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM '{src}/orders.parquet'""")

gen("lineitem", """
SELECT l_orderkey + {r} * 150000 AS l_orderkey,
       l_partkey + {r} * 20000 AS l_partkey,
       l_suppkey + {r} * 1000 AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM '{src}/lineitem.parquet'""")

gen("events", """
SELECT event_id + {r} * 100000 AS event_id, ts,
       user_id + {r} * 1500 AS user_id, event_type, value, props
FROM '{src}/events.parquet'""")

# deterministically PERMUTE words per replica (hash-keyed sort over
# (word, position, r)) AND retag every 5th word with a replica suffix:
# a mere rotation left shingle sets ~93% intact between adjacent
# replicas — measured on the fixture — and a permutation alone leaves
# the token SET identical, so every bag-of-words signature (SimHash!)
# still collides across replicas in R-sized planted cliques. The 20%
# token divergence pushes SimHash hamming far past its 3-bit budget and
# drops token-set Jaccard to ~0.67 < any dedup τ, while intra-replica
# near-dup structure survives (similar docs get similar keys and the
# same retag positions). Token counts and per-doc length stats are
# preserved.
gen("documents", """
SELECT doc_id + {r} * 5000 AS doc_id,
       CASE WHEN {r} = 0 THEN text
            ELSE array_to_string(
              list_transform(
                list_sort(list_transform(string_split(text, ' '),
                  (x, i) -> {{'k': hash(x || ':' || CAST(i AS VARCHAR) || ':{r}'),
                              'w': CASE WHEN i % 5 = 0
                                        THEN x || 'r{r}'
                                        ELSE x END}})),
                s -> s.w), ' ')
       END AS text,
       lang, source, n_chars
FROM '{src}/documents.parquet'""")

# rotate embedding dimensions by r (norm-preserving)
gen("embeddings", """
SELECT vec_id + {r} * 2000 AS vec_id,
       CASE WHEN {r} = 0 THEN embedding
            ELSE CAST(list_concat(embedding[(1 + {r} % 64):], embedding[1:({r} % 64)])
                      AS FLOAT[])
       END AS embedding,
       label
FROM '{src}/embeddings.parquet'""")
