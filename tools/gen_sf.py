#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing fixture directory by
deterministic replication — the local stand-in for driver-generated data
when measuring how operator wall-clock scales PAST the largest shipped
fixture (SCALE.md "measured growth" sections).

Each replica r in 1..R-1 is the base fixture with:
  - every key column offset by r * (max_key + 1), so joins/groupings see
    genuinely new entities (no accidental key collisions across replicas);
  - document TEXT word-PERMUTED per replica with every 5th token
    retagged, so both shingle-level AND bag-of-words similarity across
    replicas collapses (verbatim or merely-rotated copies would plant
    R-sized duplicate cliques and measure an adversarial dup-explosion
    regime, not organic growth); n_chars is recomputed from the
    rewritten text;
  - embeddings rotated by r dimensions (norm-preserving, neighborhoods
    shuffled, no cross-replica near-identity pairs).

region/nation are dimension tables with fixed public cardinality and are
copied as-is. Usage:
  python3 tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10

ADVERSARIAL MODE (--adversarial as 4th arg): document TEXT is replicated
VERBATIM (keys still offset) — every base document becomes an R-sized
duplicate CLIQUE in EVERY similarity space at once (char shingles →
MinHash bands, bag-of-words → SimHash, word n-grams → containment/
jaccard, pHash payload bytes). This is the boilerplate-mega-clique
regime the banded generators' population caps exist for: any UNCAPPED
bucketed self-join goes quadratic in R on this corpus (the permute-
without-retag variant of this regime measured 100x runtime at 10x data
for the then-uncapped simhash join, SCALE.md). AdversarialBoundSpec
asserts the capped generators' candidate-bound theorems on a small
committed fixture built by this flag; embeddings are also copied
verbatim in this mode (planted duplicate vectors for the embedding
generators). Usage:
  python3 tools/gen_sf.py /root/testdata/sf0.001 /tmp/adv 40 --adversarial
"""
import sys
import duckdb

src, dst, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
ADVERSARIAL = len(sys.argv) > 4 and sys.argv[4] == "--adversarial"
con = duckdb.connect()
import os
os.makedirs(dst, exist_ok=True)

def off(table, key):
    """Per-replica key stride = max(key)+1 FROM THE SOURCE — hardcoded
    strides would silently collide keys when the tool is chained on its
    own output (the scale-another-decade workflow) or run on a fixture
    with a different key range, corrupting every join/grouping/dedup
    measurement with cross-replica entity merges."""
    return con.execute(
        f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

O_SUPP = off('supplier', 's_suppkey')
# events.user_id JOINS customer.c_custkey (joinScd2, stream_static_join,
# GDPR purge): the two columns live in ONE entity space, so they must
# share ONE stride — per-column strides would shift replicas r>=1 of the
# two sides by different amounts whenever max(user_id) != max(c_custkey),
# silently breaking the user<->customer join relationship in every
# synthesized-SF scale measurement (round-8 ADVICE).
O_CUST = max(off('customer', 'c_custkey'), off('events', 'user_id'))
O_PART = off('part', 'p_partkey')
O_ORD  = off('orders', 'o_orderkey')
O_USER = O_CUST  # same entity space as c_custkey — see above
O_EVT  = off('events', 'event_id')
O_DOC  = off('documents', 'doc_id')
O_VEC  = off('embeddings', 'vec_id')

def gen(table, sql_tpl, copy_only=False):
    parts = []
    for r in range(reps):
        parts.append(sql_tpl.format(r=r, src=src, O_SUPP=O_SUPP, O_CUST=O_CUST,
            O_PART=O_PART, O_ORD=O_ORD, O_USER=O_USER, O_EVT=O_EVT, O_DOC=O_DOC, O_VEC=O_VEC))
        if copy_only:
            break
    union = "\nUNION ALL\n".join(parts)
    con.execute(f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

gen("region", "SELECT * FROM '{src}/region.parquet'", copy_only=True)
gen("nation", "SELECT * FROM '{src}/nation.parquet'", copy_only=True)

gen("supplier", """
SELECT s_suppkey + {r} * {O_SUPP} AS s_suppkey,
       concat(s_name, '_R{r}') AS s_name, s_nationkey, s_acctbal
FROM '{src}/supplier.parquet'""")

gen("customer", """
SELECT c_custkey + {r} * {O_CUST} AS c_custkey,
       concat(c_name, '_R{r}') AS c_name, c_nationkey, c_acctbal, c_mktsegment
FROM '{src}/customer.parquet'""")

gen("part", """
SELECT p_partkey + {r} * {O_PART} AS p_partkey,
       concat(p_name, '_R{r}') AS p_name, p_brand, p_type, p_size, p_retailprice
FROM '{src}/part.parquet'""")

gen("orders", """
SELECT o_orderkey + {r} * {O_ORD} AS o_orderkey,
       o_custkey + {r} * {O_CUST} AS o_custkey,
       o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM '{src}/orders.parquet'""")

gen("lineitem", """
SELECT l_orderkey + {r} * {O_ORD} AS l_orderkey,
       l_partkey + {r} * {O_PART} AS l_partkey,
       l_suppkey + {r} * {O_SUPP} AS l_suppkey,
       l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
       l_returnflag, l_linestatus, l_shipdate
FROM '{src}/lineitem.parquet'""")

gen("events", """
SELECT event_id + {r} * {O_EVT} AS event_id, ts,
       user_id + {r} * {O_USER} AS user_id, event_type, value, props
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
# same retag positions). The outer SELECT recomputes n_chars from the
# rewritten text (the retag lengthens it ~4%).
if ADVERSARIAL:
    # verbatim text replicas: R-cliques in every similarity space
    gen("documents", """
SELECT doc_id + {r} * {O_DOC} AS doc_id, text, lang, source, n_chars
FROM '{src}/documents.parquet'""")
    gen("embeddings", """
SELECT vec_id + {r} * {O_VEC} AS vec_id, embedding, label
FROM '{src}/embeddings.parquet'""")
else:
    gen("documents", """
SELECT doc_id, text, lang, source,
       CAST(length(text) AS BIGINT) AS n_chars
FROM (
SELECT doc_id + {r} * {O_DOC} AS doc_id,
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
       lang, source, n_chars AS n_chars_orig
FROM '{src}/documents.parquet') t""")

    # rotate embedding dimensions by r (norm-preserving)
    gen("embeddings", """
SELECT vec_id + {r} * {O_VEC} AS vec_id,
       CASE WHEN {r} = 0 THEN embedding
            ELSE CAST(list_concat(embedding[(1 + {r} % 64):], embedding[1:({r} % 64)])
                      AS FLOAT[])
       END AS embedding,
       label
FROM '{src}/embeddings.parquet'""")
