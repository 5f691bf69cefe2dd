#!/usr/bin/env python3
"""Generate sf1 (10x sf0.1) benchmark data into /tmp/sf1.

Scale-proof data for SURVEY §6: ten id-offset replicas of the driver's
sf0.1 tables, constructed so the SIMILARITY STRUCTURE scales exactly 10x
instead of exploding:

- documents: replica k > 0 suffixes every word with "r{k}", so replicas
  share no shingles — per-replica near-dup pairs are identical to sf0.1
  and the global pair count is exactly 10x (naive replication would make
  every doc an exact dup of its 9 copies: 45x pairs, a different problem
  than the one being scaled).
- embeddings: replica k > 0 gets hash-derived pseudo-random vectors
  (uniform in [-1, 1]) — random 64-dim pairs have cosine ~ N(0, 1/64), so
  replicas contribute no accidental cross-replica near-dups; the queries'
  own planted pairs replicate per id range.
- id offsets are multiples of 1e6 (1e8 for orderkey/event_id/vec_id), so
  the catalogs' doc_id % m plantings (m | 1e6: 2, 4, 8, 10, 50) replicate
  identically per replica.

Only used locally for the sf1 bench sidecar; the driver's gates stay on
/root/testdata. Deterministic (hash-based, no RNG state).
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10  # replicas of sf0.1

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def gen(table, sql_for_k, order=None):
    parts = [sql_for_k(k) for k in range(K)]
    union = " UNION ALL ".join(parts)
    ob = f" ORDER BY {order}" if order else ""
    con.execute(
        f"COPY ({union}{ob}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


# dims stay 1x — they are O(25) at any scale factor
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied 1x")

gen("customer", lambda k: f"""
  SELECT c_custkey + {k*1000000} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")

gen("supplier", lambda k: f"""
  SELECT s_suppkey + {k*1000000} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")

gen("part", lambda k: f"""
  SELECT p_partkey + {k*1000000} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")

gen("orders", lambda k: f"""
  SELECT o_orderkey + {k*100000000} AS o_orderkey,
         o_custkey + {k*1000000} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")

gen("lineitem", lambda k: f"""
  SELECT l_orderkey + {k*100000000} AS l_orderkey,
         l_partkey + {k*1000000} AS l_partkey,
         l_suppkey + {k*1000000} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")

# ts as epoch-NANOS BIGINT: the driver's events.parquet is INT64
# TIMESTAMP(NANOS), which graft.sources.Tables.events reads as a long
# (legacy nanosAsLong) and divides to micros — a plain TIMESTAMP column
# here would hit its `ts DIV 1000` with the wrong type
gen("events", lambda k: f"""
  SELECT event_id + {k*100000000} AS event_id,
         epoch_ns(ts) AS ts,
         user_id + {k*1000000} AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'""")

gen("documents", lambda k: (f"""
  SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'"""
    if k == 0 else f"""
  SELECT doc_id + {k*1000000} AS doc_id,
         array_to_string(list_transform(string_split(text, ' '),
           x -> CASE WHEN x = '' THEN x ELSE x || 'r{k}' END), ' ') AS text,
         lang, source,
         CAST(len(array_to_string(list_transform(string_split(text, ' '),
           x -> CASE WHEN x = '' THEN x ELSE x || 'r{k}' END), ' '))
           AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet'"""))

# embedding dim of the source table
dim = con.sql(
    f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
).fetchone()[0]

gen("embeddings", lambda k: (f"""
  SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"""
    if k == 0 else f"""
  SELECT vec_id + {k*100000000} AS vec_id,
         [CAST((CAST(hash(vec_id * 131071 + i * 524287 + {k} * 8191)
            % 2001 AS BIGINT) - 1000) / 1000.0 AS FLOAT)
          FOR i IN range(1, {dim} + 1)] AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'"""))

print(f"done -> {DST}")
