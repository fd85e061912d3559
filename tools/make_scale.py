#!/usr/bin/env python3
"""Build a K-times scale replica of an sf dir for the scale probe.

Growth model = "more shards, same per-shard shape": each replica k
shifts every surrogate id past the base range and salts `source` (and
`user_id`) so per-source/per-user structure is preserved while global
volume grows K times. That mirrors how a real corpus scales — new
sources and new users arrive; intra-source redundancy stays constant —
and keeps banded/blocked dedup families' TRUE output linear in K
(blocks key on source). Families whose contract is GLOBAL all-pairs
similarity (exact SSJoin q122, substring spans q115/q116) see their
true output grow ~K^2 on replicated content; the probe therefore
records output-row growth next to runtime growth, and runtime is
judged per unit of output where output is super-linear by contract.

Dimensions (region/nation/customer/supplier/part) are copied
unchanged: at 100 TB dims stay dim-sized; facts reference the same
keys.

Usage: make_scale.py [src] [dst] [K]   (defaults: sf0.1 /tmp/sf1x 10)
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sf1x'
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

import os
import shutil

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

# dims: verbatim copies
for t in ['region', 'nation', 'customer', 'supplier', 'part']:
    shutil.copyfile(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')

def shift(t):
    return con.execute(f"SELECT max({t}) + 1 FROM base").fetchone()[0]

def replicate(table, sql_tmpl, id_col):
    con.execute(f"CREATE OR REPLACE VIEW base AS SELECT * FROM '{src}/{table}.parquet'")
    step = shift(id_col)
    parts = " UNION ALL ".join(sql_tmpl.format(k=k, step=step) for k in range(K))
    con.execute(f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows ({K}x)")

# source salting keeps the generator's `srcN` shape (queries like the
# mixture rebalancer parse the numeric suffix): replica k's sources are
# srcN+k*1000 when the base matches, `-rK`-suffixed otherwise.
replicate('documents', """
  SELECT doc_id + {k} * {step} AS doc_id, text, lang,
         CASE WHEN regexp_matches(source, '^src[0-9]+$')
              THEN 'src' || (substring(source, 4)::INT + {k} * 1000)
              ELSE source || '-r{k}' END AS source,
         n_chars FROM base""", 'doc_id')

replicate('embeddings', """
  SELECT vec_id + {k} * {step} AS vec_id, embedding, label FROM base""", 'vec_id')

replicate('orders', """
  SELECT o_orderkey + {k} * {step} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority FROM base""", 'o_orderkey')

con.execute(f"CREATE OR REPLACE VIEW obase AS SELECT * FROM '{src}/orders.parquet'")
ostep = con.execute("SELECT max(o_orderkey) + 1 FROM obase").fetchone()[0]
con.execute(f"CREATE OR REPLACE VIEW base AS SELECT * FROM '{src}/lineitem.parquet'")
parts = " UNION ALL ".join(f"""
  SELECT l_orderkey + {k} * {ostep} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate FROM base""" for k in range(K))
con.execute(f"COPY ({parts}) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")
print("lineitem:", con.execute(f"SELECT count(*) FROM '{dst}/lineitem.parquet'").fetchone()[0], f"rows ({K}x, orderkey-aligned)")

replicate('events', """
  SELECT event_id + {k} * {step} AS event_id, ts,
         user_id + {k} * 1000000 AS user_id, event_type, value, props
  FROM base""", 'event_id')

print(f"wrote {dst} at {K}x of {src}")
