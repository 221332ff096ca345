#!/usr/bin/env python3
"""Generate sf1 test data as a 10x replication of the driver's sf0.1.

Scale-rehearsal data for BENCH at one order of magnitude above sf0.1
(the driver only ships sf0.001/0.01/0.1). Copy 0 is sf0.1 verbatim;
copies 1..9 are key-shifted and TRANSFORMED so that cross-copy rows
never collide with each other:

  - entity keys (custkey/orderkey/partkey/suppkey/event_id/user_id/
    doc_id/vec_id) shift by k*10_000_000 consistently, so FK joins
    stay intact within each copy;
  - document text appends the copy digit to EVERY token: within-copy
    shingle/near-dup structure is preserved exactly, cross-copy
    shingles never match (without this, every doc gains 9 exact
    clones and pair-emitting dedup queries blow up ~100x instead of
    the ~10x a real corpus costs);
  - customer names append a per-copy 3-letter tag (edit distance >= 3
    between any two copies), so fuzzy-match pair counts scale ~10x,
    not ~100x;
  - embeddings flip the sign of a per-copy pseudo-random dimension
    subset: norms and ALL within-copy cosines are exactly preserved
    (cos(s*a, s*b) == cos(a, b)), cross-copy cosines collapse toward
    0, keeping near-dup/ANN workloads linear.

Dims (region, nation) stay as-is. Output: /root/repo/local/sf1/.
"""
import os
import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/local/sf1"
COPIES = 10
OFF = 10_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")


def gen(table, select_fn):
    parts = [select_fn(k) for k in range(COPIES)]
    q = "\nUNION ALL\n".join(parts)
    con.execute(
        f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n}")


def src(t):
    return f"'{SRC}/{t}.parquet'"


# dims: copy through unchanged
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO "
                f"'{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

gen("customer", lambda k: f"""
  SELECT c_custkey + {k * OFF} AS c_custkey,
    c_name || {"''" if k == 0 else f"' ' || repeat(chr(65 + {k}), 3)"} AS c_name,
    c_nationkey, c_acctbal, c_mktsegment
  FROM {src('customer')}""")

gen("supplier", lambda k: f"""
  SELECT s_suppkey + {k * OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}""")

gen("part", lambda k: f"""
  SELECT p_partkey + {k * OFF} AS p_partkey, p_name, p_brand, p_type,
    p_size, p_retailprice
  FROM {src('part')}""")

gen("orders", lambda k: f"""
  SELECT o_orderkey + {k * OFF} AS o_orderkey,
    o_custkey + {k * OFF} AS o_custkey,
    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}""")

gen("lineitem", lambda k: f"""
  SELECT l_orderkey + {k * OFF} AS l_orderkey,
    l_partkey + {k * OFF} AS l_partkey,
    l_suppkey + {k * OFF} AS l_suppkey,
    l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
    l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}""")

gen("events", lambda k: f"""
  SELECT event_id + {k * OFF} AS event_id, ts,
    user_id + {k * OFF} AS user_id, event_type, value, props
  FROM {src('events')}""")

def doc_text(k):
    if k == 0:
        return "text"
    return ("regexp_replace(text, '(" + r"\S" + "+)', '" + r"\1" +
            str(k) + "', 'g')")


gen("documents", lambda k: f"""
  SELECT doc_id + {k * OFF} AS doc_id,
    {doc_text(k)} AS text,
    lang, source,
    {"n_chars" if k == 0 else f"length({doc_text(k)})"} AS n_chars
  FROM {src('documents')}""")

gen("embeddings", lambda k: f"""
  SELECT vec_id + {k * OFF} AS vec_id,
    {"embedding" if k == 0 else
     f"list_transform(embedding, (x, i) -> "
     f"CASE WHEN (hash(i * 31 + {k}) & 1) = 0 THEN x ELSE -x END)"}
      AS embedding,
    label
  FROM {src('embeddings')}""")

print("done ->", DST)
