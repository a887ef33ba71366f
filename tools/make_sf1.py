#!/usr/bin/env python3
"""Derive an sf1-scale bench input (~6M lineitem rows) from the driver's
sf0.1 testdata by 10x replication with per-copy decorrelation, so that
per-query cost scales the way a genuinely larger corpus would:

- lineitem/orders: order keys offset per copy (same dims -> 10x orders per
  customer, the TPC-H scaling shape).
- documents: doc_id offset; text passed through a per-copy letter-rotation
  `translate` so copies are NOT near-duplicates of each other (otherwise
  every dedup family would see quadratic cross-copy pair blowups that say
  nothing about honest scaling). Lengths/word structure are preserved.
- events: event_id/user_id offset per copy (per-user event density
  unchanged -> sessionization scales linearly). Written via pyarrow to
  preserve the source ts physical type (ns or us; Tables.t handles both).
- embeddings: vec_id offset; vector components rotated by copy index
  (norm-preserving, decorrelates copies for the ANN/semdedup families).
- dims (region/nation/customer/supplier/part): copied as-is.

Output: /tmp/graft_sf1 (regenerable dev artifact, not committed).
Usage: python3 tools/make_sf1.py
"""
import os, shutil
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft_sf1"
N = 10
ALPHA = "abcdefghij"

def main():
    os.makedirs(DST, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")

    con = duckdb.connect()

    con.execute(f"""COPY (
      SELECT l_orderkey + c.i * 10000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'),
           (SELECT unnest(range({N})) AS i) c
    ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")

    con.execute(f"""COPY (
      SELECT o_orderkey + c.i * 10000000 AS o_orderkey, o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'),
           (SELECT unnest(range({N})) AS i) c
    ) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")

    # per-copy rotation of a 10-letter alphabet: every char 5-gram/word
    # 3-shingle differs across copies while n_chars and word counts match
    doc_selects = []
    for i in range(N):
        rot = ALPHA[i:] + ALPHA[:i]
        doc_selects.append(f"""
          SELECT doc_id + {i * 5000} AS doc_id,
                 translate(text, '{ALPHA}', '{rot}') AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(doc_selects)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)")

    emb_selects = []
    for i in range(N):
        if i == 0:
            vec = "embedding"
        else:
            vec = f"embedding[{i + 1}:] || embedding[1:{i}]"
        emb_selects.append(f"""
          SELECT vec_id + {i * 2000} AS vec_id, {vec} AS embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(emb_selects)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")

    # events: pyarrow preserves the source ts physical type (the driver
    # has shipped both timestamp[ns] and timestamp[us]; Tables.t branches
    # on the loaded type, so either is fine -- just don't coerce)
    tbl = pq.read_table(f"{SRC}/events.parquet")
    assert tbl.schema.field("ts").type in (pa.timestamp("ns"), pa.timestamp("us")), \
        tbl.schema.field("ts").type
    parts = []
    for i in range(N):
        t2 = tbl.set_column(tbl.schema.get_field_index("event_id"), "event_id",
                            pc.add(tbl["event_id"], i * 10000000))
        t2 = t2.set_column(t2.schema.get_field_index("user_id"), "user_id",
                           pc.add(t2["user_id"], i * 1000000))
        parts.append(t2)
    pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet",
                   coerce_timestamps=None, version="2.6")

    for t in ["lineitem", "orders", "documents", "events", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n}")

if __name__ == "__main__":
    main()
