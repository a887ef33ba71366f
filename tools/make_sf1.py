#!/usr/bin/env python3
"""Derive an sfN-scale bench input from the driver's sf0.1 testdata by
K-fold replication with per-copy decorrelation, so that per-query cost
scales the way a genuinely larger corpus would:

- lineitem/orders: order keys offset per copy (same dims -> K-fold more
  orders per customer, the TPC-H scaling shape).
- documents: doc_id offset; text passed through a per-copy SEEDED
  PERMUTATION of the full a-z alphabet (copy 0 = identity), so copies
  are NOT near-duplicates of each other at ANY K (the sf1-era 10-letter
  rotation only yielded 10 distinct variants — at K=100 copies i and
  i+10 would be identical and every dedup family would see quadratic
  cross-copy pair blowups that say nothing about honest scaling).
  Lengths/word structure are preserved by any fixed permutation.
- events: event_id/user_id offset per copy (per-user event density
  unchanged -> sessionization scales linearly). Written via pyarrow to
  preserve the source ts physical type (ns or us; Tables.t handles both).
- embeddings: vec_id offset; vector components rotated by copy index,
  and copies >= dim additionally REVERSED before rotating (norm-
  preserving, doubles the distinct-variant budget to 2*dim = 128 — ample
  for K=100; the ANN/semdedup families must not see cross-copy
  near-identical vectors).
- dims (region/nation/customer/supplier/part): copied as-is.

Usage: python3 tools/make_sf1.py [K [DST]]
  K=10  -> /tmp/graft_sf1  (~6M lineitem, the sf1 bench input; default)
  K=100 -> /tmp/graft_sf10 (~60M lineitem, the sf10 bench input)
Output dirs are regenerable dev artifacts, not committed.
"""
import os, random, shutil, string, sys
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
LETTERS = string.ascii_lowercase
EMB_DIM = 64


def perm(i: int) -> str:
    """Deterministic full-alphabet permutation for copy i (identity at 0)."""
    if i == 0:
        return LETTERS
    chars = list(LETTERS)
    random.Random(i).shuffle(chars)
    return "".join(chars)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = sys.argv[2] if len(sys.argv) > 2 else (
        "/tmp/graft_sf1" if n == 10 else f"/tmp/graft_sf{n // 10}")
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")

    con = duckdb.connect()

    con.execute(f"""COPY (
      SELECT l_orderkey + c.i * 10000000 AS l_orderkey, l_partkey, l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{SRC}/lineitem.parquet'),
           (SELECT unnest(range({n})) AS i) c
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")

    con.execute(f"""COPY (
      SELECT o_orderkey + c.i * 10000000 AS o_orderkey, o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{SRC}/orders.parquet'),
           (SELECT unnest(range({n})) AS i) c
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")

    # per-copy alphabet permutation: every char 5-gram / word 3-shingle
    # differs across copies while n_chars and word counts match
    doc_selects = []
    for i in range(n):
        doc_selects.append(f"""
          SELECT doc_id + {i * 5000} AS doc_id,
                 translate(text, '{LETTERS}', '{perm(i)}') AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(doc_selects)}) TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    emb_selects = []
    for i in range(n):
        rot = i % EMB_DIM
        base = ("list_reverse(embedding)" if i >= EMB_DIM else "embedding")
        if rot == 0:
            vec = base
        else:
            vec = f"{base}[{rot + 1}:] || {base}[1:{rot}]"
        emb_selects.append(f"""
          SELECT vec_id + {i * 2000} AS vec_id, {vec} AS embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet')""")
    con.execute(f"COPY ({' UNION ALL '.join(emb_selects)}) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")

    # events: pyarrow preserves the source ts physical type (the driver
    # has shipped both timestamp[ns] and timestamp[us]; Tables.t branches
    # on the loaded type, so either is fine -- just don't coerce)
    tbl = pq.read_table(f"{SRC}/events.parquet")
    assert tbl.schema.field("ts").type in (pa.timestamp("ns"), pa.timestamp("us")), \
        tbl.schema.field("ts").type
    parts = []
    for i in range(n):
        t2 = tbl.set_column(tbl.schema.get_field_index("event_id"), "event_id",
                            pc.add(tbl["event_id"], i * 10000000))
        t2 = t2.set_column(t2.schema.get_field_index("user_id"), "user_id",
                           pc.add(t2["user_id"], i * 1000000))
        parts.append(t2)
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet",
                   coerce_timestamps=None, version="2.6")

    for t in ["lineitem", "orders", "documents", "events", "embeddings"]:
        cnt = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {cnt}")

if __name__ == "__main__":
    main()
