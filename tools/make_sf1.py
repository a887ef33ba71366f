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
- embeddings: vec_id offset; every copy gets an ORTHOGONAL transform —
  rotation by copy index, reversal on alternating dim-blocks, and (for
  K beyond the 2*dim = 128 rotation/reverse budget — i.e. the sf100
  probe's K=1000) a per-copy SEEDED SIGN PATTERN. All three preserve
  norms and within-copy cosines exactly, while cross-copy cosines
  collapse to noise — the ANN/semdedup families must not see cross-copy
  near-identical vectors at any K.
- dims (region/nation/customer/supplier/part): copied as-is.

documents is written as a parquet DIRECTORY of part files for K > 100
(a single-file 13 GB corpus would both choke one DuckDB UNION ALL plan
and serialize the Spark scan).

Usage: python3 tools/make_sf1.py [K [DST]]
  K=10   -> /tmp/graft_sf1   (~6M lineitem, the sf1 bench input; default)
  K=100  -> /tmp/graft_sf10  (~60M lineitem, the sf10 bench input)
  K=1000 -> /tmp/graft_sf100 (~600M lineitem, the sf100-lite probe input)
Output dirs are regenerable dev artifacts, not committed.
"""
import os, random, shutil, string, sys
import duckdb
import numpy as np
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
    # stream COPY instead of materializing the whole K-fold result in
    # memory first (at K=1000 the default insertion-order-preserving
    # write buffered ~100 GB of lineitem before flushing a byte)
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")

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
    def doc_select(i):
        return f"""
          SELECT doc_id + {i * 5000} AS doc_id,
                 translate(text, '{LETTERS}', '{perm(i)}') AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet')"""
    if n <= 100:
        con.execute(f"COPY ({' UNION ALL '.join(doc_select(i) for i in range(n))}) "
                    f"TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    else:
        ddir = f"{dst}/documents.parquet"
        shutil.rmtree(ddir, ignore_errors=True)
        os.makedirs(ddir)
        batch = 50
        for p, lo in enumerate(range(0, n, batch)):
            sel = " UNION ALL ".join(doc_select(i) for i in range(lo, min(lo + batch, n)))
            con.execute(f"COPY ({sel}) TO '{ddir}/part-{p:04d}.parquet' (FORMAT PARQUET)")

    # embeddings via numpy: per-copy orthogonal transform = seeded sign
    # pattern (copy 0 = identity) o alternating reverse o rotation
    et = pq.read_table(f"{SRC}/embeddings.parquet")
    evec = np.array(et["embedding"].to_pylist(), dtype=np.float32)
    evid = et["vec_id"].to_numpy()
    ew = pq.ParquetWriter(f"{dst}/embeddings.parquet", pa.schema([
        ("vec_id", et.schema.field("vec_id").type),
        ("embedding", et.schema.field("embedding").type),
        ("label", et.schema.field("label").type)]))
    for i in range(n):
        v = evec
        if (i // EMB_DIM) % 2 == 1:
            v = v[:, ::-1]
        rot = i % EMB_DIM
        if rot:
            v = np.concatenate([v[:, rot:], v[:, :rot]], axis=1)
        if i > 0:
            signs = (np.asarray(
                random.Random(10_000 + i).choices([1.0, -1.0], k=EMB_DIM),
                dtype=np.float32))
            v = v * signs
        ew.write_table(pa.table({
            "vec_id": pa.array(evid + i * 2000, type=et.schema.field("vec_id").type),
            "embedding": pa.array(list(v), type=et.schema.field("embedding").type),
            "label": et["label"]}))
    ew.close()

    # events: pyarrow preserves the source ts physical type (the driver
    # has shipped both timestamp[ns] and timestamp[us]; Tables.t branches
    # on the loaded type, so either is fine -- just don't coerce)
    tbl = pq.read_table(f"{SRC}/events.parquet")
    assert tbl.schema.field("ts").type in (pa.timestamp("ns"), pa.timestamp("us")), \
        tbl.schema.field("ts").type
    # incremental writer: K=1000 copies concat'd in memory would be ~8 GB
    w = pq.ParquetWriter(f"{dst}/events.parquet", tbl.schema, version="2.6")
    for i in range(n):
        t2 = tbl.set_column(tbl.schema.get_field_index("event_id"), "event_id",
                            pc.add(tbl["event_id"], i * 10000000))
        t2 = t2.set_column(t2.schema.get_field_index("user_id"), "user_id",
                           pc.add(t2["user_id"], i * 1000000))
        w.write_table(t2)
    w.close()

    for t in ["lineitem", "orders", "documents", "events", "embeddings"]:
        p = f"{dst}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        cnt = con.execute(f"SELECT count(*) FROM read_parquet('{pat}')").fetchone()[0]
        print(f"{t}: {cnt}")

if __name__ == "__main__":
    main()
