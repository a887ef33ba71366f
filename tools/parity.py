#!/usr/bin/env python3
"""Local oracle-parity check (SURVEY §5.2 layer 1) — mirrors the driver's
t2 compare: run graft.Verify output parquet vs DuckDB oracle_sql.json over
the same testdata, sort columns by name, sort rows, compare values.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    # union of declared queries (queries.json, written by Verify) and
    # whatever output dirs exist — a query that threw inside Verify has
    # no output dir and must surface as MISSING_OUTPUT, not be skipped
    declared = set()
    qj = os.path.join(out_dir, "queries.json")
    if os.path.exists(qj):
        declared = set(json.load(open(qj)))
    names = sorted(declared | {d for d in os.listdir(out_dir)
                               if os.path.isdir(os.path.join(out_dir, d))})
    for name in names:
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            results[name] = "MISSING_OUTPUT (query threw in Verify?)"
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
        if name not in oracle:
            results[name] = f"NO_ORACLE rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT spark={len(g)} duck={len(e)}"
        else:
            try:
                import pandas as pd
                eq = g.equals(e)
                if not eq:
                    # find first differing cell for diagnostics
                    diff = None
                    for c in g.columns:
                        gc, ec = g[c], e[c]
                        neq = ~((gc == ec) | (gc.isna() & ec.isna()))
                        if neq.any():
                            i = neq.idxmax()
                            diff = f"col={c} row={i} spark={gc[i]!r} duck={ec[i]!r}"
                            break
                    results[name] = f"VALUE_MISMATCH {diff or '(dtype-only?) ' + str(list(zip(g.dtypes, e.dtypes)))}"
                else:
                    results[name] = f"OK rows={len(g)}"
            except Exception as ex:
                results[name] = f"COMPARE_ERROR: {ex}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    noor = sum(1 for v in results.values() if v.startswith("NO_ORACLE"))
    for k, v in sorted(results.items()):
        flag = "  " if v.startswith(("OK", "NO_ORACLE")) else "**"
        print(f"{flag} {k:28s} {v}")
    print(f"\n{ok} OK, {noor} no-oracle, {len(results) - ok - noor} FAILING of {len(results)}")
    # optional committed-artifact form (e.g. CORRECTNESS_SF01.json):
    # the same per-query verdicts, machine-readable
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump({"sf_dir": sf_dir, "n": len(results), "ok": ok,
                       "failing": len(results) - ok - noor,
                       "results": dict(sorted(results.items()))}, f, indent=1)
        print(f"wrote {sys.argv[3]}")
    return 0 if ok + noor == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
