#!/usr/bin/env python3
"""Artifact↔narrative lockstep check (VERDICT r8 'What's wrong #4'):
every `<query_name> <float>` pair quoted in the NEWEST row of
BASELINE.md's measurements table must be reproducible from the committed
bench artifacts, so the prose can never cite a superseded sample again.

Only the newest row is checked: older rows cite artifacts that were
current at their round and are legitimately overwritten later (the
re-baseline convention documented in BASELINE.md).

Usage: python3 tools/check_baseline.py   (exit 1 on any mismatch)
"""
import json, os, re, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACTS = ["BENCH_LOCAL.json", "BENCH_SF1.json", "BENCH_SF10.json",
             "BENCH_SF100.json", "BENCH_SF100B.json", "BENCH_SF100C.json",
             "BENCH_SF100D.json", "BENCH_SF100E.json", "BENCH_SF100F.json", "BENCH_SF100G.json",
             "BENCH_BPEDEEP.json"]

def load_queries():
    merged = {}
    for a in ARTIFACTS:
        p = os.path.join(ROOT, a)
        if os.path.exists(p):
            try:
                merged[a] = json.load(open(p)).get("queries", {})
            except Exception as e:
                print(f"WARN cannot parse {a}: {e}")
    return merged

def newest_row(md):
    # first data row after the measurements-table header
    lines = md.splitlines()
    try:
        i = next(i for i, l in enumerate(lines) if l.startswith("| date | commit |"))
    except StopIteration:
        sys.exit("measurements table header not found")
    for l in lines[i + 2:]:
        if l.startswith("|"):
            return l
    sys.exit("no measurement rows found")

def main():
    md = open(os.path.join(ROOT, "BASELINE.md")).read()
    row = newest_row(md)
    arts = load_queries()
    known = {k for qs in arts.values() for k in qs}
    bad, checked = [], 0
    # ratios ("llm_dup_span 7.2×") are computed ACROSS artifacts, not
    # quoted from one — only bare seconds are checked
    for name, val in re.findall(r"([a-z][a-z0-9_]{3,})\s+(\d+\.\d+)(?!\s*[×x])", row):
        if name not in known:
            continue
        v = float(val)
        # a citation is good if ANY committed artifact holds a matching
        # value at the quoted precision (rows quote 1-2 decimals)
        ok = any(name in qs and abs(qs[name] - v) < 0.055 for qs in arts.values())
        checked += 1
        if not ok:
            have = {a: qs.get(name) for a, qs in arts.items() if name in qs}
            bad.append(f"  {name} {v} not in any committed artifact (have {have})")
    if bad:
        print("BASELINE.md newest row cites numbers absent from committed artifacts:")
        print("\n".join(bad))
        sys.exit(1)
    print(f"OK: {checked} per-query citations in the newest BASELINE.md row "
          f"all reproduce from committed artifacts ({', '.join(arts)})")

if __name__ == "__main__":
    main()
