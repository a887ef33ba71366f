#!/usr/bin/env python3
"""Anchor-normalized bench comparison (BASELINE.md "anchor_sec" convention).

Usage: python3 tools/weather.py OLD.json NEW.json [threshold]

Both files must be graft.Bench artifacts carrying "anchor_sec" (round 11+).
Totals and per-query times are divided by each run's anchor before
comparing, so a uniformly loaded host cancels out; queries whose
normalized ratio exceeds the threshold (default 1.5) are listed as real
suspects. Without anchors this falls back to raw ratios and says so.
"""
import json, sys

def main(old_p, new_p, thr=1.5):
    old, new = json.load(open(old_p)), json.load(open(new_p))
    ao, an = old.get("anchor_sec"), new.get("anchor_sec")
    norm = ao is not None and an is not None and ao > 0 and an > 0
    if not norm:
        print("WARN: one artifact lacks anchor_sec - raw (weather-exposed) ratios")
        ao = an = 1.0
    tot_o, tot_n = old["value"] / ao, new["value"] / an
    print(f"total: {old['value']:.1f}s/{ao:.3f} vs {new['value']:.1f}s/{an:.3f} "
          f"-> normalized {tot_o:.1f} vs {tot_n:.1f} ({tot_n / tot_o:.2f}x)")
    qs_o, qs_n = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qs_o) & set(qs_n))
    sus = []
    for q in common:
        o, nv = qs_o[q] / ao, qs_n[q] / an
        if o > 1e-6 and nv / o > thr and qs_n[q] > 0.25:
            sus.append((nv / o, q, qs_o[q], qs_n[q]))
    print(f"{len(common)} common queries; {len(sus)} above {thr}x normalized:")
    for r, q, o, nv in sorted(sus, reverse=True)[:20]:
        print(f"  {q:32s} {o:8.3f} -> {nv:8.3f}  ({r:.2f}x normalized)")

if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
