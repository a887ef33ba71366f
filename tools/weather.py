#!/usr/bin/env python3
"""Anchor-normalized bench comparison (BASELINE.md "anchor_sec" convention).

Usage: python3 tools/weather.py OLD.json NEW.json [threshold]

Both files must be graft.Bench artifacts carrying "anchor_sec" (round 11+).
Totals and per-query times are divided by each run's anchor before
comparing, so a uniformly loaded host cancels out; queries whose
normalized ratio exceeds the threshold (default 1.5) are listed as real
suspects. Without anchors this falls back to raw ratios and says so.

Round 12+: artifacts also carry "anchor_shuffle_sec" (a fixed two-exchange
shuffle sentinel). The CPU anchor misses scheduler/IO weather (r11 closing
samples: 1.32x normalized spread at equal CPU anchors); the shuffle anchor
reads it. Interpretation: CPU-normalized total high AND shuffle ratio high
=> scheduler/IO contention, not a regression; CPU-normalized high at a
FLAT shuffle ratio => investigate the engine.
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
    so, sn = old.get("anchor_shuffle_sec"), new.get("anchor_shuffle_sec")
    # presence tested explicitly: a legitimate 0.0 reading must not fall
    # through to the "only one artifact" branch
    if so is not None and sn is not None and so > 0 and sn > 0:
        # shuffle weather relative to CPU weather: the scheduler/IO axis
        # the CPU anchor is blind to
        rel = (sn / an) / (so / ao) if norm else sn / so
        print(f"shuffle anchor: {so:.3f} -> {sn:.3f} "
              f"(shuffle/CPU weather ratio {rel:.2f}x"
              f"{'; scheduler/IO contention in NEW' if rel > 1.25 else ''}"
              f"{'; scheduler/IO contention in OLD' if rel < 0.8 else ''})")
    elif so is not None and sn is not None:
        print("WARN: anchor_shuffle_sec degenerate (<= 0) in at least one "
              "artifact - scheduler/IO axis unread")
    elif so is not None or sn is not None:
        print("WARN: only one artifact has anchor_shuffle_sec - scheduler/IO axis unread")
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
