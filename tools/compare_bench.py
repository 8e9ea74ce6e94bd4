#!/usr/bin/env python3
"""Compare two bench_out.json artifacts query-by-query.

Usage: tools/compare_bench.py OLD.json NEW.json [threshold_ratio]

Prints the shared-query totals, the per-query deltas beyond the threshold
(default 1.5x in either direction, min 0.3 s absolute so micro-queries'
jitter doesn't spam), and the new/removed query sets. This is the
adjudication step BENCH_HISTORY's per-round rows are written from.
"""
import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    so = sum(oq[k] for k in shared)
    sn = sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s "
          f"({(sn - so) / so * 100:+.1f}%)")
    print(f"totals: {old['value']:.1f}s ({len(oq)} q, "
          f"contended={old.get('contended')}) -> {new['value']:.1f}s "
          f"({len(nq)} q, contended={new.get('contended')})")
    moved = []
    for k in shared:
        a, b = oq[k], nq[k]
        if min(a, b) <= 0:
            continue
        r = b / a
        if (r >= thr or r <= 1 / thr) and abs(b - a) >= 0.3:
            moved.append((r, k, a, b))
    for r, k, a, b in sorted(moved, reverse=True):
        print(f"  {k}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    added = sorted(set(nq) - set(oq))
    gone = sorted(set(oq) - set(nq))
    if added:
        cost = sum(nq[k] for k in added)
        print(f"new ({cost:.1f}s): " +
              ", ".join(f"{k} {nq[k]:.2f}s" for k in added))
    if gone:
        print("removed: " + ", ".join(gone))


if __name__ == "__main__":
    main()
