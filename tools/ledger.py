#!/usr/bin/env python3
"""Exhaustive bench-ledger diff (round 18, r17 judge item #2c).

Compares a committed BENCH_DETAIL snapshot's per-row `floor` against
the PRIOR committed snapshot's and prints EVERY row past the watch
band — floor > prior_floor + max(0.25 s, 20%) — so the §5 addendum can
disposition each one instead of claiming "in-band everywhere else".
Also prints rows that cleared (floor below prior) on request.

Usage: python3 tools/ledger.py <prior_detail.json> <new_detail.json> [--cleared]
"""
import json
import sys


def floors(path):
    d = json.load(open(path))
    q = d["queries"]
    out = {}
    for k, v in q.items():
        out[k] = v["floor"] if isinstance(v, dict) else v
    return out, d.get("value")


def main():
    prior_path, new_path = sys.argv[1], sys.argv[2]
    show_cleared = "--cleared" in sys.argv
    prior, ptot = floors(prior_path)
    new, ntot = floors(new_path)
    over, cleared, added, gone = [], [], [], []
    for k, nv in sorted(new.items()):
        if k not in prior:
            added.append((k, nv))
            continue
        pv = prior[k]
        band = max(0.25, 0.20 * pv)
        if nv > pv + band:
            over.append((k, pv, nv, nv - pv, nv / pv if pv else float("inf")))
        elif nv <= pv:
            cleared.append((k, pv, nv))
    for k in sorted(prior):
        if k not in new:
            gone.append(k)
    print(f"prior total {ptot:.1f}s ({len(prior)} rows) -> "
          f"new total {ntot:.1f}s ({len(new)} rows)")
    carried = [k for k in new if k in prior]
    ratios = sorted(new[k] / prior[k] for k in carried if prior[k] > 0)
    med = ratios[len(ratios) // 2] if ratios else float("nan")
    print(f"carried rows: {len(carried)}, median floor ratio {med:.2f}")
    print(f"\nOUT OF BAND (> prior + max(0.25s, 20%)): {len(over)} rows")
    for k, pv, nv, d, r in sorted(over, key=lambda x: -x[3]):
        print(f"  {k:36s} {pv:7.2f} -> {nv:7.2f}  (+{d:.2f}, x{r:.2f})")
    if added:
        print(f"\nNEW rows: {len(added)}")
        for k, nv in added:
            print(f"  {k:36s}          -> {nv:7.2f}")
    if gone:
        print(f"\nDROPPED rows: {gone}")
    if show_cleared:
        print(f"\nCLEARED (at or below prior floor): {len(cleared)} rows")
        for k, pv, nv in sorted(cleared, key=lambda x: x[1] - x[2]):
            print(f"  {k:36s} {pv:7.2f} -> {nv:7.2f}")


if __name__ == "__main__":
    main()
