#!/usr/bin/env python
"""Compare two bench sidecars (bench_details.json) with machine-speed
normalization — mechanizes the drift-vs-regression call.

Round 7/8 showed wall-clock deltas on this shared box are dominated by
ambient load arriving in waves: 5-8 CONSECUTIVE bench positions inflate
1.4-2x while shuffle metrics stay byte-identical.  `calibration_sec` (a
fixed synthetic workload timed min-of-3 in the same process) captures
the machine's speed for the run, so a query is only flagged as a real
regression when its wall grows beyond the calibration ratio by more than
the noise band AND its shuffle bytes moved, or when the wall ratio is
extreme even with flat shuffle (plan-shape suspect).

Usage: python tools/bench_compare.py OLD.json NEW.json [--band 0.25]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Compare two bench sidecars with machine-speed "
        "normalization (accepts both --band=X and --band X)"
    )
    ap.add_argument("old", help="previous bench_details.json")
    ap.add_argument("new", help="current bench_details.json")
    ap.add_argument("--band", type=float, default=0.25,
                    help="noise band after normalization (default 0.25)")
    ns = ap.parse_args()
    band = ns.band
    old = json.load(open(ns.old))
    new = json.load(open(ns.new))
    cal_old = old.get("calibration_sec") or 1.0
    cal_new = new.get("calibration_sec") or 1.0
    speed = cal_new / cal_old  # >1 → the new machine state is slower
    print(f"calibration: {cal_old} -> {cal_new}  (machine ratio {speed:.2f})")

    mo, mn = old.get("runtime_metrics", {}), new.get("runtime_metrics", {})
    common = sorted(set(old["queries"]) & set(new["queries"]))
    flagged, drifted = [], []
    for name in common:
        a, b = old["queries"][name], new["queries"][name]
        norm_ratio = (b / max(a, 1e-9)) / speed
        sh_a = (mo.get(name) or {}).get("shuffle_bytes")
        sh_b = (mn.get(name) or {}).get("shuffle_bytes")
        sh_moved = (
            sh_a is not None
            and sh_b is not None
            and abs(sh_b - sh_a) > 0.02 * max(sh_a, 1)
        )
        if norm_ratio > 1 + band and (sh_moved or norm_ratio > 2.0):
            flagged.append((norm_ratio, name, a, b, sh_a, sh_b))
        elif norm_ratio > 1 + band:
            drifted.append((norm_ratio, name, a, b))
    print(f"\n{len(common)} common queries; band ±{band:.0%} after normalization")
    if flagged:
        print("\nREGRESSION SUSPECTS (normalized wall up AND shuffle moved, "
              "or >2x with flat shuffle):")
        for r, name, a, b, sa, sb in sorted(flagged, reverse=True):
            print(f"  {name}: {a}s -> {b}s (norm {r:.2f}x), "
                  f"shuffle {sa} -> {sb}")
    if drifted:
        print("\nambient drift (normalized wall up, shuffle flat — machine "
              "noise until proven otherwise):")
        for r, name, a, b in sorted(drifted, reverse=True):
            print(f"  {name}: {a}s -> {b}s (norm {r:.2f}x)")
    if not flagged and not drifted:
        print("no queries beyond the noise band")
    print(f"\ncommon-query wall sum: {sum(old['queries'][n] for n in common):.2f}"
          f" -> {sum(new['queries'][n] for n in common):.2f} s"
          f" (normalized ratio "
          f"{(sum(new['queries'][n] for n in common) / max(sum(old['queries'][n] for n in common), 1e-9)) / speed:.2f})")


if __name__ == "__main__":
    main()
