#!/usr/bin/env python
"""Compare two bench sidecars (bench_details.json) with machine-speed
normalization — mechanizes the drift-vs-regression call.

Round 7/8 showed wall-clock deltas on this shared box are dominated by
ambient load arriving in waves: 5-8 CONSECUTIVE bench positions inflate
1.4-2x while shuffle metrics stay byte-identical.  `calibration_sec` (a
fixed synthetic workload timed min-of-3 in the same process) captures
the machine's speed for the run — but the calibration job over-responds
to ambient load relative to the fixed driver-side costs dominating
sub-second queries, so a query is only flagged as a real regression when
its wall grows beyond the noise band under BOTH the raw and the
calibration-normalized view, AND its shuffle bytes moved (or the growth
is extreme even with flat shuffle — plan-shape suspect).  Peak task
memory growing >2x and >64 MB flags separately as a funnel suspect.

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
    # Single-thread calibration (present since r11): serial critical paths
    # (presentation sorts, driver Row materialization) track this, not the
    # 32-way workload — print both so a wall delta can be attributed to
    # the right resource.
    st_old, st_new = old.get("calibration_st_sec"), new.get("calibration_st_sec")
    if st_old and st_new:
        print(
            f"calibration (1-thread): {st_old} -> {st_new}  "
            f"(ratio {st_new / st_old:.2f})"
        )

    mo, mn = old.get("runtime_metrics", {}), new.get("runtime_metrics", {})
    common = sorted(set(old["queries"]) & set(new["queries"]))
    # Per-query trust (round 15): sidecars now carry query_trusted from
    # the interleaved single-thread probes.  A wall taken inside a noisy
    # probe segment says nothing about the code, so cross-round ratios
    # only use queries trusted in BOTH rounds; sidecars predating the
    # field treat every query as trusted (vacuously, as before).
    qt_old = old.get("query_trusted") or {}
    qt_new = new.get("query_trusted") or {}
    untrusted = sorted(
        n for n in common
        if qt_old.get(n, True) is False or qt_new.get(n, True) is False
    )
    if untrusted:
        print(
            f"excluding {len(untrusted)} queries whose wall is probe-"
            f"untrusted in either round: {', '.join(untrusted)}"
        )
        common = [n for n in common if n not in untrusted]
    flagged, drifted = [], []
    for name in common:
        a, b = old["queries"][name], new["queries"][name]
        raw_ratio = b / max(a, 1e-9)
        norm_ratio = raw_ratio / speed
        # The calibration job is 32-thread CPU-bound, so it over-responds
        # to ambient load relative to the fixed driver-side costs that
        # dominate sub-second queries: when machine speed shifts, dividing
        # by it inverts the signal (a 2x-faster calibration makes every
        # merely-10%-faster query look like a 1.8x normalized regression).
        # A real regression must survive under BOTH views — raw wall up
        # AND calibration-normalized wall up.
        ratio = min(raw_ratio, norm_ratio)
        sh_a = (mo.get(name) or {}).get("shuffle_bytes")
        sh_b = (mn.get(name) or {}).get("shuffle_bytes")
        sh_moved = (
            sh_a is not None
            and sh_b is not None
            and abs(sh_b - sh_a) > 0.02 * max(sh_a, 1)
        )
        if ratio > 1 + band and (sh_moved or ratio > 2.0):
            flagged.append((ratio, name, a, b, sh_a, sh_b))
        elif ratio > 1 + band:
            drifted.append((ratio, name, a, b))
    # Peak-task-memory growth is the funnel tell wall-clock hides at
    # sf0.1: an operator that newly concentrates its input into one task
    # multiplies its per-task peak long before wall time moves.  Flag
    # growth beyond 2x AND 64 MB absolute — below that the hash-map page
    # granularity (32 MB allocations) dominates and toggles freely.
    mem_flagged = []
    for name in common:
        pa = (mo.get(name) or {}).get("peak_memory_bytes")
        pb = (mn.get(name) or {}).get("peak_memory_bytes")
        if (
            pa is not None
            and pb is not None
            and pb > 2 * max(pa, 1)
            and pb - pa > 64 * 1024 * 1024
        ):
            mem_flagged.append((pb / max(pa, 1), name, pa, pb))
    print(f"\n{len(common)} common queries; band ±{band:.0%} under BOTH raw "
          "and normalized views")
    if flagged:
        print("\nREGRESSION SUSPECTS (raw AND normalized wall up, with "
              "shuffle moved or >2x):")
        for r, name, a, b, sa, sb in sorted(flagged, reverse=True):
            print(f"  {name}: {a}s -> {b}s (norm {r:.2f}x), "
                  f"shuffle {sa} -> {sb}")
    if drifted:
        print("\nambient drift (wall up under both views, shuffle flat — "
              "machine noise until proven otherwise):")
        for r, name, a, b in sorted(drifted, reverse=True):
            print(f"  {name}: {a}s -> {b}s (norm {r:.2f}x)")
    if mem_flagged:
        print("\nPEAK-TASK-MEMORY SUSPECTS (per-task peak >2x and >64 MB up "
              "— possible new single-task funnel):")
        for r, name, pa, pb in sorted(mem_flagged, reverse=True):
            print(f"  {name}: {pa} -> {pb} bytes ({r:.1f}x)")
    if not flagged and not drifted and not mem_flagged:
        print("no queries beyond the noise band")
    print(f"\ncommon-query wall sum: {sum(old['queries'][n] for n in common):.2f}"
          f" -> {sum(new['queries'][n] for n in common):.2f} s"
          f" (normalized ratio "
          f"{(sum(new['queries'][n] for n in common) / max(sum(old['queries'][n] for n in common), 1e-9)) / speed:.2f})")


if __name__ == "__main__":
    main()
