#!/usr/bin/env python
"""Compute the next checked-window rotation for queries/__init__.py.

The external harness oracle-checks a 50-query *prefix* of the registry, so
each round the prefix should hold the 50 queries whose external evidence
is oldest (see the rotation policy comment in queries/__init__.py).  This
tool derives that ordering mechanically from the committed
CORRECTNESS_r*.json files:

- per query, find the latest round with a green row (hash_match, or
  rows_match for rows-only checks); never-green queries sort first;
- ties (same last-green round) keep current registry order;
- prints the 50-name prefix as a ready-to-paste Python list plus the
  staleness histogram, and flags any query that has NEVER been green.

Usage: python tools/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_history() -> dict[str, dict[int, str]]:
    hist: dict[str, dict[int, str]] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except json.JSONDecodeError:
            continue
        for name, row in rows.items():
            green = row.get("hash_match") is True or (
                row.get("hash_match") is None and row.get("rows_match") is True
            )
            hist.setdefault(name, {})[rnd] = "green" if green else "err"
    return hist


MAX_STALE_ROUNDS = 5


def staleness_projection(
    names: list[str], prefix: list[str], hist: dict[str, dict[int, str]]
) -> tuple[str, int]:
    """Worst (query, projected rounds without external evidence) after
    the NEXT round, assuming the proposed prefix goes green.  Shared by
    the CLI below and tests/test_rotation_policy.py so a round's query
    additions cannot silently push any query past MAX_STALE_ROUNDS."""
    last_green = {
        n: max((r for r, s in hist.get(n, {}).items() if s == "green"), default=0)
        for n in names
    }
    cur_round = max((r for h in hist.values() for r in h), default=0)
    next_round = cur_round + 1
    period = -(-len(names) // max(len(prefix), 1))
    worst = None
    in_prefix = set(prefix)
    for n in names:
        age = 0 if n in in_prefix else next_round - last_green[n]
        if last_green[n] == 0 and n not in in_prefix:
            age = period  # never-green outside the window: worst case
        if worst is None or age > worst[1]:
            worst = (n, age)
    return worst


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from walmart_e_commerce_sales_data_pipeline_spark import queries as q

    names = list(q.REGISTRY)
    hist = load_history()
    last_green = {
        n: max((r for r, s in hist.get(n, {}).items() if s == "green"), default=0)
        for n in names
    }
    order = sorted(names, key=lambda n: (last_green[n], names.index(n)))
    prefix = order[:window]

    from collections import Counter

    buckets = Counter(last_green[n] for n in names)
    print("# staleness histogram (last green round -> query count):")
    for rnd in sorted(buckets):
        label = "never" if rnd == 0 else f"r{rnd}"
        print(f"#   {label}: {buckets[rnd]}")
    never = [n for n in names if last_green[n] == 0]
    if never:
        print(f"# NEVER-GREEN (must head the window): {never}")

    # Staleness-horizon honesty check: with a registry this much wider than
    # the window, a query's external-refresh period is ceil(N/window) rounds
    # by construction.  Project forward: under the proposed window, every
    # query not in it keeps its current evidence age + 1 next round.  Assert
    # no query would exceed MAX_STALE_ROUNDS rounds without external
    # evidence — if this fires, widen the window or split the round.
    cur_round = max((r for h in hist.values() for r in h), default=0)
    next_round = cur_round + 1
    period = -(-len(names) // window)  # ceil: structural refresh period
    print(
        f"# staleness horizon: registry {len(names)} / window {window} -> "
        f"structural refresh period {period} rounds"
    )
    worst = staleness_projection(names, prefix, hist)
    print(
        f"# worst projected staleness after r{next_round}: "
        f"{worst[0]} at {worst[1]} rounds (limit {MAX_STALE_ROUNDS})"
    )
    assert worst[1] <= MAX_STALE_ROUNDS, (
        f"query {worst[0]} would be {worst[1]} rounds without external "
        f"evidence (> {MAX_STALE_ROUNDS}); widen the window or rotate twice"
    )

    print(f"# proposed {window}-query prefix, stalest first:")
    print("_PRIORITY = [")
    for n in prefix:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
