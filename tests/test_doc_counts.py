"""Doc-pinning self-test (VERDICT r11 item 4): the registry counts
quoted in README.md / ROADMAP.md / COVERAGE.md must equal the runtime
registry, so a query landing in a snapshot commit can never silently
drift the documented totals again (r11: runtime 142 vs docs 140/141).

No Spark session — imports the registry and regex-parses the doc lines.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_counts():
    from walmart_e_commerce_sales_data_pipeline_spark import queries as q

    return len(q.REGISTRY), len(q.oracle_map())


def _read(name: str) -> str:
    with open(os.path.join(REPO, name)) as fh:
        return fh.read()


def test_readme_count_matches_registry():
    n, _ = _registry_counts()
    m = re.search(r"the driver-contract registry: (\d+) named queries", _read("README.md"))
    assert m, "README.md no longer states the registry count"
    assert int(m.group(1)) == n, f"README says {m.group(1)}, registry has {n}"


def test_coverage_totals_match_registry():
    n, n_oracle = _registry_counts()
    m = re.search(
        r"\*\*(\d+) registered queries, (\d+) with\s*\nexact DuckDB oracles",
        _read("COVERAGE.md"),
    )
    assert m, "COVERAGE.md no longer states the driver-contract totals"
    assert int(m.group(1)) == n, f"COVERAGE says {m.group(1)}, registry has {n}"
    assert int(m.group(2)) == n_oracle, (
        f"COVERAGE says {m.group(2)} oracles, registry has {n_oracle}"
    )


def test_roadmap_total_matches_registry():
    n, n_oracle = _registry_counts()
    # The newest "(N total, N exact oracles" parenthetical must match;
    # older round summaries naturally quote historical totals.  ROADMAP's
    # newest round summary is the TOPMOST section, so anchor to the first
    # match — max() would break on correct docs if a query were ever
    # removed and the newest total legitimately shrank (ADVICE r12).
    totals = re.findall(r"\((\d+) total, (\d+) exact oracles", _read("ROADMAP.md"))
    assert totals, "ROADMAP.md no longer states a (N total, N exact oracles) line"
    latest = int(totals[0][0])
    assert latest == n, f"ROADMAP newest total {latest} != registry {n}"


def test_every_registered_query_has_an_oracle():
    """The standing all-oracles invariant: zero rows-only exemptions."""
    n, n_oracle = _registry_counts()
    assert n == n_oracle
