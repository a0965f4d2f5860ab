"""Evidence-trail gate (r17 VERDICT item 3): the external driver writes
CORRECTNESS_r{N}.json / BENCH_r{N}.json after the builder's last commit
of round N, so every round starts with the previous round's evidence
sitting untracked — and the same "commit the sidecars" ADVICE item
recurred mechanically in r16 and r17.  This test makes the gap a suite
failure instead of a judge note: every round artifact present on disk
must be git-tracked.  bench_details.json is deliberately NOT checked —
the builder's own bench runs rewrite it throughout a round; it rides
into the round's first commit alongside the sidecars.
"""

from __future__ import annotations

import glob
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_round_artifacts_are_git_tracked():
    try:
        tracked = subprocess.run(
            ["git", "ls-files"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        ).stdout.splitlines()
    except (OSError, subprocess.SubprocessError):
        pytest.skip("git unavailable — not running inside the repo checkout")
    tracked_set = set(tracked)
    on_disk = [
        os.path.basename(p)
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in glob.glob(os.path.join(REPO, pat))
    ]
    assert on_disk, "no round artifacts found — wrong working directory?"
    untracked = sorted(n for n in on_disk if n not in tracked_set)
    assert not untracked, (
        f"driver round artifacts exist on disk but are not git-tracked: "
        f"{untracked} — commit them with this round's first commit "
        f"(see ROADMAP.md evidence-trail policy)"
    )
