"""Sweep-freshness assertion (r10 verdict #8): with 100+ workloads and
a 50-entry/round driver gate, rotation alone could leave a workload
unswept for many rounds if new workloads keep landing at the front.
This test fails CI when any REGISTERED workload's last sweep-green
round falls more than ``MAX_STALE_ROUNDS`` behind the newest committed
end-state sweep — forcing either a re-sweep or an explicit retirement.

Rules:
- a workload counts as green in round N if the ``tools/sweeps/
  rNN_*_sweep.txt`` file lists it as ``ok`` (hash-green) or ``weak``
  (rows-only by design);
- workloads absent from EVERY committed sweep are NEW since the last
  end-state sweep — fresh by definition (they enter this round's
  end-state sweep, which becomes the new latest);
- a workload present in some old sweep but missing from the newest
  ``MAX_STALE_ROUNDS + 1`` sweeps is STALE → fail, naming it.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP_DIR = os.path.join(REPO, "tools", "sweeps")
MAX_STALE_ROUNDS = 2

_LINE = re.compile(r"^(ok|weak)\s+([A-Za-z0-9_]+):")


def _sweeps() -> dict[int, set[str]]:
    """round -> set of green workload names, one entry per round
    (a round with several sweep files unions them)."""
    out: dict[int, set[str]] = {}
    for fname in os.listdir(SWEEP_DIR):
        m = re.match(r"r(\d+)_\w*sweep\.txt$", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        names = out.setdefault(rnd, set())
        with open(os.path.join(SWEEP_DIR, fname)) as f:
            for line in f:
                lm = _LINE.match(line.strip())
                if lm:
                    names.add(lm.group(2))
    return out


def test_no_workload_sweep_green_older_than_two_rounds():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    sweeps = _sweeps()
    assert sweeps, "no committed sweep files found"
    latest = max(sweeps)
    ever_swept = set().union(*sweeps.values())
    last_green = {
        name: max(rnd for rnd, names in sweeps.items() if name in names)
        for name in ever_swept
    }
    stale = sorted(
        name
        for name in registered
        if name in last_green
        and last_green[name] < latest - MAX_STALE_ROUNDS
    )
    assert not stale, (
        f"{len(stale)} workload(s) last sweep-green before round "
        f"{latest - MAX_STALE_ROUNDS} (latest sweep: r{latest}) — re-run "
        f"tools/check_correctness.py over them and commit the sweep, or "
        f"retire them: {stale}"
    )
