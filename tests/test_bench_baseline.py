"""Per-query bench regression guard.

BENCH_BASELINE.json freezes each headliner's wall time at sf0.01
(best-of-2, tuned session).  Every headliner re-runs here with a
GENEROUS bound -- 3x the recorded time plus a 3s floor -- so only gross
plan regressions trip it (the r3 incident: a query that silently
switched to a cartesian/row-Python plan would blow 3x immediately,
while host noise, measured at 2-6x between back-to-back runs for
sub-second queries, stays inside the floor+multiplier envelope).

Timing uses the same recipe as bench.py: build the DataFrame, execute
through the noop sink (full-column materialization -- count() would let
Catalyst prune projection-heavy work), best-of-2.  When a query is missing from the
baseline (freshly added headliner), it is skipped here and picked up at
the next baseline refresh; a baseline entry whose query vanished fails
loudly instead.
"""

from __future__ import annotations

import json
import os
import time

import pytest

import __spark_entry__ as entrymod
from bench import HEADLINERS

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"

with open(os.path.join(ROOT, "BENCH_BASELINE.json")) as f:
    BASELINE = json.load(f)

TOLERANCE = 3.0
# floor absorbs host noise on sub-second queries: co-tenant load has been
# measured pushing a 0.24s query past 2s while a true plan regression
# (cartesian / row-Python switch) lands at 10-100x -- 3s keeps the guard
# sensitive to the failure class it exists for without flaking
FLOOR_SEC = 3.0


def test_baseline_covers_only_live_headliners():
    dead = set(BASELINE["queries"]) - set(entrymod.queries())
    assert not dead, f"baseline entries with no registered query: {sorted(dead)}"


# r11: the per-headliner envelope battery is opt-in (`pytest -m deep`,
# round-close certification) so the default run fits the driver's
# pytest budget; the cheap baseline-integrity check above stays default.
@pytest.mark.deep
@pytest.mark.parametrize("name", sorted(set(HEADLINERS) & set(BASELINE["queries"])))
def test_headliner_within_baseline_envelope(spark, name):
    fn = entrymod.queries()[name]
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    bound = max(FLOOR_SEC, TOLERANCE * BASELINE["queries"][name])
    assert best <= bound, (
        f"{name}: {best:.2f}s vs baseline {BASELINE['queries'][name]:.2f}s "
        f"(bound {bound:.2f}s) -- gross plan regression?"
    )
