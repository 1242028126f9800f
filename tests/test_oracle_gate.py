"""Committed oracle-gate tiers.

The driver samples ~50 registry queries per round, so most of the 300+
registered queries would otherwise be certified only by ad-hoc
tools/check_oracles.py runs.  These tests make the gate part of the
green suite:

- ``oracle_smoke`` (default run): a deterministic ~30-query slice that
  ROTATES by day, so consecutive days of default runs sweep the whole
  registry (~11-day cycle) at sf0.01 -- the same scale the driver's
  correctness gate uses.
- ``oracle_full`` (opt-in, ``pytest -m oracle_full``): every registry
  query, the full 293-oracle sweep.
"""

from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tools")
)
import check_oracles  # noqa: E402

SF_GATE = "/root/testdata/sf0.01"
SMOKE_SIZE = 30


def _registry_names() -> list[str]:
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries())


def _smoke_slice(names: list[str], today: datetime.date | None = None) -> list[str]:
    """Deterministic day-rotating slice: chunk k of ceil(N/30) chunks,
    k = ordinal-day mod n_chunks.  Same-day runs are reproducible; the
    cycle covers every name."""
    n_chunks = max(1, -(-len(names) // SMOKE_SIZE))
    day = (today or datetime.date.today()).toordinal()
    k = day % n_chunks
    return names[k * SMOKE_SIZE : (k + 1) * SMOKE_SIZE]


def test_smoke_slices_cover_registry():
    names = _registry_names()
    n_chunks = max(1, -(-len(names) // SMOKE_SIZE))
    seen: set[str] = set()
    base = datetime.date(2026, 1, 1)
    for d in range(n_chunks):
        seen.update(_smoke_slice(names, base + datetime.timedelta(days=d)))
    assert seen == set(names)


def test_cli_json_missing_path_is_usage_error(monkeypatch, capsys):
    """ADVICE r8: `--json` as the last argument (or followed by another
    flag) is a usage error, not an IndexError."""
    monkeypatch.setattr(sys, "argv", ["check_oracles.py", "--json"])
    assert check_oracles.main() == 2
    monkeypatch.setattr(sys, "argv", ["check_oracles.py", "--json", "--ansi"])
    assert check_oracles.main() == 2
    assert "usage:" in capsys.readouterr().err


def test_cli_filtered_artifact_is_stamped_partial(monkeypatch, tmp_path, spark):
    """ADVICE r8: a name-filtered run writes an artifact stamped
    partial=true with the active filters recorded, so it can never be
    mistaken for a full-registry sweep."""
    import json

    calls = {}

    def fake_run_gate(spark_, sf_dir, filters=None, records=None, **kw):
        calls["filters"] = filters
        if records is not None:
            records.append({"name": "x", "status": "pass", "rows": 1, "sec": 0.0,
                            "detail": "ok"})
        return 1, 0, []

    monkeypatch.setattr(check_oracles, "run_gate", fake_run_gate)
    out = tmp_path / "sweep.json"
    monkeypatch.setattr(
        sys, "argv",
        ["check_oracles.py", "--ansi", "--json", str(out), "p1_contains"],
    )
    assert check_oracles.main() == 0
    art = json.load(open(out))
    assert art["partial"] is True
    assert art["filters"] == ["p1_contains"]
    assert calls["filters"] == ["p1_contains"]
    # and an unfiltered run is stamped full
    monkeypatch.setattr(
        sys, "argv", ["check_oracles.py", "--ansi", "--json", str(out)]
    )
    assert check_oracles.main() == 0
    art = json.load(open(out))
    assert art["partial"] is False and art["filters"] == []


@pytest.mark.oracle_smoke
def test_oracle_smoke(spark):
    names = _smoke_slice(_registry_names())
    n_pass, n_rows, failures = check_oracles.run_gate(
        spark, SF_GATE, names=names, verbose=False
    )
    assert not failures, f"oracle gate failures: {failures}"
    assert n_pass + n_rows == len(names)


@pytest.mark.oracle_full
def test_oracle_full(spark):
    n_pass, n_rows, failures = check_oracles.run_gate(spark, SF_GATE, verbose=False)
    assert not failures, f"oracle gate failures: {failures}"
    assert n_pass + n_rows == len(_registry_names())
