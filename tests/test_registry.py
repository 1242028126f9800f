"""Driver-contract checks: every queries() entry runs at sf0.001 and
yields a stable schema; oracle keys match query keys; bench headliners
exist; entry() works under a DEFAULT session config (the driver does not
use our tuned session -- Spark 4 defaults are ANSI ON, so every query
must be try_-safe)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from bench import HEADLINERS


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {sorted(missing)}"


def test_bench_headliners_registered():
    qs = entrymod.queries()
    missing = [h for h in HEADLINERS if h not in qs]
    assert not missing


def test_entry_returns_rows(spark, sf_dir):
    df = entrymod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() >= 0


# r11: the 396-query run probe is opt-in (`pytest -m deep`, round-close
# certification); the default run keeps the contract singles above plus
# the day-rotating oracle_smoke slice (strictly stronger per query).
@pytest.mark.deep
@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_has_schema(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    assert df.columns, name
    # schema must be stable across two logical invocations
    df2 = fn(spark, sf_dir)
    assert df.schema == df2.schema
    assert df.count() >= 0
