"""Shared Spark fixtures for the engine test suite.

One session per pytest run (JVM start is ~10s); small parallelism and
shuffle width keep fixture-scale jobs fast.  ANSI stays OFF here to match
the engine session (session.py) -- the driver-contract registry is probed
under a default ANSI-on session separately in test_registry.py.
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from uofi_payroll_etl_main_spark.session import get_spark

    s = get_spark("engine-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive asserts."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
