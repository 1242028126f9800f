"""Predicate / projection layer (P1-P10) plus fiscal-year bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark import predicates as P


def _names(spark, *names):
    return spark.createDataFrame([Row(file_name=n) for n in names])


def test_contains_ci(spark):
    df = _names(spark, "pua_extract.xlsx", "PUA Final.xls", "cpa_only.csv")
    got = {r.file_name for r in df.filter(P.contains_ci("file_name", "PUA")).collect()}
    assert got == {"pua_extract.xlsx", "PUA Final.xls"}


def test_rlike_bounded_token(spark):
    # ref :72-74 -- CPA must be delimited by start/end/space/underscore
    df = _names(spark, "CPA_report.xlsx", "my cpa file.xlsx", "x_CPA", "OCPAX.xlsx")
    got = {r.file_name for r in df.filter(P.rlike_bounded("file_name", "CPA")).collect()}
    assert got == {"CPA_report.xlsx", "my cpa file.xlsx", "x_CPA"}


def test_in_list(spark):
    df = spark.createDataFrame([Row(ext=e) for e in [".xlsx", ".xls", ".csv"]])
    got = {r.ext for r in df.filter(P.in_list("ext", [".xlsx", ".xls"])).collect()}
    assert got == {".xlsx", ".xls"}


def test_eq_ci(spark):
    df = _names(spark, "Lookup_TS_ORG.csv", "other.csv")
    got = [r.file_name for r in df.filter(P.eq_ci("file_name", "lookup_ts_org.CSV")).collect()]
    assert got == ["Lookup_TS_ORG.csv"]


def test_first_match_is_deterministic(spark):
    df = spark.createDataFrame([Row(n=i, name=f"f{i}") for i in (3, 1, 2)])
    assert P.first_match(df, ["n"]).first().name == "f1"


def test_between_dates_inclusive(spark):
    df = spark.createDataFrame(
        [Row(d=d) for d in ["2024-07-01 00:00:00", "2025-06-30 23:59:59",
                            "2024-06-30 23:59:59", "2025-07-01 00:00:00"]]
    ).select(F.to_timestamp("d").alias("d"))
    kept = df.filter(P.between_dates("d", "2024-07-01 00:00:00", "2025-06-30 23:59:59.999999"))
    assert kept.count() == 2


def test_fiscal_year_bounds():
    start, end = P.fiscal_year_bounds(2025)
    assert start.startswith("2024-07-01")
    assert end.startswith("2025-06-30")


def test_project_keeps_intersection_in_order(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "b", "c"])
    assert P.project(df, ["c", "missing", "a"]).columns == ["c", "a"]


def test_drop_tolerant(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = P.drop_tolerant(df, "b", "not_there")
    assert out.columns == ["a"]


def test_resolve_duplicate_columns_keeps_first(spark):
    base = spark.createDataFrame([(1, 2)], ["x", "y"])
    dup = base.select(F.col("x"), F.col("y").alias("x"))  # two columns named x
    out = P.resolve_duplicate_columns(dup)
    assert out.columns == ["x"]
    assert out.first().x == 1  # first occurrence wins (ref :591)
