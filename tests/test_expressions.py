"""Scalar expression layer (E1-E16) -- the SURVEY.md section 5.3 edge
cases: Excel `.0` repair, null-propagating concat, hyphen-less split,
nan-string defaulting, coerce-to-null parsing."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import rows
from uofi_payroll_etl_main_spark import expressions as E


def test_clean_headers_strips_whitespace(spark):
    df = spark.createDataFrame([(1, 2)], ["  UIN ", "Pay ID\t"])
    assert E.clean_headers(df).columns == ["UIN", "Pay ID"]


def test_ensure_string_trims_and_casts(spark):
    df = spark.createDataFrame([(1, " a "), (2, None)], ["i", "s"])
    out = df.select(
        E.ensure_string("i").alias("i"), E.ensure_string("s").alias("s")
    ).collect()
    assert (out[0].i, out[0].s) == ("1", "a")
    assert (out[1].i, out[1].s) == ("2", None)  # null stays null (not "nan")


@pytest.mark.parametrize(
    "raw,expected",
    [("123.0", "123"), (" 45.0 ", "45"), ("12.50", "12.50"), ("7", "7"), (None, None)],
)
def test_strip_decimal_str(spark, raw, expected):
    df = spark.createDataFrame([Row(c=raw)], "c string")
    assert df.select(E.strip_decimal_str("c").alias("c")).first().c == expected


def test_concat_key_null_propagates(spark):
    # pandas `+` semantics (ref :239): any null operand -> null result,
    # unlike concat_ws which skips nulls.
    df = spark.createDataFrame([("1", "ABC"), (None, "ABC"), ("1", None)], ["a", "b"])
    got = [r.k for r in df.select(E.concat_key("a", "b").alias("k")).collect()]
    assert got == ["1-ABC", None, None]


def test_concat_plain(spark):
    df = spark.createDataFrame([("2025", "BW", "14", "0"), ("2025", None, "14", "0")],
                               ["y", "p", "n", "s"])
    got = [r.e for r in df.select(E.concat_plain("y", "p", "n", "s").alias("e")).collect()]
    assert got == ["2025BW140", None]


def test_prefix(spark):
    df = spark.createDataFrame([Row(c="1-602-99")])
    assert df.select(E.prefix("c", 5).alias("p")).first().p == "1-602"


@pytest.mark.parametrize(
    "raw,code,name",
    [
        ("KV-Engineering", "KV", "Engineering"),
        ("NOHYPHEN", "NOHYPHEN", ""),          # split guard (ref :550-560)
        ("A-B-C", "A", "B-C"),                  # split on FIRST delimiter only
        (None, None, ""),  # null head propagates; tail takes the no-delim '' guard

    ],
)
def test_split_first_with_guard(spark, raw, code, name):
    df = spark.createDataFrame([Row(c=raw)], "c string")
    c, n = E.split_first("c")
    got = df.select(c.alias("code"), n.alias("name")).first()
    assert (got.code, got.name) == (code, name)


def test_to_ts_coerce(spark):
    df = spark.createDataFrame([("2025-01-02 03:04:05",), ("garbage",), (None,)], ["c"])
    got = [r.t for r in df.select(E.to_ts_coerce("c").alias("t")).collect()]
    assert got[0] == datetime.datetime(2025, 1, 2, 3, 4, 5)
    assert got[1] is None and got[2] is None


def test_coalesce_cols(spark):
    df = spark.createDataFrame([(None, "fallback"), ("main", "fallback")], ["a", "b"])
    got = [r.c for r in df.select(E.coalesce_cols("a", "b").alias("c")).collect()]
    assert got == ["fallback", "main"]


def test_keep_or_replace(spark):
    # ref :296-299: keep non-null, non-'' values; else take the mapped one
    df = spark.createDataFrame([("X", "m"), ("", "m"), (None, "m")], ["te", "mapped"])
    got = [r.o for r in df.select(E.keep_or_replace("te", "mapped").alias("o")).collect()]
    assert got == ["X", "m", "m"]


@pytest.mark.parametrize("bad", [None, "", "   ", "nan", " NaN "])
def test_null_blank_default_applies(spark, bad):
    df = spark.createDataFrame([Row(code=bad, desc="old")], "code string, desc string")
    code, desc = E.null_blank_default("code", "desc")
    got = df.select(code.alias("c"), desc.alias("d")).first()
    assert (got.c, got.d) == ("INT", "Internal")


def test_null_blank_default_keeps_real_values(spark):
    df = spark.createDataFrame([Row(code="ABC", desc="Actual")])
    code, desc = E.null_blank_default("code", "desc")
    got = df.select(code.alias("c"), desc.alias("d")).first()
    assert (got.c, got.d) == ("ABC", "Actual")


def test_ensure_column(spark):
    df = spark.createDataFrame([Row(a=1)])
    out = E.ensure_column(df, "Time Entry")
    assert "Time Entry" in out.columns
    assert out.first()["Time Entry"] is None
    # no-op when present
    assert E.ensure_column(out, "Time Entry").columns == out.columns


def test_rename_columns_typo_unification(spark):
    df = spark.createDataFrame([(1, 2)], ["ADj Reason Code", "Adj Reason"])
    out = E.rename_columns(
        df, {"ADj Reason Code": "ADJ Reason Code", "Adj Reason": "ADJ Reason DESC"}
    )
    assert out.columns == ["ADJ Reason Code", "ADJ Reason DESC"]


def test_rename_columns_rejects_duplicate_targets(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError, match="duplicate"):
        E.rename_columns(df, {"a": "x", "b": "x"})


def test_strip_all_strings(spark):
    df = spark.createDataFrame([(" a ", 5)], ["s", "i"])
    got = E.strip_all_strings(df).first()
    assert (got.s, got.i) == ("a", 5)


def test_output_contract_pads_and_reports(spark):
    df = spark.createDataFrame([Row(src="v")])
    out, missing = E.output_contract(df, {"Kept": "src", "Padded": "absent", "AlsoPadded": None})
    assert out.columns == ["Kept", "Padded", "AlsoPadded"]
    assert missing == ["Padded", "AlsoPadded"]
    got = out.first()
    assert (got.Kept, got.Padded, got.AlsoPadded) == ("v", None, None)


def test_finalize_output_strings_and_dates(spark):
    df = spark.createDataFrame([Row(n=1.5, s=" x ", d="2025-01-02")])
    out = E.finalize_output(df, date_cols=["d"])
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema == {"n": "string", "s": "string", "d": "timestamp"}
    got = out.first()
    assert got.s == "x"
    assert got.d == datetime.datetime(2025, 1, 2)
    assert got.n == "1.50"  # stable fixed-point text, not double repr
