"""Filter / projection helpers (SURVEY.md section 2.2, P1-P10).

All predicates are plain Catalyst expressions, so they push down into the
parquet scan (check `.explain`: PushedFilters) -- at 100 TB the filter
happens at the file/row-group level, not after a full read.

Reference cites: substring predicate :67-68, bounded regex :72-74,
IN-list :69, ci-equality :124, first-match pick :82/:90/etc, fiscal-year
range :443-452, equality :545, projection :301-312, tolerant drop :279,
duplicate-name resolution :591.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "contains_ci",
    "rlike_bounded",
    "in_list",
    "eq_ci",
    "first_match",
    "between_dates",
    "fiscal_year_bounds",
    "project",
    "drop_tolerant",
    "resolve_duplicate_columns",
]


def contains_ci(col: Column | str, needle: str) -> Column:
    """P1 -- case-insensitive substring containment (ref :67-68)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c).contains(needle.lower())


def rlike_bounded(col: Column | str, token: str) -> Column:
    """P2 -- token bounded by start/whitespace/underscore/end,
    case-insensitive (ref CPA matcher :72-74)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(rf"(?i)(^|\s|_){re.escape(token)}(\s|_|$)")


def in_list(col: Column | str, values: Iterable) -> Column:
    """P3 -- IN-list membership (ref extension check :69, :74)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin(*list(values))


def eq_ci(col: Column | str, value: str) -> Column:
    """P4 -- case-insensitive equality (ref lookup-file pick :124)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(c) == value.lower()


def first_match(df: DataFrame, order_by: Sequence[Column | str]) -> DataFrame:
    """P5 -- deterministic `iloc[0]`: explicit total order + limit 1.

    The reference relies on listing order (ref :82, :90, :127); Spark has
    no implicit order, so callers must supply one that is total (include a
    unique tiebreak column).  limit(1) after a sort is executed as a
    TakeOrderedAndProject -- no global sort materialization at scale.
    """
    return df.orderBy(*order_by).limit(1)


def between_dates(col: Column | str, start, end) -> Column:
    """P6 -- inclusive date range (ref fiscal-year filter :443-452)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.between(F.lit(start), F.lit(end))


def fiscal_year_bounds(fy_end_year: int) -> tuple[str, str]:
    """FY(Y) = Jul 1 (Y-1) .. Jun 30 (Y)  (ref :446-447)."""
    return f"{fy_end_year - 1}-07-01 00:00:00", f"{fy_end_year}-06-30 23:59:59.999999"


def project(df: DataFrame, cols: Sequence[str], keep_order: bool = True) -> DataFrame:
    """P8 -- keep the intersection of `cols` and df.columns, in `cols`
    order (ref source_fields intersection :301-312)."""
    present = [c for c in cols if c in df.columns]
    if not keep_order:
        present = [c for c in df.columns if c in set(present)]
    return df.select(*present)


def drop_tolerant(df: DataFrame, *cols: str) -> DataFrame:
    """P9 -- drop columns, silently skipping absent ones (ref
    ``drop(errors='ignore')`` :279).  Spark's drop is already tolerant;
    wrapped for parity and intent."""
    return df.drop(*cols)


def resolve_duplicate_columns(df: DataFrame) -> DataFrame:
    """P10 -- keep the first occurrence of each duplicate-NAMED column
    (ref ``df.loc[:, ~df.columns.duplicated()]`` :591).

    The engine's rename layer prevents duplicates from arising
    (expressions.rename_columns raises), but frames joined from external
    sources can still carry them; select-by-position resolves.
    """
    names = df.columns
    if len(set(names)) == len(names):
        return df
    tmp = df.toDF(*[f"__c{i}" for i in range(len(names))])
    seen: set[str] = set()
    keep: list[Column] = []
    for i, name in enumerate(names):
        if name not in seen:
            seen.add(name)
            keep.append(F.col(f"__c{i}").alias(name))
    return tmp.select(*keep)
