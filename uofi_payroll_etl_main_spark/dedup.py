"""Deterministic dedup family (SURVEY.md section 2.5, D1-D4).

The reference's dedups are row-order-dependent (`keep="first"`, ref
:317, :547).  Spark DataFrames have no implicit order, so "first" must be
made explicit: thread an ingest-order column from the read
(`with_ingest_order`) and keep the row_number()==1 row per key over
(order asc).  `dropDuplicates` keeps an ARBITRARY row -- fine for D1/D3
(full-projection dedup, all surviving values identical) but wrong for
keyed keep-first (SURVEY.md 7.4.1).

Scale: keyed dedup is one shuffle on the dedup key; the window is a
within-partition sort after that shuffle -- the same cost as any
groupBy on that key.  No global sort, no driver collect.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "with_ingest_order",
    "INGEST_ORDER_COL",
    "dedup_full",
    "dedup_keys_tolerant",
    "keep_first",
]

INGEST_ORDER_COL = "__ingest_order"


def with_ingest_order(df: DataFrame, col: str = INGEST_ORDER_COL) -> DataFrame:
    """Capture read order at the source edge.

    monotonically_increasing_id is (partition_id << 33) + row-in-partition:
    it reproduces file/row order exactly when attached directly to the
    scan (splits are ordered), which is the Spark analog of the pandas
    row index the reference's keep="first" relies on.  Attach BEFORE any
    shuffle or the order is meaningless.
    """
    return df.withColumn(col, F.monotonically_increasing_id())


def dedup_full(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """D1/D3 -- full-projection / full-row dedup (ref :263, :546).

    Order-free: every surviving column is part of the key, so any kept
    row is identical.  Map-side partial aggregation halves the shuffle.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_keys_tolerant(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column | None = None,
) -> DataFrame:
    """D2 -- business-key dedup tolerant of missing key columns (ref
    :314-317: warn for absent keys, dedup on the present subset).

    With `order_col`, keep-first is deterministic (row_number over the
    ingest order); without, falls back to dropDuplicates (arbitrary kept
    row -- only safe when callers don't depend on which survives).
    """
    present = [k for k in keys if k in df.columns]
    missing = [k for k in keys if k not in df.columns]
    if missing:
        warnings.warn(f"dedup keys missing from frame: {missing}", stacklevel=2)
    if not present:
        return df
    if order_col is None:
        return df.dropDuplicates(present)
    return keep_first(df, present, order_col)


def keep_first(
    df: DataFrame, keys: Sequence[str], order_col: str | Column | Sequence[Column]
) -> DataFrame:
    """D4 -- keyed dedup, deterministic keep-FIRST by explicit order (ref
    ``drop_duplicates(subset='UIN Job', keep='first')`` :547)."""
    if isinstance(order_col, (str, Column)):
        order = [F.col(order_col) if isinstance(order_col, str) else order_col]
    else:
        order = list(order_col)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    rn = "__rn_keep_first"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)
