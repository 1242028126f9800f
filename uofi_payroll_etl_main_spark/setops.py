"""Set operations (SURVEY.md section 2.7, U1).

The reference stacks the BW + MN certification extracts with
``pd.concat(ignore_index=True)`` (etl_payroll_pipeline.py:436), which
aligns by column NAME and null-pads columns absent from one side.
``unionByName(allowMissingColumns=True)`` is the exact Spark analog; it
is a zero-shuffle plan node (just concatenated partitions).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

__all__ = ["union_by_name", "intersect_rows", "except_rows"]


def union_by_name(*frames: DataFrame, allow_missing: bool = True) -> DataFrame:
    """U1 -- UNION ALL by column name across any number of frames."""
    if not frames:
        raise ValueError("union_by_name needs at least one frame")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), frames)


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set INTERSECT (distinct rows in both) -- hash-aggregate both
    sides on the full row, one shuffle each."""
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set EXCEPT (distinct rows of a not in b)."""
    return a.exceptAll(b).distinct()
