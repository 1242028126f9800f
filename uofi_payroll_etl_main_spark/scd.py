"""Slowly-changing-dimension (type 2) history builder.

The warehouse pattern the reference's dimension handling stops short
of: given a change log (one row per observation of an entity's
attributes), produce the compressed validity-interval history --
one row per (entity, attribute-state) RUN with [valid_from, valid_to)
bounds and an is_current flag.

Scale shape: both steps (change compression, interval bounds) are
windows over the SAME (key) partitioning and (order) sort, so the
whole build is ONE shuffle; no self-joins, no collect.  Point-in-time
lookup against the result composes with joins.asof_join_backward on
valid_from (beyond-reference extension, cited per SURVEY.md section 2
dimension handling: /root/reference/etl_payroll_pipeline.py dim loads
at :96-:128 keep only the latest state).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_build"]


def scd2_build(
    changes: DataFrame,
    key: str,
    order_col: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Compress an observation log into SCD2 validity intervals.

    Per `key`, ordered by (`order_col`, `tiebreak`): consecutive
    observations with identical `attrs` collapse into one run; each
    run becomes a row with valid_from = first observation's order
    value, valid_to = the NEXT run's valid_from (null on the current
    run), is_current = valid_to is null.

    Null-safe change detection (eqNullSafe vs lag) so a null->value or
    value->null transition opens a new run.  The tiebreak column makes
    the order total when `order_col` alone has duplicates -- without
    it, equal-order observations would make run boundaries
    nondeterministic under Spark's unstable sort.
    """
    from pyspark.sql import Window

    order_exprs: list[Column] = [F.col(order_col).asc()]
    if tiebreak is not None:
        order_exprs.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order_exprs)

    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1
    runs = changes.withColumn("__new_run", first | changed).filter(
        F.col("__new_run")
    )
    # second window: SAME partitioning and order -> rides the first
    # exchange (no second shuffle)
    w2_exprs: list[Column] = [F.col(order_col).asc()]
    if tiebreak is not None:
        w2_exprs.append(F.col(tiebreak).asc())
    w2 = Window.partitionBy(key).orderBy(*w2_exprs)
    return (
        runs.withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key, *attrs, "valid_from", "valid_to", "is_current")
    )
