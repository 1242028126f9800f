"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

A 100 TB table is pruned, not scanned: parquet keeps per-row-group
min/max stats, so rows that are CLUSTERED on the filter columns let the
reader drop whole row groups.  Sorting can cluster only one column;
interleaving the bits of two keys (the Morton / Z-order curve) bounds
the range of BOTH keys inside every run of the sort order -- the layout
trick behind Delta/Iceberg `ZORDER BY`.

The interleave is plain integer bit arithmetic, generated once as SQL
text and shared verbatim with the DuckDB oracle -- no UDF, fully
codegen'd, and engine-agnostic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key_sql", "zorder_write", "zbucket_profile"]


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving the low `bits` bits of two integer
    columns into one Morton key (x takes even bit positions, y odd).
    Valid in Spark SQL and DuckDB alike."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Write `df` Z-order-clustered on (x, y): range-partition by the
    Morton key (sampled range boundaries -- no global sort barrier,
    no single-partition window), sort within each partition, write
    parquet.  Each output file then holds a contiguous Z-curve segment,
    so its parquet min/max stats are tight on BOTH x and y."""
    keyed = df.withColumn("__z", F.expr(zorder_key_sql(x, y, bits)))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zbucket_profile(
    df: DataFrame, x: str, y: str, bits: int = 16, n_buckets: int = 64
) -> DataFrame:
    """Locality profile of the Z-order layout: split the OCCUPIED
    Morton-key range into `n_buckets` equal-width contiguous curve
    segments (a stand-in for output files) and report each segment's
    row count and min/max of both dimensions.

    Narrow per-bucket ranges on BOTH columns are exactly what makes
    min/max pruning effective -- this is the measurable artifact of the
    layout.  The key range comes from one scalar min/max aggregate
    broadcast back onto the scan (never a global sort or window), then
    one metadata-sized groupBy; the normalization arithmetic is
    fixed-order so the oracle reproduces the bucket ids exactly.
    """
    z = F.expr(zorder_key_sql(x, y, bits))
    keyed = df.select(z.alias("__z"), F.col(x), F.col(y))
    rng = keyed.agg(F.min("__z").alias("__lo"), F.max("__z").alias("__hi"))
    bucket = F.floor(
        (F.col("__z") - F.col("__lo"))
        * float(n_buckets)
        / (F.col("__hi") - F.col("__lo") + F.lit(1))
    ).alias("zbucket")
    return (
        keyed.crossJoin(F.broadcast(rng))
        .groupBy(bucket)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x).alias("x_min"),
            F.max(x).alias("x_max"),
            F.min(y).alias("y_min"),
            F.max(y).alias("y_max"),
        )
        .select("zbucket", "n_rows", "x_min", "x_max", "y_min", "y_max")
    )
