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

__all__ = [
    "zorder_key_sql", "zorder_write", "zbucket_profile",
    "hilbert_key", "hilbert_write", "hbucket_profile", "hilbert_profile_sql",
]


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


# --------------------------------------------------------------------------
# Hilbert-curve clustering: strictly better locality than Z-order (the
# curve never jumps, so every contiguous key segment is one connected
# region -- Morton's quadrant seams split segments across space).
# --------------------------------------------------------------------------

def _hilbert_tables() -> tuple[list[int], list[int], int]:
    """Derive the 2-D Hilbert DFA (state-transition + output-digit
    tables) from the classic xy2d transformation rules, instead of
    typing magic tables in.  A state is the accumulated frame transform
    applied to each level's raw bit pair; the reachable set closes at 4
    states.  Returns (trans, digit, n_states), tables indexed by
    state * 4 + q where q = (x_bit << 1) | y_bit."""
    idmap = ((0, 0), (0, 1), (1, 0), (1, 1))

    def compose(op, m):  # (op . m) extensionally over the 4 bit pairs
        return tuple(op[idmap.index(m[i])] for i in range(4))

    swap = ((0, 0), (1, 0), (0, 1), (1, 1))             # (bx,by)->(by,bx)
    inv_swap = ((1, 1), (0, 1), (1, 0), (0, 0))         # ->(1-by,1-bx)
    ident = idmap
    states: list[tuple] = [ident]
    trans: dict[tuple[int, int], int] = {}
    digit: dict[tuple[int, int], int] = {}
    i = 0
    while i < len(states):
        m = states[i]
        for q, (bx, by) in enumerate(idmap):
            rx, ry = m[idmap.index((bx, by))]
            digit[(i, q)] = (3 * rx) ^ ry
            if ry == 1:
                m2 = m
            elif rx == 1:
                m2 = compose(inv_swap, m)
            else:
                m2 = compose(swap, m)
            if m2 not in states:
                states.append(m2)
            trans[(i, q)] = states.index(m2)
        i += 1
    n = len(states)
    t_flat = [trans[(s, q)] for s in range(n) for q in range(4)]
    d_flat = [digit[(s, q)] for s in range(n) for q in range(4)]
    return t_flat, d_flat, n


_H_TRANS, _H_DIGIT, _H_STATES = _hilbert_tables()


def hilbert_key(x, y, bits: int = 16):
    """Hilbert index of two already-scaled integer columns in
    [0, 2^bits) -- pure Catalyst, no UDF.  The per-level quadrants are
    an unrolled literal-shift array (linear in `bits`); the sequential
    DFA walk folds over it with the `aggregate` higher-order function,
    which evaluates ITERATIVELY at runtime, so the state recurrence
    never inflates the expression tree (the naive withColumn chain
    would re-inline the state once per reference and blow up 2^bits)."""
    one = F.lit(1).cast("long")
    xm = F.col(x).cast("long") if isinstance(x, str) else x.cast("long")
    ym = F.col(y).cast("long") if isinstance(y, str) else y.cast("long")
    quads = F.array(*[
        (
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(one), 1)
            + F.shiftright(ym, i).bitwiseAND(one)
        ).cast("int")
        for i in range(bits - 1, -1, -1)  # high bit level first
    ])
    t_arr = F.array(*[F.lit(v) for v in _H_TRANS])
    d_arr = F.array(*[F.lit(v) for v in _H_DIGIT])
    folded = F.aggregate(
        quads,
        F.struct(F.lit(0).alias("s"), F.lit(0).cast("long").alias("d")),
        lambda acc, q: F.struct(
            F.element_at(t_arr, acc["s"] * 4 + q + 1).alias("s"),
            (
                acc["d"] * 4
                + F.element_at(d_arr, acc["s"] * 4 + q + 1).cast("long")
            ).alias("d"),
        ),
    )
    return folded["d"]


def hilbert_profile_sql(
    table_expr: str, x: str, y: str, bits: int = 16, n_buckets: int = 64
) -> str:
    """DuckDB oracle text for hbucket_profile: the SAME DFA walk,
    unrolled as one nested derived table per bit level (each level's
    state/index referenced by NAME, so the generated text stays linear
    in `bits`), then the identical bucket/groupBy arithmetic."""
    t_list = "[" + ", ".join(str(v) for v in _H_TRANS) + "]"
    d_list = "[" + ", ".join(str(v) for v in _H_DIGIT) + "]"
    inner = (
        f"SELECT {x} AS __x, {y} AS __y, 0 AS s0, CAST(0 AS BIGINT) AS d0 "
        f"FROM {table_expr}"
    )
    for lvl, i in enumerate(range(bits - 1, -1, -1)):
        q = f"(((__x >> {i}) & 1) * 2 + ((__y >> {i}) & 1))"
        idx = f"(s{lvl} * 4 + {q} + 1)"
        inner = (
            f"SELECT __x, __y, "
            f"{t_list}[{idx}] AS s{lvl + 1}, "
            f"d{lvl} * 4 + {d_list}[{idx}] AS d{lvl + 1} "
            f"FROM ({inner})"
        )
    keyed = f"SELECT __x AS x, __y AS y, d{bits} AS h FROM ({inner})"
    return f"""
    WITH keyed AS ({keyed}),
    rng AS (SELECT min(h) AS lo, max(h) AS hi FROM keyed)
    SELECT CAST(floor((h - lo) * {float(n_buckets)} / (hi - lo + 1)) AS BIGINT)
             AS hbucket,
           count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM keyed CROSS JOIN rng
    GROUP BY 1
    """


def hilbert_write(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 16,
    n_files: int = 32,
) -> None:
    """Write `df` Hilbert-clustered on (x, y): range-partition by the
    Hilbert key (sampled boundaries, no global sort barrier), local
    sort, parquet.  Every output file holds one CONNECTED curve
    segment, so its min/max footer stats are at least as tight as the
    Z-order layout's on both dimensions."""
    keyed = df.withColumn("__h", hilbert_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite")
        .parquet(path)
    )


def hbucket_profile(
    df: DataFrame, x: str, y: str, bits: int = 16, n_buckets: int = 64
) -> DataFrame:
    """Locality profile of the Hilbert layout -- zbucket_profile's
    twin: equal-width contiguous curve segments with per-segment count
    and min/max of both dimensions.  The fixed-order normalization
    arithmetic matches hilbert_profile_sql, so the oracle reproduces
    the bucket ids exactly."""
    keyed = df.select(hilbert_key(x, y, bits).alias("__h"), F.col(x), F.col(y))
    rng = keyed.agg(F.min("__h").alias("__lo"), F.max("__h").alias("__hi"))
    bucket = F.floor(
        (F.col("__h") - F.col("__lo"))
        * float(n_buckets)
        / (F.col("__hi") - F.col("__lo") + F.lit(1))
    ).alias("hbucket")
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
        .select("hbucket", "n_rows", "x_min", "x_max", "y_min", "y_max")
    )
