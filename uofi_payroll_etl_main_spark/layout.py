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
    "write_zonemapped", "update_zonemap", "zonemap_candidate_files",
    "read_zonemap_pruned", "compaction_plan", "compact_parquet_dir",
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


ZONEMAP_NAME = "_zonemap.json"


def _enc_zone_value(v):
    """Serialize a zone bound for the sidecar.  The WRITE-side stats and
    the READ-side lo/hi comparisons must stay in the same domain or
    pruning silently breaks, so this is the single shared encoder: ISO
    strings for dates/timestamps (lexicographic order IS temporal
    order), plain numbers otherwise."""
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return v


def _zone_intersects(stats, lo, hi) -> bool:
    """Conservative zone-vs-range intersection in the sidecar's
    serialized domain: prune ONLY when the zone is provably disjoint
    (`stats[1] < lo or stats[0] > hi`).  Written in the negated form on
    purpose -- a NaN stat (one NaN in a double column makes Spark's
    F.max record NaN) fails every ordered comparison, so both disjoint
    tests come back False and the file is KEPT; the positive form
    (`stats[1] >= lo`) would silently prune it.  A cross-type
    comparison (e.g. a string-statted zone probed with a number) raises
    TypeError and is kept too: unknown means full scan, never data
    loss."""
    try:
        return not (stats[1] < lo or stats[0] > hi)
    except TypeError:
        return True


def write_zonemapped(
    df: DataFrame,
    path: str,
    cluster_col: str,
    n_files: int = 16,
    stat_cols: "Sequence[str] | None" = None,
) -> None:
    """Range-clustered multi-file parquet write plus a per-FILE column
    min/max sidecar (`_zonemap.json`) -- the Iceberg/Delta data-skipping
    layout.  Parquet row-group stats prune WITHIN a file the engine
    already opened; the zone map prunes whole files from the listing
    BEFORE any footer is read, which at 100 TB (millions of files) is
    the difference between a metadata lookup and a distributed
    footer-read storm.

    The write range-partitions on `cluster_col` so each file holds a
    contiguous value range (maximum zone selectivity); stats default to
    the cluster column and are gathered cluster-side with one grouped
    aggregate over input_file_name().  The sidecar lands via temp file
    + atomic rename (the bucket-spec discipline), AFTER _SUCCESS -- a
    crash between the two leaves a readable un-mapped table, never a
    torn map.  Values serialize as ISO strings for dates/timestamps
    (their lexicographic order IS their temporal order) and as plain
    numbers otherwise.
    """
    stat_cols = list(stat_cols or [cluster_col])
    (
        df.repartitionByRange(int(n_files), F.col(cluster_col))
        .write.mode("overwrite")
        .parquet(path)
    )
    update_zonemap(df.sparkSession, path, stat_cols, full=True)


def update_zonemap(
    spark,
    path: str,
    stat_cols: "Sequence[str]",
    full: bool = False,
    refresh: "Sequence[str] | None" = None,
) -> int:
    """(Re)build the `_zonemap.json` sidecar for `path`.  full=True
    stats every file (the initial-write path); full=False stats ONLY
    files absent from the existing map -- the incremental maintenance
    a streaming/append ingest runs per commit, so the per-batch cost
    is one grouped aggregate over the NEW files, never a table rescan.
    `refresh` names files that must be re-statted even though the map
    already has entries for them -- the replayed-batch case where a
    writer OVERWROTE an existing file name with new content (stale
    bounds would otherwise falsely prune).  An incremental call whose
    stat_cols differ from the map's recorded set re-stats EVERY file
    (self-healing: a half-widened map would otherwise prune
    pre-existing files on the new column).  Atomic temp-file + rename
    either way.  Returns the number of files statted."""
    import json
    import os
    import urllib.parse

    stat_cols = list(stat_cols)
    map_path = os.path.join(path, ZONEMAP_NAME)
    existing: dict = {}
    if not full and os.path.exists(map_path):
        with open(map_path) as fh:
            prior = json.load(fh)
        if list(prior.get("stat_cols", [])) == stat_cols:
            existing = prior["files"]
        # else: column set changed -> rebuild everything below
    names = sorted(
        n for n in os.listdir(path) if n.endswith(".parquet")
    )
    must = set(refresh or ())
    todo = [n for n in names if n not in existing or n in must]
    if todo:
        back = spark.read.parquet(
            *[os.path.join(path, n) for n in todo]
        ).withColumn("__f", F.input_file_name())
        aggs = []
        for c in stat_cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        rows = back.groupBy("__f").agg(*aggs).collect()
        for r in rows:
            # input_file_name() is a URI: strip the scheme and
            # percent-decode so names with spaces/non-ASCII match the
            # os.listdir keys (an encoded key would never be looked up
            # and its file would permanently full-scan or, worse,
            # shadow a real entry)
            f = urllib.parse.unquote(r["__f"])
            f = f[len("file:"):] if f.startswith("file:") else f
            existing[os.path.basename(f)] = {
                c: [_enc_zone_value(r[f"lo_{c}"]), _enc_zone_value(r[f"hi_{c}"])]
                for c in stat_cols
            }
    # drop map entries whose files vanished (compaction, vacuum)
    existing = {n: s for n, s in existing.items() if n in set(names)}
    tmp = map_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"stat_cols": stat_cols, "files": existing}, fh, indent=1)
    os.replace(tmp, map_path)
    return len(todo)


def zonemap_candidate_files(path: str, col: str, lo, hi) -> tuple[list, int]:
    """Which files can contain rows with `col` in [lo, hi]?  Returns
    (kept absolute paths, total mapped files).  A file whose zone is
    disjoint from the range is skipped; a file whose recorded stats are
    null (all-null column) is skipped too, because a range predicate
    never matches NULL.  CONSERVATIVE in both unknown directions: a
    file absent from the map (a writer that doesn't maintain it) is
    kept, and a column the map never statted keeps EVERY file -- a full
    scan, never silent data loss.  Comparisons happen in the sidecar's
    serialized domain (ISO strings for temporals -- order-preserving --
    plain numbers otherwise), so the caller passes `lo`/`hi` in the
    same form it queries with; a DATE hi bound probing a
    TIMESTAMP-statted column is widened to end-of-day so the encoded
    comparison agrees with the engine's date->timestamp cast (a file
    whose min is exactly midnight of the hi date must survive)."""
    import datetime
    import json
    import os

    with open(os.path.join(path, ZONEMAP_NAME)) as fh:
        doc = json.load(fh)
    zm = doc["files"]
    col_mapped = col in doc.get("stat_cols", [])

    hi_is_date = isinstance(hi, datetime.date) and not isinstance(
        hi, datetime.datetime
    )
    if isinstance(hi, str) and len(hi) == 10:
        try:
            datetime.date.fromisoformat(hi)
            hi_is_date = True
        except ValueError:
            pass
    lo, hi = _enc_zone_value(lo), _enc_zone_value(hi)
    if hi_is_date:
        # date-encoded hi ('YYYY-MM-DD'): the engine's residual filter
        # casts it to midnight-inclusive and a TIMESTAMP zone min of
        # exactly that midnight serializes as 'YYYY-MM-DDT00:00:00' >
        # hi -- widen to end-of-day so the string comparison matches
        # filter semantics.  Against a DATE-statted zone the widened
        # bound is merely conservative (keeps the same files).
        hi = hi + "T23:59:59.999999"
    kept = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        if name not in zm or not col_mapped or col not in zm[name]:
            # no zone knowledge for this file/column: keep (full-scan
            # fallback beats silently dropping matching rows)
            kept.append(os.path.join(path, name))
            continue
        stats = zm[name][col]
        if stats[0] is None:
            continue  # all-null zone: a range predicate can't match
        if _zone_intersects(stats, lo, hi):
            kept.append(os.path.join(path, name))
    return kept, len(zm)


def read_zonemap_pruned(spark, path: str, col: str, lo, hi) -> DataFrame:
    """File-skipping range read: prune the listing through the zone map
    (zonemap_candidate_files), scan only surviving files, and apply the
    exact residual filter -- zone pruning is recall-complete (a file
    whose zone intersects the range is kept), so the result equals the
    full-scan filter, certified by the s31 value oracle.  An empty
    survivor set returns an empty frame with the table's schema without
    touching any data file."""
    kept, _ = zonemap_candidate_files(path, col, lo, hi)
    pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    if not kept:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*kept).filter(pred)


def compaction_plan(
    files: "Sequence[tuple[str, int]]", target_bytes: int
) -> list[dict]:
    """Deterministic first-fit-decreasing bin-pack of (file, size) into
    ~`target_bytes` output groups -- the small-file compaction PLANNER.
    A long-lived table accumulates files far below the scan-efficient
    size (streaming commits, per-partition appends); compaction is the
    nightly maintenance that re-groups them so scans pay one open per
    target_bytes, not one per commit.

    Deterministic: files process in (size desc, name asc) order into
    the first open bin with room; a file >= target_bytes keeps a
    singleton bin (it is already compact).  The listing is metadata --
    the planner is plain Python on (name, bytes) pairs, never a scan.
    Returns [{"bin": int, "file": name, "bytes": size}] covering every
    input file exactly once.
    """
    order = sorted(files, key=lambda t: (-t[1], t[0]))
    room: list[int] = []
    plan: list[dict] = []
    for name, size in order:
        if size >= target_bytes:
            room.append(0)
            plan.append({"bin": len(room) - 1, "file": name, "bytes": size})
            continue
        for i, r in enumerate(room):
            if size <= r:
                room[i] = r - size
                plan.append({"bin": i, "file": name, "bytes": size})
                break
        else:
            room.append(target_bytes - size)
            plan.append({"bin": len(room) - 1, "file": name, "bytes": size})
    return plan


def compact_parquet_dir(
    spark, src: str, dst: str, target_bytes: int
) -> list[dict]:
    """Apply a compaction_plan to a parquet directory: one distributed
    job tags every row with its file's bin (a broadcast file->bin map
    over input_file_name()), clusters by bin, and writes dst
    partitioned by `__bin` with EXACTLY one data file per bin (a bin's
    rows hash to one task; partitionBy splits tasks per value).  No
    driver loop over bins -- thousands of bins are one shuffle, which
    is what makes this runnable as nightly maintenance at 100 TB.
    Reads of dst see the same rows as src (`__bin` is a partition
    column readers can ignore).  Returns the plan."""
    import os

    sizes = [
        (n, os.path.getsize(os.path.join(src, n)))
        for n in sorted(os.listdir(src))
        if n.endswith(".parquet")
    ]
    plan = compaction_plan(sizes, target_bytes)
    n_bins = 1 + max((p["bin"] for p in plan), default=0)
    # file->bin rides as a broadcast-joined FRAME, not a create_map
    # literal: at millions of files a literal map is millions of
    # expression nodes in the driver plan (the joins.dict_map_join
    # rule); a broadcast join keeps the mapping in the engine
    mapping = spark.createDataFrame(
        [(p["file"], p["bin"]) for p in plan], "__fname string, __bin int"
    )
    # input_file_name() is URI-encoded; the mapping keys come from
    # os.listdir (raw names), so percent-decode the scan-side basename
    # or a file named with spaces/non-ASCII never matches and the INNER
    # join silently drops its rows.  url_decode is URLDecoder semantics
    # ('+' -> space), which plain file-name percent-encoding does not
    # use -- protect literal '+' by pre-escaping it.
    src_df = spark.read.parquet(src)
    df = (
        src_df
        .withColumn(
            "__fname",
            F.url_decode(
                F.regexp_replace(
                    F.element_at(F.split(F.input_file_name(), "/"), -1),
                    r"\+",
                    "%2B",
                )
            ),
        )
        .join(F.broadcast(mapping), "__fname")
        .drop("__fname")
        .repartition(n_bins, "__bin")
    )
    df.write.mode("overwrite").partitionBy("__bin").parquet(dst)
    # recall-completeness gate: both counts are parquet-footer metadata
    # (no data scan), so certifying that no file fell out of the join
    # costs nothing next to the rewrite itself
    src_rows = src_df.count()
    dst_rows = spark.read.parquet(dst).count()
    if src_rows != dst_rows:
        raise RuntimeError(
            f"compact_parquet_dir dropped rows: src={src_rows} "
            f"dst={dst_rows} -- a scanned file name failed to match "
            "the compaction plan"
        )
    return plan
