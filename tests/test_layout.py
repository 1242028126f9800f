"""Z-order layout: Morton key correctness, write clustering, and the
locality property that justifies the whole exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from uofi_payroll_etl_main_spark.layout import (
    zbucket_profile,
    zorder_key_sql,
    zorder_write,
)


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023) for y in (0, 2, 7, 511)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", F.expr(zorder_key_sql("x", "y", 16)).alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton(x, y), (x, y)


def test_zbucket_profile_shows_two_dim_locality(spark):
    """On a dense 2-D grid, equal-width Z-curve segments must bound BOTH
    dimensions well below their global ranges -- the pruning payoff."""
    n = 64
    grid = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x long, y long")
    prof = zbucket_profile(df, "x", "y", bits=8, n_buckets=16).collect()
    assert sum(r["n_rows"] for r in prof) == n * n
    for r in prof:
        # a 1/16 z-curve segment of a 64x64 grid spans at most half of
        # each axis (a perfect quadrant split would give 1/4 + 1/4)
        assert r["x_max"] - r["x_min"] <= n // 2, r
        assert r["y_max"] - r["y_min"] <= n // 2, r


def test_zorder_write_clusters_files(spark, tmp_path):
    """Files written by zorder_write hold contiguous curve segments:
    per-file min/max of both columns are narrow, and the data survives
    the roundtrip intact."""
    n = 32
    grid = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(grid, "x long, y long, payload long")
    path = str(tmp_path / "zo")
    zorder_write(df, path, "x", "y", bits=8, n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == n * n
    assert sorted(back.columns) == ["payload", "x", "y"]

    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("x").alias("xmin"), F.max("x").alias("xmax"))
        .collect()
    )
    assert len(per_file) >= 4
    narrow = sum(1 for r in per_file if r["xmax"] - r["xmin"] <= n // 2)
    assert narrow >= len(per_file) // 2, per_file
