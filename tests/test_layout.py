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


class TestVersionedStore:
    def test_publish_time_travel_and_crash_invisibility(self, spark, tmp_path):
        import os

        from uofi_payroll_etl_main_spark.io import (
            list_versions,
            read_version,
            write_version,
        )

        root = str(tmp_path / "store")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, v string")
        assert write_version(df1, root) == 1
        assert write_version(df2, root) == 2
        assert list_versions(root) == [1, 2]
        # pinned read is unchanged by the later publish
        assert sorted(tuple(r) for r in read_version(spark, root, 1).collect()) == [
            (1, "a"), (2, "b"),
        ]
        # latest is v2
        assert read_version(spark, root).count() == 3
        # a half-written version (no _SUCCESS) is invisible
        os.makedirs(os.path.join(root, "v=3"))
        assert list_versions(root) == [1, 2]
        assert read_version(spark, root).count() == 3
        # and pinning to it raises loudly
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            read_version(spark, root, 3)

    def test_crashed_write_does_not_wedge_store(self, spark, tmp_path):
        # a half-written v=N dir (no _SUCCESS) used to collide with the
        # next publish forever; write_version must clean it and proceed
        import os

        from uofi_payroll_etl_main_spark.io import (
            list_versions,
            read_version,
            write_version,
        )

        from uofi_payroll_etl_main_spark.io import ConcurrentWriteError

        root = str(tmp_path / "crashed")
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        assert write_version(df, root) == 1
        # simulate a crashed writer at v=2 (data present, no marker)
        os.makedirs(os.path.join(root, "v=2"))
        with open(os.path.join(root, "v=2", "part-garbage.parquet"), "wb") as f:
            f.write(b"not parquet")
        assert list_versions(root) == [1]
        # a FRESH uncommitted dir may be another writer in flight:
        # publishing must refuse rather than delete it out from under them
        import pytest as _pytest

        with _pytest.raises(ConcurrentWriteError, match="in flight"):
            write_version(df, root)
        # once stale (here: zero grace), it is crash debris -- swept, and
        # the publish succeeds at the SAME version number
        assert write_version(df, root, stale_after_s=0.0) == 2
        assert list_versions(root) == [1, 2]
        assert read_version(spark, root, 2).count() == 1

    def test_uri_roots(self, spark, tmp_path):
        # the commit protocol goes through the Hadoop FileSystem API of
        # the active session: file:// URIs work end-to-end, and a scheme
        # with no filesystem implementation fails LOUDLY (never an
        # empty-store misread)
        import pytest as _pytest

        from uofi_payroll_etl_main_spark.io import list_versions, write_version

        df = spark.createDataFrame([(1,)], "id long")
        with _pytest.raises(IOError, match="no Hadoop filesystem"):
            list_versions("s3://bucket/store")
        with _pytest.raises(IOError, match="no Hadoop filesystem"):
            write_version(df, "s3://bucket/store")
        root = "file://" + str(tmp_path / "filescheme")
        assert write_version(df, root) == 1
        assert list_versions(root) == [1]

    def test_file_uri_store_end_to_end(self, spark, tmp_path):
        # full store lifecycle against a file:// URI root: publish,
        # time travel, CDC, vacuum, RTBF delete -- every metadata op via
        # the Hadoop FS API, the same code path a hdfs:// root takes
        from uofi_payroll_etl_main_spark.io import (
            delete_rows,
            list_versions,
            read_version,
            read_version_changes,
            vacuum_versions,
            write_version,
        )

        root = "file://" + str(tmp_path / "uri_store")
        df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        df2 = spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")], "id long, v string")
        df3 = spark.createDataFrame([(3, "c")], "id long, v string")
        assert [write_version(d, root) for d in (df1, df2, df3)] == [1, 2, 3]
        assert read_version(spark, root, 1).count() == 2
        changes = {
            (r["id"], r["change_type"])
            for r in read_version_changes(spark, root, 1, 2, ["id"]).collect()
        }
        assert changes == {(2, "changed"), (3, "added")}
        assert vacuum_versions(root, keep_latest=2) == [1]
        assert list_versions(root) == [2, 3]
        # RTBF against a file:// parquet path (atomic swap via fs API)
        data = "file://" + str(tmp_path / "uri_data")
        df2.write.parquet(data)
        subjects = spark.createDataFrame([(2,)], "id long")
        survivors = delete_rows(spark, data, subjects, ["id"])
        assert sorted(r["id"] for r in survivors.collect()) == [1, 3]

    def test_fs_fallback_without_session(self, tmp_path):
        # driver-side utility calls with no active session fall back to
        # the local filesystem with identical semantics; remote schemes
        # are impossible there and must raise
        import pytest as _pytest

        from uofi_payroll_etl_main_spark import fs

        active = __import__("pyspark.sql", fromlist=["SparkSession"]).SparkSession.getActiveSession()
        if active is not None:
            _pytest.skip("needs a no-session environment; covered by subprocess tier")
        d = tmp_path / "x"
        d.mkdir()
        (d / "a.txt").write_text("hi")
        assert fs.listdir(str(tmp_path)) == ["x"]
        assert fs.list_files("file://" + str(tmp_path)) == [str(d / "a.txt")]
        with _pytest.raises(ValueError, match="no active SparkSession"):
            fs.listdir("s3://bucket/x")

    def test_fs_fallback_subprocess(self, tmp_path):
        # run the fallback assertions in a clean interpreter with no
        # SparkSession so the local-os branch actually executes
        import subprocess
        import sys
        import textwrap

        d = tmp_path / "x"
        d.mkdir()
        (d / "a.txt").write_text("hi")
        code = textwrap.dedent(
            f"""
            import sys
            sys.path.insert(0, {str(__import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))!r})
            from uofi_payroll_etl_main_spark import fs
            assert fs.listdir({str(tmp_path)!r}) == ["x"]
            assert fs.list_files("file://" + {str(tmp_path)!r}) == [{str(d / 'a.txt')!r}]
            assert fs.exists({str(d)!r}) and fs.is_dir({str(d)!r})
            try:
                fs.listdir("s3://bucket/x")
            except ValueError as e:
                assert "no active SparkSession" in str(e)
            else:
                raise AssertionError("expected ValueError for remote scheme")
            fs.delete({str(d)!r})
            assert not fs.exists({str(d)!r})
            print("FALLBACK_OK")
            """
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=120
        )
        assert out.returncode == 0, out.stderr
        assert "FALLBACK_OK" in out.stdout

    def test_empty_store_raises(self, spark, tmp_path):
        import pytest as _pytest

        from uofi_payroll_etl_main_spark.io import read_version

        with _pytest.raises(FileNotFoundError):
            read_version(spark, str(tmp_path / "nope"))


class TestOptimisticPublish:
    def test_conflict_detection(self, spark, tmp_path):
        import pytest as _pytest

        from uofi_payroll_etl_main_spark.io import (
            ConcurrentWriteError,
            write_version,
            write_version_if,
        )

        root = str(tmp_path / "occ")
        df = spark.createDataFrame([(1,)], "id long")
        # empty store: expected None succeeds
        assert write_version_if(df, root, None) == 1
        # stale expectation raises
        with _pytest.raises(ConcurrentWriteError):
            write_version_if(df, root, None)
        # correct expectation advances
        assert write_version_if(df, root, 1) == 2
        # a racing plain write bumps latest; v2-expectation now stale
        write_version(df, root)
        with _pytest.raises(ConcurrentWriteError):
            write_version_if(df, root, 2)


class TestVacuumVersions:
    def test_retention_window(self, spark, tmp_path):
        import os

        from uofi_payroll_etl_main_spark.io import (
            list_versions,
            read_version,
            vacuum_versions,
            write_version,
        )

        root = str(tmp_path / "vac")
        df = spark.createDataFrame([(1,)], "id long")
        for _ in range(5):
            write_version(df, root)
        assert list_versions(root) == [1, 2, 3, 4, 5]
        deleted = vacuum_versions(root, keep_latest=2)
        assert deleted == [1, 2, 3]
        assert list_versions(root) == [4, 5]
        # retained versions still read
        assert read_version(spark, root, 4).count() == 1
        # next publish continues the dense numbering from the survivors
        assert write_version(df, root) == 6

    def test_uncommitted_debris_collected(self, spark, tmp_path):
        import os

        from uofi_payroll_etl_main_spark.io import (
            list_versions,
            vacuum_versions,
            write_version,
        )

        root = str(tmp_path / "vacdebris")
        df = spark.createDataFrame([(1,)], "id long")
        for _ in range(3):
            write_version(df, root)
        os.makedirs(os.path.join(root, "v=2.5"))  # not a version dir -> untouched
        os.rename(os.path.join(root, "v=2.5"), os.path.join(root, "junk"))
        os.makedirs(os.path.join(root, "v=1"), exist_ok=True)  # already committed
        # crashed writer debris BELOW the retained window
        import pathlib

        crash = pathlib.Path(root) / "v=2"
        (crash / "_SUCCESS").unlink()  # de-commit v2 -> becomes debris
        deleted = vacuum_versions(root, keep_latest=1)
        assert deleted == [1]  # v2 (now uncommitted) is swept but not reported
        assert list_versions(root) == [3]
        assert not (pathlib.Path(root) / "v=2").exists()
        assert (pathlib.Path(root) / "junk").exists()  # non-version dirs untouched

    def test_double_digit_versions_delete_ascending(self, spark, tmp_path):
        # lexicographic listing would order v=10 before v=2; the
        # returned deletion list must be NUMERICALLY ascending
        from uofi_payroll_etl_main_spark.io import (
            list_versions,
            vacuum_versions,
            write_version,
        )

        root = str(tmp_path / "vac10")
        df = spark.createDataFrame([(1,)], "id long")
        for _ in range(12):
            write_version(df, root)
        assert vacuum_versions(root, keep_latest=2) == list(range(1, 11))
        assert list_versions(root) == [11, 12]

    def test_keep_latest_floor(self, tmp_path):
        import pytest as _pytest

        from uofi_payroll_etl_main_spark.io import vacuum_versions

        with _pytest.raises(ValueError):
            vacuum_versions(str(tmp_path), keep_latest=0)


class TestQualityGatedPublish:
    def test_blocks_bad_load_and_passes_good(self, spark, tmp_path):
        import pytest as _pytest

        from uofi_payroll_etl_main_spark.io import (
            QualityGateError,
            list_versions,
            write_version_checked,
        )

        root = str(tmp_path / "gated")
        rules = [
            {"kind": "min_rows", "n": 2},
            {"kind": "not_null", "col": "v", "max_null_frac": 0.0},
            {"kind": "unique", "col": "id"},
        ]
        good = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        assert write_version_checked(good, root, rules) == 1
        # null violation -> refused, NOTHING written
        bad = spark.createDataFrame([(3, None), (4, "d")], "id long, v string")
        with _pytest.raises(QualityGateError, match="not_null"):
            write_version_checked(bad, root, rules)
        assert list_versions(root) == [1]
        # duplicate-key violation -> refused
        dup = spark.createDataFrame([(5, "e"), (5, "f")], "id long, v string")
        with _pytest.raises(QualityGateError, match="unique"):
            write_version_checked(dup, root, rules)
        assert list_versions(root) == [1]


class TestVersionChanges:
    def test_cdf_roundtrips_with_merge(self, spark, tmp_path):
        """diff(v1, v2) applied to v1 via keep-latest must reproduce v2's
        key set -- the CDC contract the docstring claims."""
        from uofi_payroll_etl_main_spark.io import (
            read_version,
            read_version_changes,
            write_version,
        )

        root = str(tmp_path / "cdf")
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
        )
        v2 = spark.createDataFrame(
            [(2, "B"), (3, "c"), (4, "d")], "id long, v string"
        )
        write_version(v1, root)
        write_version(v2, root)
        delta = {r["id"]: r["change_type"]
                 for r in read_version_changes(spark, root, 1, 2, keys=["id"]).collect()}
        assert delta == {1: "removed", 2: "changed", 4: "added"}  # 3 unchanged -> absent


def test_incremental_ingest_delta_only_and_commit(spark, tmp_path):
    """Three arrival batches: each read sees ONLY uncommitted files;
    commit makes them invisible; an empty delta returns (None, [])."""
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.io import (
        commit_ingest,
        list_unprocessed,
        read_incremental,
    )

    src = str(tmp_path / "src")
    manifest = str(tmp_path / "manifest")

    spark.createDataFrame([Row(k=1), Row(k=2)]).write.parquet(src + "/b1")
    df1, files1 = read_incremental(spark, src, manifest)
    assert sorted(r.k for r in df1.collect()) == [1, 2]
    commit_ingest(spark, manifest, files1)
    assert list_unprocessed(spark, src, manifest) == []
    none_df, none_files = read_incremental(spark, src, manifest)
    assert none_df is None and none_files == []

    spark.createDataFrame([Row(k=3)]).write.parquet(src + "/b2")
    df2, files2 = read_incremental(spark, src, manifest)
    assert [r.k for r in df2.collect()] == [3]
    assert set(files1).isdisjoint(files2)
    # crash between read and commit: the next run reprocesses (at-least-once)
    df2b, files2b = read_incremental(spark, src, manifest)
    assert files2b == files2
    commit_ingest(spark, manifest, files2)
    assert read_incremental(spark, src, manifest)[1] == []
    # a scheme with no filesystem implementation fails loudly, never
    # an empty listing (the commit protocol shares the data path's FS)
    import pytest as _pytest
    with _pytest.raises(IOError, match="no Hadoop filesystem"):
        list_unprocessed(spark, "s3://bucket/x", manifest)


def test_delete_rows_erases_subjects_atomically(spark, tmp_path):
    from pyspark.sql import Row

    from uofi_payroll_etl_main_spark.io import delete_rows

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [Row(user_id=i, v=f"row{i}") for i in range(10)]
    ).write.parquet(path)
    subjects = spark.createDataFrame(
        [Row(user_id=3), Row(user_id=7), Row(user_id=3),   # dup request rows ok
         Row(user_id=99)]                                   # absent subject: no-op
    )
    out = delete_rows(spark, path, subjects, ["user_id"])
    kept = sorted(r.user_id for r in out.collect())
    assert kept == [0, 1, 2, 4, 5, 6, 8, 9]
    # the on-disk dataset itself was rewritten (readers see the erasure)
    assert sorted(r.user_id for r in spark.read.parquet(path).collect()) == kept
    # idempotent: deleting again changes nothing
    again = delete_rows(spark, path, subjects, ["user_id"])
    assert again.count() == 8


# --------------------------------------------------------------------------
# Hilbert layout
# --------------------------------------------------------------------------

def _xy2d_classic(bits: int, x: int, y: int) -> int:
    """Independent reference: the classic iterative Hilbert xy2d."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_classic_reference(spark):
    import random

    from uofi_payroll_etl_main_spark.layout import hilbert_key

    rnd = random.Random(3)
    pts = [(rnd.randrange(1 << 16), rnd.randrange(1 << 16)) for _ in range(300)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.withColumn("h", hilbert_key("x", "y", 16)).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_classic(16, x, y), (x, y)


def test_hilbert_locality_beats_zorder(spark):
    # the locality claim, measured: average per-bucket bounding-box
    # semi-perimeter of the Hilbert segments must not exceed Z-order's
    # on the same data/bucket count (the curve never jumps; Morton's
    # quadrant seams do)
    from uofi_payroll_etl_main_spark.layout import hbucket_profile, zbucket_profile

    n = 64
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")

    def avg_span(profile):
        rows = profile.collect()
        spans = [(r.x_max - r.x_min) + (r.y_max - r.y_min) for r in rows]
        return sum(spans) / len(spans)

    h = avg_span(hbucket_profile(df, "x", "y", bits=6, n_buckets=32))
    z = avg_span(zbucket_profile(df, "x", "y", bits=6, n_buckets=32))
    assert h <= z, (h, z)


def test_hilbert_write_clusters_files(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from uofi_payroll_etl_main_spark.layout import hilbert_write

    rnd = random.Random(9)
    n = 48
    pts = [(x, y, rnd.random()) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long, payload double")
    out = str(tmp_path / "hilbert")
    hilbert_write(df, out, "x", "y", bits=6, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == n * n
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        )
        .collect()
    )
    assert len(per_file) >= 4
    # every file's box must be a fraction of the full space on BOTH dims
    narrow = sum(
        1 for r in per_file
        if (r.xmax - r.xmin) <= n // 2 and (r.ymax - r.ymin) <= n // 2
    )
    assert narrow >= len(per_file) // 2, per_file


def test_snapshot_diff_images_round_trips_reversal(spark):
    """Pre/post images make the diff REVERSIBLE: applying the inverse
    delta (swap images, flip added/removed) onto v2 must reconstruct
    v1 exactly -- the audit/undo property plain change_type rows lack."""
    from pyspark.sql import functions as F

    from uofi_payroll_etl_main_spark.io import snapshot_diff_images

    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, n long"
    )
    v2 = spark.createDataFrame(
        [(2, "b", 25), (3, "c", 30), (4, "d", 40)], "id long, s string, n long"
    )
    d = snapshot_diff_images(v1, v2, ["id"])
    rows = {r.id: r for r in d.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].change_type == "removed" and rows[1].new_s is None and rows[1].old_n == 10
    assert rows[2].change_type == "changed" and (rows[2].old_n, rows[2].new_n) == (20, 25)
    assert rows[4].change_type == "added" and rows[4].old_s is None and rows[4].new_n == 40

    # reversal: drop 'added' keys from v2, restore old images for the rest
    restored = (
        v2.join(d.select("id", "change_type", "old_s", "old_n"), "id", "left")
        .filter((F.col("change_type").isNull()) | (F.col("change_type") != "added"))
        .select(
            "id",
            F.when(F.col("change_type") == "changed", F.col("old_s")).otherwise(F.col("s")).alias("s"),
            F.when(F.col("change_type") == "changed", F.col("old_n")).otherwise(F.col("n")).alias("n"),
        )
        .unionByName(
            d.filter(F.col("change_type") == "removed").select(
                "id", F.col("old_s").alias("s"), F.col("old_n").alias("n")
            )
        )
    )
    assert sorted(tuple(r) for r in restored.collect()) == sorted(
        tuple(r) for r in v1.collect()
    )


def test_bucketed_table_join_is_exchange_free(spark, tmp_path):
    """bucketed_table: the co-located join runs as a SortMergeJoin with
    ZERO Exchange (the shuffle was paid at write time), values match a
    plain join, and a catalog-less re-registration (fresh session
    simulation) reads the same bucketed files exchange-free too."""
    from uofi_payroll_etl_main_spark.io import bucketed_table

    left = spark.createDataFrame(
        [(i % 100, float(i)) for i in range(1000)], "k long, v double"
    )
    right = spark.createDataFrame(
        [(i, "g%d" % (i % 7)) for i in range(100)], "k long, g string"
    )
    lt = bucketed_table(
        spark, left, str(tmp_path / "l"), "tbkt_left", "k", buckets=4
    ).withColumnRenamed("k", "lk")
    rt = bucketed_table(
        spark, right, str(tmp_path / "r"), "tbkt_right", "k", buckets=4
    )
    j = lt.hint("merge").join(rt, lt["lk"] == rt["k"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    got = j.groupBy("g").agg(F.sum("v").alias("sv")).collect()
    want = {
        r["g"]: r["sv"]
        for r in left.join(right, "k").groupBy("g").agg(F.sum("v").alias("sv")).collect()
    }
    assert {r["g"]: r["sv"] for r in got} == want

    # fresh-session path: drop the catalog entries, re-register from files
    spark.sql("DROP TABLE tbkt_left")
    spark.sql("DROP TABLE tbkt_right")
    lt2 = bucketed_table(
        spark, left, str(tmp_path / "l"), "tbkt_left", "k", buckets=4
    ).withColumnRenamed("k", "lk")
    rt2 = bucketed_table(
        spark, right, str(tmp_path / "r"), "tbkt_right", "k", buckets=4
    )
    j2 = lt2.hint("merge").join(rt2, lt2["lk"] == rt2["k"])
    plan2 = j2._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2
    assert j2.count() == 1000
    spark.sql("DROP TABLE tbkt_left")
    spark.sql("DROP TABLE tbkt_right")


def test_dpp_join_prunes_partitions_at_runtime(spark, tmp_path):
    """Dynamic partition pruning: with the dim materialized to its own
    parquet, the fact-dim join's fact scan carries a dynamicpruning
    PartitionFilter (runtime pruning, not a statically folded
    predicate), and results match the unpartitioned join."""
    fact = spark.createDataFrame(
        [(i, "p%d" % (i % 10), float(i)) for i in range(2000)],
        "id long, pk string, v double",
    )
    fact.write.mode("overwrite").partitionBy("pk").parquet(str(tmp_path / "fact"))
    dim = spark.createDataFrame(
        [("p%d" % i, "keep" if i < 3 else "drop") for i in range(10)],
        "pk string, cat string",
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("cat") == "keep")
    j = f.join(d, "pk").groupBy("pk").agg(F.sum("v").alias("sv"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    got = {r["pk"]: r["sv"] for r in j.collect()}
    want = {
        r["pk"]: r["sv"]
        for r in fact.join(dim.filter(F.col("cat") == "keep"), "pk")
        .groupBy("pk").agg(F.sum("v").alias("sv")).collect()
    }
    assert got == want and len(got) == 3


def test_join_ivm_matches_full_recompute_over_refreshes(spark, tmp_path):
    """ivm_init + two successive ivm_refresh calls (a-only, then both
    deltas) reconstruct exactly the full batch join -- the three-term
    delta decomposition loses and duplicates nothing."""
    from uofi_payroll_etl_main_spark.io import ivm_init, ivm_refresh

    a_all = spark.createDataFrame(
        [(i % 20, i, float(i)) for i in range(300)], "k long, id long, v double"
    )
    b_all = spark.createDataFrame(
        [(i, "g%d" % (i % 4)) for i in range(20)], "k long, g string"
    )
    root = str(tmp_path / "ivm")
    ivm_init(
        spark, root,
        a_all.filter(F.col("id") < 100),
        b_all.filter(F.col("k") < 10),
        "k",
    )
    ivm_refresh(
        spark, root, "k",
        delta_a=a_all.filter((F.col("id") >= 100) & (F.col("id") < 200)),
    )
    ivm_refresh(
        spark, root, "k",
        delta_a=a_all.filter(F.col("id") >= 200),
        delta_b=b_all.filter(F.col("k") >= 10),
    )
    view = spark.read.parquet(root + "/view.parquet")
    got = sorted((r["id"], r["g"]) for r in view.collect())
    want = sorted((r["id"], r["g"]) for r in a_all.join(b_all, "k").collect())
    assert got == want and len(got) == 300


def test_join_ivm_zset_retraction_cancels(spark, tmp_path):
    """Signed IVM: deleting a previously-inserted left row (and a right
    row) through -1 deltas nets the view to exactly the batch join of
    the post-delete bases -- retraction flows through the join."""
    from uofi_payroll_etl_main_spark.io import (
        ivm_init_zset,
        ivm_read_zset,
        ivm_refresh_zset,
    )

    a = spark.createDataFrame(
        [(i % 5, i) for i in range(50)], "k long, id long"
    )
    b = spark.createDataFrame([(i, "g%d" % i) for i in range(5)], "k long, g string")
    root = str(tmp_path / "zivm")
    ivm_init_zset(spark, root, a, b, "k")
    # delete ids divisible by 10 and right key 3
    da = a.filter(F.col("id") % 10 == 0).withColumn("__mult", F.lit(-1).cast("long"))
    db = b.filter(F.col("k") == 3).withColumn("__mult", F.lit(-1).cast("long"))
    ivm_refresh_zset(spark, root, "k", delta_a=da, delta_b=db)
    net = ivm_read_zset(spark, root)
    got = sorted((r["id"], r["g"]) for r in net.collect())
    want = sorted(
        (r["id"], r["g"])
        for r in a.filter(F.col("id") % 10 != 0)
        .join(b.filter(F.col("k") != 3), "k")
        .collect()
    )
    assert got == want
    assert all(r["__mult"] == 1 for r in net.collect())


def test_ivm_compact_zset_preserves_answer_and_shrinks(spark, tmp_path):
    """ivm_compact_zset: netting + rewrite changes neither the netted
    view nor subsequent refresh results, and drops the cancelled rows
    from storage."""
    from uofi_payroll_etl_main_spark.io import (
        ivm_compact_zset,
        ivm_init_zset,
        ivm_read_zset,
        ivm_refresh_zset,
    )

    a = spark.createDataFrame([(i % 4, i) for i in range(40)], "k long, id long")
    b = spark.createDataFrame([(i, "g%d" % i) for i in range(4)], "k long, g string")
    root = str(tmp_path / "civm")
    ivm_init_zset(spark, root, a, b, "k")
    da = a.filter(F.col("id") < 20).withColumn("__mult", F.lit(-1).cast("long"))
    ivm_refresh_zset(spark, root, "k", delta_a=da)
    before = sorted((r["id"], r["g"]) for r in ivm_read_zset(spark, root).collect())
    raw_before = spark.read.parquet(root + "/view.parquet").count()
    ivm_compact_zset(spark, root)
    after = sorted((r["id"], r["g"]) for r in ivm_read_zset(spark, root).collect())
    raw_after = spark.read.parquet(root + "/view.parquet").count()
    assert before == after
    assert raw_after < raw_before  # cancelled rows physically gone
    assert raw_after == len(after)
    # refresh still works against compacted bases
    ivm_refresh_zset(
        spark, root, "k",
        delta_a=spark.createDataFrame([(0, 100, 1)], "k long, id long, __mult long"),
    )
    final = {r["id"] for r in ivm_read_zset(spark, root).collect()}
    assert 100 in final and len(final) == len(after) + 1


def test_bucketed_table_rejects_mismatched_reregister(spark, tmp_path):
    """bucketed_table re-register validation (ADVICE r7): the (key,
    buckets) actually written are persisted in _bucket_spec.json and a
    fresh-session re-register with a DIFFERENT bucket count or key
    raises instead of registering a layout that would silently corrupt
    bucket-pruned joins."""
    import pytest as _pytest

    from uofi_payroll_etl_main_spark.io import bucketed_table

    df = spark.createDataFrame(
        [(i % 10, float(i)) for i in range(100)], "k long, v double"
    )
    bucketed_table(spark, df, str(tmp_path / "t"), "tbkt_spec", "k", buckets=4)
    spark.sql("DROP TABLE tbkt_spec")
    with _pytest.raises(ValueError, match="BUCKETS"):
        bucketed_table(spark, df, str(tmp_path / "t"), "tbkt_spec", "k", buckets=8)
    with _pytest.raises(ValueError, match="corrupt"):
        bucketed_table(spark, df, str(tmp_path / "t"), "tbkt_spec", "v", buckets=4)
    # the matching spec still re-registers fine
    t = bucketed_table(spark, df, str(tmp_path / "t"), "tbkt_spec", "k", buckets=4)
    assert t.count() == 100
    # ADVICE r8: validation also fires when the table is ALREADY in the
    # session catalog -- a mismatched caller must not get the existing
    # table under a spec it didn't ask for
    with _pytest.raises(ValueError, match="BUCKETS"):
        bucketed_table(spark, df, str(tmp_path / "t"), "tbkt_spec", "k", buckets=16)
    # and the sidecar write is atomic: no .tmp debris next to the spec
    assert not (tmp_path / "t" / "_bucket_spec.json.tmp").exists()
    assert (tmp_path / "t" / "_bucket_spec.json").exists()
    spark.sql("DROP TABLE tbkt_spec")


def test_zonemap_prunes_files_and_preserves_answer(spark, tmp_path):
    """write_zonemapped + read_zonemap_pruned: a range read skips files
    whose zones are disjoint, keeps every matching row (pruning is
    recall-complete), handles null zones and boundary values, and the
    sidecar lands atomically."""
    import json

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        write_zonemapped,
        zonemap_candidate_files,
    )

    root = str(tmp_path / "zm")
    df = spark.createDataFrame(
        [(i, float(i) * 2) for i in range(1000)], "k long, v double"
    )
    write_zonemapped(df, root, "k", n_files=10)

    assert not (tmp_path / "zm" / "_zonemap.json.tmp").exists()
    zm = json.load(open(tmp_path / "zm" / "_zonemap.json"))
    assert zm["stat_cols"] == ["k"] and len(zm["files"]) == 10

    # interior range: most files pruned, answer identical to full scan
    kept, total = zonemap_candidate_files(root, "k", 100, 199)
    assert total == 10 and 1 <= len(kept) <= 3
    got = sorted(
        r.k for r in read_zonemap_pruned(spark, root, "k", 100, 199).collect()
    )
    assert got == list(range(100, 200))  # boundaries inclusive, no loss

    # out-of-range: zero files, empty result, correct schema
    kept, _ = zonemap_candidate_files(root, "k", 5000, 6000)
    assert kept == []
    empty = read_zonemap_pruned(spark, root, "k", 5000, 6000)
    assert empty.count() == 0 and empty.columns == ["k", "v"]

    # all-null zone file is skippable: a range predicate never matches NULL
    root2 = str(tmp_path / "zm_null")
    df2 = spark.createDataFrame(
        [(None, 1.0)] * 5 + [(7, 2.0)] * 5, "k long, v double"
    )
    write_zonemapped(df2, root2, "k", n_files=2)
    kept2, total2 = zonemap_candidate_files(root2, "k", 0, 100)
    assert total2 == 2 and len(kept2) == 1
    assert read_zonemap_pruned(spark, root2, "k", 0, 100).count() == 5

    # date zones round-trip through the ISO-string domain
    import datetime

    root3 = str(tmp_path / "zm_date")
    d0 = datetime.date(2020, 1, 1)
    df3 = spark.createDataFrame(
        [(d0 + datetime.timedelta(days=i), i) for i in range(100)],
        "d date, i long",
    )
    write_zonemapped(df3, root3, "d", n_files=5)
    out = read_zonemap_pruned(
        spark, root3, "d", datetime.date(2020, 2, 1), datetime.date(2020, 2, 10)
    )
    assert out.count() == 10
    kept3, _ = zonemap_candidate_files(
        root3, "d", datetime.date(2020, 2, 1), datetime.date(2020, 2, 10)
    )
    assert len(kept3) < 5


def test_compaction_plan_ffd_properties():
    """compaction_plan: deterministic FFD -- (size desc, name asc)
    order, first open bin with room, oversize files get singleton
    bins, every file assigned exactly once, no bin over target (except
    singletons)."""
    from uofi_payroll_etl_main_spark.layout import compaction_plan

    files = [("a", 70), ("b", 40), ("c", 40), ("d", 30), ("e", 20), ("f", 150)]
    plan = compaction_plan(files, target_bytes=100)
    by_file = {p["file"]: p["bin"] for p in plan}
    assert len(by_file) == len(files)
    # oversize 'f' (150 >= 100) is a singleton
    fbin = by_file["f"]
    assert [p["file"] for p in plan if p["bin"] == fbin] == ["f"]
    # every non-singleton bin fits the target
    from collections import defaultdict

    tot = defaultdict(int)
    for p in plan:
        tot[p["bin"]] += p["bytes"]
    for b, s in tot.items():
        if b != fbin:
            assert s <= 100, (b, s)
    # FFD on these sizes packs the 5 small files into 2 bins + 1 singleton
    assert len(tot) == 3
    # deterministic: same input (any order) -> same plan
    assert compaction_plan(list(reversed(files)), 100) == plan


def test_compact_parquet_dir_preserves_rows_and_shrinks_files(spark, tmp_path):
    from uofi_payroll_etl_main_spark.layout import compact_parquet_dir

    src = str(tmp_path / "many")
    df = spark.createDataFrame(
        [(i, f"v{i % 7}") for i in range(5000)], "k long, v string"
    )
    df.repartition(20).write.parquet(src)
    import os

    n_src = sum(1 for n in os.listdir(src) if n.endswith(".parquet"))
    assert n_src == 20
    sizes = sum(
        os.path.getsize(os.path.join(src, n))
        for n in os.listdir(src) if n.endswith(".parquet")
    )
    dst = str(tmp_path / "compact")
    plan = compact_parquet_dir(spark, src, dst, target_bytes=sizes // 3 + 1)
    n_bins = 1 + max(p["bin"] for p in plan)
    # one data file per bin, far fewer than the input count
    data_files = [
        os.path.join(root, n)
        for root, _, names in os.walk(dst)
        for n in names if n.endswith(".parquet")
    ]
    assert len(data_files) == n_bins < n_src
    # rows survive byte-for-byte (same multiset)
    back = spark.read.parquet(dst)
    assert back.drop("__bin").orderBy("k").collect() == df.orderBy("k").collect()


def test_zonemap_unmapped_column_falls_back_to_full_scan(spark, tmp_path):
    """A column the map never statted must keep EVERY file (conservative
    full scan), not silently prune them all; and an incremental
    update_zonemap with a different stat_cols set re-stats everything
    instead of leaving a half-widened map."""
    import json

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        update_zonemap,
        write_zonemapped,
        zonemap_candidate_files,
    )

    root = str(tmp_path / "zm")
    df = spark.createDataFrame(
        [(i, float(1000 - i)) for i in range(100)], "k long, v double"
    )
    write_zonemapped(df, root, "k", n_files=5)  # stats cover ONLY k

    # query on the unmapped column: every file kept, result complete
    kept, total = zonemap_candidate_files(root, "v", 990.0, 999.0)
    assert total == 5 and len(kept) == 5
    assert read_zonemap_pruned(spark, root, "v", 990.0, 999.0).count() == 10

    # widening stat_cols incrementally re-stats ALL files (self-healing)
    n = update_zonemap(spark, root, ["k", "v"])
    assert n == 5
    zm = json.load(open(tmp_path / "zm" / "_zonemap.json"))
    assert zm["stat_cols"] == ["k", "v"]
    assert all("v" in s for s in zm["files"].values())
    kept2, _ = zonemap_candidate_files(root, "v", 990.0, 999.0)
    assert len(kept2) < 5  # now genuinely prunable
    assert read_zonemap_pruned(spark, root, "v", 990.0, 999.0).count() == 10


def test_compact_version_publishes_optimized_snapshot(spark, tmp_path):
    """compact_version: the store's OPTIMIZE pass -- latest version
    rewritten as a new version with ~target-size files, rows identical,
    time travel to the small-file version intact, vacuum reclaims it."""
    from uofi_payroll_etl_main_spark.io import (
        compact_version,
        list_versions,
        read_version,
        vacuum_versions,
        write_version,
    )

    root = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(i, f"p{i % 13}") for i in range(20000)], "id long, v string"
    )
    # simulate per-commit debris: v1 lands as 16 small files
    assert write_version(df.repartition(16), root) == 1
    import os

    v1 = os.path.join(root, "v=1")
    n1 = sum(1 for n in os.listdir(v1) if n.endswith(".parquet"))
    assert n1 == 16
    total = sum(
        os.path.getsize(os.path.join(v1, n))
        for n in os.listdir(v1) if n.endswith(".parquet")
    )

    new_v, before, after = compact_version(spark, root, target_bytes=total // 3)
    assert (new_v, before) == (2, 16) and after <= 4

    # identical content, both versions readable
    assert read_version(spark, root, 2).orderBy("id").collect() == \
        read_version(spark, root, 1).orderBy("id").collect()
    assert list_versions(root) == [1, 2]
    # retention eventually reclaims the small-file version
    assert vacuum_versions(root, keep_latest=1) == [1]
    assert read_version(spark, root).count() == 20000


def test_zonemap_nan_stats_keep_file_not_prune(spark, tmp_path):
    """ADVICE r9: one NaN in a double column makes F.max record NaN;
    a NaN bound fails every ordered comparison, so the disjointness
    test must be written conservatively -- the file holding in-range
    rows is KEPT, never silently pruned (recall-completeness)."""
    import math
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        update_zonemap,
        zonemap_candidate_files,
    )

    root = str(tmp_path / "zm_nan")
    os.makedirs(root)
    # f1 holds in-range values AND a NaN -> its recorded hi is NaN
    pq.write_table(
        pa.table({"v": [float(i) for i in range(10)] + [math.nan]}),
        os.path.join(root, "f1.parquet"),
    )
    pq.write_table(
        pa.table({"v": [float(i) for i in range(100, 110)]}),
        os.path.join(root, "f2.parquet"),
    )
    assert update_zonemap(spark, root, ["v"], full=True) == 2

    kept, total = zonemap_candidate_files(root, "v", 0.0, 5.0)
    assert total == 2
    assert any(k.endswith("f1.parquet") for k in kept), (
        "NaN-statted file was pruned despite holding in-range rows"
    )
    # and the genuinely disjoint file still prunes
    assert not any(k.endswith("f2.parquet") for k in kept)
    got = sorted(
        r.v for r in read_zonemap_pruned(spark, root, "v", 0.0, 5.0).collect()
    )
    assert got == [float(i) for i in range(6)]


def test_zonemap_date_hi_bound_keeps_midnight_timestamp_file(spark, tmp_path):
    """ADVICE r9: a TIMESTAMP-statted zone probed with a datetime.date
    hi bound compared '...T00:00:00' > 'YYYY-MM-DD' in the string
    domain and falsely pruned a file whose min is exactly midnight of
    the hi date -- the residual engine filter WOULD match that row.
    The date hi bound now widens to end-of-day before comparing."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uofi_payroll_etl_main_spark.layout import (
        read_zonemap_pruned,
        update_zonemap,
        zonemap_candidate_files,
    )

    root = str(tmp_path / "zm_ts")
    os.makedirs(root)
    mid = datetime.datetime(1996, 6, 30, 0, 0, 0)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [mid, mid + datetime.timedelta(hours=6)],
                    type=pa.timestamp("us"),
                )
            }
        ),
        os.path.join(root, "f1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [datetime.datetime(1996, 8, 1, 12)], type=pa.timestamp("us")
                )
            }
        ),
        os.path.join(root, "f2.parquet"),
    )
    assert update_zonemap(spark, root, ["ts"], full=True) == 2

    lo, hi = datetime.date(1996, 6, 1), datetime.date(1996, 6, 30)
    kept, _ = zonemap_candidate_files(root, "ts", lo, hi)
    assert any(k.endswith("f1.parquet") for k in kept), (
        "midnight-of-hi-bound file was falsely pruned"
    )
    assert not any(k.endswith("f2.parquet") for k in kept)
    # engine semantics: date hi casts to midnight, so exactly ONE row
    # (the midnight one) matches -- pruning must agree with the filter
    assert read_zonemap_pruned(spark, root, "ts", lo, hi).count() == 1


def test_update_zonemap_refresh_restats_overwritten_names(spark, tmp_path):
    """update_zonemap(refresh=...): a writer that OVERWRITES an existing
    file name (replayed streaming batch) must be able to force a
    re-stat -- the purely incremental path would trust the stale bounds
    and falsely prune."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uofi_payroll_etl_main_spark.layout import (
        update_zonemap,
        zonemap_candidate_files,
    )

    root = str(tmp_path / "zm_rf")
    os.makedirs(root)
    f1 = os.path.join(root, "f1.parquet")
    pq.write_table(pa.table({"v": [float(i) for i in range(10)]}), f1)
    assert update_zonemap(spark, root, ["v"], full=True) == 1

    # overwrite the SAME name with entirely different content
    pq.write_table(pa.table({"v": [float(i) for i in range(1000, 1010)]}), f1)
    # plain incremental: name already mapped -> nothing re-statted
    assert update_zonemap(spark, root, ["v"]) == 0
    # forced refresh re-stats it and pruning sees the new bounds
    assert update_zonemap(spark, root, ["v"], refresh=["f1.parquet"]) == 1
    kept, _ = zonemap_candidate_files(root, "v", 1000.0, 1005.0)
    assert any(k.endswith("f1.parquet") for k in kept)
    kept2, _ = zonemap_candidate_files(root, "v", 0.0, 9.0)
    assert kept2 == []


def test_compact_parquet_dir_handles_uri_hostile_names(spark, tmp_path):
    """ADVICE r9: input_file_name() is URI-encoded, so a source file
    named with spaces/percent/plus/non-ASCII must still match the
    os.listdir-derived plan (the inner join would otherwise silently
    drop all its rows); the built-in row-count gate certifies it."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from uofi_payroll_etl_main_spark.layout import compact_parquet_dir

    src = str(tmp_path / "srcdir")
    os.makedirs(src)
    pq.write_table(
        pa.table({"k": list(range(100))}), os.path.join(src, "plain.parquet")
    )
    pq.write_table(
        pa.table({"k": list(range(100, 200))}),
        os.path.join(src, "my file+100%_é.parquet"),
    )
    dst = str(tmp_path / "dstdir")
    compact_parquet_dir(spark, src, dst, target_bytes=1 << 20)
    back = spark.read.parquet(dst)
    assert sorted(r.k for r in back.collect()) == list(range(200))
