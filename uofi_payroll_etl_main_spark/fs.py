"""Commit-protocol filesystem layer for the versioned snapshot store
and the atomic-swap writers.

The store's metadata operations (version listing, ``_SUCCESS`` probes,
stale-debris sweeps, rewrite-and-swap renames, incremental-ingest file
discovery) previously ran on the driver's local filesystem via
``os.listdir``/``os.rename``.  That split the commit protocol from the
data path the moment a store root moved to ``hdfs://`` or ``s3a://``:
``df.write.parquet`` would happily write remotely while the local
listing read the store as empty.

This module routes every metadata operation through the **Hadoop
FileSystem API of the active SparkSession**
(``org.apache.hadoop.fs.FileSystem`` via ``spark._jvm``), so the
protocol and the data path share one filesystem abstraction and the
store works against any URI the Spark data path accepts -- the
production posture the reference's single-machine pandas script never
needed (etl_payroll_pipeline.py writes with bare ``to_csv``).  When no
SparkSession is active (pure-driver utility calls), a local-filesystem
fallback with identical semantics applies; it accepts plain paths and
``file://`` URIs only.

Atomicity contract by scheme -- callers should know what they get:

- local / ``file://`` and ``hdfs://``: directory rename is atomic; the
  rewrite-and-swap pattern leaves either the old or the new dataset,
  plus a recoverable ``.__*_old`` directory across a crash window.
- ``s3a://`` and other object stores: "rename" is copy+delete, NOT
  atomic.  The versioned store's publish path (immutable ``v=N`` dirs
  made visible by ``_SUCCESS``) is still safe there -- it never renames
  -- but the in-place swap writers (merge_upsert / compact /
  delete_rows) should be replaced by a versioned publish on object
  stores.  The docstrings of those functions say the same.

Path canonicalization: Hadoop renders local paths as ``file:/x`` URIs;
``canon`` folds those back to plain ``/x`` so local behavior (manifest
contents, returned file lists, error messages) is byte-identical to the
historical os implementation.  Non-file schemes pass through untouched.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import SparkSession

__all__ = [
    "canon",
    "join",
    "listdir",
    "exists",
    "is_dir",
    "delete",
    "rename",
    "atomic_swap",
    "newest_mtime",
    "list_files",
    "mkdirs",
    "open_write",
    "write_bytes",
]


def canon(path: str) -> str:
    """``file:``-scheme URIs -> plain local paths; everything else
    passes through unchanged."""
    if path.startswith("file:"):
        parsed = urlparse(path)
        return parsed.path or path
    return path


def join(path: str, *parts: str) -> str:
    """Scheme-preserving path join (os.path.join breaks on ``://``)."""
    out = path.rstrip("/")
    for p in parts:
        out += "/" + p.strip("/")
    return out


def _local_only(path: str) -> str:
    """Fallback-mode path: plain or file:// only -- without a live JVM
    there is no way to reach a remote filesystem."""
    p = canon(path)
    if "://" in p:
        raise ValueError(
            f"no active SparkSession: cannot reach {path!r} without the "
            "Hadoop FileSystem API; start a session or use a local path"
        )
    return p


def _hadoop(path: str):
    """(fs, jvm) for `path` via the active session, or None to use the
    local-os fallback.  Unknown schemes (no Hadoop impl on the
    classpath) surface as IOError -- loud, never an empty listing."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    try:
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    except Exception as exc:  # py4j-wrapped UnsupportedFileSystemException
        raise IOError(f"no Hadoop filesystem for {path!r}: {exc}") from None
    return fs, jvm


def _jpath(jvm, path: str):
    return jvm.org.apache.hadoop.fs.Path(path)


def listdir(path: str) -> list[str]:
    """Sorted names of the direct children of `path`; [] when `path`
    is missing or not a directory (matching the store's historical
    os.listdir-with-isdir-guard behavior)."""
    h = _hadoop(path)
    if h is None:
        root = _local_only(path)
        if not os.path.isdir(root):
            return []
        return sorted(os.listdir(root))
    fs, jvm = h
    p = _jpath(jvm, path)
    if not fs.exists(p) or not fs.getFileStatus(p).isDirectory():
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def exists(path: str) -> bool:
    h = _hadoop(path)
    if h is None:
        return os.path.exists(_local_only(path))
    fs, jvm = h
    return bool(fs.exists(_jpath(jvm, path)))


def is_dir(path: str) -> bool:
    h = _hadoop(path)
    if h is None:
        return os.path.isdir(_local_only(path))
    fs, jvm = h
    p = _jpath(jvm, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def delete(path: str) -> None:
    """Recursive delete; missing paths are a no-op."""
    h = _hadoop(path)
    if h is None:
        p = _local_only(path)
        if os.path.isdir(p) and not os.path.islink(p):
            shutil.rmtree(p)
        elif os.path.exists(p):
            os.remove(p)
        return
    fs, jvm = h
    fs.delete(_jpath(jvm, path), True)


def rename(src: str, dst: str) -> None:
    """Rename `src` to `dst`; raises OSError on failure (Hadoop's
    boolean-False failure mode becomes an exception, never silent)."""
    h = _hadoop(src)
    if h is None:
        os.rename(_local_only(src), _local_only(dst))
        return
    fs, jvm = h
    if not fs.rename(_jpath(jvm, src), _jpath(jvm, dst)):
        raise OSError(f"rename failed: {src!r} -> {dst!r}")


def atomic_swap(path: str, tmp: str, swap: str) -> None:
    """The rewrite-and-swap commit: retire `path` to `swap`, promote
    `tmp` to `path`, drop `swap`.  A crash between the renames leaves
    the data at `swap` (recoverable by renaming back), never deleted.
    Atomic on local/HDFS directory rename; NOT atomic on object stores
    -- use the versioned store's publish path there instead."""
    rename(path, swap)
    rename(tmp, path)
    delete(swap)


def newest_mtime(path: str) -> float:
    """Epoch seconds of the newest FILE anywhere under `path`
    (recursive); the directory's own mtime when it holds no files.
    The liveness probe behind the store's in-flight-writer guard."""
    h = _hadoop(path)
    if h is None:
        p = _local_only(path)
        newest = max(
            (
                os.path.getmtime(os.path.join(dirpath, f))
                for dirpath, _dirs, files in os.walk(p)
                for f in files
            ),
            default=None,
        )
        return newest if newest is not None else os.path.getmtime(p)
    fs, jvm = h
    p = _jpath(jvm, path)
    newest = None
    it = fs.listFiles(p, True)
    while it.hasNext():
        m = it.next().getModificationTime() / 1000.0
        if newest is None or m > newest:
            newest = m
    if newest is None:
        newest = fs.getFileStatus(p).getModificationTime() / 1000.0
    return newest


def list_files(path: str) -> list[str]:
    """All file paths under `path`, recursive, sorted, in canonical
    form (plain paths for local roots, full URIs otherwise); [] when
    `path` is missing."""
    h = _hadoop(path)
    if h is None:
        root = _local_only(path)
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(d, f)
            for d, _dirs, fls in os.walk(root)
            for f in fls
        )
    fs, jvm = h
    p = _jpath(jvm, path)
    if not fs.exists(p):
        return []
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        out.append(canon(str(it.next().getPath())))
    return sorted(out)


def mkdirs(path: str) -> None:
    h = _hadoop(path)
    if h is None:
        os.makedirs(_local_only(path), exist_ok=True)
        return
    fs, jvm = h
    fs.mkdirs(_jpath(jvm, path))


# --------------------------------------------------------------------------
# Executor-safe writes.  The Hadoop helpers above ride spark._jvm, which
# exists only in the DRIVER process; a Python Data Source's write() runs
# in an executor-side Python worker with no JVM gateway at all.  pyarrow's
# filesystem layer (LocalFileSystem / S3FileSystem / HadoopFileSystem via
# FileSystem.from_uri) needs no gateway, so it is the one write path both
# sides can share: tasks create their tmp files AT THE DESTINATION
# FILESYSTEM, and the driver-side commit() promotes them with the Hadoop
# rename/delete helpers -- the classic FileOutputCommitter split, with no
# shared-local-disk assumption between driver and executors.
# --------------------------------------------------------------------------


def _pa_fs(path: str):
    """(pyarrow FileSystem, fs-relative path) for any URI.  Plain paths
    and ``file:`` URIs map to LocalFileSystem; other schemes resolve via
    ``FileSystem.from_uri`` (S3, HDFS-with-libhdfs, GCS...).  Unknown
    schemes raise IOError -- loud, never a silent local write."""
    from pyarrow import fs as pafs

    p = canon(path)
    if "://" in p:
        try:
            return pafs.FileSystem.from_uri(p)
        except Exception as exc:
            raise IOError(f"no pyarrow filesystem for {path!r}: {exc}") from None
    return pafs.LocalFileSystem(), p


def open_write(path: str):
    """Binary output stream at `path`, creating parent directories;
    usable from BOTH driver and executor processes (no JVM needed)."""
    fsys, rel = _pa_fs(path)
    parent = rel.rsplit("/", 1)[0] if "/" in rel else ""
    if parent:
        fsys.create_dir(parent, recursive=True)
    return fsys.open_output_stream(rel)


def write_bytes(path: str, payload: bytes) -> None:
    with open_write(path) as f:
        f.write(payload)


def open_read(path: str):
    """Seekable binary input stream at `path`; executor-safe (pyarrow,
    no JVM).  Works for plain paths, file:// URIs, and any scheme
    pyarrow resolves (S3, GCS, HDFS-with-libhdfs)."""
    fsys, rel = _pa_fs(path)
    return fsys.open_input_file(rel)


def listdir_any(path: str) -> list[str]:
    """Sorted names of direct children of `path` via pyarrow -- the
    executor-safe / sessionless sibling of `listdir` (which needs the
    driver JVM for remote schemes).  [] when missing / not a dir."""
    from pyarrow import fs as pafs

    fsys, rel = _pa_fs(path)
    info = fsys.get_file_info(rel)
    if info.type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(rel, recursive=False)
    return sorted(i.base_name for i in fsys.get_file_info(sel))
