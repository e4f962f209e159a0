"""Driver-side filesystem surgery routed through the Hadoop FileSystem
API instead of ``os``/``shutil``.

The snapshot/staging swap protocol (build aside, move live aside,
promote, drop old — ``table._write_snapshot``, the ANN retrain loops,
partition-preserving compaction) was POSIX-only: correct on local[32]
but unreachable at the 100 TB north star where the index lives on
HDFS/S3/ABFS.  Every helper here resolves the filesystem FROM THE PATH
(``Path.getFileSystem``), so a plain local path or ``file:/`` URI goes
through ``LocalFileSystem`` with identical semantics (test-asserted by
the existing crash-window suites) and an ``hdfs://``/``s3a://`` URI
goes to the real store with the same two-rename crash contract.

Semantics pinned deliberately:

- ``rename`` REFUSES an existing destination.  Hadoop's ``rename(src,
  dst)`` silently moves ``src`` INTO ``dst`` when ``dst`` is an
  existing directory (HDFS semantics) — the one behavioral difference
  from ``os.rename`` that would corrupt the swap protocol (promote
  would nest the new snapshot inside a half-deleted old one).  Every
  protocol site deletes the destination first, so an existing dst here
  is always a bug; fail loudly instead of nesting.
- ``rename``/``delete`` raise on a ``False`` return (Hadoop reports
  some failures as a boolean, not an exception) — a swap step that
  silently did nothing is exactly the kind of failure the two-rename
  contract cannot absorb.
- Object-store caveat, documented not hidden: S3 has no atomic
  directory rename (S3A emulates it as copy+delete).  The two-rename
  contract then degrades from "atomic step" to "bounded window";
  production state on S3 belongs in a transactional table format
  (Delta/Iceberg), while HDFS/ABFS renames stay atomic.  This module
  makes the protocol *reachable* and correct on rename-capable remote
  stores, which POSIX calls never were.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _jpath(spark: SparkSession, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark: SparkSession, path: str):
    """FileSystem instance resolved from the path's scheme (local path ->
    LocalFileSystem, hdfs:// -> DFS, ...) under the session's Hadoop
    conf.  Hadoop caches FileSystem instances per (scheme, authority,
    ugi), so this is a map lookup after the first call, not a
    connection per call."""
    return _jpath(spark, path).getFileSystem(spark._jsc.hadoopConfiguration())


def exists(spark: SparkSession, path: str) -> bool:
    return _fs(spark, path).exists(_jpath(spark, path))


def is_dir(spark: SparkSession, path: str) -> bool:
    fs = _fs(spark, path)
    p = _jpath(spark, path)
    return fs.exists(p) and fs.getFileStatus(p).isDirectory()


def delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; missing path is a no-op (the shutil.rmtree
    ``ignore_errors`` shape the swap protocol relies on)."""
    fs = _fs(spark, path)
    p = _jpath(spark, path)
    if not fs.exists(p):
        return
    if not fs.delete(p, True):
        raise IOError(f"hadoop delete returned false for {path!r}")


def rename(spark: SparkSession, src: str, dst: str) -> None:
    """os.rename-shaped move: refuses an existing destination (see module
    docstring — Hadoop would nest src inside an existing dst dir) and
    raises on Hadoop's boolean-false failure mode."""
    fs = _fs(spark, src)
    jsrc, jdst = _jpath(spark, src), _jpath(spark, dst)
    if fs.exists(jdst):
        raise IOError(
            f"rename destination exists: {dst!r} — the swap protocol "
            "deletes destinations before renaming; refusing the Hadoop "
            "move-into-directory fallback"
        )
    if not fs.rename(jsrc, jdst):
        raise IOError(f"hadoop rename returned false: {src!r} -> {dst!r}")


def recover_snapshot(spark: SparkSession, path: str) -> None:
    """Heal the swap protocol's crash debris at ``path``:

    - ``path`` absent + ``path__old`` present: a kill landed between the
      two renames — rename the old copy back (the data's only copy).
    - ``path`` present + ``path__old`` present: a kill landed after the
      promote but before the drop — the stale ``__old`` is a disposable
      full copy that would otherwise persist until the next rebuild
      (ADVICE round 10); drop it now.

    The FS-API twin of ``table._recover_snapshot`` for URI-capable call
    sites (the ANN retrain loops and index facades)."""
    old = path + "__old"
    if not exists(spark, old):
        return
    if exists(spark, path):
        delete(spark, old)
    else:
        rename(spark, old, path)
