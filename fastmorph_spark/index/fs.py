"""Scheme-agnostic filesystem primitives over the Hadoop FileSystem API
(VERDICT r04 #4).

The compaction/purge swap protocol (write tmp -> validate -> journaled
rename swap) used to hard-require a driver-local index (os.rename) and
refuse anything else. These helpers route every directory operation
through ``Path.getFileSystem(hadoopConf)`` via the JVM gateway instead, so
the SAME code path serves file://, hdfs://, s3a://, or a schemeless path
under whatever fs.defaultFS resolves to. For file:// the Hadoop local
FileSystem contract (rename, recursive delete, exists) is identical to the
os-module behavior the swap was built on — which is also what makes the
local test suite a faithful exercise of the remote call path.

Semantics relied on by callers:
- ``fs_rename`` requires the destination to be ABSENT (callers delete
  stale targets first); Hadoop returns False instead of raising on most
  failures, so we raise loudly — a swap must never half-happen silently.
- Renames are atomic per-directory on HDFS and local FS. On object stores
  without atomic rename (raw S3A) the journaled-intent manifest row +
  recover_postings still bound the damage, but a metastore-transactional
  format (Iceberg) remains the better home there — documented trade, not
  a silent one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf), p, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p))


def fs_is_dir(spark: SparkSession, path: str) -> bool:
    fs, p, _ = _fs(spark, path)
    return bool(fs.exists(p)) and bool(fs.getFileStatus(p).isDirectory())


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; silent no-op when absent."""
    fs, p, _ = _fs(spark, path)
    if fs.exists(p):
        if not fs.delete(p, True):
            raise OSError(f"Hadoop FS delete failed: {path}")


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    """Directory rename; destination must not exist. Raises on failure
    (Hadoop signals most failures as a False return, not an exception)."""
    fs, p_src, jvm = _fs(spark, src)
    p_dst = jvm.org.apache.hadoop.fs.Path(dst)
    if not fs.rename(p_src, p_dst):
        raise OSError(f"Hadoop FS rename failed: {src} -> {dst}")


def fs_count_files(spark: SparkSession, path: str, suffix: str = ".parquet") -> int:
    """Recursive count of data files under ``path`` (0 when absent)."""
    fs, p, _ = _fs(spark, path)
    if not fs.exists(p):
        return 0
    it, n = fs.listFiles(p, True), 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(suffix):
            n += 1
    return n


def fs_mkdirs(spark: SparkSession, path: str) -> None:
    """Create ``path`` (and parents); no-op when it already exists —
    Hadoop ``mkdirs`` is idempotent. Needed because ``fs_rename``
    requires the DESTINATION'S PARENT to exist (local FS and HDFS both
    return False otherwise), so a file-move merge creates the target
    partition layer first."""
    fs, p, _ = _fs(spark, path)
    if not fs.mkdirs(p):
        raise OSError(f"Hadoop FS mkdirs failed: {path}")
