"""Filesystem operations for the streaming modules' snapshot /
compaction / rotation state, routed through the **Hadoop FileSystem
API** (via the session's JVM gateway) instead of driver-local
``os``/``shutil``.

Why this exists (VERDICT r9 #2 / ADVICE r9): the four streaming
modules (:mod:`.budget_stream`, :mod:`.dedup_stream`,
:mod:`.drift_stream`, :mod:`.rp_stream`) and the keyed snapshot sink
(:mod:`.sinks`) keep small out-of-band state next to their parquet
output — batch-numbered snapshot directories, the ``_CURRENT`` pointer
file, write-aside rotation directories. The data itself always went
through ``spark.read/write`` (any URI works), but the state discovery
and swaps used ``os.listdir`` / ``shutil.move``, which on a non-local
``out_root`` (``hdfs://``, ``s3a://``) silently see an empty directory
— e.g. the budget admission controller would reset every source's
remaining budget each micro-batch and over-admit WITHOUT any error.
Routing every list/rename/delete/pointer-IO through
``Path.getFileSystem(hadoopConf)`` makes the exactly-once discipline
hold on whatever filesystem the URI names; a bare local path resolves
to ``RawLocalFileSystem`` and behaves exactly as before.

Semantics notes:

- :func:`rename_overwrite` is the pointer/rotation swap primitive.
  On the local filesystem Hadoop's ``rename`` is POSIX ``rename(2)``
  (atomic replace). On HDFS, ``rename`` onto an existing destination
  returns false, so the helper deletes the destination and renames —
  a small non-atomic window. Pointer READERS must not mistake that
  window for a cold start: ``sinks._current_dir`` retries with
  backoff and RAISES when the pointer stays unreadable while
  snapshots exist (ADVICE r10 — a single 50 ms retry was best-effort
  only); the drift monitor falls back to the complete ``_old``
  baseline instead. On
  object stores rename is copy+delete and never atomic; the
  write-aside + pointer discipline is exactly the pattern that stays
  CORRECT there (a torn observer sees the previous complete state or
  retries), even though it stops being instantaneous.
- Everything here is driver-side control-plane IO on catalog-sized
  state (≤ a handful of paths / one-line pointer files per batch);
  per-call py4j overhead is irrelevant next to a micro-batch.
"""

from __future__ import annotations

import time


def _fs_path(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf —
    the scheme in the URI (or fs.defaultFS for bare paths) picks the
    filesystem implementation."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def exists(spark, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def is_dir(spark, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())


def list_names(spark, path: str) -> list[str]:
    """Child basenames of ``path`` (the ``os.listdir`` shape); ``[]``
    when the directory is missing — the cold-start case every caller
    treats as 'no prior state'."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def mkdirs(spark, path: str) -> None:
    fs, p = _fs_path(spark, path)
    fs.mkdirs(p)


def delete(spark, path: str) -> None:
    """Recursive delete; no-op when missing (the ``shutil.rmtree``
    + existence-guard shape the rotation/recovery paths use)."""
    fs, p = _fs_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def rename(spark, src: str, dst: str) -> None:
    """Plain rename; raises when the filesystem refuses (missing
    source, existing destination on HDFS, cross-filesystem move)."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if not fs.rename(s, d):
        raise OSError(f"rename failed: {src} -> {dst}")


def replace_dir(spark, src: str, dst: str) -> None:
    """Whole-DIRECTORY replace: explicit delete-then-rename, the only
    portable form. NOT :func:`rename_overwrite`: Hadoop rename ONTO an
    existing directory can NEST src inside dst (HDFS moves src under a
    dst dir and returns true) instead of replacing it. The two metadata
    ops are the swap's only reader-visible window; both write-aside
    replay paths (:func:`.sinks.upsert_batch`,
    :func:`.bucketed_state.upsert_keyed_buckets`) route their swaps
    here so the invariant and its caveat live in one place (r14
    review)."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if fs.exists(d):
        fs.delete(d, True)
    if not fs.rename(s, d):
        raise OSError(f"rename failed: {src} -> {dst}")


def rename_overwrite(spark, src: str, dst: str) -> None:
    """Rename ``src`` onto ``dst``, replacing it if present. Atomic on
    the local filesystem (POSIX rename); on HDFS an existing
    destination forces delete-then-rename (readers retry across the
    window — see module docstring)."""
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if fs.rename(s, d):
        return
    if fs.exists(d):
        fs.delete(d, True)
        if fs.rename(s, d):
            return
    raise OSError(f"rename failed: {src} -> {dst}")


def read_text(spark, path: str, retries: int = 1) -> str | None:
    """UTF-8 contents of a (small) file, ``None`` when missing.
    ``retries`` re-checks after a short sleep — a reader that lands
    inside a non-atomic pointer swap (HDFS delete-then-rename) sees
    the file again on the next look."""
    fs, p = _fs_path(spark, path)
    for attempt in range(retries + 1):
        if fs.exists(p):
            ins = fs.open(p)
            try:
                reader = spark._jvm.java.io.BufferedReader(
                    spark._jvm.java.io.InputStreamReader(ins, "UTF-8")
                )
                lines = []
                line = reader.readLine()
                while line is not None:
                    lines.append(line)
                    line = reader.readLine()
                return "\n".join(lines)
            finally:
                ins.close()
        if attempt < retries:
            time.sleep(0.05)
    return None


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write a small control file via tmp + rename-overwrite (the
    ``os.replace`` pointer discipline, filesystem-portable)."""
    fs, _ = _fs_path(spark, path)
    tmp = f"{path}.tmp"
    _, tp = _fs_path(spark, tmp)
    out = fs.create(tp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    rename_overwrite(spark, tmp, path)
