"""Hadoop FileSystem operations for the layout-cache commit protocols.

The content-keyed layout caches (bucketed tables, z-order layouts,
streamed-manifest versions) were committed with ``os.rename`` /
``os.stat`` / ``os.listdir`` through round 6 — correct on a single
machine, dead on HDFS. This module routes every filesystem touch
through the Hadoop FileSystem API resolved from the path's scheme, so
the same protocol runs against ``file:`` URIs, plain local paths, and
``hdfs://`` without code changes.

Commit-protocol semantics on each backend:

* **HDFS**: ``FileSystem.rename`` is atomic within a namespace; the
  publish rename and the marker files behave exactly as locally.
* **local / file:**: served by a PYTHON fast path (r14): every py4j
  call is a socket round trip and byte payloads cross the bridge
  encoded — a single Delta deletion-vector read cost ~60 ms through
  the JVM stream vs ~0.05 ms via ``open()`` (measured; the native
  delta read paid ~0.6 s of pure RPC per plan build). The fast path
  preserves the Hadoop local-FS semantics the callers rely on:
  rename returns ``False`` on an existing destination (lost-race
  signal, never an exception), ``create`` makes parent dirs, mtimes
  are integer milliseconds (``File.lastModified`` truncation),
  ``makeQualified`` renders ``file:`` + absolute path.
* **S3A (caveat, documented not special-cased)**: S3 has NO atomic
  rename — ``rename`` is copy+delete, so the dir-rename publish is
  not a safe commit there. The protocol still degrades safely
  because every reader gates on a MARKER file (``_SUCCESS`` /
  ``_IDENT`` / the manifest ``latest`` pointer) that is written
  LAST: a half-copied dir is ignored, never served. For real S3
  deployments the layout root should live behind a consistent
  committer (S3A magic committer, or an HDFS/EFS scratch tier) —
  the standard lakehouse guidance.

The ``latest`` manifest pointer needs rename-WITH-OVERWRITE
(``os.replace`` semantics), which ``FileSystem.rename`` does not
offer; ``replace_file`` uses the ``FileContext`` API whose
``Options.Rename.OVERWRITE`` is atomic on HDFS and the local FS (the
local fast path is ``os.replace`` itself).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _is_local_uri(path: str) -> bool:
    if path.startswith("file:"):
        return True
    return "://" not in path and ":" not in path.split("/", 1)[0]


def _local_path(path: str) -> str:
    """file:/x, file:///x, or plain path → plain absolute-ish path."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        return rest if rest.startswith("/") else "/" + rest
    if path.startswith("file:"):
        return path[len("file:"):]
    return path


class Fs:
    """Thin wrapper over one resolved filesystem.

    All methods take/return PLAIN PATH STRINGS (any scheme the
    resolved filesystem serves); timestamps are integer milliseconds
    (Hadoop's resolution — coarser than ``st_mtime_ns``, which only
    changes the opaque cache-key strings). Local/file: paths are
    served by direct Python I/O (see module docstring); every other
    scheme goes through the JVM Hadoop FileSystem."""

    def __init__(self, spark: SparkSession, any_path: str):
        if any_path.startswith("file:"):
            self._local = True
        elif _is_local_uri(any_path):
            # schemeless paths resolve against fs.defaultFS — probe it
            # once per SparkContext (an RPC), then remember on the
            # context wrapper so fs_for stays RPC-free on hot paths
            sc = spark.sparkContext
            cached = getattr(sc, "_tsp_default_fs_local", None)
            if cached is None:
                cached = str(
                    sc._jsc.hadoopConfiguration().get(
                        "fs.defaultFS", "file:///"
                    )
                ).startswith("file:")
                sc._tsp_default_fs_local = cached
            self._local = cached
        else:
            self._local = False
        if self._local:
            self._jvm = None
            return
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()
        self._jfs = jvm.org.apache.hadoop.fs.Path(any_path).getFileSystem(
            self._conf
        )

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def qualified(self, path: str) -> str:
        if self._local:
            return "file:" + os.path.abspath(_local_path(path))
        return str(self._jfs.makeQualified(self._p(path)).toString())

    def exists(self, path: str) -> bool:
        if self._local:
            return os.path.exists(_local_path(path))
        return bool(self._jfs.exists(self._p(path)))

    def status(self, path: str) -> tuple[int, int] | None:
        """(size_bytes, mtime_ms) or None if the path is missing.
        For a directory, size is 0 and mtime is the dir's."""
        if self._local:
            try:
                st = os.stat(_local_path(path))
            except OSError:
                return None
            size = 0 if os.path.isdir(_local_path(path)) else st.st_size
            return int(size), int(st.st_mtime_ns // 1_000_000)
        try:
            st = self._jfs.getFileStatus(self._p(path))
        except Exception:  # FileNotFoundException via py4j
            return None
        return int(st.getLen()), int(st.getModificationTime())

    def list_names(self, path: str) -> list[str]:
        """Child entry names (not full paths); [] if missing."""
        if self._local:
            try:
                return os.listdir(_local_path(path))
            except OSError:
                return []
        try:
            statuses = self._jfs.listStatus(self._p(path))
        except Exception:
            return []
        return [str(s.getPath().getName()) for s in statuses]

    def is_dir(self, path: str) -> bool:
        if self._local:
            return os.path.isdir(_local_path(path))
        try:
            return bool(self._jfs.getFileStatus(self._p(path)).isDirectory())
        except Exception:
            return False

    def mkdirs(self, path: str) -> None:
        if self._local:
            os.makedirs(_local_path(path), exist_ok=True)
            return
        self._jfs.mkdirs(self._p(path))

    def delete(self, path: str) -> None:
        """Recursive delete, ignore-missing (shutil.rmtree
        ignore_errors analogue)."""
        if self._local:
            p = _local_path(path)
            if os.path.isdir(p) and not os.path.islink(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                try:
                    os.remove(p)
                except OSError:
                    pass
            return
        try:
            self._jfs.delete(self._p(path), True)
        except Exception:
            pass

    def rename(self, src: str, dst: str) -> bool:
        """Atomic publish rename (no overwrite). False = destination
        already exists / source missing — i.e. lost the race."""
        if self._local:
            s, d = _local_path(src), _local_path(dst)
            if os.path.exists(d) or not os.path.exists(s):
                return False
            try:
                os.rename(s, d)
                return True
            except OSError:
                return False
        try:
            return bool(self._jfs.rename(self._p(src), self._p(dst)))
        except Exception:
            return False

    def publish_dir(self, src: str, dst: str) -> bool:
        """Atomic build-dir publish: True iff ``src`` became ``dst``.

        Encapsulates a Hadoop rename trap: renaming onto an EXISTING
        directory does not fail — it moves ``src`` INSIDE ``dst``
        (``mv a b`` semantics). A loser of a publish race would nest
        its build into the winner's published layout. So: pre-check,
        rename, then verify no nested stray appeared (build dirs are
        ``*.build-{pid}`` names that never occur inside a legitimate
        layout); a stray is removed and the publish reports
        lost-race. The caller discards its build on False."""
        if self.exists(dst):
            return False
        if not self.rename(src, dst):
            return False
        nested = dst.rstrip("/") + "/" + src.rstrip("/").rsplit("/", 1)[-1]
        if self.exists(nested):
            self.delete(nested)
            return False
        return True

    def copy_dir(self, src: str, dst: str) -> None:
        """Recursive copy — no Spark job, so it is the right tool for
        metadata-sized trees (manifest version dirs); ``dst`` must not
        exist and becomes the copy."""
        if self._local:
            shutil.copytree(_local_path(src), _local_path(dst))
            return
        self._jvm.org.apache.hadoop.fs.FileUtil.copy(
            self._jfs, self._p(src), self._jfs, self._p(dst),
            False, True, self._conf,
        )

    def replace_file(self, src: str, dst: str) -> None:
        """``os.replace`` semantics for a single FILE via FileContext
        Options.Rename.OVERWRITE (atomic on HDFS and the local FS)."""
        if self._local:
            os.replace(_local_path(src), _local_path(dst))
            return
        jvm = self._jvm
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            self._p(dst).toUri(), self._conf
        )
        overwrite = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        arr = self._gateway.new_array(
            jvm.org.apache.hadoop.fs.Options.Rename, 1
        )
        arr[0] = overwrite
        fc.rename(self._p(src), self._p(dst), arr)

    def write_text(self, path: str, text: str) -> None:
        if self._local:
            p = _local_path(path)
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            with open(p, "w", encoding="utf-8") as f:
                f.write(text)
            return
        out = self._jfs.create(self._p(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        if self._local:
            p = _local_path(path)
            os.makedirs(os.path.dirname(p) or ".", exist_ok=True)
            with open(p, "wb") as f:
                f.write(data)
            return
        out = self._jfs.create(self._p(path), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()

    def read_bytes(self, path: str) -> bytes:
        """Whole-file binary read (metadata-sized files only — Delta
        deletion-vector sidecars, markers)."""
        if self._local:
            with open(_local_path(path), "rb") as f:
                return f.read()
        stream = self._jfs.open(self._p(path))
        try:
            return bytes(
                self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                    stream
                )
            )
        finally:
            stream.close()

    def read_text(self, path: str) -> str:
        if self._local:
            with open(_local_path(path), "r", encoding="utf-8") as f:
                return f.read()
        stream = self._jfs.open(self._p(path))
        try:
            return str(
                self._jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()


def fs_for(spark: SparkSession, path: str) -> Fs:
    """FileSystem handle for ``path``'s scheme (schemeless paths
    resolve to the default FS — local in tests, HDFS on a cluster)."""
    return Fs(spark, path)
