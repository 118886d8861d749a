"""Filesystem shim for checkpoint/index maintenance metadata I/O.

Spark DataFrames read and write parquet through Hadoop's FileSystem
abstraction, but the engine's *maintenance* operations — run-checkpoint
manifests (``operators/index_build.write_runs``) and the compaction
shard swap (``streaming/incremental.compact_index``) — need plain
file ops: exists / read / write / rename / list / delete.  This shim
gives them one implementation that is ``os``-level for local paths and
the Hadoop FileSystem API (via the JVM gateway — the same client
Spark's own writers use) for URI paths (``hdfs://``, ``s3a://``,
``file://``), so those operations work end-to-end wherever the parquet
itself can live.  The ``file://`` scheme exercises the Hadoop branch
in local tests.

Atomicity caveat (documented, not hidden): ``rename`` is atomic on
POSIX filesystems and on HDFS, which is what the compaction swap's
crash-safety argument relies on; object stores (s3a) implement rename
as copy+delete, so a long-lived index there should prefer a table
format's own rewrite action (e.g. Iceberg rewrite_data_files) over
directory swaps.

Reference analog: the reference's builds simply fopen/rename local
files (IndexBuilder.cpp merge outputs); distributed durable storage
is part of the Spark restatement.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


class FsShim:
    """os-level ops for local paths, Hadoop FileSystem for URI paths."""

    # Schemes whose rename is a true atomic metadata operation — the
    # contract the compaction shard swap and atomic metadata writes
    # rely on.  Object stores (s3a, gs, abfs, ...) rename by
    # copy+delete and are deliberately NOT listed.
    ATOMIC_RENAME_SCHEMES = frozenset({"file", "hdfs", "viewfs"})

    def __init__(self, spark: SparkSession, base: str):
        self.remote = "://" in base
        self.scheme = base.split("://", 1)[0] if self.remote else ""
        if self.remote:
            jvm = spark._jvm
            self._jvm = jvm
            self._Path = jvm.org.apache.hadoop.fs.Path
            self._fs = self._Path(base).getFileSystem(
                spark._jsc.hadoopConfiguration())

    @staticmethod
    def scheme_atomic(path: str) -> bool:
        """Whether ``path``'s filesystem renames atomically — decided
        on the raw string so callers can refuse object stores BEFORE
        constructing a Hadoop client for them."""
        if "://" not in path:
            return True
        return path.split("://", 1)[0] in FsShim.ATOMIC_RENAME_SCHEMES

    def join(self, *parts: str) -> str:
        """Path join that is safe for both URI and local paths (one
        implementation — URI paths must not go through os.path.join
        semantics on non-POSIX hosts)."""
        if not self.remote:
            return os.path.join(*parts)
        return "/".join(p.rstrip("/") for p in parts)

    # -- files ------------------------------------------------------------
    def exists(self, path: str) -> bool:
        if not self.remote:
            return os.path.exists(path)
        return self._fs.exists(self._Path(path))

    def read_text(self, path: str) -> str:
        if not self.remote:
            with open(path) as f:
                return f.read()
        stream = self._fs.open(self._Path(path))
        try:
            # py4j copies byte[] by value, so a mutate-the-buffer read
            # loop can't work from Python; commons-io (on Spark's
            # classpath) drains the stream JVM-side in one call
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8")
        finally:
            stream.close()

    def read_json_or_none(self, path: str):
        """Best-effort JSON read for recovery metadata: the main file,
        else its ``.tmp`` sibling (the remote ``write_text`` has a
        delete→rename window where only the fully-written tmp exists —
        falling back to it turns that window from an O(index) redo
        into a no-op), else None.  Unparseable content (a tmp cut off
        mid-write) also returns None: treat-as-absent is the safe
        direction for every caller (idempotent re-work, never
        duplication)."""
        import json

        for p in (path, path + ".tmp"):
            if self.exists(p):
                try:
                    return json.loads(self.read_text(p))
                except Exception:
                    # unparseable OR unreadable (a torn out-of-band
                    # rewrite leaves Hadoop's local filesystem with a
                    # stale .crc sidecar → ChecksumException): same
                    # treat-as-absent direction either way
                    continue
        return None

    def write_text(self, path: str, text: str) -> None:
        """Atomic metadata write: full content to a temp sibling, then
        rename into place.  A crash mid-write can never leave a
        TRUNCATED manifest/snapshot (which would permanently break the
        resume paths these files serve) — the destination either holds
        the old complete version or the new one.  The remote branch
        has a delete→rename window where the destination is briefly
        missing; :meth:`read_json_or_none` bridges it via the tmp."""
        tmp = path + ".tmp"
        if not self.remote:
            with open(tmp, "w") as f:
                f.write(text)
                f.flush()
                # without the fsync the rename can become durable
                # before the data blocks, and a power loss leaves a
                # zero-length file — the very truncation this method
                # exists to rule out
                os.fsync(f.fileno())
            os.replace(tmp, path)
            return
        stream = self._fs.create(self._Path(tmp), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()
        # Hadoop rename refuses an existing destination: drop it first
        # (old-or-new-or-missing, never truncated)
        dst = self._Path(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        if not self._fs.rename(self._Path(tmp), dst):
            raise OSError(f"hadoop rename failed: {tmp} -> {path}")

    def put_text(self, path: str, text: str) -> None:
        """Direct single-object write — the manifest-pointer commit
        primitive.  On object stores a PUT lands whole or not at all
        (readers never see a partial object), which is exactly the
        atomicity the pointer swap needs WITHOUT rename.  On plain
        filesystems a crash mid-write CAN tear the file — the manifest
        protocol tolerates that (unique-named manifests are validated
        before use; a torn pointer re-derives from the manifest dir),
        so one primitive serves every scheme."""
        if not self.remote:
            with open(path, "w") as f:
                f.write(text)
                f.flush()
                os.fsync(f.fileno())
            return
        stream = self._fs.create(self._Path(path), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    # -- directories ------------------------------------------------------
    def is_dir(self, path: str) -> bool:
        if not self.remote:
            return os.path.isdir(path)
        p = self._Path(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def list_names(self, path: str) -> list[str]:
        if not self.remote:
            return os.listdir(path)
        return [st.getPath().getName()
                for st in self._fs.listStatus(self._Path(path))]

    def mkdirs(self, path: str) -> None:
        if not self.remote:
            os.makedirs(path, exist_ok=True)
            return
        self._fs.mkdirs(self._Path(path))

    def rename(self, src: str, dst: str) -> None:
        """Atomic on POSIX and HDFS; copy+delete on object stores
        (see module docstring)."""
        if not self.remote:
            os.rename(src, dst)
            return
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def delete_file(self, path: str) -> None:
        if not self.remote:
            if os.path.exists(path):
                os.remove(path)
            return
        p = self._Path(path)
        if self._fs.exists(p):
            self._fs.delete(p, False)

    def delete_tree(self, path: str) -> None:
        if not self.remote:
            shutil.rmtree(path, ignore_errors=True)
            return
        p = self._Path(path)
        if self._fs.exists(p):
            self._fs.delete(p, True)

    def wipe_children(self, base: str) -> None:
        if not self.remote:
            for name in os.listdir(base):
                full = os.path.join(base, name)
                shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
            return
        for st in self._fs.listStatus(self._Path(base)):
            self._fs.delete(st.getPath(), True)

    def bucket_bytes(self, base: str) -> dict[int, int]:
        """{bucket: total parquet bytes} under ``run=<bucket>/`` —
        remote-only: local callers get rows AND bytes in one pass from
        the parquet footers (index_build._bucket_counts)."""
        if not self.remote:
            raise ValueError(
                "bucket_bytes is the remote complement of the local "
                "parquet-footer fast path — use index_build."
                "_bucket_counts for local paths")
        sizes: dict[int, int] = {}
        for st in self._fs.listStatus(self._Path(base)):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("run=")):
                continue
            bucket = int(name.split("=", 1)[1])
            total = 0
            for f in self._fs.listStatus(st.getPath()):
                if f.getPath().getName().endswith(".parquet"):
                    total += f.getLen()
            sizes[bucket] = total
        return sizes
