"""Manifest-pointer snapshot commits — object-store-safe maintenance.

The rename-based maintenance protocol (streaming finalize's gen-file
installs, ``compact_index``'s shard swap — ``streaming/incremental``)
is crash-safe only where rename is an atomic metadata operation
(POSIX, HDFS).  Object stores (s3a, gs, abfs) rename by copy+delete,
so this module provides the commit path those stores were designed
for — the same model Iceberg and Delta use:

* data files are **immutable and uniquely named** (Spark append-mode
  part files; never renamed, never mutated);
* a **manifest** (``_manifests/manifest-<version>-<uuid>.json``) lists
  the exact live index file set plus the maintenance bookkeeping
  (runs / gens / lexicon pointer) that ``_finalized.json`` carries in
  rename mode;
* a commit is ONE small-object write of ``_pointer.json`` naming the
  manifest — single-key PUT semantics: a reader sees the old or the
  new manifest, never a partial state.

Crash windows (pinned end-to-end by tests/test_manifest_commit.py on
a scheme-forced non-atomic store):

* **before the manifest write** — appended data files are
  unreferenced orphans; the next maintenance op's GC preamble deletes
  them (deletes are object-store-safe);
* **between manifest and pointer write** — roll-FORWARD recovery: the
  next WRITER adopts the highest-version valid manifest (all of its
  data files are in place, by write order) and re-points; readers
  keep seeing the old pointer until then — both states are complete;
* **a torn pointer** — possible on plain filesystems only
  (object-store PUTs land whole); recovery re-derives the pointer
  from the manifest directory.

Readers resolve the live file set through the pointer
(:func:`read_blocks`, :func:`read_lexicon`); ``QueryEngine`` does so
automatically when a pointer exists.  Single WRITER assumed (the
streaming checkpoint already implies one per ``out``); concurrent
committers would need a conditional PUT (If-Match) or a catalog lock,
exactly the service an Iceberg catalog provides — on a cluster with
Iceberg available, this layout maps onto an Iceberg table and
compaction becomes ``rewrite_data_files``.  Readers during a
maintenance op keep the contract rename mode documents: serve from an
engine opened before the op (its manifest's files are deleted only by
a LATER op's GC), re-open after.

Reference analog: the reference engine rewrites its single-node index
files in place (``IndexBuilder.cpp``); snapshot isolation for durable
shared storage is part of the Spark restatement (SURVEY §1.7).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from cs6913_web_search_engines_spark.sources.fsutil import FsShim

MANIFESTS_DIR = "_manifests"
POINTER = "_pointer.json"


def empty_state() -> dict:
    return {"version": 0, "index_files": [], "lexicon": None,
            "runs": [], "gens": [], "lex_gens": []}


class ManifestStore:
    """Manifest/pointer bookkeeping for one index root ``out``."""

    def __init__(self, spark: SparkSession, out: str,
                 fs: FsShim | None = None):
        self.fs = fs or FsShim(spark, out)
        self.out = out
        self.mdir = self.fs.join(out, MANIFESTS_DIR)
        self.ptr = self.fs.join(out, POINTER)

    # -- resolution -------------------------------------------------------
    def _candidates(self) -> list[tuple[int, str]]:
        if not self.fs.is_dir(self.mdir):
            return []
        out = []
        for name in self.fs.list_names(self.mdir):
            parts = name.split("-")
            if name.startswith("manifest-") and len(parts) >= 3:
                try:
                    out.append((int(parts[1]), name))
                except ValueError:
                    continue
        return sorted(out, reverse=True)

    def _load(self, name: str) -> dict | None:
        try:
            man = json.loads(self.fs.read_text(self.fs.join(self.mdir, name)))
        except Exception:
            # torn or unreadable object → invalid; GC (which removes
            # invalid manifests ABOVE the adopted version too) keeps
            # a skipped-then-readable manifest from ever resurrecting
            # files a lower-version adoption already GC'd
            return None
        return man if isinstance(man, dict) and "index_files" in man else None

    def current(self) -> dict | None:
        """The pointer's manifest — the reader view.  A missing or torn
        pointer (or one naming a vanished manifest) falls back to the
        highest-version valid manifest on disk."""
        ptr = self.fs.read_json_or_none(self.ptr)
        if ptr and isinstance(ptr.get("manifest"), str):
            man = self._load(ptr["manifest"])
            if man is not None:
                return man
        for _v, name in self._candidates():
            man = self._load(name)
            if man is not None:
                return man
        return None

    def roll_forward(self) -> dict | None:
        """The writer view: adopt the highest-version valid manifest
        (a crash between manifest and pointer write leaves the newer,
        fully-written manifest unreferenced — its data files are all
        in place, so rolling forward is the cheap direction) and heal
        the pointer to it."""
        best = None
        for _v, name in self._candidates():
            man = self._load(name)
            if man is not None:
                best = (name, man)
                break
        if best is None:
            return None
        name, man = best
        ptr = self.fs.read_json_or_none(self.ptr)
        if not ptr or ptr.get("manifest") != name:
            self.fs.put_text(self.ptr, json.dumps(
                {"manifest": name, "version": man["version"]}))
        return man

    def commit(self, prev: dict | None, **state) -> dict:
        """Write manifest version prev+1 (unique object name), then
        point the pointer at it — the single-key atomic step."""
        man = dict(empty_state() if prev is None else prev)
        man.update(state)
        man["version"] = (0 if prev is None else int(prev["version"])) + 1
        name = f"manifest-{man['version']}-{uuid.uuid4().hex[:12]}.json"
        self.fs.mkdirs(self.mdir)
        self.fs.put_text(self.fs.join(self.mdir, name), json.dumps(man))
        self.fs.put_text(self.ptr, json.dumps(
            {"manifest": name, "version": man["version"]}))
        return man

    # -- GC ---------------------------------------------------------------
    def gc(self, man: dict) -> int:
        """Delete everything the manifest does not reference: orphan
        index part files (crashed appends / compaction replacements),
        superseded lexicon dirs, manifests older than the current
        version.  Pure deletes — object-store-safe.  Writer-side only,
        AFTER roll_forward (so nothing newer-than-pointer exists)."""
        n = 0
        live = set(man["index_files"])
        for rel in list_index_files(self.fs, self.out):
            if rel not in live:
                self.fs.delete_file(self.fs.join(self.out, rel))
                n += 1
        for name in self.fs.list_names(self.out):
            if (name.startswith("_lex_") and name != man.get("lexicon")
                    and self.fs.is_dir(self.fs.join(self.out, name))):
                self.fs.delete_tree(self.fs.join(self.out, name))
                n += 1
        for v, name in self._candidates():
            # below the current version: superseded; above it: torn or
            # invalid (roll_forward adopts the highest VALID manifest,
            # so anything newer failed validation) — delete both
            if v != man["version"] or not self._load(name):
                self.fs.delete_file(self.fs.join(self.mdir, name))
                n += 1
        return n


def has_pointer(fs: FsShim, out: str) -> bool:
    """Whether ``out`` is manifest-committed (pointer or any
    manifest — a crash can leave the latter without the former)."""
    if fs.exists(fs.join(out, POINTER)):
        return True
    mdir = fs.join(out, MANIFESTS_DIR)
    return fs.is_dir(mdir) and any(
        n.startswith("manifest-") for n in fs.list_names(mdir))


def list_index_files(fs: FsShim, out: str) -> list[str]:
    """Relative paths ``index/shard=K/<name>.parquet`` of every data
    file physically present (manifest-referenced or not)."""
    index_dir = fs.join(out, "index")
    if not fs.is_dir(index_dir):
        return []
    rels = []
    for shard_name in fs.list_names(index_dir):
        if not shard_name.startswith("shard="):
            continue
        for f in fs.list_names(fs.join(index_dir, shard_name)):
            if f.endswith(".parquet"):
                rels.append(f"index/{shard_name}/{f}")
    return sorted(rels)


def adopt_in_place(spark: SparkSession, out: str,
                   fs: FsShim | None = None) -> dict:
    """Convert a rename-mode index (e.g. one built on HDFS/local and
    copied to an object store) to manifest commits: roll back any
    uncommitted generation files (pure deletes — the only part of the
    rename-mode repair a non-atomic store can run), then commit a
    manifest listing the current physical state.  No data moves."""
    fs = fs or FsShim(spark, out)
    ms = ManifestStore(spark, out, fs=fs)
    fin = fs.read_json_or_none(fs.join(out, "_finalized.json")) or {}
    committed = set(fin.get("gens", []))
    for rel in list_index_files(fs, out):
        f = rel.rsplit("/", 1)[1]
        if (f.startswith("gen-")
                and int(f.split("-", 3)[1]) not in committed):
            fs.delete_file(fs.join(out, rel))
    lex = "lexicon" if fs.is_dir(fs.join(out, "lexicon")) else None
    return ms.commit(
        None,
        index_files=list_index_files(fs, out),
        lexicon=lex,
        runs=sorted(fin.get("runs", [])),
        gens=sorted(committed),
        # absent lex_gens (pre-round-4 snapshot / crashed finalize)
        # means "unknown" → empty set forces the full re-agg repair on
        # the next lexicon update
        lex_gens=sorted(fin.get("lex_gens", [])),
    )


# -- readers ----------------------------------------------------------------

def _read_files(spark: SparkSession, fs: FsShim, out: str,
                rels: list[str], base: str) -> DataFrame:
    paths = [fs.join(out, r) for r in rels]
    return spark.read.option("basePath", fs.join(out, base)).parquet(*paths)


def read_blocks(spark: SparkSession, out: str,
                fs: FsShim | None = None) -> DataFrame | None:
    """Live block rows per the committed manifest (None when ``out``
    is not manifest-committed — callers fall back to the directory
    scan).  basePath keeps ``shard`` partition discovery (and its
    pruning) identical to the directory read."""
    fs = fs or FsShim(spark, out)
    if not has_pointer(fs, out):
        return None
    man = ManifestStore(spark, out, fs=fs).current()
    if man is None:
        return None
    if not man["index_files"]:
        from cs6913_web_search_engines_spark.operators import block_codec
        return spark.createDataFrame(
            [], block_codec.INDEX_SCHEMA + ", shard int")
    return _read_files(spark, fs, out, man["index_files"], "index")


def read_lexicon(spark: SparkSession, out: str,
                 fs: FsShim | None = None) -> DataFrame | None:
    fs = fs or FsShim(spark, out)
    if not has_pointer(fs, out):
        return None
    man = ManifestStore(spark, out, fs=fs).current()
    if man is None or not man.get("lexicon"):
        return None
    return spark.read.parquet(fs.join(out, man["lexicon"]))
