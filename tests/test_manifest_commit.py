"""Manifest-pointer commits: object-store-safe finalize + compaction.

These tests force ``file://`` to count as a NON-atomic-rename scheme
(the object-store regime) so the whole protocol — append-only data
files, manifest write, single-key pointer PUT, roll-forward recovery,
GC — runs end-to-end on the local Hadoop client, with every crash
window simulated via the ``fault`` hook (VERDICT r4 #4
done-criterion)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import (
    block_codec as bc,
    index_build as ib,
)
from cs6913_web_search_engines_spark.sources import manifest_commit as mc
from cs6913_web_search_engines_spark.sources.fsutil import FsShim
from cs6913_web_search_engines_spark.streaming import incremental as si


@pytest.fixture
def nonatomic(monkeypatch):
    """Treat file:// as an object store (rename non-atomic) — commit
    mode 'auto' must then route every maintenance op through the
    manifest protocol while the bytes still live on local disk."""
    monkeypatch.setattr(FsShim, "ATOMIC_RENAME_SCHEMES",
                        frozenset({"hdfs", "viewfs"}))


class Boom(Exception):
    pass


def _batch_lexicon(documents):
    return sorted(map(tuple, ib.build_lexicon(
        ib.build_postings(documents)).collect()))


def _lex_rows(spark, out):
    return sorted(map(tuple, mc.read_lexicon(spark, out).collect()))


def test_manifest_finalize_matches_batch(spark, documents, tmp_path,
                                         nonatomic):
    # full → incremental → skip across three drains, all committed via
    # the pointer; after GC the physical file set equals the manifest.
    half_a = documents.filter(F.col("doc_id") % 2 == 0)
    half_b = documents.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "drops")
    stage = str(tmp_path / "stage_b")
    half_a.repartition(2).write.parquet(src)
    half_b.repartition(2).write.parquet(stage)
    out = "file://" + str(tmp_path / "idx")

    s1 = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s1["commit"] == "manifest" and s1["lexicon_mode"] == "full"
    assert s1["n_new_runs"] == 2
    import shutil
    for f in os.listdir(stage):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(stage, f), os.path.join(src, f))
    s2 = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s2["lexicon_mode"] == "incremental" and s2["n_new_runs"] == 2
    assert _lex_rows(spark, out) == _batch_lexicon(documents)
    s3 = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s3["n_new_runs"] == 0 and s3["lexicon_mode"] == "skip"
    # GC leaves exactly the manifest's files on disk, and the manifest
    # reader equals the plain directory read
    fs = FsShim(spark, out)
    man = mc.ManifestStore(spark, out, fs=fs).current()
    assert sorted(man["index_files"]) == mc.list_index_files(fs, out)
    got = sorted(map(tuple, mc.read_blocks(spark, out)
                     .select("term", "seg", "n_postings").collect()))
    disk = sorted(map(tuple, spark.read.parquet(out + "/index")
                      .select("term", "seg", "n_postings").collect()))
    assert got == disk


@pytest.mark.parametrize("window",
                         ["after-data", "after-lexicon", "after-commit"])
def test_manifest_finalize_crash_windows(spark, documents, tmp_path,
                                         nonatomic, window):
    # Kill the finalize at each crash point; the NEXT drain must
    # recover to exactly the batch totals (orphans GC'd, runs either
    # re-encoded or already committed — never duplicated).
    src = str(tmp_path / "drops")
    documents.repartition(2).write.parquet(src)
    out = "file://" + str(tmp_path / "idx")

    def fault(point):
        if point == window:
            raise Boom()

    with pytest.raises(Boom):
        si.run_incremental_build(spark, src, out, EngineConfig(),
                                 fault=fault)
    s = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s["commit"] == "manifest"
    if window == "after-commit":
        # pointer landed before the crash: the drain is committed
        assert s["n_new_runs"] == 0 and s["lexicon_mode"] == "skip"
    else:
        # orphaned data/lexicon files GC'd, runs re-encoded
        assert s["n_new_runs"] == 2
    assert _lex_rows(spark, out) == _batch_lexicon(documents)
    fs = FsShim(spark, out)
    man = mc.ManifestStore(spark, out, fs=fs).current()
    assert sorted(man["index_files"]) == mc.list_index_files(fs, out)


def test_manifest_pointer_crash_rolls_forward(spark, documents, tmp_path,
                                              nonatomic, monkeypatch):
    # Crash BETWEEN the manifest write and the pointer PUT: the
    # manifest (and all its data files) are complete, so the next
    # writer rolls forward — nothing re-encoded, pointer healed.
    src = str(tmp_path / "drops")
    documents.repartition(2).write.parquet(src)
    out = "file://" + str(tmp_path / "idx")
    allow = {"ok": False}
    real_put = FsShim.put_text

    def put(self, path, text):
        if path.endswith("_pointer.json") and not allow["ok"]:
            raise Boom()
        return real_put(self, path, text)

    monkeypatch.setattr(FsShim, "put_text", put)
    with pytest.raises(Boom):
        si.run_incremental_build(spark, src, out, EngineConfig())
    allow["ok"] = True
    s = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s["n_new_runs"] == 0 and s["lexicon_mode"] == "skip"
    assert _lex_rows(spark, out) == _batch_lexicon(documents)
    ptr = json.loads(open(str(tmp_path / "idx" / "_pointer.json")).read())
    assert ptr["manifest"].startswith("manifest-")  # pointer healed


def test_torn_pointer_recovers(spark, documents, tmp_path, nonatomic):
    # A torn pointer (possible on plain filesystems; object-store PUTs
    # land whole) must not brick readers or writers: readers fall back
    # to the manifest scan, the next writer heals the pointer.
    src = str(tmp_path / "drops")
    documents.repartition(1).write.parquet(src)
    out = "file://" + str(tmp_path / "idx")
    si.run_incremental_build(spark, src, out, EngineConfig())
    ptr_path = str(tmp_path / "idx" / "_pointer.json")
    with open(ptr_path, "w") as f:
        f.write('{"manifest": "manif')        # torn mid-write
    assert _lex_rows(spark, out) == _batch_lexicon(documents)  # reader ok
    s = si.run_incremental_build(spark, src, out, EngineConfig())
    assert s["n_new_runs"] == 0
    assert json.loads(open(ptr_path).read())["manifest"].startswith(
        "manifest-")


def test_manifest_compaction_restores_batch_layout(spark, documents,
                                                   tmp_path, nonatomic):
    # The object-store compaction path: fragment via three drains,
    # compact through the manifest (no renames), assert block-row
    # identity with the one-shot batch build — same bar as the
    # rename-mode test — plus physical GC of the replaced files.
    cfg = EngineConfig(segment_docs=1 << 20)
    src = str(tmp_path / "drops")
    out = "file://" + str(tmp_path / "idx")
    for third in range(3):
        (documents.filter(F.col("doc_id") % 3 == third)
         .repartition(1).write.mode("append").parquet(src))
        si.run_incremental_build(spark, src, out, cfg)

    def rows(df):
        return sorted(
            tuple(bytes(v) if isinstance(v, (bytes, bytearray))
                  else tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.select(*bc._BLOCK_COLS, "shard").collect()
        )

    want = bc.encode_index(ib.build_postings(documents), cfg)
    frag = mc.read_blocks(spark, out)
    assert (frag.filter(F.col("block_id") == 0).count()
            > want.filter(F.col("block_id") == 0).count())

    stats = si.compact_index(spark, out, cfg, max_generations=1)
    assert stats["compacted_groups"] > 0
    got = mc.read_blocks(spark, out)
    assert rows(got) == rows(want)
    # replaced files were physically deleted (best-effort delete ran)
    fs = FsShim(spark, out)
    man = mc.ManifestStore(spark, out, fs=fs).current()
    assert sorted(man["index_files"]) == mc.list_index_files(fs, out)
    # idempotent
    again = si.compact_index(spark, out, cfg, max_generations=1)
    assert again == {"compacted_groups": 0, "compacted_shards": 0}


def test_manifest_compaction_crash_windows(spark, documents, tmp_path,
                                           nonatomic):
    # Kill compaction after the replacement append (before commit):
    # the manifest still lists the fragmented files, a re-run GCs the
    # orphans and completes; then kill after commit: the replaced
    # files are gone from the manifest and the next op deletes them.
    cfg = EngineConfig(segment_docs=1 << 20)
    src = str(tmp_path / "drops")
    out = "file://" + str(tmp_path / "idx")
    for half in range(2):
        (documents.filter(F.col("doc_id") % 2 == half)
         .repartition(1).write.mode("append").parquet(src))
        si.run_incremental_build(spark, src, out, cfg)

    def boom_at(window):
        def fault(point):
            if point == window:
                raise Boom()
        return fault

    with pytest.raises(Boom):
        si.compact_index(spark, out, cfg, max_generations=1,
                         fault=boom_at("after-data"))
    stats = si.compact_index(spark, out, cfg, max_generations=1)
    assert stats["compacted_groups"] > 0
    want = bc.encode_index(ib.build_postings(documents), cfg)
    assert (mc.read_blocks(spark, out).count() == want.count())
    # second scenario on a fresh fragmented index: crash after commit
    out2 = "file://" + str(tmp_path / "idx2")
    src2 = str(tmp_path / "drops2")
    for half in range(2):
        (documents.filter(F.col("doc_id") % 2 == half)
         .repartition(1).write.mode("append").parquet(src2))
        si.run_incremental_build(spark, src2, out2, cfg)
    with pytest.raises(Boom):
        si.compact_index(spark, out2, cfg, max_generations=1,
                         fault=boom_at("after-commit"))
    # committed: reader already sees the compacted layout
    assert (sorted(map(tuple, mc.read_blocks(spark, out2)
                       .select("term", "seg", "block_id").collect()))
            == sorted(map(tuple, want
                          .select("term", "seg", "block_id").collect())))
    # next maintenance op completes the physical GC
    si.run_incremental_build(spark, src2, out2, cfg)
    fs = FsShim(spark, out2)
    man = mc.ManifestStore(spark, out2, fs=fs).current()
    assert sorted(man["index_files"]) == mc.list_index_files(fs, out2)


def test_adopt_rename_mode_index_on_object_store(spark, documents,
                                                 tmp_path, monkeypatch):
    # An index built with rename-mode maintenance then moved to an
    # object store: the first manifest-mode op adopts it in place
    # (pure metadata — no data moves) and compaction works where it
    # used to refuse with NotImplementedError.
    cfg = EngineConfig(segment_docs=1 << 20)
    src = str(tmp_path / "drops")
    out_local = str(tmp_path / "idx")
    for half in range(2):
        (documents.filter(F.col("doc_id") % 2 == half)
         .repartition(1).write.mode("append").parquet(src))
        si.run_incremental_build(spark, src, out_local, cfg)  # rename mode
    assert not os.path.exists(out_local + "/_pointer.json")
    monkeypatch.setattr(FsShim, "ATOMIC_RENAME_SCHEMES",
                        frozenset({"hdfs", "viewfs"}))
    out = "file://" + out_local
    stats = si.compact_index(spark, out, cfg, max_generations=1)
    assert stats["compacted_groups"] > 0
    want = bc.encode_index(ib.build_postings(documents), cfg)
    got = mc.read_blocks(spark, out)
    assert (sorted(map(tuple, got.select("term", "seg", "block_id",
                                         "n_postings").collect()))
            == sorted(map(tuple, want.select("term", "seg", "block_id",
                                             "n_postings").collect())))
