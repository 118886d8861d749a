"""Compressed inverted index: VarByte/delta blocks with block-max metadata.

Spark-native restatement of the reference's final index generation
(``Lexicon::_writeBlocks``, ``query_processor/src/Lexicon.cpp:
100-236``): postings are cut into chunks of ``postings_per_chunk``
(=64), docIDs delta-gap encoded with the base reset per chunk, gaps
and tfs VarByte encoded, chunks greedily packed into blocks of at
most ``block_bytes`` (=64 KB) with parallel metadata arrays
(last docID / gap bytes / tf bytes per chunk).  The reference packs
one mmap'd file; we emit one **row per block** in a term-sharded
parquet table — Parquet column chunks + partition pruning play the
role of the byte offsets + mmap (SURVEY §4).

Block-max upgrade: alongside the reference's `lastDocIdList` skip
metadata we store per-chunk ``max_tf``, which (with df and corpus
stats) yields the BM25 upper bound each chunk needs for block-max
WAND pruning — metadata the reference writes but never uses
(SURVEY §2.12.2).

Skew: the encode groups are ``(term, seg)`` with ``seg = doc_id //
segment_docs``; a head term's postings land in many independent
groups, each bounded, and decode re-concatenates by (seg, block_id)
— segments are self-contained because every chunk starts with an
absolute docID.

The kernel runs as one streaming ``mapInPandas`` pass over
partitions that are hash-partitioned by (term, seg) and sorted by
(term, seg, doc_id): group state carries across Arrow batches, so
one Python call handles a whole partition (no per-group invocation
overhead at millions of terms).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import DEFAULT, EngineConfig
from cs6913_web_search_engines_spark.functions import varbyte

INDEX_SCHEMA = (
    "term string, seg long, block_id int, n_postings int, "
    "first_doc_id long, last_doc_id long, max_tf int, "
    "chunk_last_doc_ids array<long>, chunk_counts array<int>, "
    "chunk_max_tfs array<int>, doc_gaps binary, tfs binary"
)


def _encode_group(term: str, seg: int, doc_ids: np.ndarray,
                  tfs: np.ndarray, cfg: EngineConfig) -> list[dict]:
    """Encode one (term, seg) posting run into block rows."""
    chunk = cfg.postings_per_chunk
    n = doc_ids.size
    gaps = varbyte.delta_encode(doc_ids, chunk)
    rows: list[dict] = []
    # Greedy block packing: add whole chunks while total payload +
    # metadata stays under block_bytes (Lexicon.cpp:181-233 semantics,
    # 16 bytes of metadata per chunk like the reference's 3x uint32 +
    # amortized header).
    block: list[tuple[int, int, bytes, bytes, int]] = []  # (last_doc, count, gap_b, tf_b, max_tf)
    block_bytes = 0
    block_id = 0
    first_doc = int(doc_ids[0])

    def flush() -> None:
        nonlocal block, block_bytes, block_id, first_doc
        if not block:
            return
        rows.append({
            "term": term,
            "seg": seg,
            "block_id": block_id,
            "n_postings": int(sum(c for _, c, _, _, _ in block)),
            "first_doc_id": first_doc,
            "last_doc_id": int(block[-1][0]),
            "max_tf": int(max(m for *_, m in block)),
            "chunk_last_doc_ids": [int(d) for d, *_ in block],
            "chunk_counts": [int(c) for _, c, *_ in block],
            "chunk_max_tfs": [int(m) for *_, m in block],
            "doc_gaps": b"".join(g for _, _, g, _, _ in block),
            "tfs": b"".join(t for _, _, _, t, _ in block),
        })
        block_id += 1
        block = []
        block_bytes = 0

    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        gap_b = varbyte.encode(gaps[s:e])
        tf_b = varbyte.encode(tfs[s:e])
        sz = len(gap_b) + len(tf_b) + 16
        if block and block_bytes + sz > cfg.block_bytes:
            flush()
        if not block:
            first_doc = int(doc_ids[s])
        block.append((int(doc_ids[e - 1]), e - s, gap_b, tf_b, int(tfs[s:e].max())))
        block_bytes += sz
    flush()
    return rows


def _encode_stream(cfg: EngineConfig):
    """mapInPandas kernel with cross-batch group carry-over."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        key: tuple[str, int] | None = None
        docs_acc: list[np.ndarray] = []
        tfs_acc: list[np.ndarray] = []
        out: list[dict] = []

        def close_group() -> None:
            nonlocal docs_acc, tfs_acc
            if key is not None and docs_acc:
                d = np.concatenate(docs_acc)
                t = np.concatenate(tfs_acc)
                out.extend(_encode_group(key[0], key[1], d, t, cfg))
            docs_acc, tfs_acc = [], []

        for pdf in batches:
            if pdf.empty:
                continue
            terms = pdf["term"].values
            segs = pdf["seg"].values
            docs = pdf["doc_id"].values.astype(np.int64)
            tfs = pdf["tf"].values.astype(np.int64)
            # boundaries where (term, seg) changes
            change = np.empty(len(pdf), dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (segs[1:] != segs[:-1])
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], len(pdf))
            for s, e in zip(starts, ends):
                k = (terms[s], int(segs[s]))
                if k != key:
                    close_group()
                    key = k
                docs_acc.append(docs[s:e])
                tfs_acc.append(tfs[s:e])
            if len(out) >= 256:
                yield pd.DataFrame(out)
                out = []
        close_group()
        if out:
            yield pd.DataFrame(out)

    return fn


def shard_col(term=None, cfg: EngineConfig = DEFAULT):
    """Term shard: crc32(term) % n_shards.  CRC32 is chosen because the
    JVM (F.crc32) and Python (zlib.crc32) implementations agree
    bit-for-bit, so query-time shard pruning needs no Spark job."""
    term = F.col("term") if term is None else term
    return F.pmod(F.crc32(F.encode(term, "UTF-8")), F.lit(cfg.n_term_shards)).cast("int")


def py_shard(term: str, cfg: EngineConfig = DEFAULT) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % cfg.n_term_shards


def encode_index(postings: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Logical postings → compressed block rows (+ shard column).

    Physical plan: one hash shuffle on (term, seg) with in-partition
    sort — the distributed k-way merge — then a streaming encode pass.
    """
    with_seg = postings.withColumn(
        "seg", (F.col("doc_id") / F.lit(cfg.segment_docs)).cast("long")
    )
    arranged = (
        with_seg.repartition(cfg.run_partitions, "term", "seg")
        .sortWithinPartitions("term", "seg", "doc_id")
    )
    blocks = arranged.mapInPandas(_encode_stream(cfg), INDEX_SCHEMA)
    return blocks.withColumn("shard", shard_col(cfg=cfg))


def write_index(blocks: DataFrame, path: str) -> None:
    """Term-sharded layout: partition pruning on `shard` at query time."""
    blocks.write.partitionBy("shard").mode("overwrite").parquet(path)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

DECODED_SCHEMA = "term string, doc_id long, tf int"


def _decode_stream(cfg: EngineConfig, extra_cols: tuple[str, ...] = ()):
    chunk = cfg.postings_per_chunk

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms: list[str] = []
            extras: dict[str, list] = {c: [] for c in extra_cols}
            docs: list[np.ndarray] = []
            tfs: list[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                n = int(row.n_postings)
                gaps = varbyte.decode(bytes(row.doc_gaps), n)
                d = varbyte.delta_decode(gaps, chunk)
                t = varbyte.decode(bytes(row.tfs), n)
                terms.append(row.term)
                for c in extra_cols:
                    extras[c].append(getattr(row, c))
                docs.append(d)
                tfs.append(t)
            if not terms:
                yield pd.DataFrame(
                    {**{c: [] for c in extra_cols},
                     "term": [], "doc_id": [], "tf": []})
                continue
            counts = [d.size for d in docs]
            yield pd.DataFrame({
                **{c: np.repeat(np.array(extras[c], dtype=object), counts)
                   for c in extra_cols},
                "term": np.repeat(np.array(terms, dtype=object), counts),
                "doc_id": np.concatenate(docs),
                "tf": np.concatenate(tfs).astype(np.int32),
            })

    return fn


def decode_postings(blocks: DataFrame, cfg: EngineConfig = DEFAULT,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Block rows → (term, doc_id, tf).  Works on any filtered subset;
    segments/blocks decode independently (absolute chunk-leading docID).

    ``extra_cols`` are carried through row-wise (e.g. a ``query_id``
    tag so per-query block subsets stay per-query after decode).
    """
    cols = blocks.select(*extra_cols, "term", "n_postings", "doc_gaps", "tfs")
    schema = "".join(f"{c} string, " for c in extra_cols) + DECODED_SCHEMA
    return cols.mapInPandas(_decode_stream(cfg, extra_cols), schema)


def read_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def term_filter(spark: SparkSession, terms: list[str],
                cfg: EngineConfig = DEFAULT):
    """Predicate that prunes both shard partitions and term row groups."""
    if not terms:
        return F.lit(False)
    shards = sorted({py_shard(t, cfg) for t in terms})
    return F.col("shard").isin(shards) & F.col("term").isin(terms)
