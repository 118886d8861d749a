"""Inverted-index build: logical postings, doc stats, lexicon, runs.

Spark-first restatement of the reference's three-stage build
(``main.cpp:118-135`` → parse / merge / compress, SURVEY §3.1):

* parse → :func:`build_postings` — one ``mapInPandas`` pass over the
  corpus computing per-(doc, term) frequencies *inside* the kernel
  (the map-side combine the reference gets from its per-doc map at
  ``IndexBuilder.cpp:62-110``).  No token-level shuffle ever happens.
* the 178-way heap merge (``IndexBuilder.cpp:268-352``) → the shuffle
  of ``repartition(term, seg)`` + ``sortWithinPartitions``: Spark's
  sort-based shuffle *is* a distributed k-way merge.
* page table (``PageTable.cpp:38-65``) → :func:`build_doc_stats`;
  lexicon (``Lexicon.cpp:279-297``) → :func:`build_lexicon`.

Skew: a head term ("the") appears in nearly every doc.  The group
key for all per-term work is ``(term, seg)`` where ``seg = doc_id //
segment_docs`` — deterministic range-salting that caps any single
group at ``segment_docs`` postings while keeping segments
concatenable in doc_id order (chunk delta bases reset per chunk, so
segments are self-contained; reference Lexicon.cpp:143-146).

Resumability: :func:`write_runs` writes posting runs partitioned by
run bucket with a per-run manifest (row counts, postings/sec,
lineage).  A re-run skips complete buckets — the Spark analog of the
reference's flag-gated stage re-runs (``config.h:44-48``).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import DEFAULT, EngineConfig
from cs6913_web_search_engines_spark.functions import tokenizer
from cs6913_web_search_engines_spark.sources.fsutil import FsShim


def build_postings(documents: DataFrame) -> DataFrame:
    """corpus(doc_id, text) → logical postings (doc_id, term, tf).

    Exactly one posting per (term, doc) pair — the reference
    guarantees the same by construction (`_calcWordFreq` aggregates
    per doc before `insertWord`, IndexBuilder.cpp:104-108).

    Inputs with fewer file splits than the cluster's parallelism are
    fanned out first, so the tokenizer kernel never idles cores (a
    4-file corpus would otherwise run 4 tasks on 32 slots; at real
    scale inputs have thousands of splits and this is a no-op).
    """
    docs = documents.select("doc_id", "text")
    if not documents.isStreaming:
        sc = documents.sparkSession.sparkContext
        target = sc.defaultParallelism
        if docs.rdd.getNumPartitions() < target:
            docs = docs.repartition(target)
    return docs.mapInPandas(
        tokenizer.postings_batches, tokenizer.POSTINGS_SCHEMA
    )


def subset_filter(documents: DataFrame, subset_ids: DataFrame) -> DataFrame:
    """S2 — build over a doc-id subset (HW3's 1M-doc subset runs,
    ``ranking_optimizer/src/IndexBuilder.cpp:126-149,169-176``): the
    reference loads the id set into a hash set and skips lines; here
    it is a broadcast left-semi join, map-side at any corpus size as
    long as the id list fits a broadcast (use a shuffle semi-join
    above that by dropping the hint)."""
    return documents.join(
        F.broadcast(subset_ids.select("doc_id")), "doc_id", "left_semi"
    )


def build_doc_stats(documents: DataFrame, postings: DataFrame) -> DataFrame:
    """Page-table analog: (doc_id, url?, byte_len, distinct_terms).

    byte_len mirrors ``dataLength`` (text byte length,
    IndexBuilder.cpp:151); distinct_terms mirrors ``wordCount``
    (distinct-term count, IndexBuilder.cpp:110,152).  Docs whose text
    yields no kept tokens still get a row (the reference writes a
    page-table row per input line).
    """
    counts = postings.groupBy("doc_id").agg(
        F.count("*").alias("distinct_terms")
    )
    # coalesce: null text → byte_len 0, matching the fused kernel
    # (fused≡staged identity must hold on null-text docs too)
    cols = [F.col("doc_id"),
            F.coalesce(F.octet_length("text"), F.lit(0)).alias("byte_len")]
    if "url" in documents.columns:
        cols.insert(1, F.col("url"))
    return (
        documents.select(*cols)
        .join(counts, "doc_id", "left")
        .fillna(0, subset=["distinct_terms"])
    )


def corpus_stats(doc_stats: DataFrame, cfg: EngineConfig = DEFAULT) -> dict:
    """Broadcast-scalar corpus aggregates (PageTable.cpp:8-14,101-105).

    avg_len follows the configured length norm: HW3 averages
    distinct-term counts, HW2 averages byte lengths (SURVEY §2.11).
    """
    len_col = "distinct_terms" if cfg.length_norm == "hw3" else "byte_len"
    row = doc_stats.agg(
        F.count("*").alias("total_docs"),
        F.avg(F.col(len_col).cast("double")).alias("avg_len"),
        F.min(len_col).alias("min_len"),
        F.max(len_col).alias("max_len"),
    ).collect()[0]
    return {
        "total_docs": row["total_docs"],
        "avg_len": float(row["avg_len"]),
        # doc-length range: tightens block-max score upper bounds
        # (operators/pruning.py) — no reference analog.
        "min_len": int(row["min_len"]),
        "max_len": int(row["max_len"]),
    }


def build_lexicon(postings: DataFrame) -> DataFrame:
    """(term, df, max_tf) — ``LexiconItem.docNum`` is the df used in
    the IDF (QueryProcessor.cpp:28); max_tf feeds block-max bounds
    (QueryProcessor.cpp:651-654)."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.max("tf").alias("max_tf"),
    )


# ---------------------------------------------------------------------------
# Posting runs: checkpointed stage-1 output with manifests (resumable)
# ---------------------------------------------------------------------------

def _bucket_counts(path: str,
                   spark: SparkSession | None = None) -> dict[int, tuple[int, int | None]]:
    """{bucket: (n_rows, n_bytes)} by summing parquet footer row
    counts + file sizes per ``run=<bucket>`` directory — metadata-only,
    no data scan.  Rows and BYTES per partition are the build metrics
    the checkpoint manifest records (skew in either flags a bad bucket
    function long before a query does).

    The footer fast path only works for local-filesystem paths; for
    URI schemes (hdfs://, s3a://) it falls back to a Spark
    ``groupBy(run).count()``, which AQE keeps cheap (footer-driven
    row-count stats make it near-metadata-only too; byte sizes are
    not visible to that path and come back None)."""
    if os.path.isdir(path):
        import pyarrow.parquet as pq

        counts: dict[int, tuple[int, int | None]] = {}
        for name in os.listdir(path):
            if not name.startswith("run="):
                continue
            bucket = int(name.split("=", 1)[1])
            total = nbytes = 0
            d = os.path.join(path, name)
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    full = os.path.join(d, f)
                    total += pq.ParquetFile(full).metadata.num_rows
                    nbytes += os.path.getsize(full)
            counts[bucket] = (total, nbytes)
        return counts
    if spark is None:
        raise ValueError(f"non-local runs path {path!r} needs a SparkSession "
                         "for the count fallback")
    rows = spark.read.parquet(path).groupBy("run").count().collect()
    return {int(r["run"]): (int(r["count"]), None) for r in rows}


def run_bucket(cfg: EngineConfig = DEFAULT):
    """Deterministic run bucket for a term: hash-mod, like the final
    shard but over `run_partitions` — each bucket is one resumable
    unit of stage-1 output.  md5-derived (functions/hashing.hash60)
    rather than xxhash64 so the DuckDB oracle can reproduce the
    bucket assignment exactly (cross-engine, same reason the term
    shard uses crc32 — block_codec.py term_shard)."""
    from cs6913_web_search_engines_spark.functions import hashing

    return F.pmod(hashing.hash60_col(F.col("term")),
                  F.lit(cfg.run_partitions)).cast("int")


def run_bucket_sql(cfg: EngineConfig = DEFAULT) -> str:
    """DuckDB twin of :func:`run_bucket` (oracle parity)."""
    from cs6913_web_search_engines_spark.functions import hashing

    return f"CAST({hashing.hash60_sql('term')} % {cfg.run_partitions} AS INT)"


def write_runs(
    postings: DataFrame,
    path: str,
    cfg: EngineConfig = DEFAULT,
    lineage: dict | None = None,
) -> dict:
    """Write doc_id-sorted posting runs partitioned by run bucket.

    The run files are the reference's intermediate 20 MB spill runs
    (``InvertedList.cpp:149-171``) promoted to a durable, resumable
    checkpoint: parquet partitioned by ``run=<bucket>`` plus a
    ``_manifest.json`` recording lineage + build metrics.  If the
    manifest already marks a bucket complete, it is skipped on re-run
    (kill-between-stages resumability, SURVEY §5).
    """
    fs = FsShim(postings.sparkSession, path)
    manifest_path = path.rstrip("/") + "/_manifest.json"
    # The bucket function is part of the checkpoint's identity: resuming
    # runs bucketed under a DIFFERENT hash or partition count would mix
    # assignments (every posting re-appended under its new bucket while
    # the old rows stay) — silent duplication.  Fingerprint it and wipe
    # a stale checkpoint instead of resuming it.
    #
    # The bucket hash is md5-derived (run_bucket) and computed per
    # POSTING row — deliberate: the only per-distinct-term alternative
    # (distinct → hash → broadcast-join) would re-scan `postings`,
    # which in build_full is the tokenizer kernel's output, i.e. it
    # would re-tokenize the corpus to save a short-string md5 whose
    # cost is a low single-digit % of the stage (shuffle + sort +
    # parquet write dominate).
    bucket_fn = f"hash60%{cfg.run_partitions}"
    done: set[int] = set()
    prev = fs.read_json_or_none(manifest_path)
    if prev is not None:
        if prev.get("bucket_fn") == bucket_fn:
            done = {b["bucket"] for b in prev.get("buckets", [])
                    if b.get("complete")}
        else:
            fs.wipe_children(path)

    t0 = time.time()
    tagged = postings.withColumn("run", run_bucket(cfg))
    if done:
        tagged = tagged.filter(~F.col("run").isin(*sorted(done)))
    (
        # range, not hash: `run` has only run_partitions distinct
        # values — hashing them over run_partitions slots leaves
        # Poisson holes; range assignment is one bucket per partition
        tagged.repartitionByRange(cfg.run_partitions, "run")
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("run")
        # dynamic overwrite, NOT append: a crash after the parquet job
        # commits but before the manifest below is written would make
        # an append-mode re-run duplicate every posting of the
        # re-written buckets; overwrite of exactly the written run=K
        # partitions is idempotent (bucket content is a deterministic
        # function of postings + cfg), so re-running the stage always
        # converges to the same bytes — exactly-once without a
        # transaction log
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )
    elapsed = time.time() - t0
    # per-bucket row counts from parquet FOOTERS (driver-side metadata
    # read) — no second scan of the runs table
    counts = _bucket_counts(path, postings.sparkSession)
    if fs.remote:
        # rows came from the Spark count fallback (no footer access
        # over a URI); byte sizes come from a Hadoop FS listing
        sizes = fs.bucket_bytes(path)
        counts = {b: (n, sizes.get(b)) for b, (n, _) in counts.items()}
    n_rows = sum(n for n, _ in counts.values())
    manifest = {
        "format": "postings-runs-v1",
        "bucket_fn": bucket_fn,
        "lineage": lineage or {},
        "elapsed_sec": elapsed,
        "total_postings": int(n_rows),
        "postings_per_sec": (n_rows / elapsed) if elapsed > 0 else None,
        "buckets": [
            {"bucket": int(b), "rows": int(n), "bytes": sz, "complete": True}
            for b, (n, sz) in sorted(counts.items())
        ],
    }
    fs.write_text(manifest_path, json.dumps(manifest, indent=1))
    return manifest


def read_runs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("doc_id", "term", "tf")


# ---------------------------------------------------------------------------
# Full build pipeline (cli + bench entrypoint)
# ---------------------------------------------------------------------------

def build_full(
    spark: SparkSession,
    docs: DataFrame,
    out: str,
    cfg: EngineConfig = DEFAULT,
    lineage: dict | None = None,
    checkpoint_runs: bool = True,
    fused: bool = False,
) -> dict:
    """Tokenize-once build: corpus → {index, lexicon, doc_stats,
    stats.json} under ``out``.

    Two physical strategies, identical output bytes:

    * ``checkpoint_runs=True`` (durable): postings runs are written as
      a resumable checkpoint (one pass over text); every downstream
      structure derives from the runs parquet, mirroring the
      reference's staged files (``main.cpp:118-135``).
    * ``fused=True`` (throughput): single-pass tokenize+encode kernel
      (block_codec.encode_fused) — one doc-shuffle, no posting
      shuffle; doc_stats fall out of the same pass.  Best
      postings/sec; resumability is per-job (Spark stage retry), not
      per-stage.

    The lexicon is aggregated from the *encoded blocks* (sum of
    n_postings per term) so it costs one scan of the compact index
    instead of another postings shuffle.
    """
    from pyspark.sql import Observation

    from cs6913_web_search_engines_spark.operators import block_codec as bc

    if fused and checkpoint_runs:
        raise ValueError(
            "--fused is incompatible with --runs: the fused single-pass "
            "build has no posting-run stage to checkpoint"
        )

    t0 = time.time()
    run_manifest = None
    # Corpus/lexicon scalar aggregates ride the write jobs via
    # ``observe`` — saves dedicated aggregate jobs whose fixed
    # scheduling cost dominates at high parallelism.
    len_col = "distinct_terms" if cfg.length_norm == "hw3" else "byte_len"
    obs_docs = Observation("corpus_stats")

    def _observe_docs(ds: DataFrame) -> DataFrame:
        return ds.observe(
            obs_docs,
            F.count("*").alias("total_docs"),
            F.avg(F.col(len_col).cast("double")).alias("avg_len"),
            F.min(len_col).alias("min_len"),
            F.max(len_col).alias("max_len"),
        )

    if fused and not checkpoint_runs:
        fused_df = bc.encode_fused(docs, cfg).cache()
        bc.write_index(bc.fused_blocks(fused_df), os.path.join(out, "index"))
        blocks = spark.read.parquet(os.path.join(out, "index"))
        doc_stats = bc.fused_doc_stats(fused_df)
        if "url" in docs.columns:
            doc_stats = doc_stats.join(docs.select("doc_id", "url"), "doc_id", "left")
        _observe_docs(doc_stats).write.mode("overwrite").parquet(
            os.path.join(out, "doc_stats"))
        fused_df.unpersist()
    else:
        postings = build_postings(docs)
        if checkpoint_runs:
            run_manifest = write_runs(
                postings, os.path.join(out, "runs"), cfg, lineage=lineage
            )
            postings = read_runs(spark, os.path.join(out, "runs"))
        else:
            postings = postings.cache()
        bc.write_index(bc.encode_index(postings, cfg), os.path.join(out, "index"))
        blocks = spark.read.parquet(os.path.join(out, "index"))
        doc_stats = build_doc_stats(docs, postings)
        _observe_docs(doc_stats).write.mode("overwrite").parquet(
            os.path.join(out, "doc_stats"))

    obs_lex = Observation("lexicon_stats")
    lexicon = blocks.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.max("max_tf").alias("max_tf")
    ).observe(obs_lex, F.sum("df").alias("n_postings"))
    lexicon.write.mode("overwrite").parquet(os.path.join(out, "lexicon"))
    drow = obs_docs.get
    stats = {
        "total_docs": int(drow["total_docs"]),
        "avg_len": float(drow["avg_len"] or 0.0),
        "min_len": int(drow["min_len"] or 0),
        "max_len": int(drow["max_len"] or 0),
    }
    elapsed = time.time() - t0

    n_postings = int(obs_lex.get["n_postings"] or 0)
    stats.update(
        {
            "n_postings": n_postings,
            "build_sec": elapsed,
            "postings_per_sec": n_postings / elapsed if elapsed else None,
            "runs": run_manifest is not None,
            "config": {
                "n_term_shards": cfg.n_term_shards,
                "segment_docs": cfg.segment_docs,
                "postings_per_chunk": cfg.postings_per_chunk,
                "block_bytes": cfg.block_bytes,
                "length_norm": cfg.length_norm,
            },
        }
    )
    FsShim(spark, out).write_text(os.path.join(out, "stats.json"),
                                  json.dumps(stats, indent=1))
    return stats
