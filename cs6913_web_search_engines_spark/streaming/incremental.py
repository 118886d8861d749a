"""Incremental (streaming) index build via Structured Streaming.

The reference's build is strictly batch (SURVEY §1.7: "no Structured
Streaming required"); at web scale the corpus *arrives* continuously
(new WARC drops), so the build must be incremental.  This module runs
the stage-1 tokenize→postings pass as a Structured Streaming job:

    readStream(parquet docs dir)
      → build_postings (same mapInPandas kernel as batch)
      → foreachBatch: append doc_id-tagged posting micro-runs

Each micro-batch appends a *posting run* — exactly the checkpointed
run unit the batch pipeline writes (operators/index_build.py), tagged
with the batch id for lineage.  Finalization (merge + block-encode)
is the unchanged batch stage over the accumulated runs, so

    streaming build ≡ batch build   (same runs → same index)

which the tests assert (lexicon equality).  ``foreachBatch`` is
at-least-once, so the run sink is made idempotent: each micro-batch
writes with dynamic partition overwrite keyed on its ``run=batch_id``
partition — a replayed batch *overwrites* its own run instead of
appending a duplicate.  Together with the streaming checkpoint
(offset log + batch commits) this yields effectively-exactly-once
runs — the streaming half of the north rule's "resumable from
per-partition checkpoints".

Finalization is *incremental*: ``_finalized.json`` records which runs
are already encoded; a drain encodes only newer runs and APPENDS
their block rows to the index (block rows decode independently —
absolute chunk-leading docIDs, SURVEY §2.9 — so a multi-generation
index answers queries identically), then re-aggregates the lexicon
from block metadata (a scan of the compact index, no decode).

Watermark/stateful operators are intentionally absent: postings are
append-only facts (no late-data semantics); dedup/compaction happen
at merge time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from cs6913_web_search_engines_spark.config import DEFAULT, EngineConfig
from cs6913_web_search_engines_spark.operators import index_build as ib

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_postings(spark: SparkSession, docs_dir: str,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming postings DataFrame from a parquet documents directory."""
    reader = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 1)
    )
    docs = reader.parquet(docs_dir)
    return ib.build_postings(docs)


def run_incremental_build(
    spark: SparkSession,
    docs_dir: str,
    out: str,
    cfg: EngineConfig = DEFAULT,
) -> dict:
    """Drain all available input (Trigger.AvailableNow), appending one
    posting-run per micro-batch, then finalize the compressed index
    incrementally (only runs not yet encoded).  Returns build stats."""
    import json

    runs_dir = os.path.join(out, "runs")
    ckpt_dir = os.path.join(out, "_stream_checkpoint")
    fin_path = os.path.join(out, "_finalized.json")
    if os.path.isfile(docs_dir):
        # The file stream source requires a directory; stage a
        # symlink (sandbox convenience — real deployments stream a
        # landing directory of WARC-derived parquet drops).
        src = os.path.join(out, "_src")
        os.makedirs(src, exist_ok=True)
        link = os.path.join(src, os.path.basename(docs_dir))
        if not os.path.exists(link):
            os.symlink(docs_dir, link)
        docs_dir = src
    postings = stream_postings(spark, docs_dir)

    def _append_run(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent sink: dynamic overwrite of exactly this batch's
        # run=<batch_id> partition — an at-least-once replay rewrites
        # the same run instead of duplicating it
        (
            batch_df.withColumn("run", F.lit(batch_id).cast("int"))
            .repartition(cfg.run_partitions)
            .sortWithinPartitions("term", "doc_id")
            .write.partitionBy("run")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(runs_dir)
        )

    q = (
        postings.writeStream.foreachBatch(_append_run)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from cs6913_web_search_engines_spark.operators import block_codec as bc

    # incremental finalize: encode only runs newer than the last
    # finalized snapshot, append their blocks to the index
    finalized: set[int] = set()
    if os.path.exists(fin_path):
        with open(fin_path) as f:
            finalized = set(json.load(f)["runs"])
    all_runs = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(runs_dir)
        if d.startswith("run=")
    )
    new_runs = [r for r in all_runs if r not in finalized]
    index_dir = os.path.join(out, "index")
    if new_runs:
        runs = (
            spark.read.parquet(runs_dir)
            .filter(F.col("run").isin(new_runs))
            .select("doc_id", "term", "tf")
        )
        blocks_new = bc.encode_index(runs, cfg)
        blocks_new.write.partitionBy("shard").mode("append").parquet(index_dir)
        with open(fin_path, "w") as f:
            json.dump({"runs": all_runs}, f)
    blocks = spark.read.parquet(index_dir)
    # lexicon re-agg is a scan of block METADATA only (no payload
    # decode; parquet column pruning drops the binary columns)
    lexicon = blocks.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.max("max_tf").alias("max_tf")
    )
    lexicon.write.mode("overwrite").parquet(os.path.join(out, "lexicon"))
    return {
        "n_batches": len(all_runs),
        "n_new_runs": len(new_runs),
        "n_postings": int(blocks.agg(F.sum("n_postings")).collect()[0][0] or 0),
        "out": out,
    }
