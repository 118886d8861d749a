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

which the tests assert (lexicon equality).  Spark's streaming
checkpoint (offset log + batch commits) supplies exactly-once run
appends: a crashed job resumes from the last committed micro-batch —
this is the streaming half of the north rule's "resumable from
per-partition checkpoints".

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
    from the accumulated runs.  Returns build stats."""
    runs_dir = os.path.join(out, "runs")
    ckpt_dir = os.path.join(out, "_stream_checkpoint")
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
        (
            batch_df.withColumn("run", F.lit(batch_id).cast("int"))
            .repartition(cfg.run_partitions)
            .sortWithinPartitions("term", "doc_id")
            .write.partitionBy("run").mode("append").parquet(runs_dir)
        )

    q = (
        postings.writeStream.foreachBatch(_append_run)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from cs6913_web_search_engines_spark.operators import block_codec as bc

    runs = spark.read.parquet(runs_dir).select("doc_id", "term", "tf")
    bc.write_index(bc.encode_index(runs, cfg), os.path.join(out, "index"))
    blocks = spark.read.parquet(os.path.join(out, "index"))
    lexicon = blocks.groupBy("term").agg(
        F.sum("n_postings").alias("df"), F.max("max_tf").alias("max_tf")
    )
    lexicon.write.mode("overwrite").parquet(os.path.join(out, "lexicon"))
    n_batches = spark.read.parquet(runs_dir).select("run").distinct().count()
    return {
        "n_batches": int(n_batches),
        "n_postings": int(blocks.agg(F.sum("n_postings")).collect()[0][0] or 0),
        "out": out,
    }
