"""Multi-generation query cost: the measured case for compact_index.

Each incremental drain appends one block-row generation per touched
(term, seg) group (streaming/incremental.py), so a hot term's
query-time block-row count grows linearly with drains.  This bench
builds the SAME corpus as G ∈ {1, 4, 16} generations (one
run_incremental_build drain per landing-batch), measures the
8-query distributed batch latency on each, then compacts the G=16
index back to one generation and measures again — the number that
justifies compaction's existence (VERDICT r3 #7).

Queries run through the segment kernel tier (the batch fast path)
with stats/doc_stats computed from the corpus — the streaming output
dir carries index/ + lexicon/ only.

Output: one JSON line appended to MULTIGEN_BENCH.json.

Usage: python bench_multigen.py     # ~4 min on local[32]
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.engine import build_len_lookup
from cs6913_web_search_engines_spark.operators import index_build as ib
from cs6913_web_search_engines_spark.operators import query_exec as qe
from cs6913_web_search_engines_spark.session import get_spark
from cs6913_web_search_engines_spark.streaming import incremental as si

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("MULTIGEN_REPLICATE", "20"))
GENS = [int(g) for g in
        os.environ.get("MULTIGEN_GENS", "1,4,16").split(",")]

QUERIES = {
    f"q{i}": q for i, q in enumerate(
        ["data fast join", "the query window", "merge sort stream",
         "spark filter", "hash group row", "table scan part",
         "slow batch value", "customer line order"])
}




def main() -> None:
    spark = get_spark(app_name="bench_multigen", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    base = "/dev/shm/multigen"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    # replicated corpus, split into max(GENS) landing files
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = spark.range(REPLICATE).withColumnRenamed("id", "copy")
    docs = (
        docs0.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") * REPLICATE + F.col("copy"))
        .drop("copy")
    )
    n_files = max(GENS)
    drops_all = f"{base}/drops_all"
    docs.repartition(n_files).write.parquet(drops_all)
    files = sorted(f for f in os.listdir(drops_all) if f.endswith(".parquet"))
    assert len(files) == n_files
    docs = spark.read.parquet(drops_all)
    doc_stats = ib.build_doc_stats(docs, ib.build_postings(docs))
    stats = ib.corpus_stats(doc_stats, cfg)
    norms = build_len_lookup(spark, doc_stats)
    # warm python workers
    spark.range(0, CPUS * 4, 1, CPUS * 4).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()

    def query_sec(out: str) -> tuple[float, int]:
        blocks = spark.read.parquet(f"{out}/index")
        lexicon = spark.read.parquet(f"{out}/lexicon")

        def run():
            return qe.search_segmented(
                spark, blocks, lexicon, stats, QUERIES, cfg,
                len_lookup=norms).count()

        run()                                   # warm
        t0 = time.time()
        n = run()
        dt = time.time() - t0
        # query-term block-row count: the fragmentation the kernel eats
        from cs6913_web_search_engines_spark.operators import block_codec as bc
        from cs6913_web_search_engines_spark.functions import tokenizer
        terms = sorted({t for q in QUERIES.values()
                        for t in tokenizer.split_query(q)})
        n_rows = blocks.filter(
            bc.term_filter(spark, terms, cfg)).count()
        assert n > 0
        return dt, n_rows

    levels = []
    last_out = None
    for g in GENS:
        out = f"{base}/idx_g{g}"
        land = f"{base}/land_g{g}"
        os.makedirs(land)
        per = n_files // g
        t0 = time.time()
        for i in range(g):
            for f in files[i * per:(i + 1) * per]:
                os.link(os.path.join(drops_all, f), os.path.join(land, f))
            si.run_incremental_build(spark, land, out, cfg)
        t_build = time.time() - t0
        t_q, n_rows = query_sec(out)
        levels.append({"generations": g, "build_sec": round(t_build, 3),
                       "query8_sec": round(t_q, 3),
                       "query_term_block_rows": n_rows})
        last_out = out
    # compact the most fragmented index back to one generation
    t0 = time.time()
    cstats = si.compact_index(spark, last_out, cfg, max_generations=1)
    t_compact = time.time() - t0
    t_q, n_rows = query_sec(last_out)
    levels.append({"generations": f"{max(GENS)}->compacted",
                   "build_sec": round(t_compact, 3),
                   "query8_sec": round(t_q, 3),
                   "query_term_block_rows": n_rows,
                   **cstats})
    row = {
        "metric": "query latency vs index generations (+post-compaction)",
        "replicate": REPLICATE,
        "queries": len(QUERIES),
        "levels": levels,
    }
    print(json.dumps(row))
    hist = []
    if os.path.exists("MULTIGEN_BENCH.json"):
        with open("MULTIGEN_BENCH.json") as f:
            hist = json.load(f)
    hist.append(row)
    with open("MULTIGEN_BENCH.json", "w") as f:
        json.dump(hist, f, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
