"""Round bench: index build + BM25 query throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-phase sec...}, "sf": ...,
   "docs_per_sec": ..., "postings_per_sec": ...}

The corpus is documents.parquet replicated deterministically
BENCH_REPLICATE times (doc_id' = doc_id * R + r) so build throughput
is measured on a meaningfully sized input while remaining a pure
function of the driver-provided table (no external data).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import time

from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.engine import QueryEngine
from cs6913_web_search_engines_spark.operators import index_build as ib
from cs6913_web_search_engines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "20"))
OUT = os.environ.get("BENCH_INDEX_DIR", "/tmp/bench_index")

BATCH_QUERIES = {
    f"q{i}": q
    for i, q in enumerate(
        [
            "data fast join", "the query window", "merge sort stream",
            "spark filter", "hash group row", "table scan part",
            "slow batch value", "customer line order",
        ]
    )
}
SINGLE_QUERY = "data fast join"


def main() -> None:
    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    cfg = EngineConfig()
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    r = spark.range(REPLICATE).withColumnRenamed("id", "copy")
    docs = (
        docs0.crossJoin(r)
        .withColumn("doc_id", F.col("doc_id") * REPLICATE + F.col("copy"))
        .drop("copy")
    )
    n_docs = docs.count()

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.time()
    stats = ib.build_full(spark, docs, OUT, cfg,
                          lineage={"source": SF_DIR, "replicate": REPLICATE})
    t_build = time.time() - t0
    n_postings = stats["n_postings"]

    # Preload (reference main.cpp:99-108 analog): lexicon + doc_stats
    # cached once; queries then use the block-max pruned fast path.
    t0 = time.time()
    eng = QueryEngine(spark, OUT, cfg)
    t_load = time.time() - t0

    # batch query set through the compressed index (one job)
    t0 = time.time()
    res = eng.search(BATCH_QUERIES)
    n_res = res.count()
    t_batch = time.time() - t0

    # single-query latency p50 (5 repeats, warm JVM)
    lat = []
    for _ in range(5):
        t0 = time.time()
        eng.search({"q": SINGLE_QUERY}).collect()
        lat.append(time.time() - t0)
    p50 = statistics.median(lat)

    total = t_build + t_load + t_batch + sum(lat)
    out = {
        "metric": "index-build + bm25-query wall time (sf docs x replicate)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            "build_index": round(t_build, 3),
            "engine_preload": round(t_load, 3),
            "query_batch8": round(t_batch, 3),
            "query_single_p50": round(p50, 3),
        },
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_docs": n_docs,
        "n_postings": n_postings,
        "n_results": n_res,
        "replicate": REPLICATE,
        "cpus": CPUS,
        "docs_per_sec": round(n_docs / t_build, 1),
        "postings_per_sec": round(n_postings / t_build, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
