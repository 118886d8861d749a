"""spark-submit entrypoint: build the index, run queries.

North-rule surface: ``spark-submit --py-files engine.zip -m`` style
invocation on a cluster.  Subcommands:

    build  --input <documents.parquet|webpages dir> --out <index dir>
    query  --index <index dir> --query "dog cat" [--mode and|or] [-k 20]
    batch  --index <index dir> --queries <tsv query_id\tquery> --out <runs dir>

The ``build`` output directory layout::

    <out>/index/      term-sharded compressed block postings (parquet)
    <out>/lexicon/    (term, df, max_tf)
    <out>/doc_stats/  (doc_id, byte_len, distinct_terms)
    <out>/stats.json  {total_docs, avg_len, ...build metrics}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import index_build as ib


def _spark(args) -> SparkSession:
    from cs6913_web_search_engines_spark.session import get_spark

    return get_spark(app_name=f"cs6913-{args.cmd}", master=args.master)


def cmd_build(args) -> None:
    spark = _spark(args)
    cfg = EngineConfig(
        n_term_shards=args.shards, segment_docs=args.segment_docs
    )
    docs = spark.read.parquet(args.input)
    if "doc_id" not in docs.columns:
        from cs6913_web_search_engines_spark.sources import webpages

        docs = webpages.mint_doc_ids_scalable(webpages.extract_text(docs)
                                              .withColumnRenamed("extracted", "text"))
    if args.subset:
        # S2 — HW3-style subset build (IndexBuilder.cpp:126-149)
        docs = ib.subset_filter(docs, spark.read.parquet(args.subset))
    stats = ib.build_full(
        spark, docs, args.out, cfg,
        lineage={"input": args.input}, checkpoint_runs=args.runs,
        fused=args.fused,
    )
    print(json.dumps(stats))


def _engine(spark, index_dir: str, k: int):
    from cs6913_web_search_engines_spark.engine import QueryEngine
    from cs6913_web_search_engines_spark.sources.fsutil import FsShim

    fs = FsShim(spark, index_dir)
    stats = json.loads(fs.read_text(fs.join(index_dir, "stats.json")))
    cfg = EngineConfig(
        top_k=k,
        n_term_shards=stats["config"]["n_term_shards"],
        segment_docs=stats["config"]["segment_docs"],
    )
    # tiered planner: driver-local / segmented / exhaustive / pruned
    return QueryEngine(spark, index_dir, cfg, stats=stats)


def cmd_query(args) -> None:
    spark = _spark(args)
    eng = _engine(spark, args.index, args.k)
    t0 = time.time()
    res = eng.search({"q": args.query}, conjunctive=(args.mode == "and"))
    rows = res.orderBy("rank").collect()
    dt = time.time() - t0
    for r in rows:
        print(f"DocId: {r['doc_id']}, Score: {r['score']:.4f}, Rank: {r['rank']}")
    print(f"# {len(rows)} results in {dt:.3f}s", file=sys.stderr)


def cmd_batch(args) -> None:
    spark = _spark(args)
    eng = _engine(spark, args.index, args.k)
    qdf = spark.read.csv(args.queries, sep="\t",
                         schema="query_id string, query string")
    queries = {r["query_id"]: r["query"] for r in qdf.collect()}
    res = eng.search(queries, conjunctive=(args.mode == "and"))
    # 6-col TREC run rows (reference query_bm25.py:42-47)
    from cs6913_web_search_engines_spark.operators import evalmetrics as em

    run = em.trec_run(res, run_tag=args.run_tag)
    run.write.mode("overwrite").csv(args.out, sep="\t")
    print(f"wrote {res.count()} run rows to {args.out}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="cs6913-spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--segment-docs", type=int,
                   default=EngineConfig().segment_docs, dest="segment_docs")
    b.add_argument("--subset", default=None,
                   help="parquet with a doc_id column: build over this "
                        "doc subset only (HW3 IndexBuilder.cpp:126-149)")
    b.add_argument("--runs", action="store_true",
                   help="checkpoint posting runs (resumable stage 1)")
    b.add_argument("--fused", action="store_true",
                   help="single-pass tokenize+encode build (throughput "
                        "path; incompatible with --runs)")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("--mode", choices=["and", "or"], default="or")
    q.add_argument("-k", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    t = sub.add_parser("batch")
    t.add_argument("--index", required=True)
    t.add_argument("--queries", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--mode", choices=["and", "or"], default="or")
    t.add_argument("-k", type=int, default=20)
    t.add_argument("--run-tag", default="cs6913-spark")
    t.set_defaults(fn=cmd_batch)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
