"""High-level engine facade: build once, query many.

``QueryEngine`` is the analog of the reference server's startup
preload (``main.cpp:99-108`` pins lexicon + page table in RAM,
10.85 s) — lexicon and doc_stats are read once and cached; stats.json
is loaded driver-side.  Queries then run either through the
exhaustive compressed path or the block-max pruned fast path
(operators/pruning.py), both rank-identical.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from cs6913_web_search_engines_spark.config import DEFAULT, EngineConfig
from cs6913_web_search_engines_spark.operators import pruning, query_exec


class QueryEngine:
    def __init__(self, spark: SparkSession, index_dir: str,
                 cfg: EngineConfig = DEFAULT, cache: bool = True,
                 broadcast_doc_stats: bool = True):
        self.spark = spark
        self.index_path = os.path.join(index_dir, "index")
        self.cfg = cfg
        self.broadcast_doc_stats = broadcast_doc_stats
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.lexicon = spark.read.parquet(os.path.join(index_dir, "lexicon"))
        self.doc_stats = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
        if cache:
            self.lexicon = self.lexicon.cache()
            self.doc_stats = self.doc_stats.cache()
            # materialize now — the reference pays its preload up front
            self.lexicon.count()
            self.doc_stats.count()

    def search(self, queries: dict[str, str], conjunctive: bool = False,
               pruned: bool | None = None, seed_segs: int = 2) -> DataFrame:
        """(query_id, doc_id, score, rank) for a batch of queries.

        ``pruned=None`` auto-selects: the block-max pruned path costs
        two decode passes plus threshold joins, which only pays for
        itself when the corpus spans many segments (the 10^12-doc
        regime has ~10^6); small corpora answer faster exhaustively.
        """
        if pruned is None:
            n_segs = self.stats["total_docs"] / max(self.cfg.segment_docs, 1)
            pruned = n_segs >= 64
        if pruned:
            return pruning.search_pruned(
                self.spark, self.index_path, self.lexicon, self.doc_stats,
                self.stats, queries, self.cfg, conjunctive=conjunctive,
                seed_segs=seed_segs,
                broadcast_doc_stats=self.broadcast_doc_stats,
            )
        return query_exec.search_compressed(
            self.spark, self.index_path, self.lexicon, self.doc_stats,
            self.stats, queries, self.cfg, conjunctive=conjunctive,
        )
