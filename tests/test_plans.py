"""Plan-shape tests: pruning, pushdown, broadcast — the properties
that make the design survive a 100x scale-up (SURVEY §4)."""

import pytest
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import (
    block_codec as bc,
    index_build as ib,
    query_exec as qe,
)
from cs6913_web_search_engines_spark.plans import checks


@pytest.fixture(scope="module")
def index_path(spark, built, tmp_path_factory):
    postings, *_ = built
    cfg = EngineConfig(n_term_shards=4)
    path = str(tmp_path_factory.mktemp("planidx") / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)
    return path, cfg


def test_py_shard_matches_jvm(spark, built):
    postings, *_ = built
    cfg = EngineConfig(n_term_shards=7)
    rows = (
        postings.select("term").distinct()
        .select("term", bc.shard_col(cfg=cfg).alias("shard")).collect()
    )
    assert rows
    for r in rows:
        assert bc.py_shard(r["term"], cfg) == r["shard"]


def test_shard_partition_pruning(spark, index_path):
    path, cfg = index_path
    df = spark.read.parquet(path).filter(
        bc.term_filter(spark, ["data", "fast"], cfg)
    )
    assert checks.has_partition_filter(df, "shard")
    assert checks.has_pushed_filter(df, "term")


def test_doc_stats_join_broadcasts(spark, built):
    postings, doc_stats, stats, lexicon = built
    res = qe.search(spark, postings, lexicon, doc_stats, stats, "data fast")
    assert checks.has_broadcast_join(res)


def test_decode_reads_only_needed_columns(spark, index_path):
    path, cfg = index_path
    blocks = spark.read.parquet(path).filter(
        bc.term_filter(spark, ["data"], cfg)
    )
    decoded = bc.decode_postings(blocks, cfg)
    cols = checks.read_schema_columns(decoded)
    # codec needs only term + payload columns, not the metadata arrays
    assert set(cols) <= {"term", "n_postings", "doc_gaps", "tfs"}, cols


def test_ann_query_side_broadcasts(spark):
    from cs6913_web_search_engines_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    res = sim.brute_force_topk(emb, n_queries=4, k=5)
    # the tiny query side must broadcast into the corpus scan — a
    # shuffle of the big side here would be fatal at 10^12 vectors
    assert "BroadcastNestedLoopJoin" in checks.plan_text(res) or \
        checks.has_broadcast_join(res)


def test_ivf_assignment_is_map_only(spark):
    # literal-centroid assignment must add NO exchange and NO join:
    # one projection over the scan (10^12 rows → write-through)
    from cs6913_web_search_engines_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    txt = checks.plan_text(sim.ivf_assign(emb, 8))
    assert "Exchange" not in txt
    for join in ("Join", "CartesianProduct"):
        assert join not in txt, txt


def test_link_extraction_is_map_only(spark, documents):
    from cs6913_web_search_engines_spark.operators import weblog
    from cs6913_web_search_engines_spark.sources import webpages

    txt = checks.plan_text(weblog.link_graph(webpages.synthesize(documents)))
    assert "Exchange" not in txt          # narrow explode + projections
    assert "Generate" in txt              # the href explode


def test_frontier_order_is_take_ordered(spark, documents):
    from cs6913_web_search_engines_spark.operators import weblog
    from cs6913_web_search_engines_spark.sources import webpages

    txt = checks.plan_text(
        weblog.frontier_order(webpages.synthesize(documents), budget=50))
    # orderBy().limit() must plan as TakeOrdered, never a global Sort
    # materializing all candidates
    assert "TakeOrderedAndProject" in txt


def test_engine_inline_norms_skip_doc_stats_join(spark, documents, tmp_path):
    # with doc_len inline from the decode kernel, the scorer plan must
    # not reference the doc_stats parquet at all
    from cs6913_web_search_engines_spark.engine import QueryEngine
    from cs6913_web_search_engines_spark.operators import index_build as ib2

    out = str(tmp_path / "idx")
    ib2.build_full(spark, documents, out, EngineConfig(segment_docs=256),
                   checkpoint_runs=False, fused=True)
    eng = QueryEngine(spark, out, EngineConfig(segment_docs=256))
    assert eng.len_lookup is not None
    res = eng.search({"q": "data fast join"}, local=False)
    assert "doc_stats" not in checks.plan_text(res)


def test_segmented_shuffle_is_range_partitioned(spark, built, index_path):
    # seg is low-cardinality: hash partitioning leaves Poisson holes
    # (VERDICT r2 #3) — the segmented tier must range-partition like
    # the build paths (commit f7e1d2b).
    import numpy as np

    path, cfg = index_path
    postings, doc_stats, stats, lexicon = built
    blocks = spark.read.parquet(path)
    lk = spark.sparkContext.broadcast(np.ones(16, dtype=np.int32))
    res = qe.search_segmented(spark, blocks, lexicon, stats,
                              {"q0": "data fast"}, cfg, len_lookup=lk)
    txt = checks.plan_text(res).lower()
    assert "rangepartitioning" in txt
