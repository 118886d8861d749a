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
