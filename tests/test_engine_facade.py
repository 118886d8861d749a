"""QueryEngine facade: local fast path ≡ distributed path, caches,
norms-in-RAM lookup."""

import pytest

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.engine import QueryEngine
from cs6913_web_search_engines_spark.operators import index_build as ib


@pytest.fixture(scope="module")
def built_index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("engidx") / "idx")
    ib.build_full(spark, documents, out, EngineConfig(segment_docs=256),
                  checkpoint_runs=False, fused=True)
    return out


@pytest.fixture(scope="module")
def engine(spark, built_index):
    return QueryEngine(spark, built_index, EngineConfig(segment_docs=256))


QUERIES = {"q0": "data fast join", "q1": "the query window"}


def _key(rows):
    return sorted((r["query_id"], r["rank"], r["doc_id"],
                   round(r["score"], 9)) for r in rows)


def test_norms_lookup_built(engine):
    assert engine.len_lookup is not None
    arr = engine.len_lookup.value
    assert arr.size == engine.stats["total_docs"]


@pytest.mark.parametrize("conjunctive", [False, True])
def test_local_path_rank_identical_to_distributed(engine, conjunctive):
    local = engine.search(QUERIES, conjunctive=conjunctive, local=True).collect()
    dist = engine.search(QUERIES, conjunctive=conjunctive, local=False).collect()
    assert local and _key(local) == _key(dist)


def test_local_path_caches_warm_after_first_call(engine):
    engine.search({"q": "data fast join"}).collect()
    assert engine._df_memo.get("data", 0) > 0
    assert engine._postings_cache.get("data")
    # second call answers from cache and stays identical
    a = engine.search({"q": "data fast join"}).collect()
    b = engine.search({"q": "data fast join"}, local=False).collect()
    assert _key(a) == _key(b)


@pytest.mark.parametrize("conjunctive", [False, True])
def test_segmented_equals_exhaustive(spark, engine, conjunctive):
    from cs6913_web_search_engines_spark.operators import query_exec as qe

    seg = qe.search_segmented(
        spark, engine.blocks, engine.lexicon, engine.stats, QUERIES,
        engine.cfg, len_lookup=engine.len_lookup, conjunctive=conjunctive,
    ).collect()
    ex = qe.search_compressed(
        spark, engine.index_path, engine.lexicon, engine.doc_stats,
        engine.stats, QUERIES, engine.cfg, conjunctive=conjunctive,
    ).collect()
    assert seg and _key(seg) == _key(ex)


def test_unknown_term_conjunctive_returns_empty(engine):
    assert engine.search({"q": "data zzzznotaword"},
                         conjunctive=True).count() == 0


@pytest.mark.parametrize("local", [True, False])
def test_edge_queries_every_tier(engine, local):
    # separator-only, fully-unknown, and mixed queries behave
    # identically on the local and segmented tiers
    assert engine.search({"q": "!!! ???"}, local=local).count() == 0
    assert engine.search({"q": "zzznotaword"}, local=local).count() == 0
    assert engine.search({"q": "data zzznotaword"}, conjunctive=True,
                         local=local).count() == 0
    assert engine.search({"q": "data zzznotaword"}, local=local).count() > 0


def test_separator_only_query_empty(engine):
    assert engine.search({"q": "!!! ???"}).count() == 0


def test_eviction_with_mixed_cached_and_new_terms(spark, built_index, monkeypatch):
    # Regression: eviction used to clear the whole postings cache but
    # re-fetch only the new terms, KeyError-ing on a query that mixed a
    # previously-cached term with a new one (ADVICE r2, engine.py).
    import cs6913_web_search_engines_spark.engine as engine_mod

    monkeypatch.setattr(engine_mod, "LOCAL_EXEC_MAX_POSTINGS", 1)
    eng = engine_mod.QueryEngine(spark, built_index, EngineConfig(segment_docs=256))
    eng.search({"q": "data"}, local=True).collect()
    assert "data" in eng._postings_cache
    got = eng.search({"q": "data fast"}, local=True).collect()
    ref = eng.search({"q": "data fast"}, local=False).collect()
    assert got and _key(got) == _key(ref)


def test_auto_tier_selects_pruned_for_huge_candidate_sets(
        spark, built_index, monkeypatch):
    # pruned=None auto-selects the block-max tier when the per-query
    # candidate volume crosses PRUNED_MIN_AVG_CANDIDATES; shrink the
    # threshold so the auto path takes the pruned branch through
    # engine.search (not a direct search_pruned call), rank-identical
    # to the segmented tier.
    import cs6913_web_search_engines_spark.engine as engine_mod

    monkeypatch.setattr(engine_mod, "PRUNED_MIN_AVG_CANDIDATES", 0)
    eng = engine_mod.QueryEngine(spark, built_index,
                                 EngineConfig(segment_docs=256))
    auto = eng.search(QUERIES, local=False).collect()
    ref = eng.search(QUERIES, local=False, pruned=False).collect()
    assert auto and _key(auto) == _key(ref)


def test_norms_fallback_distributed_join_path(spark, built_index, engine):
    # VERDICT r2 #10: past NORMS_IN_RAM_MAX_DOCS the engine must answer
    # through the doc_stats join path, rank-identical.
    eng = QueryEngine(spark, built_index, EngineConfig(segment_docs=256),
                      norms_in_ram=False)
    assert eng.len_lookup is None
    got = eng.search(QUERIES).collect()
    ref = engine.search(QUERIES, local=False).collect()
    assert got and _key(got) == _key(ref)


@pytest.fixture(scope="module")
def hw2_index(spark, documents, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("hw2idx") / "idx")
    cfg2 = EngineConfig(segment_docs=256).hw2()
    ib.build_full(spark, documents, out, cfg2, checkpoint_runs=False, fused=True)
    return out, cfg2


def test_pruned_tier_respects_hw2_query_tokenizer(spark, hw2_index):
    # ADVICE r2: the pruned tier tokenized queries with the HW3 table
    # regardless of cfg; under HW2, '_' is NOT a query separator
    # (QueryProcessor.cpp:88), so 'data_fast' must stay one token on
    # every tier or cross-tier rank-identity breaks.
    import json

    from cs6913_web_search_engines_spark.operators import pruning
    from cs6913_web_search_engines_spark.operators import query_exec as qe

    out, cfg2 = hw2_index
    lexicon = spark.read.parquet(f"{out}/lexicon")
    doc_stats = spark.read.parquet(f"{out}/doc_stats")
    with open(f"{out}/stats.json") as f:
        stats = json.load(f)
    queries = {"q0": "data_fast join"}
    pr = pruning.search_pruned(spark, f"{out}/index", lexicon, doc_stats,
                               stats, queries, cfg2, seed_segs=1).collect()
    ex = qe.search_compressed(spark, f"{out}/index", lexicon, doc_stats,
                              stats, queries, cfg2).collect()
    assert pr and _key(pr) == _key(ex)
    # sanity: the HW3 tokenization of the same string scores differently
    hw3 = qe.search_compressed(spark, f"{out}/index", lexicon, doc_stats,
                               stats, {"q0": "data fast join"}, cfg2).collect()
    assert _key(pr) != _key(hw3)


def test_engine_over_uri_index(spark, documents, engine, tmp_path_factory):
    """Build to a file:// URI and serve queries from it: stats.json
    goes through the filesystem shim (was a plain open() — the last
    local-only step between build and query on a URI-hosted index).
    Results must be rank-identical to the local-path engine."""
    local = str(tmp_path_factory.mktemp("engidx_uri") / "idx")
    out = "file://" + local
    cfg = EngineConfig(segment_docs=256)
    ib.build_full(spark, documents, out, cfg,
                  checkpoint_runs=False, fused=True)
    eng_uri = QueryEngine(spark, out, cfg)
    got = eng_uri.search(QUERIES).collect()
    want = engine.search(QUERIES).collect()
    assert got and _key(got) == _key(want)


def test_missing_norms_entries_are_dropped_not_inflated(spark, built_index):
    """Index/page-table desync window: a doc_id absent from the norms
    array must be EXCLUDED from results (matching the doc_stats
    inner-join tier), not scored at length 0 — zero length minimizes
    the BM25 K term and would rank the desynced doc ABOVE every honest
    one.  Pinned on both the driver-local tier and the distributed
    segment kernel."""
    import numpy as np

    cfg = EngineConfig(segment_docs=256)
    eng = QueryEngine(spark, built_index, cfg)
    q = {"q": "data fast join"}
    baseline = eng.search(q, local=True).collect()
    assert baseline
    victim = baseline[0]["doc_id"]          # top doc loses its length
    arr = eng.len_lookup.value.copy()
    arr[victim] = 0
    eng.len_lookup = spark.sparkContext.broadcast(arr)
    eng._postings_cache.clear()
    eng._postings_cache_n = 0
    local = eng.search(q, local=True).collect()
    dist = eng.search(q, local=False).collect()
    for rows in (local, dist):
        ids = [r["doc_id"] for r in rows]
        assert victim not in ids            # dropped, not rank-1
        assert ids                          # others still returned
    key = lambda rows: sorted((r["query_id"], r["rank"], r["doc_id"],
                               round(r["score"], 9)) for r in rows)
    assert key(local) == key(dist)          # tiers agree on the drop
