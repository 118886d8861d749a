"""Rank-identity of the Spark engine vs the pure-Python oracle
(HW3 semantics), logical and compressed paths, AND + OR modes."""

import pytest

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import (
    block_codec as bc,
    index_build as ib,
    query_exec as qe,
)
from tests.oracle import OracleIndex

QUERIES = [
    "data fast join",
    "spark",
    "the query window",
    "merge sort",
    "data_fast",          # underscore splits in hw3 query mode
    "nosuchterm data",
    "zzz qqq",            # nothing matches
]


@pytest.fixture(scope="module")
def oracle(documents):
    docs = [(r["doc_id"], r["text"]) for r in documents.collect()]
    return OracleIndex(docs)


def assert_rank_identical(got_rows, want, tol=1e-9):
    got = [(r["doc_id"], r["score"]) for r in sorted(got_rows, key=lambda r: r["rank"])]
    assert len(got) == len(want), (got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd, (got, want)
        assert abs(gs - ws) <= tol * max(1.0, abs(ws))


@pytest.mark.parametrize("query", QUERIES)
@pytest.mark.parametrize("conjunctive", [False, True])
def test_logical_rank_identity(spark, built, oracle, query, conjunctive):
    postings, doc_stats, stats, lexicon = built
    cfg = EngineConfig()
    got = qe.search(spark, postings, lexicon, doc_stats, stats, query,
                    cfg, conjunctive).collect()
    want = oracle.search(query, cfg.top_k, conjunctive)
    assert_rank_identical(got, want)


def test_hw2_length_norm(spark, built, documents, oracle):
    """HW2 mode: byte-length normalization, k=15."""
    postings, _, _, lexicon = built
    cfg = EngineConfig().hw2()
    doc_stats = ib.build_doc_stats(documents, postings)
    stats = ib.corpus_stats(doc_stats, cfg)
    docs = [(r["doc_id"], r["text"]) for r in documents.collect()]
    orc = OracleIndex(docs, length_norm="hw2")
    got = qe.search(spark, postings, lexicon, doc_stats, stats,
                    "data fast join", cfg).collect()
    want = orc.search("data fast join", cfg.top_k)
    assert_rank_identical(got, want)


def test_compressed_equals_logical(spark, built, tmp_path_factory):
    postings, doc_stats, stats, lexicon = built
    cfg = EngineConfig(segment_docs=128, n_term_shards=4)
    path = str(tmp_path_factory.mktemp("idx") / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)
    queries = {"q1": "data fast join", "q2": "the query window"}
    got = qe.search_compressed(spark, path, lexicon, doc_stats, stats,
                               queries, cfg).collect()
    qt = qe.queries_to_terms(spark, queries)
    want = qe.score_query_set(postings, qt, lexicon, doc_stats, stats,
                              cfg).collect()
    key = lambda r: (r["query_id"], r["rank"])
    got_s = [(r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
             for r in sorted(got, key=key)]
    want_s = [(r["query_id"], r["doc_id"], round(r["score"], 9), r["rank"])
              for r in sorted(want, key=key)]
    assert got_s == want_s


def test_batch_query_set(spark, built, oracle):
    postings, doc_stats, stats, lexicon = built
    cfg = EngineConfig()
    queries = {f"q{i}": q for i, q in enumerate(QUERIES[:4])}
    qt = qe.queries_to_terms(spark, queries)
    res = qe.score_query_set(postings, qt, lexicon, doc_stats, stats, cfg)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in queries.items():
        want = oracle.search(q, cfg.top_k)
        assert_rank_identical(by_q.get(qid, []), want)


def test_attach_content(spark, built, documents):
    postings, doc_stats, stats, lexicon = built
    res = qe.search(spark, postings, lexicon, doc_stats, stats, "data")
    out = qe.attach_content(res, documents).collect()
    assert all("," not in r["content"] for r in out)
    assert len(out) == res.count()


def test_exact_topk_numpy_semantics():
    """The shared rank-critical helper: score ties break by doc_id
    ascending, conjunctive keeps only docs matching every term, k
    cuts after ordering."""
    import numpy as np

    from cs6913_web_search_engines_spark.operators.query_exec import (
        exact_topk_numpy,
    )

    # docs 2 and 3 tie at 2.0 → doc 2 first; doc 1 leads at 5.0
    ids = np.array([3, 1, 2, 3], dtype=np.int64)
    w = np.array([1.0, 5.0, 2.0, 1.0])
    u, s = exact_topk_numpy(ids, w, n_terms=1, conjunctive=False, k=3)
    assert u.tolist() == [1, 2, 3] and s.tolist() == [5.0, 2.0, 2.0]
    u, s = exact_topk_numpy(ids, w, 1, False, 2)
    assert u.tolist() == [1, 2]
    # conjunctive: only doc 3 appears twice (= n_terms)
    u, s = exact_topk_numpy(ids, w, 2, True, 10)
    assert u.tolist() == [3] and s.tolist() == [2.0]
    # empty in, empty out
    u, s = exact_topk_numpy(np.empty(0, np.int64), np.empty(0), 1, False, 5)
    assert u.size == 0
