"""Similarity search, rerank pipeline, and TREC-metric semantics
against numpy/pure-Python oracles at sf0.001."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import (
    evalmetrics as em,
    index_build as ib,
    query_exec as qe,
    rerank,
    similarity as sim,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def vecs(emb):
    rows = emb.select("vec_id", "embedding").collect()
    m = np.zeros((len(rows), len(rows[0]["embedding"])), dtype=np.float64)
    for r in rows:
        m[r["vec_id"]] = r["embedding"]
    return m


def _np_topk(vecs, qid, k):
    sims = vecs @ vecs[qid] / (
        np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[qid])
    )
    sims[qid] = -np.inf
    order = sorted(range(len(sims)), key=lambda i: (-round(sims[i], 6), i))
    return order[:k]


def test_brute_force_matches_numpy(emb, vecs):
    got = sim.brute_force_topk(emb, n_queries=4, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qid in range(4):
        ids = [v for _, v in sorted(by_q[qid])]
        assert ids == _np_topk(vecs, qid, 10), f"query {qid}"


def test_ivf_subset_of_probed_cells(emb):
    assign = {r["vec_id"]: r["centroid_id"]
              for r in sim.ivf_assign(emb, 16).collect()}
    got = sim.ivf_topk(emb, n_queries=4, k=10, n_centroids=16, nprobe=4).collect()
    assert len({r["query_id"] for r in got}) == 4
    for r in got:
        assert r["vec_id"] in assign


def test_ivf_recall_against_brute_force(emb, vecs):
    got = sim.ivf_topk(emb, n_queries=4, k=10, n_centroids=16, nprobe=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(by_q.get(q, set()) & set(_np_topk(vecs, q, 10))) / 10
        for q in range(4)
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_neardup_pairs_ordered_and_thresholded(emb):
    rows = sim.neardup_pairs(emb, threshold=0.3).collect()
    assert rows, "threshold 0.3 should produce pairs at sf0.001"
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert r["sim"] >= 0.3


def test_neardup_blocked_is_subset_of_exact(emb):
    exact = {(r["vec_a"], r["vec_b"]): r["sim"]
             for r in sim.neardup_pairs_exact(emb, threshold=0.3).collect()}
    blocked = {(r["vec_a"], r["vec_b"]): r["sim"]
               for r in sim.neardup_pairs(emb, threshold=0.3).collect()}
    assert blocked and set(blocked) <= set(exact)
    for p, s in blocked.items():
        assert s == exact[p]


def test_neardup_blocked_finds_planted_duplicates(emb):
    # a scaled copy has cosine exactly 1 and (cosine being
    # scale-invariant) the same argmax-centroid → always same cell, so
    # blocked recall on true near-identicals is 1.0
    n = emb.count()
    planted = emb.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x * 1.5 AS FLOAT))").alias("embedding"),
    )
    both = emb.select("vec_id", "embedding").unionByName(planted)
    got = {(r["vec_a"], r["vec_b"]): r["sim"]
           for r in sim.neardup_pairs(both, threshold=0.999).collect()}
    for vid in range(n):
        assert got.get((vid, vid + n)) == 1.0, vid


def test_neardup_blocked_plan_has_no_cross_join(emb):
    from cs6913_web_search_engines_spark.plans import checks

    txt = checks.plan_text(sim.neardup_pairs(emb, threshold=0.3))
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    # sanity: the exact baseline IS the cross-join shape we banned
    txt_exact = checks.plan_text(sim.neardup_pairs_exact(emb, threshold=0.3))
    assert ("CartesianProduct" in txt_exact
            or "BroadcastNestedLoopJoin" in txt_exact)


def test_rerank_topk_is_bm25_candidate_subset(spark, documents, built, emb):
    postings, doc_stats, stats, lexicon = built
    cfg = EngineConfig()
    queries = {"q0": "data fast join"}
    res = rerank.bm25_rerank(
        spark, postings, lexicon, doc_stats, stats, emb, queries, cfg,
        topn=30, topk=5,
    ).collect()
    assert 0 < len(res) <= 5
    qt = qe.queries_to_terms(spark, queries)
    from dataclasses import replace
    cands = {r["doc_id"] for r in qe.score_query_set(
        postings, qt, lexicon, doc_stats, stats, replace(cfg, top_k=30)
    ).collect()}
    sims = [r["sim"] for r in sorted(res, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)
    for r in res:
        assert r["doc_id"] in cands


def test_trec_metrics_hand_case(spark):
    # 1 query, ranks 1..4, relevant docs {1, 3, 99}; doc 99 never retrieved.
    run = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("q", 4, 4)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 1), ("q", 99, 1)],
        "query_id string, doc_id long, rel int",
    )
    m = em.trec_metrics(run, qrels).collect()[0]
    assert m["n_rel"] == 3
    assert m["rr"] == 1.0
    assert m["ap"] == round((1 / 1 + 2 / 3) / 3, 6)
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    # the 4-row run fits inside both cutoffs, so @10 == @100 here;
    # the cutoffs differing on longer runs is pinned by a second case
    assert m["ndcg_10"] == round(dcg / idcg, 6)
    assert m["ndcg_100"] == round(dcg / idcg, 6)
    assert m["recall_100"] == round(2 / 3, 6)


def test_trec_metrics_cutoffs_differ(spark):
    # relevant doc at rank 12: inside @100, outside @10
    run = spark.createDataFrame(
        [("q", i, i) for i in range(1, 21)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", 12, 1)], "query_id string, doc_id long, rel int",
    )
    m = em.trec_metrics(run, qrels).collect()[0]
    assert m["ndcg_10"] == 0.0 and m["recall_10"] == 0.0
    assert m["recall_100"] == 1.0
    assert m["ndcg_100"] == round((1 / math.log2(13)) / (1 / math.log2(2)), 6)
    s = em.trec_summary(em.trec_metrics(run, qrels)).collect()[0]
    assert s["n_queries"] == 1
    assert s["mrr"] == round(1 / 12, 6)
    assert s["ndcg_at_10"] == 0.0
    assert s["recall_at_100"] == 1.0


def test_trec_metrics_pytrec_conventions(spark):
    """Cross-validate trec_metrics against pytrec_eval's conventions
    (VERDICT r4 #5): a fixture with score TIES whose trec_eval order
    (score desc, docid-string desc) differs from the engine's native
    doc_id-asc tiebreak, plus an unjudged query.  Per metric per
    query the Spark operator over ``trec_eval_rank`` must agree with
    the vendored trec_eval re-statement to 1e-9 (and with real
    pytrec_eval when importable)."""
    from tests.pytrec_ref import trec_eval_metrics

    ks = (3, 10)
    # q1: docs 12 (rel) and 15 (nonrel) tied at 4.0 — numeric-asc
    # ranks 12 first, string-desc ranks 15 first, so AP/NDCG differ
    # between conventions.  q2: triple tie (5 rel, 4 nonrel, 2 rel).
    # qx: unjudged (in run, absent from qrels).
    run_rows = {
        "q1": {"1": 5.0, "12": 4.0, "15": 4.0, "3": 3.0, "8": 2.0,
               "21": 1.5, "7": 1.0},
        "q2": {"5": 2.0, "4": 2.0, "2": 2.0, "6": 1.0},
        "qx": {"1": 1.0, "2": 0.5},
    }
    qrel_rows = {
        "q1": {"1": 1, "12": 1, "3": 1, "99": 1},  # 99 never retrieved
        "q2": {"5": 1, "2": 1},
    }
    run = spark.createDataFrame(
        [(q, int(d), s) for q, docs in run_rows.items()
         for d, s in docs.items()],
        "query_id string, doc_id long, score double")
    qrels = spark.createDataFrame(
        [(q, int(d), r) for q, docs in qrel_rows.items()
         for d, r in docs.items()],
        "query_id string, doc_id long, rel int")

    got = {r["query_id"]: r for r in em.trec_metrics(
        em.trec_eval_rank(run), qrels, ks=ks, dp=None).collect()}
    want = trec_eval_metrics(run_rows, qrel_rows, ks=ks)

    assert set(want) == {"q1", "q2"}
    for qid, exp in want.items():
        for name, val in exp.items():
            assert abs(got[qid][name] - val) <= 1e-9, (qid, name)
    # the unjudged query surfaces explicitly with NULL metrics (so
    # trec_summary's judged-only mean matches pytrec_eval's averaging)
    assert got["qx"]["n_rel"] == 0 and got["qx"]["ap"] is None
    s = em.trec_summary(em.trec_metrics(
        em.trec_eval_rank(run), qrels, ks=ks, dp=None), ks=ks).collect()[0]
    assert s["n_queries"] == 2
    assert abs(s["mean_ap"]
               - (want["q1"]["ap"] + want["q2"]["ap"]) / 2) <= 1e-6

    # the ties genuinely bite: engine-native doc_id-asc ranking gives a
    # DIFFERENT ap on q1 (this is what trec_eval_rank exists to bridge)
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc())
    native = run.withColumn("rank", F.row_number().over(w))
    ap_native = {r["query_id"]: r["ap"] for r in
                 em.trec_metrics(native, qrels, ks=ks, dp=None).collect()}
    assert abs(ap_native["q1"] - want["q1"]["ap"]) > 1e-3

    try:  # soft cross-check of the vendored re-statement itself
        import pytrec_eval
    except ImportError:
        return
    ev = pytrec_eval.RelevanceEvaluator(
        qrel_rows, {"map", "recip_rank"}
        | {f"ndcg_cut.{k}" for k in ks} | {f"recall.{k}" for k in ks})
    real = ev.evaluate(run_rows)
    for qid, exp in want.items():
        assert abs(real[qid]["map"] - exp["ap"]) <= 1e-9
        assert abs(real[qid]["recip_rank"] - exp["rr"]) <= 1e-9
        for k in ks:
            assert abs(real[qid][f"ndcg_cut_{k}"] - exp[f"ndcg_{k}"]) <= 1e-9
            assert abs(real[qid][f"recall_{k}"] - exp[f"recall_{k}"]) <= 1e-9


# --- broadcast-centroid kernel (scale path past LITERAL_CENTROID_MAX) ------


def test_ivf_assign_broadcast_matches_literal(emb):
    lit = {(r["vec_id"], r["centroid_id"])
           for r in sim.ivf_assign(emb, 64, method="literal").collect()}
    bc = {(r["vec_id"], r["centroid_id"])
          for r in sim.ivf_assign(emb, 64, method="broadcast").collect()}
    assert lit == bc


def test_ivf_topk_broadcast_matches_literal(emb):
    lit = sorted(map(tuple, sim.ivf_topk(
        emb, n_queries=4, k=10, n_centroids=64, nprobe=4,
        method="literal").collect()))
    bc = sorted(map(tuple, sim.ivf_topk(
        emb, n_queries=4, k=10, n_centroids=64, nprobe=4,
        method="broadcast").collect()))
    assert lit == bc


def test_neardup_broadcast_matches_literal(emb):
    lit = sorted(map(tuple, sim.neardup_pairs(
        emb, threshold=0.8, n_centroids=64, method="literal").collect()))
    bc = sorted(map(tuple, sim.neardup_pairs(
        emb, threshold=0.8, n_centroids=64, method="broadcast").collect()))
    assert lit == bc


def test_ivf_broadcast_1024_centroids_plan_stays_small(spark):
    """VERDICT r2 #2 done-criterion: 1,024 centroids without the plan
    string growing O(C*dim) — and assignments match numpy argmax."""
    import pandas as pd

    rng = np.random.RandomState(7)
    n, dim, c = 1500, 16, 1024
    mat = rng.randn(n, dim)
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [[float(x) for x in row] for row in mat],
    }))
    got = sim.ivf_assign(df, c)  # auto-selects the broadcast kernel
    plan = got._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 50_000, f"plan blew up: {len(plan)} chars"
    got_map = {r["vec_id"]: r["centroid_id"] for r in got.collect()}
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    expect = np.argmax(matn @ matn[:c].T, axis=1)
    assert len(got_map) == n
    assert all(got_map[i] == expect[i] for i in range(n))
    # topk through the kernel path also runs end-to-end
    rows = sim.ivf_topk(df, n_queries=3, k=5, n_centroids=c, nprobe=8).collect()
    assert len(rows) == 15


# --- trained centroids (VERDICT r3 #6) --------------------------------------


@pytest.fixture(scope="module")
def skewed_emb(spark):
    """The untrained-seeding failure mode: three well-separated
    clusters, but vec_ids ordered so the first-N vectors (= the
    untrained centroids) ALL come from cluster 0 — every other
    cluster's mass then piles into one or two cells."""
    import pandas as pd

    rng = np.random.RandomState(11)
    dim, per = 16, 120
    axes = np.zeros((3, dim))
    axes[0, 0] = axes[1, 5] = axes[2, 10] = 1.0
    mats = [axes[c] * 10.0 + rng.randn(per, dim) * 0.3 for c in range(3)]
    mat = np.vstack(mats)          # ids 0..119 cluster0, 120..239 c1, ...
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(mat.shape[0], dtype=np.int64),
        "embedding": [[float(x) for x in row] for row in mat],
    }))
    return df.cache(), mat


def test_trained_centroids_balance_cells(skewed_emb):
    df, mat = skewed_emb
    c = 6
    trained = sim.train_centroids(df, c, sample_size=360, iters=8)

    def cell_sizes(centroids):
        counts = (sim.ivf_assign(df, c, method="broadcast",
                                 centroids=centroids)
                  .groupBy("centroid_id").count().collect())
        return sorted(r["count"] for r in counts)

    untrained, trained_sz = cell_sizes(None), cell_sizes(trained)
    # The documented dense-cell caveat (similarity.neardup_pairs): with
    # untrained first-N centroids a tight far cluster's argmax is
    # decided by CENTROID noise — constant across the cluster — so the
    # whole cluster collapses into one cell.  The join cost the caveat
    # is about is Σ size² (O(cell²) pair work); training must reduce
    # it, and the biggest trained cell must stay near one cluster.
    pair_work = lambda sizes: sum(s * s for s in sizes)
    assert pair_work(trained_sz) < pair_work(untrained), (
        trained_sz, untrained)
    assert trained_sz[-1] <= 130, trained_sz
    assert untrained[-1] > trained_sz[-1], (trained_sz, untrained)


def test_trained_centroids_recall_not_worse(skewed_emb):
    df, mat = skewed_emb
    c, k, nq = 6, 10, 6
    trained = sim.train_centroids(df, c, sample_size=360, iters=8)

    def truth(q):
        sims = mat @ mat[q] / (
            np.linalg.norm(mat, axis=1) * np.linalg.norm(mat[q]))
        sims[q] = -np.inf
        return set(sorted(range(len(sims)),
                          key=lambda i: (-round(sims[i], 6), i))[:k])

    def recall(centroids):
        got = sim.ivf_topk(df, n_queries=nq, k=k, n_centroids=c, nprobe=2,
                           method="broadcast", centroids=centroids).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(by_q.get(q, set()) & truth(q)) / k
                   for q in range(nq)) / nq

    r_untrained, r_trained = recall(None), recall(trained)
    assert r_trained >= r_untrained, (r_trained, r_untrained)
    assert r_trained >= 0.9, r_trained


def test_neardup_trained_centroids_finds_planted_pairs(skewed_emb, spark):
    import pandas as pd

    df, mat = skewed_emb
    # plant near-identical twins of three vectors, one per cluster
    twins = mat[[0, 130, 250]] + 1e-4
    extra = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(1000, 1003, dtype=np.int64),
        "embedding": [[float(x) for x in row] for row in twins],
    }))
    full = df.unionByName(extra)
    trained = sim.train_centroids(full, 6, sample_size=400, iters=8)
    pairs = {(r["vec_a"], r["vec_b"]) for r in sim.neardup_pairs(
        full, threshold=0.999, n_centroids=6, method="broadcast",
        centroids=trained).collect()}
    for a, b in [(0, 1000), (130, 1001), (250, 1002)]:
        assert (a, b) in pairs, (a, b, pairs)
    # blocked result stays a subset of the exact all-pairs baseline
    exact = {(r["vec_a"], r["vec_b"]) for r in
             sim.neardup_pairs_exact(full, threshold=0.999).collect()}
    assert pairs <= exact


def test_tsv_sources_raw_split_fidelity(spark, tmp_path):
    """The reference splits raw lines on tab (trec_eval.py:7-20,
    query_bm25.py:53-62); csv default quoting would mangle fields with
    a leading double-quote and PERMISSIVE mode would turn a malformed
    qrels row into a silent null that vanishes in the metrics join."""
    qpath = tmp_path / "queries.tsv"
    qpath.write_text('q1\t"exact phrase" retrieval\n'
                     'q2\tback\\slash and "mid"quote\n')
    got = em.queries_dict(em.read_queries_tsv(spark, str(qpath)))
    assert got == {"q1": '"exact phrase" retrieval',
                   "q2": 'back\\slash and "mid"quote'}

    ok = tmp_path / "qrels_ok"
    ok.mkdir()
    (ok / "part.tsv").write_text("q1\t0\t42\t1\nq1\t0\t7\t0\n")
    rows = em.read_qrels_tsv(spark, str(ok)).collect()
    assert {(r["query_id"], r["doc_id"], r["rel"]) for r in rows} == {
        ("q1", 42, 1), ("q1", 7, 0)}

    bad = tmp_path / "qrels_bad"
    bad.mkdir()
    (bad / "part.tsv").write_text("q1\t0\tnot_an_int\t1\n")
    with pytest.raises(Exception, match="(?i)failfast|malformed|cannot|parse"):
        em.read_qrels_tsv(spark, str(bad)).collect()
