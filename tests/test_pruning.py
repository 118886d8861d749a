"""Block-max pruned search must be rank-identical to the exhaustive
compressed path (and therefore to the oracle), while decoding fewer
blocks.  Small segment_docs forces many segments so pruning has
something to skip."""

import pytest

from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.operators import (
    block_codec as bc,
    index_build as ib,
    pruning,
    query_exec as qe,
)

QUERIES = {
    "q1": "data fast join",
    "q2": "the query window",   # head terms (possible negative idf)
    "q3": "spark",
    "q4": "nosuchterm data",
    "q5": "zzz qqq",            # nothing matches
    "q6": "merge sort stream",
}


@pytest.fixture(scope="module")
def compressed(spark, built, tmp_path_factory):
    postings, doc_stats, stats, lexicon = built
    cfg = EngineConfig(segment_docs=64, n_term_shards=4)
    path = str(tmp_path_factory.mktemp("pidx") / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)
    return path, cfg, postings, doc_stats, stats, lexicon


def _canon(rows):
    return [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"]))
    ]


@pytest.mark.parametrize("conjunctive", [False, True])
def test_pruned_rank_identity(spark, compressed, conjunctive):
    path, cfg, postings, doc_stats, stats, lexicon = compressed
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
        conjunctive=conjunctive, seed_segs=2,
    ).collect()
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
        conjunctive=conjunctive,
    ).collect()
    assert _canon(got) == _canon(want)


def test_pruned_with_tiny_k(spark, compressed):
    """Small k → high threshold → aggressive pruning; still identical."""
    path, cfg0, postings, doc_stats, stats, lexicon = compressed
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=3)
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg, seed_segs=1,
    ).collect()
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
    ).collect()
    assert _canon(got) == _canon(want)


def _norms_broadcast(spark, doc_stats):
    """Dense doc_id → distinct_terms array, as the engine's
    norms-in-RAM preload builds it (engine._build_len_lookup)."""
    import numpy as np

    pdf = doc_stats.select("doc_id", "distinct_terms").toPandas()
    arr = np.zeros(int(pdf["doc_id"].max()) + 1, dtype=np.int32)
    arr[pdf["doc_id"].to_numpy(np.int64)] = (
        pdf["distinct_terms"].to_numpy(np.int32))
    return spark.sparkContext.broadcast(arr)


@pytest.mark.parametrize("conjunctive", [False, True])
@pytest.mark.parametrize("driver_plan", [True, False])
def test_pruned_planners_rank_identity(spark, compressed, driver_plan,
                                       conjunctive):
    """The driver planner (pandas bounds/θ/survivors + fused kernel)
    and the distributed planner must both be rank-identical to the
    exhaustive path AND agree exactly on pruning accounting — the two
    planners implement the same bound math."""
    path, cfg, postings, doc_stats, stats, lexicon = compressed
    norms = _norms_broadcast(spark, doc_stats)
    counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
        conjunctive=conjunctive, seed_segs=2, len_lookup=norms,
        driver_plan=driver_plan, counters=counters,
    ).collect()
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
        conjunctive=conjunctive,
    ).collect()
    assert _canon(got) == _canon(want)
    other: dict = {}
    pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, QUERIES, cfg,
        conjunctive=conjunctive, seed_segs=2, len_lookup=norms,
        driver_plan=not driver_plan, counters=other,
    )
    # underscore keys are lazy accumulator handles (populated only
    # after an action), not planner accounting
    strip = lambda d: {k: v for k, v in d.items() if not k.startswith("_")}
    assert strip(counters) == strip(other)


def test_pruning_actually_prunes_on_selective_terms(spark, tmp_path):
    """On a corpus with a rare, concentrated term the pruned tier must
    (a) decode strictly fewer blocks than the exhaustive plan and
    (b) stay rank-identical.

    The per-round bench corpus (31-word uniform vocabulary) makes
    every query term a head term — negative idf, uniform block maxima
    — so pruning is structurally impossible there (recorded ratio
    0.0); this fixture is the selective-term regime where block-max
    pruning earns its keep: 'rare' lives only in segment 0 with high
    tf, so θ seeded there exceeds every other segment's bound."""
    rows = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["rare"] * 8          # concentrated + high tf
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)

    queries = {"q1": "rare common", "q2": "rare"}
    counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, queries, cfg,
        seed_segs=1, counters=counters,
    ).collect()
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, queries, cfg,
    ).collect()
    assert _canon(got) == _canon(want)
    assert counters["survivor_blocks"] < counters["exhaustive_blocks"]
    # the rare term's 32-segment spread of 'common' blocks must be
    # mostly gone: ≥half the block rows pruned
    assert counters["survivor_blocks"] <= counters["exhaustive_blocks"] // 2


def test_upper_bound_is_sound(spark, compressed):
    """Every actual BM25 term contribution must be ≤ its block's ub."""
    path, cfg, postings, doc_stats, stats, lexicon = compressed
    blocks = spark.read.parquet(path)
    lex = lexicon.select("term", "df")
    meta = blocks.join(lex, "term").withColumn(
        "ub",
        pruning.block_upper_bound(
            cfg, stats["total_docs"], stats["avg_len"],
            stats.get("min_len", 1), stats.get("max_len", 1 << 30),
        ),
    )
    decoded = bc.decode_postings(blocks, cfg)
    from cs6913_web_search_engines_spark.functions.bm25 import bm25_score
    scored = (
        decoded.join(lex, "term")
        .join(doc_stats.select("doc_id", "distinct_terms"), "doc_id")
        .withColumn(
            "contrib",
            bm25_score(F.col("tf"), F.col("df"), F.col("distinct_terms"),
                       stats["total_docs"], stats["avg_len"], cfg),
        )
    )
    per_term_max = scored.groupBy("term").agg(F.max("contrib").alias("mx"))
    per_term_ub = meta.groupBy("term").agg(F.max("ub").alias("ub"))
    bad = (
        per_term_max.join(per_term_ub, "term")
        .filter(F.col("mx") > F.col("ub") + 1e-9)
        .count()
    )
    assert bad == 0


def test_meta_row_estimate_is_upper_bound(spark, compressed):
    """The driver-plan gate and partition sizing hinge on
    _estimate_meta_rows being a SOUND upper bound on the actual
    (query_id, term, seg, block_id) metadata row count — including
    per-query term multiplication (shared head terms) and the
    one-partial-block-per-nonempty-segment floor that the naive
    Σ df//chunk estimate misses."""
    path, cfg, postings, doc_stats, stats, lexicon = compressed
    # replicate head terms across many queries to stress the
    # per-occurrence multiplication
    batch = dict(QUERIES)
    for i in range(20):
        batch[f"b{i}"] = "the data query"
    meta, qt, all_terms, meta_phys = pruning._query_meta(
        spark, path, lexicon, batch, cfg)
    actual = meta.count()
    dfs = {r["term"]: int(r["df"])
           for r in lexicon.select("term", "df").collect()}
    est = pruning._estimate_meta_rows(
        batch, dfs, int(stats["total_docs"]), cfg, "hw3")
    assert est >= actual, (est, actual)
    # the physical-row estimate (round 5: what the driver planner
    # actually collects — query-free) must bound the physical count,
    # and NOT scale with the batch width the way the tagged count does
    actual_phys = meta_phys.count()
    est_phys = pruning._estimate_phys_rows(
        all_terms, dfs, int(stats["total_docs"]), cfg)
    assert est_phys >= actual_phys, (est_phys, actual_phys)
    assert actual_phys < actual  # 20 shared-term queries tag ≫ physical
    # and the old per-distinct-term formula demonstrably is NOT sound
    # here (documenting why it was replaced)
    old = sum(max(1, d // cfg.postings_per_chunk) for d in dfs.values())
    assert old < actual


@pytest.mark.parametrize("driver_plan", [True, False])
def test_chunk_skipping_inside_surviving_blocks(spark, tmp_path, driver_plan):
    """VERDICT r3 #2: chunk-level skipping.  Segment 1's single 'hot'
    block survives block-level pruning (one chunk has max_tf=50), but
    its tf=1 chunks bound below θ and must be SKIPPED inside the
    decode kernel — fewer chunks decoded than seen, ranks identical
    to the exhaustive path, under both planners."""
    rows = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["hot"] * 50              # seg 0: seeds a high θ
        elif 1024 <= d < 1536:                 # seg 1: 8 chunks of 'hot'
            words += ["hot"] * (50 if 1088 <= d < 1152 else 1)
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=1024, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)
    norms = _norms_broadcast(spark, doc_stats)

    counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, {"q": "hot"}, cfg,
        seed_segs=1, counters=counters, len_lookup=norms,
        driver_plan=driver_plan,
    ).collect()
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, {"q": "hot"}, cfg,
    ).collect()
    assert _canon(got) == _canon(want)
    total, decoded = (a.value for a in counters["_chunk_accs"])
    assert decoded >= 1
    assert decoded < total, (decoded, total)
    # seg 1 spans 8 chunks of 'hot'; only the max_tf=50 chunk clears θ
    assert total - decoded >= 6, (decoded, total)


@pytest.mark.parametrize("driver_plan", [True, False])
def test_shared_decode_across_overlapping_queries(spark, tmp_path,
                                                 driver_plan):
    """Queries that keep the same physical block share ONE decode:
    grouped survivor keys (query_ids array) mean the chunk accounting
    for four copies of a query equals the single-query accounting —
    not 4× — while every copy still ranks identically to the
    exhaustive path (the shared-term batch was the pruned tier's
    measured worst case: payload shuffle + decode per (query, block))."""
    rows = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["hot"] * 50
        elif 1024 <= d < 1536:
            words += ["hot"] * (50 if 1088 <= d < 1152 else 1)
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=1024, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "index")
    bc.write_index(bc.encode_index(postings, cfg), path)
    norms = _norms_broadcast(spark, doc_stats)

    chunks = {}
    for label, queries in (("one", {"q0": "hot common"}),
                           ("four", {f"q{i}": "hot common"
                                     for i in range(4)})):
        counters: dict = {}
        got = pruning.search_pruned(
            spark, path, lexicon, doc_stats, stats, queries, cfg,
            seed_segs=1, counters=counters, len_lookup=norms,
            driver_plan=driver_plan,
        ).collect()
        want = qe.search_compressed(
            spark, path, lexicon, doc_stats, stats, queries, cfg,
        ).collect()
        assert _canon(got) == _canon(want)
        chunks[label] = tuple(a.value for a in counters["_chunk_accs"])
    # identical queries → identical survivor blocks → the physical
    # chunk decode is deduplicated, not repeated per query
    assert chunks["four"] == chunks["one"], chunks


def test_adaptive_abort_on_nonpruning_shape(spark, tmp_path):
    """Round-5 routing guard: when θ prunes (almost) nothing — a
    uniform corpus where every segment's bound ties — the driver
    planner must hand the batch to the caller's fallback BEFORE the
    phase-2 decode (PRUNED_ABORT_SURVIVOR_RATIO); on a genuinely
    prunable shape it must NOT abort.  Measured basis: zipf 8 M docs
    × 256 q ran 40.2 s pruned vs 5.8 s exhaustive at survivor ratio
    ≈ 1.0, while pruning-friendly shapes keep ≤ 10 % of blocks."""
    rows = [(d, "alpha beta gamma") for d in range(2048)]  # uniform
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "uidx")
    bc.write_index(bc.encode_index(postings, cfg), path)
    norms = _norms_broadcast(spark, doc_stats)

    calls = []

    def fallback():
        calls.append(1)
        return qe.search_compressed(
            spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"},
            cfg)

    counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"}, cfg,
        len_lookup=norms, counters=counters, fallback=fallback,
    ).collect()
    assert calls == [1] and counters.get("aborted_to_fallback")
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"}, cfg,
    ).collect()
    assert _canon(got) == _canon(want)
    # forced path (no fallback) still executes pruned and stays
    # rank-identical even on the hostile shape
    forced = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"}, cfg,
        len_lookup=norms,
    ).collect()
    assert _canon(forced) == _canon(want)

    # prunable shape: rare concentrated term — no abort
    rows = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["rare"] * 8
        rows.append((d, " ".join(words)))
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    postings2 = ib.build_postings(docs2)
    doc_stats2 = ib.build_doc_stats(docs2, postings2)
    stats2 = ib.corpus_stats(doc_stats2)
    lexicon2 = ib.build_lexicon(postings2)
    path2 = str(tmp_path / "ridx")
    bc.write_index(bc.encode_index(postings2, cfg), path2)
    norms2 = _norms_broadcast(spark, doc_stats2)
    calls.clear()
    counters2: dict = {}
    got2 = pruning.search_pruned(
        spark, path2, lexicon2, doc_stats2, stats2, {"q": "rare common"},
        cfg, len_lookup=norms2, seed_segs=1, counters=counters2,
        fallback=lambda: (_ for _ in ()).throw(AssertionError("aborted")),
    ).collect()
    assert calls == [] and not counters2.get("aborted_to_fallback")
    assert counters2["survivor_blocks"] < counters2["exhaustive_blocks"] // 2
    want2 = qe.search_compressed(
        spark, path2, lexicon2, doc_stats2, stats2, {"q": "rare common"},
        cfg).collect()
    assert _canon(got2) == _canon(want2)


def test_engine_auto_abort_rank_identity(spark, tmp_path, monkeypatch):
    """Engine-level: with the gate constants forced low (so auto
    routing picks pruned on a tiny hostile corpus), the adaptive
    abort must still deliver rank-identical results through the
    fallback tier."""
    import cs6913_web_search_engines_spark.engine as eng_mod

    rows = [(d, "alpha beta gamma") for d in range(2048)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=10)
    out = str(tmp_path / "full")
    ib.build_full(spark, docs, out, cfg, checkpoint_runs=False)
    monkeypatch.setattr(eng_mod, "PRUNED_MIN_AVG_CANDIDATES", 1)
    monkeypatch.setattr(eng_mod, "LOCAL_EXEC_MAX_POSTINGS", 0)
    engine = eng_mod.QueryEngine(spark, out, cfg)
    got = engine.search({"q": "alpha beta"}).collect()
    want = engine.search({"q": "alpha beta"}, pruned=False,
                         local=False).collect()
    assert _canon(got) == _canon(want)
    # the abort taught the router: the same term set now routes
    # straight to the segmented tier (memo populated), same results
    assert engine._route_memo
    key = (False, frozenset(["alpha", "beta"]))
    assert engine._route_memo.get(key) == "exhaustive"
    got2 = engine.search({"other": "beta alpha"}).collect()
    assert ([("other",) + r[1:] for r in _canon(got2)]
            == [("other",) + r[1:] for r in _canon(got)])


def test_rollup_probed_driver_planner(spark, tmp_path, monkeypatch):
    """Round-5 beyond-cap regime: when physical metadata outgrows the
    driver cap but the (term, sseg) ROLLUP fits, the driver planner
    plans hierarchically from the rollup and fetches per-segment
    metadata ONLY for top + θ-surviving super-segments — identical
    results and pruning accounting to the full-collect planner.  When
    even a lazy fetch outgrows the budget, the planner must overflow
    cleanly into the distributed replan (same results)."""
    rows = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["rare"] * 8
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "ridx")
    bc.write_index(bc.encode_index(postings, cfg), path)
    norms = _norms_broadcast(spark, doc_stats)
    queries = {"q1": "rare common", "q2": "rare"}

    ref_counters: dict = {}
    want = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, queries, cfg,
        seed_segs=1, len_lookup=norms, driver_plan=True,
        counters=ref_counters,
    ).collect()

    # 8 segs per sseg → 4 ssegs over the 32 segments; cap between the
    # rollup size and the physical row count forces rollup mode
    monkeypatch.setattr(pruning, "SUPERSEG_FACTOR", 8)
    nphys = int(ref_counters["planner_meta_rows"])
    monkeypatch.setattr(pruning, "PLAN_LOCAL_MAX_META_ROWS", nphys - 1)
    lazy_counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, queries, cfg,
        seed_segs=1, len_lookup=norms, counters=lazy_counters,
    ).collect()
    assert _canon(got) == _canon(want)
    # rollup mode engaged: fewer rows collected than physical, and
    # super-segments were pruned before their metadata was fetched
    assert lazy_counters["planner_meta_rows"] < nphys
    assert lazy_counters["exhaustive_blocks"] == ref_counters[
        "exhaustive_blocks"]
    assert lazy_counters["survivor_blocks"] <= ref_counters[
        "exhaustive_blocks"] // 2
    assert "_t_rollup" in lazy_counters

    # overflow: budget below even the top-sseg fetch → clean
    # distributed replan, same results
    monkeypatch.setattr(pruning, "PLAN_LOCAL_MAX_META_ROWS", 6)
    got2 = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, queries, cfg,
        seed_segs=1, len_lookup=norms,
    ).collect()
    assert _canon(got2) == _canon(want)


def test_distributed_planner_abort(spark, tmp_path, monkeypatch):
    """Round-5: the adaptive abort must also fire on the DISTRIBUTED
    planner — the path a beyond-driver-cap corpus takes (including a
    lazy rollup plan that overflowed mid-fetch), so a non-pruning
    shape at exactly that scale still hands the batch to the
    segmented fallback before the phase-2 decode.  Same shapes as the
    driver-planner abort test, with the driver cap forced to 0 so
    planning goes distributed; the prunable shape must NOT abort."""
    rows = [(d, "alpha beta gamma") for d in range(2048)]  # uniform
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = EngineConfig(segment_docs=64, n_term_shards=4, top_k=10)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats)
    lexicon = ib.build_lexicon(postings)
    path = str(tmp_path / "didx")
    bc.write_index(bc.encode_index(postings, cfg), path)
    norms = _norms_broadcast(spark, doc_stats)
    monkeypatch.setattr(pruning, "PLAN_LOCAL_MAX_META_ROWS", 0)

    calls = []

    def fallback():
        calls.append(1)
        return qe.search_compressed(
            spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"},
            cfg)

    counters: dict = {}
    got = pruning.search_pruned(
        spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"}, cfg,
        len_lookup=norms, counters=counters, fallback=fallback,
    ).collect()
    assert calls == [1] and counters.get("aborted_to_fallback")
    want = qe.search_compressed(
        spark, path, lexicon, doc_stats, stats, {"q": "alpha beta"}, cfg,
    ).collect()
    assert _canon(got) == _canon(want)

    # prunable shape through the same forced-distributed planner: no
    # abort, pruning accounting intact, rank identity holds
    rows2 = []
    for d in range(2048):
        words = ["common", "filler"]
        if d < 64:
            words += ["rare"] * 8
        rows2.append((d, " ".join(words)))
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    postings2 = ib.build_postings(docs2)
    doc_stats2 = ib.build_doc_stats(docs2, postings2)
    stats2 = ib.corpus_stats(doc_stats2)
    lexicon2 = ib.build_lexicon(postings2)
    path2 = str(tmp_path / "didx2")
    bc.write_index(bc.encode_index(postings2, cfg), path2)
    norms2 = _norms_broadcast(spark, doc_stats2)
    calls.clear()
    counters2: dict = {}
    got2 = pruning.search_pruned(
        spark, path2, lexicon2, doc_stats2, stats2, {"q": "rare common"},
        cfg, len_lookup=norms2, seed_segs=1, counters=counters2,
        fallback=lambda: (_ for _ in ()).throw(AssertionError("aborted")),
    ).collect()
    assert calls == [] and not counters2.get("aborted_to_fallback")
    assert counters2["survivor_blocks"] < counters2["exhaustive_blocks"] // 2
    want2 = qe.search_compressed(
        spark, path2, lexicon2, doc_stats2, stats2, {"q": "rare common"},
        cfg).collect()
    assert _canon(got2) == _canon(want2)
