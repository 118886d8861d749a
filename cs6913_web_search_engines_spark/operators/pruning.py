"""Block-max pruned top-k BM25 — the skip-metadata fast path.

The reference writes block-max skip metadata (``lastDocIdList`` per
chunk, ``query_processor/src/Lexicon.cpp:196-214``) but its MaxScore
traversal never prunes (constant bound, ``QueryProcessor.cpp:691-695``
— SURVEY §2.12.2).  This module is the upgrade the format was built
for, restated for Spark's batch execution model instead of a
document-at-a-time cursor walk:

* Every posting of a doc (for every term) lives in the doc's segment
  ``seg = doc_id // segment_docs``, and in exactly one block of each
  term.  A *matching* doc contains at least one query term (whose
  postings are in the doc's own segment), so its score is bounded by
  ``seg_ub(q, seg) = Σ_t max(0, ub_t) + max_t min(ub_t, 0)``
  (the optional terms clamp at 0; the best mandatory term may be
  negative — this stays below 0 in the all-head-term regime where the
  naive clamped sum degenerates to 0 and can never be pruned by a
  negative θ).  Conjunctive docs contain every term, so the plain
  unclamped ``Σ_t ub_t`` bounds them.
* ``ub`` is a pure Column expression over block metadata (``max_tf``,
  df, corpus stats) — no decode, no Python.  Bounds stay sound for
  the reference's *unclamped* IDF (negative for df > N/2):
  positive-idf terms bound at (max_tf, min doc length), negative-idf
  terms at (tf=1, max doc length) — always ≤ 0 for the latter.
* Phase 1 seeds a threshold: decode only each query's top-``seed_segs``
  segments by ``seg_ub`` and score them exactly (segment scores are
  complete scores — all of a doc's postings share its segment)
  → θ = the k-th best seed score per query.
* Phase 2 decodes only segments with ``seg_ub >= θ`` (strict-less
  pruning keeps rank identity even for score ties).  Within kept
  segments, a block of a *positive-idf* term is pruned when
  ``ub(block) + Σ_{t'≠t} max(0, seg ub of t') < θ`` — dropping a
  positive contribution can only deflate a doomed doc's partial
  score, never inflate it, so partially-decoded docs can never
  displace the true top-k.  Negative-idf terms are never
  block-pruned (dropping a negative contribution would inflate).

Everything stays distributed (no driver-side metadata collect):
θ is a per-query DataFrame joined into the prune filters.  Results
are provably rank-identical to the exhaustive path — pinned by
tests/test_pruning.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import DEFAULT, EngineConfig
from cs6913_web_search_engines_spark.functions import tokenizer
from cs6913_web_search_engines_spark.operators import block_codec, query_exec


def block_upper_bound(cfg: EngineConfig, total_docs: int, avg_len: float,
                      min_len: int, max_len: int):
    """BM25 upper bound for any posting in a block, as a Column.

    Score = idf * (k1+1)·tf / (K(len) + tf) with K increasing in len:
    the product is maximal at (max_tf, min_len) when idf > 0 and at
    (tf=1, max_len) when idf ≤ 0 (least-negative).  idf is the
    reference's unclamped form (QueryProcessor.cpp:28).
    """
    idf = F.log((F.lit(float(total_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    k1, b = cfg.k1, cfg.b

    def tf_part(tf_col, length: float):
        k = k1 * ((1.0 - b) + b * length / avg_len)
        return (k1 + 1.0) * tf_col / (F.lit(k) + tf_col)

    pos = idf * tf_part(F.col("max_tf").cast("double"), float(max(min_len, 1)))
    neg = idf * tf_part(F.lit(1.0), float(max(max_len, 1)))
    return F.when(idf > 0, pos).otherwise(neg)


def _query_meta(
    spark: SparkSession,
    index_path: str,
    lexicon: DataFrame,
    queries: dict[str, str],
    cfg: EngineConfig,
    blocks: DataFrame | None = None,
):
    """Block metadata rows for all query terms, with df attached.

    Reads ONLY metadata columns — the parquet scan never touches the
    ``doc_gaps``/``tfs`` payload bytes (column pruning), and shard/term
    predicates prune partitions and row groups.

    Query tokenization follows ``cfg.length_norm`` (HW2 splits on a
    different separator set than HW3) so the pruned tier stays
    rank-identical to the other tiers under either config.
    """
    mode = "hw2" if cfg.length_norm == "hw2" else "hw3"
    all_terms = sorted({t for q in queries.values()
                        for t in tokenizer.split_query(q, mode)})
    meta_cols = ["shard", "term", "seg", "block_id", "n_postings", "max_tf"]
    src = blocks if blocks is not None else spark.read.parquet(index_path)
    meta = (
        src.select(*meta_cols)
        .filter(block_codec.term_filter(spark, all_terms, cfg))
    )
    qt = query_exec.queries_to_terms(spark, queries, mode)
    qt = qt.join(lexicon.select("term", "df"), "term", "left").fillna(0, subset=["df"])
    return meta.join(F.broadcast(qt), "term"), qt, all_terms


def search_pruned(
    spark: SparkSession,
    index_path: str,
    lexicon: DataFrame,
    doc_stats: DataFrame,
    stats: dict,
    queries: dict[str, str],
    cfg: EngineConfig = DEFAULT,
    conjunctive: bool = False,
    seed_segs: int = 2,
    broadcast_doc_stats: bool = True,
    broadcast_keys: bool = True,
    blocks: DataFrame | None = None,
    len_lookup=None,
    counters: dict | None = None,
) -> DataFrame:
    """Exact top-k BM25 over the compressed index, decoding only
    blocks whose bound can still beat the seeded threshold.

    Returns (query_id, doc_id, score, rank) — rank-identical to
    :func:`query_exec.search_compressed`.

    ``broadcast_keys``: the survivor block-key set grows with corpus
    segments; set False beyond broadcast size (same regime as
    ``broadcast_doc_stats``) and the key join shuffles instead (AQE
    still broadcasts it at runtime when it measures small).
    """
    total_docs = int(stats["total_docs"])
    min_len = int(stats.get("min_len", 1))
    max_len = int(stats.get("max_len", 1 << 30))
    src = blocks if blocks is not None else spark.read.parquet(index_path)
    meta, qt, all_terms = _query_meta(spark, index_path, lexicon, queries,
                                      cfg, src)
    # The decode scans must carry the term predicate too: the survivor
    # join alone does NOT push anything into the parquet scan, so an
    # unfiltered src would read EVERY shard's payload bytes to decode a
    # handful of blocks — measured as pruned wall-clock growing with
    # corpus size while the decoded-block count stayed constant.  With
    # the filter, shard partition pruning + term row-group pruning keep
    # the payload read proportional to the query postings.
    src = src.filter(block_codec.term_filter(spark, all_terms, cfg))
    meta = meta.withColumn(
        "ub",
        block_upper_bound(cfg, total_docs, float(stats["avg_len"]),
                          min_len, max_len),
    )

    # Per (query, term, seg): best block bound of that term there.
    term_seg = meta.groupBy("query_id", "term", "seg").agg(
        F.max("ub").alias("term_ub"),
        F.first("n_terms").alias("n_terms"),
    ).withColumn("term_ub_pos", F.greatest(F.col("term_ub"), F.lit(0.0)))
    # Per (query, seg): bounds + #query terms present.
    #
    # ``sum_pos = Σ_t max(0, ub_t)`` is the bound for a doc that may
    # contain ANY subset of terms — but an empty subset is not a
    # match.  A matching doc contains ≥1 query term t0, and t0's
    # postings live in the doc's own segment, so
    #     score ≤ max_{t0 present} [ub_t0 + Σ_{t'≠t0} max(0, ub_t')]
    #           = sum_pos + max_t min(ub_t, 0)
    # — strictly sharper when every term in the segment has negative
    # ub (the unclamped-idf head-term regime, where the clamped bound
    # degenerates to 0 and can never fall below a negative θ).  For
    # conjunctive queries the doc contains ALL terms, so the plain
    # unclamped sum ``Σ_t ub_t`` bounds it (sharper again).
    seg_ub = (
        term_seg.groupBy("query_id", "seg")
        .agg(
            F.sum("term_ub_pos").alias("sum_pos"),
            F.sum("term_ub").alias("sum_all"),
            F.max(F.least(F.col("term_ub"), F.lit(0.0))).alias("best_neg"),
            F.count("*").alias("n_terms_present"),
            F.first("n_terms").alias("n_terms"),
        )
        .withColumn(
            "seg_ub",
            F.col("sum_all") if conjunctive
            else F.col("sum_pos") + F.col("best_neg"),
        )
    )
    if conjunctive:
        # A conjunctive match needs every term; all of a doc's postings
        # share its segment, so segments missing any query term can
        # never match — the zigzag-intersection skip
        # (QueryProcessor.cpp:589-634) at segment granularity.
        seg_ub = seg_ub.filter(F.col("n_terms_present") == F.col("n_terms"))

    w_seed = Window.partitionBy("query_id").orderBy(
        F.col("seg_ub").desc(), F.col("seg").asc()
    )
    seeds = (
        seg_ub.withColumn("seg_rank", F.row_number().over(w_seed))
        .filter(F.col("seg_rank") <= seed_segs)
        .select("query_id", "seg")
    )

    def exact_scores(block_keys: DataFrame) -> DataFrame:
        """Decode exactly the given (query_id, term, seg, block_id)
        rows and score.  Blocks are tagged with query_id *before*
        decode so a block kept for query A never leaks partial scores
        into query B (which may have pruned it)."""
        keys = block_keys.select(
            "query_id", "term", "seg", "block_id"
        ).dropDuplicates()
        if broadcast_keys:
            keys = F.broadcast(keys)
        kept = src.join(keys, ["term", "seg", "block_id"])
        postings = block_codec.decode_postings(
            kept, cfg, extra_cols=("query_id",), len_lookup=len_lookup
        )
        return query_exec.score_query_set(
            postings, qt, lexicon, doc_stats, stats, cfg,
            conjunctive=conjunctive,
            broadcast_doc_stats=broadcast_doc_stats,
        )

    # Phase 1: exact top-k inside the seed segments → threshold θ.
    seed_meta = meta.join(F.broadcast(seeds), ["query_id", "seg"], "left_semi")
    seed_topk = exact_scores(seed_meta)
    theta = seed_topk.filter(F.col("rank") == cfg.top_k).select(
        "query_id", F.col("score").alias("theta")
    )
    # θ is one scalar per query but its plan carries the whole seed
    # decode+score subtree; downstream it is referenced twice (segment
    # keep filter + block filter), and Python-UDF subplans never
    # canonicalize equal, so Catalyst cannot ReusedExchange them — left
    # lazy, the seed phase would execute 3× inside the final job.
    # Materialize the (tiny) θ table once instead.
    theta = theta.localCheckpoint(eager=True)

    # Phase 2: segments whose bound can still matter.  Queries with
    # fewer than k seed results get θ = -inf (left-join null keeps all).
    kept_segs = (
        seg_ub.join(theta, "query_id", "left")
        .filter(F.col("theta").isNull() | (F.col("seg_ub") >= F.col("theta")))
        .select("query_id", "seg", "seg_ub")
    )
    survivors = (
        meta.join(kept_segs.select("query_id", "seg"),
                  ["query_id", "seg"], "left_semi")
        # block-level bound: the doc CONTAINS this term (ub accounts it
        # exactly), the others stay optional → the CLAMPED sum_pos,
        # not the sharpened seg_ub (which assumes the best single
        # mandatory term and would under-bound docs holding this one)
        .join(seg_ub.select("query_id", "seg", "sum_pos"), ["query_id", "seg"])
        .join(term_seg.select("query_id", "term", "seg", "term_ub_pos"),
              ["query_id", "term", "seg"])
        .join(theta, "query_id", "left")
        .filter(
            F.col("theta").isNull()
            # never block-prune negative-idf terms (df ≥ N/2): dropping
            # a negative contribution would inflate partial scores
            | (F.col("df") * 2 >= F.lit(total_docs))
            | (F.col("ub") + F.col("sum_pos") - F.col("term_ub_pos")
               >= F.col("theta"))
        )
        .select("query_id", "term", "seg", "block_id")
    )
    if counters is not None:
        # bench-only accounting (extra actions): how many (query, term,
        # block) rows the exhaustive plan would decode vs what survived
        counters["exhaustive_blocks"] = meta.count()
        counters["survivor_blocks"] = survivors.count()
    return exact_scores(survivors)


def count_blocks(spark: SparkSession, index_path: str,
                 queries: dict[str, str], lexicon: DataFrame,
                 cfg: EngineConfig = DEFAULT) -> int:
    """Block rows the exhaustive path would decode (pruning-ratio
    metrics for bench)."""
    meta, _, _ = _query_meta(spark, index_path, lexicon, queries, cfg)
    return meta.count()
