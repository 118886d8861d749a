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

# Below this many (query, term, block) metadata rows the PLANNING side
# (bounds, seeds, θ, survivor keys) runs driver-side in pandas — the
# reference's own model, which walks skip metadata in RAM
# (Lexicon.cpp:196-214) — leaving Spark exactly two decode jobs.  The
# estimate (see ``_estimate_meta_rows``) is a hard upper bound known
# from the driver df probe before any job runs.  1 M rows ≈ tens of MB
# of pandas; past that the fully-distributed planner below takes over
# (identical results — pinned by tests/test_pruning.py).
PLAN_LOCAL_MAX_META_ROWS = 1_000_000


def _estimate_meta_rows(queries: dict[str, str], dfs: dict[str, int],
                        total_docs: int, cfg: EngineConfig,
                        mode: str) -> int:
    """Sound upper bound on |meta| = # (query_id, term, seg, block_id)
    rows, from driver-known quantities only (no job).

    Per (query, term) occurrence — NOT per distinct term: a head term
    shared by Q queries appears Q× in meta.  Per occurrence the term's
    block rows are Σ_seg ceil(df_seg / chunk) ≤ ceil(df / chunk) +
    #nonempty segs ≤ ceil(df/chunk) + min(df, n_segs): each nonempty
    segment adds at most one partial block (a term spread one posting
    per segment has ~n_segs block rows even though df/chunk ≈ 0 —
    the regime the old Σ_t df_t//chunk estimate missed by up to
    chunk×batch_size)."""
    chunk = cfg.postings_per_chunk
    n_segs = max(1, -(-total_docs // cfg.segment_docs))
    total = 0
    for q in queries.values():
        for t in set(tokenizer.split_query(q, mode)):
            df = dfs.get(t, 0)
            total += min(df, n_segs) + -(-df // chunk)
    return max(1, total)


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
    dfs: dict[str, int] | None = None,
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
    if dfs is not None:
        # caller already probed term dfs driver-side (the engine's
        # lexicon memo) — build qt with df attached, no lexicon join
        qt = query_exec.queries_to_terms(spark, queries, mode, dfs=dfs)
    else:
        qt = query_exec.queries_to_terms(spark, queries, mode)
        qt = qt.join(lexicon.select("term", "df"), "term", "left").fillna(
            0, subset=["df"])
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
    dfs: dict[str, int] | None = None,
    driver_plan: bool | None = None,
) -> DataFrame:
    """Exact top-k BM25 over the compressed index, decoding only
    blocks whose bound can still beat the seeded threshold.

    Returns (query_id, doc_id, score, rank) — rank-identical to
    :func:`query_exec.search_compressed`.

    Two planners, same algorithm and identical results:

    * **driver planner** (small metadata, the default under
      ``PLAN_LOCAL_MAX_META_ROWS``): bounds/seeds/θ/survivors in
      pandas on the collected metadata — the reference's in-RAM
      skip-metadata walk (Lexicon.cpp:196-214) — so Spark runs only
      the seed-decode and survivor-decode jobs;
    * **distributed planner** (``driver_plan=False`` or big
      metadata): everything stays in DataFrames with the metadata
      tables materialized once via localCheckpoint — the 10^12-doc
      regime where even per-query metadata outgrows the driver.

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
                                      cfg, src, dfs=dfs)
    if dfs is None:
        # probe term dfs once driver-side (qt carries the lexicon df):
        # kernel idf inputs + the partition-sizing estimate below
        dfs = {r["term"]: int(r["df"]) for r in
               qt.select("term", "df").distinct().collect()}
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
    # The metadata tables below (meta, term_seg, seg_ub) are each
    # referenced 2-4 times across the θ-seed job and the final decode
    # job, and Python-UDF subplans never canonicalize equal, so
    # Catalyst recomputes the scan→join→groupBy chain at every
    # reference — measured as ~40 tiny shuffle stages per search whose
    # scheduling dominated pruned wall-clock (≈10 s for a batch whose
    # decode work is milliseconds).  Materialize each once:
    # localCheckpoint is distributed (executor-memory), and the tables
    # are O(query terms × blocks) / O(query terms × segments) metadata,
    # never payload — safe at any corpus size.
    #
    # Partition counts are sized from the driver-side df probe when
    # available: ``_estimate_meta_rows`` is a hard upper bound on every
    # table and decode set below (per-(query,term) occurrence ×
    # per-segment partial blocks — not the old per-distinct-term
    # df//chunk, which undercounted by up to chunk × batch_size).
    # Tiny queries then run 1-8-task stages instead of scheduling
    # 25-64 mostly-empty tasks per stage (explicit repartition counts
    # are NOT AQE-coalesced) — measured as the dominant pruned-tier
    # constant at small corpora — while head-term queries at large
    # corpora still fan out.
    mode = "hw2" if cfg.length_norm == "hw2" else "hw3"
    est_rows = (_estimate_meta_rows(queries, dfs, total_docs, cfg, mode)
                if dfs else 1 << 20)
    n_meta = max(1, min(32, est_rows // 250_000 + 1))
    kernel_parts = max(8, min(spark.sparkContext.defaultParallelism * 2,
                              est_rows // 2_000 + 1))

    chunk_accs = None
    if counters is not None:
        sc = spark.sparkContext
        chunk_accs = (sc.accumulator(0), sc.accumulator(0))
        # read .value after exactly ONE action: accumulators updated
        # inside a transformation are at-least-once (task retries,
        # speculation, or a second action re-executing the kernel
        # double-count) — bench/pytest accounting only, never used for
        # query results or planning
        counters["_chunk_accs"] = chunk_accs

    # seg lists longer than this stay out of the scan predicate (an
    # isin of tens of thousands of literals bloats the plan for a
    # filter that prunes little)
    SCAN_SEG_MAX = 4096

    def exact_candidates(block_keys: DataFrame,
                         scan_segs: list[int] | None = None
                         ) -> DataFrame | None:
        """Fused decode+score+per-segment-top-k over exactly the given
        (query_id, term, seg, block_id[, cut_ub]) rows → per-segment
        candidate rows (query_id, doc_id, score), pre-global-ranking.
        Blocks are tagged with query_id *before* decode so a block
        kept for query A never leaks partial scores into query B
        (which may have pruned it).  ``cut_ub`` (survivor keys only)
        enables chunk-level skipping inside the kernel — see
        query_exec.segment_topk_candidates.  None when norms aren't in
        RAM (the kernel needs the resident length array).

        ``scan_segs``: when the planner knows the exact segment set
        driver-side, it is pushed INTO the parquet scan — the join
        alone prunes nothing at read time, so without it both decode
        jobs re-read every query-term block's payload bytes (measured:
        the whole pruned-tier residual at 32 M docs, where term
        filtering leaves 15 k one-block groups and pruning keeps 24).
        The fused build writes seg-range-clustered files per shard, so
        the seg predicate prunes at file/row-group granularity."""
        if len_lookup is None:
            return None
        key_cols = ["query_id", "term", "seg", "block_id"]
        sel = key_cols + (["cut_ub"] if "cut_ub" in block_keys.columns
                          else [])
        # Share decode across queries that kept the same physical
        # block: grouped keys carry query_ids array<string> so the
        # payload join ships and the kernel decodes ONE copy per
        # (term, seg, block) instead of one per (query, block) —
        # without this a batch whose queries overlap on a term pays
        # payload shuffle + decode per query (measured 256 same-term
        # queries: 125 k tagged rows for 489 physical blocks).  The
        # merged cut_ub is the MIN over the block's queries, null if
        # any has none (decode must keep every chunk any query needs;
        # per-query add-back is rank-safe — see the kernel docstring).
        # The driver planner pre-groups in pandas (stage-count parity:
        # a Spark groupBy here measured +0.5 s of tiny-stage
        # scheduling per batch, the exact trap localCheckpoint fixed);
        # the distributed planner groups here.
        if "query_ids" in block_keys.columns:
            keys = block_keys
        else:
            keys = block_keys.select(*sel).dropDuplicates(key_cols)
            agg = [F.collect_list("query_id").alias("query_ids")]
            if "cut_ub" in block_keys.columns:
                agg.append(
                    F.when(F.count(F.lit(1)) == F.count("cut_ub"),
                           F.min("cut_ub")).alias("cut_ub"))
            keys = keys.groupBy("term", "seg", "block_id").agg(*agg)
        if broadcast_keys:
            keys = F.broadcast(keys)
        scan = src
        if scan_segs is not None and 0 < len(scan_segs) <= SCAN_SEG_MAX:
            scan = scan.filter(F.col("seg").isin([int(s) for s in scan_segs]))
        kept = scan.join(keys, ["term", "seg", "block_id"])
        return query_exec.segment_topk_candidates(
            spark, kept, lexicon, stats, queries, cfg,
            len_lookup=len_lookup, conjunctive=conjunctive, dfs=dfs,
            num_partitions=kernel_parts, chunk_counters=chunk_accs,
        )

    def exact_scores(block_keys: DataFrame,
                     scan_segs: list[int] | None = None) -> DataFrame:
        """Ranked exact top-k over the given block keys.

        With norms in RAM this is ONE fused Arrow crossing
        (``exact_candidates``) plus a tiny global ranking window —
        instead of decode → per-posting score rows → groupBy → window
        (two extra shuffles of per-posting width, measured as the
        dominant pruned-tier constant).  Beyond norms-in-RAM scale it
        falls back to the distributed doc_stats-join scorer."""
        cand = exact_candidates(block_keys, scan_segs)
        if cand is not None:
            w = Window.partitionBy("query_id").orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
            return (
                cand.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= cfg.top_k)
                .select("query_id", "doc_id", "score", "rank")
            )
        bk = block_keys
        if "query_ids" in bk.columns:     # pre-grouped (driver planner)
            bk = bk.withColumn("query_id", F.explode("query_ids"))
        keys = bk.select(
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

    probe_pdf = None
    _META_COLS = ["query_id", "term", "seg", "block_id",
                  "n_terms", "df", "ub"]
    if driver_plan is None:
        driver_plan = (len_lookup is not None
                       and est_rows <= PLAN_LOCAL_MAX_META_ROWS)
        if len_lookup is not None and not driver_plan:
            # The estimate bounds CHUNK rows, so it exceeds the true
            # block-row count by up to the chunks-per-block packing
            # factor (~60-100× at 64 KB blocks / ~650 B chunks) —
            # measured routing the 32 M-doc regime to the distributed
            # planner (13 s) when the driver planner answers in ~2 s
            # over the actual 15 k metadata rows.  Probe with ONE
            # bounded metadata-only collect (CollectLimit stops at
            # MAX+1 rows, so driver memory stays gated by the same
            # constant): under the cap, the probe IS the planner's
            # input; over it, the distributed planner takes over as
            # before — metadata genuinely beyond the driver.
            probe_pdf = (meta.select(*_META_COLS)
                         .limit(PLAN_LOCAL_MAX_META_ROWS + 1).toPandas())
            if len(probe_pdf) <= PLAN_LOCAL_MAX_META_ROWS:
                driver_plan = True
            else:
                probe_pdf = None
    if driver_plan:
        return _search_pruned_driver(
            spark, meta, exact_scores, exact_candidates, stats, cfg,
            conjunctive, seed_segs, counters, mpdf=probe_pdf)

    meta = meta.coalesce(n_meta).localCheckpoint(eager=True)

    # Per (query, term, seg): best block bound of that term there.
    term_seg = meta.groupBy("query_id", "term", "seg").agg(
        F.max("ub").alias("term_ub"),
        F.first("n_terms").alias("n_terms"),
    ).withColumn("term_ub_pos", F.greatest(F.col("term_ub"), F.lit(0.0)))
    term_seg = term_seg.localCheckpoint(eager=True)
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
    seg_ub = seg_ub.localCheckpoint(eager=True)
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

    # Phase 1: exact top-k inside the seed segments → threshold θ.
    # seed_topk is ≤ k rows per query and is used twice — to derive θ
    # AND as the seed segments' contribution to the final result (seed
    # segments are excluded from phase 2 below, so their blocks decode
    # exactly once instead of twice).  Materialize it once; θ derives
    # from the checkpoint for free.
    seed_meta = meta.join(F.broadcast(seeds), ["query_id", "seg"], "left_semi")
    seed_topk = exact_scores(seed_meta).localCheckpoint(eager=True)
    theta = seed_topk.filter(F.col("rank") == cfg.top_k).select(
        "query_id", F.col("score").alias("theta")
    )

    # Phase 2: segments whose bound can still matter, MINUS the seed
    # segments (already scored exactly; their survivors ride in via the
    # final union).  Queries with fewer than k seed results get
    # θ = -inf (left-join null keeps all).
    kept_segs = (
        seg_ub.join(theta, "query_id", "left")
        .filter(F.col("theta").isNull() | (F.col("seg_ub") >= F.col("theta")))
        .join(seeds, ["query_id", "seg"], "left_anti")
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
        # cut_ub = θ − other-terms slack: the bound a CHUNK inside this
        # surviving block must still clear — the decode kernel prunes
        # chunks below it (null = no chunk pruning: no θ yet, or a
        # negative-idf term, same rule as the block filter above)
        .select(
            "query_id", "term", "seg", "block_id",
            F.when(
                F.col("theta").isNull()
                | (F.col("df") * 2 >= F.lit(total_docs)),
                F.lit(None).cast("double"),
            ).otherwise(
                F.col("theta") - (F.col("sum_pos") - F.col("term_ub_pos"))
            ).alias("cut_ub"),
        )
    )
    if counters is not None:
        # bench-only accounting (extra actions): how many (query, term,
        # block) rows the exhaustive plan would decode vs what was
        # actually decoded (seed phase + phase-2 survivors)
        counters["exhaustive_blocks"] = meta.count()
        counters["seed_blocks"] = seed_meta.count()
        counters["survivor_blocks"] = (survivors.count()
                                       + counters["seed_blocks"])

    # Per-subset top-k then union then re-rank is exact: a doc ranked
    # past k *within* the seed subset already has k better
    # (score desc, doc_id asc) docs in that subset alone, so it can
    # never enter the overall top-k; same for phase 2.  No doc appears
    # in both subsets (its postings live in exactly one segment, and
    # seed segments are anti-joined out of phase 2).
    phase2 = exact_scores(survivors)
    combined = seed_topk.select("query_id", "doc_id", "score").unionByName(
        phase2.select("query_id", "doc_id", "score")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        combined.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= cfg.top_k)
        .select("query_id", "doc_id", "score", "rank")
    )


def _search_pruned_driver(
    spark: SparkSession,
    meta: DataFrame,
    exact_scores,
    exact_candidates,
    stats: dict,
    cfg: EngineConfig,
    conjunctive: bool,
    seed_segs: int,
    counters: dict | None,
    mpdf=None,
) -> DataFrame:
    """Driver-side planning half of :func:`search_pruned` — identical
    bound/seed/θ/survivor math to the distributed planner, in pandas
    over the collected (small) metadata.  Decode + scoring stay in
    Spark (``exact_scores``), so the job count drops from ~6 actions
    of metadata bookkeeping to exactly: one metadata collect, one
    seed-decode job, one survivor-decode job.  The planner's exact
    seed/survivor SEGMENT sets are pushed into both decode scans
    (``scan_segs``) — reads, not just decode, stay proportional to
    what survived.  ``mpdf``: optionally the already-collected
    metadata (the routing probe), so the gate costs no second scan."""
    total_docs = int(stats["total_docs"])
    keys_schema = "query_id string, term string, seg long, block_id int"
    grouped_schema = ("term string, seg long, block_id int, "
                      "query_ids array<string>")
    empty = spark.createDataFrame(
        [], "query_id string, doc_id long, score double, rank int")

    if mpdf is None:
        mpdf = meta.select("query_id", "term", "seg", "block_id",
                           "n_terms", "df", "ub").toPandas()
    if counters is not None:
        counters["exhaustive_blocks"] = len(mpdf)
    if len(mpdf) == 0:
        if counters is not None:
            counters["seed_blocks"] = counters["survivor_blocks"] = 0
        return empty

    # term_seg: best block bound of each term per (query, segment)
    ts = (mpdf.groupby(["query_id", "term", "seg"], as_index=False)
          .agg(term_ub=("ub", "max"), n_terms=("n_terms", "first")))
    ts["term_ub_pos"] = ts["term_ub"].clip(lower=0.0)
    ts["term_ub_neg"] = ts["term_ub"].clip(upper=0.0)
    # seg_ub: see the distributed planner for the bound derivation
    su = (ts.groupby(["query_id", "seg"], as_index=False)
          .agg(sum_pos=("term_ub_pos", "sum"), sum_all=("term_ub", "sum"),
               best_neg=("term_ub_neg", "max"),
               n_terms_present=("term", "count"),
               n_terms=("n_terms", "first")))
    su["seg_ub"] = (su["sum_all"] if conjunctive
                    else su["sum_pos"] + su["best_neg"])
    if conjunctive:
        su = su[su["n_terms_present"] == su["n_terms"]]
        if len(su) == 0:
            if counters is not None:
                counters["seed_blocks"] = counters["survivor_blocks"] = 0
            return empty

    seeds = (su.sort_values(["query_id", "seg_ub", "seg"],
                            ascending=[True, False, True])
             .groupby("query_id").head(seed_segs)[["query_id", "seg"]])
    seed_keys = mpdf.merge(seeds, on=["query_id", "seg"])[
        ["query_id", "term", "seg", "block_id"]].drop_duplicates()

    # Phase 1: exact top-k of the seed segments → θ; reused below so
    # seed blocks decode once.  With the fused kernel available, rank
    # the (collect-sized) per-segment candidates here in pandas —
    # skipping the Spark ranking window saves a shuffle stage in the
    # seed job.
    # pre-group per physical block in pandas (shared decode — see
    # exact_candidates): one Spark row per (term, seg, block) with the
    # query_ids array, zero extra Spark stages
    seed_g = (seed_keys.groupby(["term", "seg", "block_id"],
                                as_index=False)
              .agg(query_ids=("query_id", list)))
    seed_df = spark.createDataFrame(seed_g, grouped_schema)
    seed_seg_list = sorted(set(seed_keys["seg"].tolist()))
    cand = exact_candidates(seed_df, seed_seg_list)
    if cand is not None:
        cpdf = cand.toPandas()
        cpdf = cpdf.sort_values(["query_id", "score", "doc_id"],
                                ascending=[True, False, True])
        cpdf["rank"] = cpdf.groupby("query_id").cumcount() + 1
        seed_pdf = cpdf[cpdf["rank"] <= cfg.top_k]
    else:
        seed_pdf = exact_scores(seed_df, seed_seg_list).toPandas()
    theta = (seed_pdf[seed_pdf["rank"] == cfg.top_k]
             [["query_id", "score"]].rename(columns={"score": "theta"}))

    # Phase 2: surviving segments (minus seeds), then surviving blocks.
    kept = su.merge(theta, on="query_id", how="left")
    kept = kept[kept["theta"].isna() | (kept["seg_ub"] >= kept["theta"])]
    kept = kept.merge(seeds, on=["query_id", "seg"], how="left",
                      indicator=True)
    kept = kept[kept["_merge"] == "left_only"]
    sv = (mpdf.merge(kept[["query_id", "seg", "sum_pos"]],
                     on=["query_id", "seg"])
          .merge(ts[["query_id", "term", "seg", "term_ub_pos"]],
                 on=["query_id", "term", "seg"])
          .merge(theta, on="query_id", how="left"))
    mask = (sv["theta"].isna()
            | (sv["df"] * 2 >= total_docs)      # never prune negative idf
            | (sv["ub"] + sv["sum_pos"] - sv["term_ub_pos"] >= sv["theta"]))
    # chunk-level cut: same rule as the distributed planner (NaN =
    # no chunk pruning — no θ, or negative-idf term)
    sv["cut_ub"] = sv["theta"] - (sv["sum_pos"] - sv["term_ub_pos"])
    sv.loc[sv["theta"].isna() | (sv["df"] * 2 >= total_docs),
           "cut_ub"] = float("nan")
    surv_keys = sv[mask][["query_id", "term", "seg", "block_id",
                          "cut_ub"]].drop_duplicates(
        subset=["query_id", "term", "seg", "block_id"])
    if counters is not None:
        counters["seed_blocks"] = len(seed_keys)
        counters["survivor_blocks"] = len(surv_keys) + len(seed_keys)

    seed_scores = spark.createDataFrame(
        seed_pdf[["query_id", "doc_id", "score"]],
        "query_id string, doc_id long, score double")
    if len(surv_keys) == 0:
        combined = seed_scores
    else:
        # grouped like the seed keys; merged cut_ub = min with
        # skipna=False so any no-cut query (NaN) disables chunk
        # pruning for the shared block
        surv_g = (surv_keys.groupby(["term", "seg", "block_id"],
                                    as_index=False)
                  .agg(query_ids=("query_id", list),
                       cut_ub=("cut_ub",
                               lambda s: s.min(skipna=False))))
        phase2 = exact_scores(
            spark.createDataFrame(surv_g, grouped_schema + ", cut_ub double"),
            sorted(set(surv_keys["seg"].tolist())))
        combined = seed_scores.unionByName(
            phase2.select("query_id", "doc_id", "score"))
    # per-subset top-k ∪ re-rank is exact — see search_pruned
    w_final = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        combined.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= cfg.top_k)
        .select("query_id", "doc_id", "score", "rank")
    )


def count_blocks(spark: SparkSession, index_path: str,
                 queries: dict[str, str], lexicon: DataFrame,
                 cfg: EngineConfig = DEFAULT) -> int:
    """Block rows the exhaustive path would decode (pruning-ratio
    metrics for bench)."""
    meta, _, _ = _query_meta(spark, index_path, lexicon, queries, cfg)
    return meta.count()
