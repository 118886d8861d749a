"""TREC-style IR evaluation metrics as DataFrame aggregations.

The reference delegates MAP / MRR / NDCG@k / Recall@k to pytrec_eval
over run + qrels TSVs (``ranking_optimizer/src/ranking-optimizer/
trec_eval.py:40-94``, SURVEY §2.8 M6).  Here the metrics are window +
aggregate expressions over the run DataFrame — one shuffle on
query_id, entirely JVM-side, so evaluating a million-query run is one
job instead of a driver-side loop.

Definitions (matching pytrec_eval on binary relevance):
  RR      = 1 / rank of the first relevant hit (0 if none)
  AP      = Σ_relevant-hits P@rank / R,  R = |relevant in qrels|
  NDCG@k  = DCG@k / IDCG@k,  DCG = Σ_hits≤k 1/log2(rank+1),
            IDCG = Σ_{i=1..min(R,k)} 1/log2(i+1)
  Recall@k = |relevant hits ≤ k| / R

Qrels in this sandbox are synthesized deterministically
(rel(q, d) = 1 iff hash60(q||'#'||d) % QREL_MOD == 0) so the DuckDB
oracle reproduces them exactly; with real qrels the operator is
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cs6913_web_search_engines_spark.functions import hashing

QREL_MOD = 13


def synth_qrels(documents: DataFrame, query_ids: list[str]) -> DataFrame:
    """(query_id, doc_id, rel=1) — deterministic binary qrels."""
    spark = documents.sparkSession
    qids = spark.createDataFrame([(q,) for q in query_ids], "query_id string")
    key = F.concat_ws("#", F.col("query_id"), F.col("doc_id").cast("string"))
    return (
        documents.select("doc_id").crossJoin(F.broadcast(qids))
        .filter(hashing.hash60_col(key) % QREL_MOD == 0)
        .select("query_id", "doc_id", F.lit(1).alias("rel"))
    )


def synth_qrels_sql(query_ids: list[str], docs: str = "documents") -> str:
    vals = ", ".join(f"('{q}')" for q in sorted(query_ids))
    key = "query_id || '#' || CAST(doc_id AS VARCHAR)"
    return f"""
SELECT query_id, doc_id, 1 AS rel
FROM {docs} CROSS JOIN (SELECT * FROM (VALUES {vals}) t(query_id))
WHERE {hashing.hash60_sql(key)} % {QREL_MOD} = 0
"""


# --- file-based qrels / query sources (S12) --------------------------------
#
# The reference reads both from headerless TSVs: qrels as
# (query_id, placeholder, doc_id, relevance) — trec_eval.py:7-20 —
# and queries as (query_id, query_text) — query_bm25.py:53-62.
# Fixed-schema spark.read.csv keeps the scan schema-pruned and
# distributed (a million-query file is just another DataFrame source).

QRELS_TSV_SCHEMA = "query_id string, placeholder string, doc_id long, rel int"
QUERIES_TSV_SCHEMA = "query_id string, text string"


_RAW_TSV = {
    # the reference splits raw lines on '\t' (trec_eval.py:7-20,
    # query_bm25.py:53-62); Spark csv's default quote='"' would
    # silently reinterpret fields with a leading double-quote, so
    # disable quote/escape handling for byte-faithful parsing
    "sep": "\t", "quote": "", "escape": "",
}


def read_qrels_tsv(spark, path: str) -> DataFrame:
    """TREC qrels TSV → (query_id, doc_id, rel).  Drop-in replacement
    for :func:`synth_qrels` (reference ``trec_eval.py:7-20``).
    FAILFAST: a malformed row raises (as the reference's ``int()``
    would) instead of becoming a silent null that vanishes in the
    metrics join."""
    return (
        spark.read.options(**_RAW_TSV, mode="FAILFAST")
        .csv(path, schema=QRELS_TSV_SCHEMA)
        .select("query_id", "doc_id", "rel")
    )


def write_qrels_tsv(qrels: DataFrame, path: str) -> None:
    """(query_id, doc_id, rel) → the reference's 4-column qrels TSV
    (placeholder column fixed to '0', as in MS MARCO qrels).

    Quoting is DISABLED on the writer to match the raw-split reader
    (``_RAW_TSV``): the csv default quote='"' would wrap a query_id
    containing a double-quote, which the quote-free reader would then
    load with literal quote characters — a silently corrupted round
    trip.  Fields containing the separator itself (tab/newline) are
    outside the TREC format's contract, same as in the reference's
    plain ``'\\t'.split`` files."""
    (
        qrels.select(
            "query_id", F.lit("0").alias("placeholder"),
            F.col("doc_id").cast("string"), F.col("rel").cast("string"),
        )
        .write.mode("overwrite").options(**_RAW_TSV).csv(path)
    )


def read_queries_tsv(spark, path: str) -> DataFrame:
    """Query TSV → (query_id, text) (reference ``query_bm25.py:53-62``).
    Raw-split fidelity: a query text like ``"exact phrase" search``
    loads verbatim (no csv quote stripping)."""
    return (spark.read.options(**_RAW_TSV)
            .csv(path, schema=QUERIES_TSV_SCHEMA))


def queries_dict(query_df: DataFrame) -> dict[str, str]:
    """Collect a (query_id, text) DataFrame to the driver-side dict the
    batch search APIs take.  Queries are driver-resident by nature
    (the reference iterates the TSV row-by-row); at extreme query
    counts feed the DataFrame itself to queries_to_terms instead."""
    return {r["query_id"]: r["text"] or "" for r in query_df.collect()}


def trec_eval_rank(run: DataFrame) -> DataFrame:
    """Re-rank a scored run per trec_eval's own sort convention:
    score DESC, then document id as a STRING in DESCENDING order.

    trec_eval (and hence pytrec_eval, the reference's quality oracle —
    ``trec_eval.py:40-59``) ignores the run file's rank column and
    re-sorts internally with this exact tiebreak.  The engine's native
    tiebreak is doc_id ASC — rank-identical to the reference ENGINE
    (QueryProcessor.cpp) — so on runs containing score ties the two
    conventions assign different ranks and MAP/NDCG/MRR can differ.
    Evaluate ``trec_metrics(trec_eval_rank(run), qrels)`` to reproduce
    pytrec_eval's numbers exactly (pinned to 1e-9 on a tied fixture by
    tests/test_similarity_rerank.py::test_trec_metrics_pytrec_conventions).
    """
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").cast("string").desc())
    return run.withColumn("rank", F.row_number().over(w))


def trec_metrics(run: DataFrame, qrels: DataFrame,
                 ks: tuple[int, ...] = (10, 100),
                 dp: int | None = 6) -> DataFrame:
    """run(query_id, doc_id, rank) × qrels → per-query
    (query_id, n_rel, rr, ap, ndcg_<k>..., recall_<k>...), 6 dp —
    the reference report's column set (HW3 Table 1: MAP, MRR,
    NDCG@10/@100, Recall@100) at ``ks = (10, 100)``.

    Queries present in the run but with zero qrels get NULL metrics
    (pytrec_eval drops them; we surface them explicitly).  The metric
    math follows pytrec_eval's conventions — linear-gain NDCG with
    1/log2(rank+1) discount, AP normalized by |qrels|, means over
    judged queries only — verified per metric per query to 1e-9
    against a vendored trec_eval re-statement (``dp=None`` disables
    the 6-dp report rounding for such comparisons).  Rank convention
    is the caller's: pass the run through :func:`trec_eval_rank` first
    to reproduce trec_eval's own tie ordering.
    """
    r_tot = qrels.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    hits = run.join(qrels.select("query_id", "doc_id", "rel"),
                    ["query_id", "doc_id"], "left").fillna(0, subset=["rel"])
    w = Window.partitionBy("query_id").orderBy("rank")
    hits = hits.withColumn("cum_rel", F.sum("rel").over(w))
    aggs = [
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(F.when(F.col("rel") == 1, F.col("cum_rel") / F.col("rank"))
              .otherwise(0.0)).alias("ap_num"),
    ]
    for k in ks:
        aggs.append(
            F.sum(F.when((F.col("rel") == 1) & (F.col("rank") <= k),
                         1.0 / F.log2(F.col("rank") + 1)).otherwise(0.0))
            .alias(f"dcg_{k}"))
        aggs.append(
            F.sum(F.when((F.col("rel") == 1) & (F.col("rank") <= k), 1)
                  .otherwise(0)).alias(f"hits_{k}"))
    per_q = hits.groupBy("query_id").agg(*aggs)

    def idcg(k: int):
        return F.expr(
            f"aggregate(sequence(1, least(n_rel, {k})), 0D, "
            "(acc, i) -> acc + 1.0 / log2(i + 1))"
        )

    def _r(col):
        return F.round(col, dp) if dp is not None else col

    cols = [
        "query_id",
        F.coalesce("n_rel", F.lit(0)).cast("int").alias("n_rel"),
        _r(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0))).alias("rr"),
        F.when(F.col("n_rel") > 0,
               _r(F.col("ap_num") / F.col("n_rel"))).alias("ap"),
    ]
    for k in ks:
        cols.append(F.when(F.col("n_rel") > 0,
                           _r(F.col(f"dcg_{k}") / idcg(k)))
                    .alias(f"ndcg_{k}"))
        cols.append(F.when(F.col("n_rel") > 0,
                           _r(F.col(f"hits_{k}") / F.col("n_rel")))
                    .alias(f"recall_{k}"))
    return per_q.join(r_tot, "query_id", "left").select(*cols)


def trec_run(results: DataFrame, run_tag: str = "cs6913-spark") -> DataFrame:
    """S13 — the 6-column TREC run projection ``qid Q0 docid rank
    score run`` (reference ``query_bm25.py:42-47``,
    ``query_hnsw.py:74-88``); write with ``.write.csv(sep='\\t')`` for
    the on-disk run file."""
    return results.select(
        F.col("query_id").alias("qid"),
        F.lit("Q0").alias("q0"),
        F.col("doc_id").cast("string").alias("docid"),
        F.col("rank").alias("rank"),
        F.round("score", 4).alias("score"),
        F.lit(run_tag).alias("run"),
    )


def trec_run_sql(ranked_rel: str, k: int, run_tag: str = "cs6913-spark") -> str:
    """Oracle over a relation with (query_id, doc_id, score, rank)."""
    return f"""
SELECT query_id AS qid, 'Q0' AS q0, CAST(doc_id AS VARCHAR) AS docid,
       rank, ROUND(score, 4) AS score, '{run_tag}' AS run
FROM ({ranked_rel}) WHERE rank <= {k}
"""


def trec_summary(metrics: DataFrame,
                 ks: tuple[int, ...] = (10, 100)) -> DataFrame:
    """A10 — corpus-level metric means (``trec_eval.py:52-59``),
    shaped as the reference report's headline row (HW3 Table 1:
    MAP, MRR, NDCG@10, NDCG@100, Recall@100): mean over queries that
    have qrels (pytrec_eval averages exactly those; zero-qrel queries
    carry NULL metrics here and are excluded)."""
    aggs = [
        F.count("*").cast("int").alias("n_queries"),
        F.round(F.avg("ap"), 6).alias("mean_ap"),
        F.round(F.avg("rr"), 6).alias("mrr"),
    ]
    for k in ks:
        aggs.append(F.round(F.avg(f"ndcg_{k}"), 6).alias(f"ndcg_at_{k}"))
    aggs.append(F.round(F.avg(f"recall_{ks[-1]}"), 6)
                .alias(f"recall_at_{ks[-1]}"))
    return metrics.filter(F.col("n_rel") > 0).agg(*aggs)


def trec_summary_sql(metrics_sql: str, ks: tuple[int, ...] = (10, 100)) -> str:
    ndcg_cols = ",\n       ".join(
        f"ROUND(AVG(ndcg_{k}), 6) AS ndcg_at_{k}" for k in ks
    )
    return f"""
SELECT CAST(COUNT(*) AS INT) AS n_queries,
       ROUND(AVG(ap), 6) AS mean_ap,
       ROUND(AVG(rr), 6) AS mrr,
       {ndcg_cols},
       ROUND(AVG(recall_{ks[-1]}), 6) AS recall_at_{ks[-1]}
FROM ({metrics_sql})
WHERE n_rel > 0
"""


def trec_metrics_sql(run_cte: str, qrels_cte: str,
                     ks: tuple[int, ...] = (10, 100)) -> str:
    """DuckDB oracle over CTEs named ``run`` (query_id, doc_id, rank)
    and ``qrels`` (query_id, doc_id, rel)."""
    per_k_aggs = ",\n           ".join(
        f"SUM(CASE WHEN rel = 1 AND rank <= {k} "
        f"THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg_{k},\n           "
        f"SUM(CASE WHEN rel = 1 AND rank <= {k} THEN 1 ELSE 0 END) AS hits_{k}"
        for k in ks
    )
    per_k_cols = ",\n       ".join(
        f"CASE WHEN t.n_rel > 0 THEN ROUND(dcg_{k} / list_sum(\n"
        f"           [1.0 / log2(i + 1) for i in range(1, least(t.n_rel, {k}) + 1)]), 6)\n"
        f"       END AS ndcg_{k},\n       "
        f"CASE WHEN t.n_rel > 0 THEN ROUND(hits_{k} / t.n_rel::DOUBLE, 6) "
        f"END AS recall_{k}"
        for k in ks
    )
    return f"""
WITH {run_cte},
{qrels_cte},
r_tot AS (SELECT query_id, COUNT(*) AS n_rel FROM qrels GROUP BY query_id),
hits AS (
    SELECT r.query_id, r.doc_id, r.rank, COALESCE(q.rel, 0) AS rel,
           SUM(COALESCE(q.rel, 0)) OVER (
               PARTITION BY r.query_id ORDER BY r.rank) AS cum_rel
    FROM run r LEFT JOIN qrels q USING (query_id, doc_id)),
per_q AS (
    SELECT query_id,
           MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel,
           SUM(CASE WHEN rel = 1 THEN cum_rel / rank ELSE 0.0 END) AS ap_num,
           {per_k_aggs}
    FROM hits GROUP BY query_id)
SELECT p.query_id,
       CAST(COALESCE(t.n_rel, 0) AS INT) AS n_rel,
       ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS rr,
       CASE WHEN t.n_rel > 0 THEN ROUND(ap_num / t.n_rel, 6) END AS ap,
       {per_k_cols}
FROM per_q p LEFT JOIN r_tot t USING (query_id)
"""
