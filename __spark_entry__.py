"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry is an implemented operator from SURVEY.md §2
re-expressed Spark-first; ``oracle_sql()`` holds the DuckDB-ANSI
equivalent run against the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings).
Column names/types are aligned on both sides (the driver hashes
values after sorting columns by name).

The synthetic ``documents`` text is lowercase ASCII words joined by
single spaces (verified), so the SQL-side tokenizer
``string_split(text, ' ')`` is exactly the reference tokenizer's
behavior on this corpus; byte-level fidelity on adversarial input is
pinned by tests/test_tokenizer.py golden cases instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.functions.bm25 import bm25_sql
from cs6913_web_search_engines_spark.operators import (
    block_codec as bc,
    index_build as ib,
    query_exec as qe,
)
from cs6913_web_search_engines_spark.sources import webpages

CFG = EngineConfig()
FLAGSHIP_QUERY = "data fast join"
BATCH_QUERIES = {
    "q0": "data fast join",
    "q1": "the query window",
    "q2": "merge sort stream",
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _built(spark: SparkSession, sf_dir: str):
    docs = _docs(spark, sf_dir)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    stats = ib.corpus_stats(doc_stats, CFG)
    lexicon = ib.build_lexicon(postings)
    return docs, postings, doc_stats, stats, lexicon


# --- SQL oracle building blocks (DuckDB) -----------------------------------

_POSTINGS_CTE = """
postings AS (
    SELECT doc_id, tok AS term, CAST(COUNT(*) AS INT) AS tf
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id, tok
),
doc_stats AS (
    SELECT d.doc_id,
           CAST(octet_length(ENCODE(d.text)) AS INT) AS byte_len,
           COALESCE(p.n, 0) AS distinct_terms
    FROM documents d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM postings GROUP BY doc_id) p
      USING (doc_id)
),
stats AS (
    SELECT COUNT(*) AS total_docs,
           AVG(CAST(distinct_terms AS DOUBLE)) AS avg_len
    FROM doc_stats
),
lexicon AS (
    SELECT term, COUNT(*) AS df, MAX(tf) AS max_tf
    FROM postings GROUP BY term
)
"""


def _bm25_oracle(query_terms: list[str], conjunctive: bool, k: int) -> str:
    vals = ", ".join(f"('{t}')" for t in query_terms)
    score = bm25_sql("p.tf", "l.df", "d.distinct_terms",
                     "s.total_docs", "s.avg_len", CFG)
    having = f"HAVING COUNT(*) = {len(query_terms)}" if conjunctive else ""
    return f"""
WITH {_POSTINGS_CTE},
q(term) AS (VALUES {vals}),
scored AS (
    SELECT p.doc_id, SUM({score}) AS score
    FROM postings p
    JOIN q USING (term)
    JOIN lexicon l ON l.term = p.term
    JOIN doc_stats d ON d.doc_id = p.doc_id
    CROSS JOIN stats s
    GROUP BY p.doc_id
    {having}
)
SELECT doc_id, ROUND(score, 6) AS score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# --- Spark-side queries -----------------------------------------------------

def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ib.build_postings(_docs(spark, sf_dir))


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return ib.build_doc_stats(docs, ib.build_postings(docs))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    ds = ib.build_doc_stats(docs, ib.build_postings(docs))
    return ds.agg(
        F.count("*").alias("total_docs"),
        F.avg(F.col("distinct_terms").cast("double")).alias("avg_len"),
    )


def _q_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ib.build_lexicon(ib.build_postings(_docs(spark, sf_dir)))


def _bm25_query(conjunctive: bool):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _, postings, doc_stats, stats, lexicon = _built(spark, sf_dir)
        res = qe.search(spark, postings, lexicon, doc_stats, stats,
                        FLAGSHIP_QUERY, CFG, conjunctive)
        return res.select("doc_id", F.round("score", 6).alias("score"), "rank")
    return run


def _q_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, postings, doc_stats, stats, lexicon = _built(spark, sf_dir)
    qt = qe.queries_to_terms(spark, BATCH_QUERIES)
    res = qe.score_query_set(postings, qt, lexicon, doc_stats, stats, CFG)
    return res.select("query_id", "doc_id",
                      F.round("score", 6).alias("score"), "rank")


def _q_bm25_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25 *through the compressed index* (encode →
    decode → score) — validates the VarByte/delta block codec against
    the plain-SQL oracle."""
    _, postings, doc_stats, stats, lexicon = _built(spark, sf_dir)
    cfg = EngineConfig(segment_docs=256)  # force multi-segment coverage
    blocks = bc.encode_index(postings, cfg)
    decoded = bc.decode_postings(blocks, cfg)
    res = qe.search(spark, decoded, lexicon, doc_stats, stats,
                    FLAGSHIP_QUERY, cfg, conjunctive=False)
    return res.select("doc_id", F.round("score", 6).alias("score"), "rank")


def _q_webpages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = webpages.synthesize(_docs(spark, sf_dir))
    return webpages.extract_text(pages).select("url", "extracted", "lang")


_BATCH_ORACLE = f"""
WITH {_POSTINGS_CTE},
q(query_id, term) AS (VALUES
    ('q0','data'),('q0','fast'),('q0','join'),
    ('q1','the'),('q1','query'),('q1','window'),
    ('q2','merge'),('q2','sort'),('q2','stream')),
scored AS (
    SELECT q.query_id, p.doc_id,
           SUM({bm25_sql("p.tf", "l.df", "d.distinct_terms",
                         "s.total_docs", "s.avg_len", CFG)}) AS score
    FROM postings p
    JOIN q USING (term)
    JOIN lexicon l ON l.term = p.term
    JOIN doc_stats d ON d.doc_id = p.doc_id
    CROSS JOIN stats s
    GROUP BY q.query_id, p.doc_id
)
SELECT query_id, doc_id, ROUND(score, 6) AS score, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INT) AS rank
    FROM scored)
WHERE rank <= {CFG.top_k}
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch disjunctive top-k BM25 over sf0.001."""
    return _q_bm25_batch(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings": _q_postings,
        "doc_stats": _q_doc_stats,
        "corpus_stats": _q_corpus_stats,
        "lexicon": _q_lexicon,
        "bm25_disjunctive": _bm25_query(conjunctive=False),
        "bm25_conjunctive": _bm25_query(conjunctive=True),
        "bm25_batch": _q_bm25_batch,
        "bm25_compressed": _q_bm25_compressed,
        "webpages_extract": _q_webpages_extract,
    }


def oracle_sql() -> dict[str, str]:
    terms = FLAGSHIP_QUERY.split()
    return {
        "postings": f"WITH {_POSTINGS_CTE} SELECT doc_id, term, tf FROM postings",
        "doc_stats": f"WITH {_POSTINGS_CTE} SELECT doc_id, byte_len, distinct_terms FROM doc_stats",
        "corpus_stats": f"WITH {_POSTINGS_CTE} SELECT total_docs, avg_len FROM stats",
        "lexicon": f"WITH {_POSTINGS_CTE} SELECT term, df, max_tf FROM lexicon",
        "bm25_disjunctive": _bm25_oracle(terms, False, CFG.top_k),
        "bm25_conjunctive": _bm25_oracle(terms, True, CFG.top_k),
        "bm25_batch": _BATCH_ORACLE,
        "bm25_compressed": _bm25_oracle(terms, False, CFG.top_k),
        "webpages_extract": f"""
            SELECT url, regexp_extract(DECODE(html), '<p>(.*)</p>', 1) AS extracted, lang
            FROM ({webpages.synthesize_sql("documents")})
        """,
    }
