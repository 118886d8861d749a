"""BM25 as a pure Column expression (JVM-side, codegen-friendly).

Formula per ``ranking_optimizer/src/QueryProcessor.cpp:18-41``::

    K     = k1 * ((1 - b) + b * doc_len / avg_len)
    idf   = log((N - df + 0.5) / (df + 0.5))        # natural log, UNCLAMPED
    score = idf * (k1 + 1) * tf / (K + tf)

The IDF is deliberately unclamped (negative for df > N/2) to stay
rank-identical with the reference.  ``doc_len`` is the distinct-term
count in HW3 mode and the byte length in HW2 mode (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig, DEFAULT


def bm25_score(
    tf: Column,
    df: Column,
    doc_len: Column,
    total_docs: Column | int,
    avg_len: Column | float,
    cfg: EngineConfig = DEFAULT,
) -> Column:
    k1, b = cfg.k1, cfg.b
    n = F.lit(total_docs) if isinstance(total_docs, int) else total_docs
    avg = F.lit(avg_len) if isinstance(avg_len, (int, float)) else avg_len
    K = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * doc_len.cast("double") / avg)
    idf = F.log((n.cast("double") - df.cast("double") + F.lit(0.5))
                / (df.cast("double") + F.lit(0.5)))
    return idf * F.lit(k1 + 1.0) * tf.cast("double") / (K + tf.cast("double"))


def bm25_sql(tf: str, df: str, doc_len: str, n: str, avg_len: str,
             cfg: EngineConfig = DEFAULT) -> str:
    """The same formula as an ANSI-SQL string (for DuckDB oracles)."""
    k1, b = cfg.k1, cfg.b
    K = f"({k1} * ((1 - {b}) + {b} * CAST({doc_len} AS DOUBLE) / {avg_len}))"
    idf = f"LN((CAST({n} AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))"
    return f"({idf} * ({k1} + 1) * CAST({tf} AS DOUBLE) / ({K} + {tf}))"
