"""PySpark-native full-text indexing + BM25 query engine.

A brand-new, Spark-first re-expression of the capabilities of the
CS6913 reference (web crawler / inverted-index builder / BM25 query
processor / rerank harness at /root/reference):

- corpus ingestion from a web-pages table (url, warc_ts, html, text, lang)
- byte-faithful tokenization via vectorized Arrow/pandas UDFs
- distributed inverted-index build: per-partition sorted posting runs,
  shuffle-as-k-way-merge, VarByte/delta-gap block compression with
  block-max metadata, term-sharded layout, lexicon + doc-stats tables
- conjunctive / disjunctive top-k BM25 (k1=1.2, b=0.75), batch query sets
- training-data pipeline extras: dedup (exact/minhash/simhash/jaccard),
  ANN cosine top-k, text quality/langid, TREC metrics, rerank

Everything is DataFrame-declarative so Catalyst handles pushdown,
pruning and join planning; pandas UDFs are used only for the four
non-relational kernels (tokenizer, block codec, minhash, cosine batch).
"""

__version__ = "0.1.0"

from cs6913_web_search_engines_spark.config import EngineConfig

__all__ = ["EngineConfig"]
