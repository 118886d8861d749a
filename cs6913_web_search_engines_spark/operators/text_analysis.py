"""Text-analysis operators for training-data pipelines.

Scale-path additions beyond the reference engine (SURVEY §7
follow-ons): per-document token counting, quality scoring, n-gram
language ID, and content fingerprinting over the ``documents`` table.
All four are pure Column expressions (JVM whole-stage codegen, no
Python in the hot path) and are embarrassingly parallel — one
narrow map over the corpus scan, no shuffle — so they scale linearly
with executors at 10^12-doc scale.

Reference tie-ins: token counting generalizes ``_calcWordFreq``'s
word counting (query_processor/src/IndexBuilder.cpp:56-111); the
stopword list doubles as the head-term ("the") skew set the merge
salting targets (SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cs6913_web_search_engines_spark.functions import hashing

# Stopword profile reused by quality scoring and language ID.  The
# synthetic corpus is English-ish lowercase words; profiles for other
# languages use marker words that simply never match there (the
# operator's semantics, not its vocabulary, is what scales).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans"),
    "es": ("el", "los", "las", "es", "una", "para", "por"),
}
STOPWORDS = LANG_PROFILES["en"]

# BPE-ish pre-tokenization: alpha runs, digit runs, or single
# non-alnum-non-space symbols — the classic GPT-2-style pretoken
# classes reduced to ASCII (public regex shape, not a library dep).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(documents: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars) — whitespace and
    BPE-ish token counts per document."""
    toks = hashing.tokens_col(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length("text").cast("int").alias("n_chars"),
    )


def token_counts_sql(docs: str = "documents") -> str:
    toks = hashing.TOKENS_SQL.format(text="text")
    return f"""
SELECT doc_id,
       CAST(len({toks}) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS INT) AS n_bpe_tokens,
       CAST(length(text) AS INT) AS n_chars
FROM {docs}
"""


def quality_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, stopword_ratio, alnum_ratio,
    quality) — heuristic quality features + a [0,1] score.

    quality = mean of three indicator features (length band, stopword
    presence, alnum density) — deterministic arithmetic only, so the
    DuckDB oracle reproduces it exactly.
    """
    toks = hashing.tokens_col(F.col("text"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_alnum = F.length(F.regexp_replace("text", "[^a-z0-9]", ""))
    d = documents.select(
        "doc_id",
        n.alias("n_tokens"),
        F.when(n > 0, F.round((F.length("text") - (n - 1)) / n, 6))
        .otherwise(0.0).alias("mean_token_len"),
        F.when(n > 0, F.round(n_stop / n, 6)).otherwise(0.0).alias("stopword_ratio"),
        F.when(F.length("text") > 0, F.round(n_alnum / F.length("text"), 6))
        .otherwise(0.0).alias("alnum_ratio"),
    )
    return d.withColumn(
        "quality",
        F.round(
            (
                F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 1000), 1.0)
                .otherwise(0.0)
                + F.when(F.col("stopword_ratio") > 0, 1.0).otherwise(0.0)
                + F.when(F.col("alnum_ratio") >= 0.5, 1.0).otherwise(0.0)
            )
            / 3.0,
            6,
        ),
    )


def quality_scores_sql(docs: str = "documents") -> str:
    toks = hashing.TOKENS_SQL.format(text="text")
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH feat AS (
    SELECT doc_id,
           CAST(len({toks}) AS INT) AS n_tokens,
           CASE WHEN len({toks}) > 0
                THEN ROUND((length(text) - (len({toks}) - 1)) / len({toks})::DOUBLE, 6)
                ELSE 0.0 END AS mean_token_len,
           CASE WHEN len({toks}) > 0
                THEN ROUND(len(list_filter({toks}, t -> t IN ({sw})))
                           / len({toks})::DOUBLE, 6)
                ELSE 0.0 END AS stopword_ratio,
           CASE WHEN length(text) > 0
                THEN ROUND(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))
                           / length(text)::DOUBLE, 6)
                ELSE 0.0 END AS alnum_ratio
    FROM {docs})
SELECT *,
       ROUND(((CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN stopword_ratio > 0 THEN 1.0 ELSE 0.0 END)
            + (CASE WHEN alnum_ratio >= 0.5 THEN 1.0 ELSE 0.0 END)) / 3.0,
             6) AS quality
FROM feat
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — marker-word language ID.

    Score per language = number of tokens in that language's marker
    profile; argmax with ties broken by language code ascending; zero
    hits everywhere → 'und'.  One scan, no shuffle: the per-language
    hit counts are a fixed-width set of filtered array sizes.
    """
    toks = hashing.tokens_col(F.col("text"))
    def hits(profile: tuple[str, ...]):
        return lambda t: t.isin(*profile)

    hit_cols = [
        F.size(F.filter(toks, hits(LANG_PROFILES[lang]))).alias(f"hits_{lang}")
        for lang in sorted(LANG_PROFILES)
    ]
    d = documents.select("doc_id", *hit_cols)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in sorted(LANG_PROFILES)])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_PROFILES):
        pred = pred.when(F.col(f"hits_{lang}") == best, F.lit(lang))
    return d.select("doc_id", pred.alias("lang_pred"), best.alias("lang_hits"))


def lang_id_sql(docs: str = "documents") -> str:
    toks = hashing.TOKENS_SQL.format(text="text")
    hits = ", ".join(
        f"CAST(len(list_filter({toks}, t -> t IN "
        f"({', '.join(chr(39) + w + chr(39) for w in LANG_PROFILES[lang])}))) AS INT)"
        f" AS hits_{lang}"
        for lang in sorted(LANG_PROFILES)
    )
    langs = sorted(LANG_PROFILES)
    best = "GREATEST(" + ", ".join(f"hits_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH h AS (SELECT doc_id, {hits} FROM {docs})
SELECT doc_id, {case} AS lang_pred, {best} AS lang_hits FROM h
"""


def fingerprints(documents: DataFrame, shingle_n: int = 4) -> DataFrame:
    """(doc_id, content_md5, roll_hash, min_shingle_hash) — exact and
    shift-tolerant document fingerprints.

    content_md5: exact-dup key; roll_hash: polynomial rolling hash of
    the bytes; min_shingle_hash: winnowing-style minimum over word
    n-gram hashes (survives local edits).  All md5-derived → identical
    in the DuckDB oracle (functions/hashing.py).
    """
    sh = hashing.shingles_col(F.col("text"), shingle_n)
    min_sh = F.array_min(F.transform(sh, lambda s: hashing.hash60_col(s)))
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("content_md5"),
        hashing.rolling_hash_col(F.col("text")).alias("roll_hash"),
        F.coalesce(min_sh, F.lit(None).cast("long")).alias("min_shingle_hash"),
    )


def fingerprints_sql(docs: str = "documents", shingle_n: int = 4) -> str:
    sh = hashing.shingles_sql("text", shingle_n)
    return f"""
SELECT doc_id,
       md5(text) AS content_md5,
       {hashing.rolling_hash_sql("text")} AS roll_hash,
       list_min([{hashing.hash60_sql("s")} for s in {sh}]) AS min_shingle_hash
FROM {docs}
"""
