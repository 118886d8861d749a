"""Deterministic cross-engine hash / shingle primitives.

The dedup, fingerprinting, and LSH operators must produce *identical*
values in the Spark engine and in the DuckDB oracle SQL the driver
runs side-by-side.  Engine-native hashes (``xxhash64`` vs ``hash()``)
differ, so every content hash here is derived from ``md5`` — the one
cryptographic hash both engines expose with identical lowercase-hex
output — reduced to integers via hex-digit arithmetic that both
engines express exactly.

Each primitive therefore comes in two forms built from one template:
``*_col(...)`` returns a Spark ``Column`` and ``*_sql(...)`` returns
the equivalent DuckDB SQL snippet.  Keeping both in one module is the
single-source-of-truth that makes the driver's value-hash comparison
meaningful.

Reference analog: the reference reduces terms/urls to integers only
via ``std::map`` ordering and docID assignment; content hashing is
our scale-path addition (SURVEY §7 follow-ons).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# 60-bit integer hash of a string: first 15 hex digits of md5.
# 15 digits = 60 bits < 2^63, so the value is an exact non-negative
# BIGINT in both engines (no sign/overflow divergence).
# ---------------------------------------------------------------------------


def hash60_col(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ---------------------------------------------------------------------------
# Seeded hash family for MinHash: h_i(s) = hash60(i || ':' || s).
# ---------------------------------------------------------------------------


def seeded_hash_col(seed: Column | int, c: Column) -> Column:
    s = F.lit(seed) if isinstance(seed, int) else seed
    return hash60_col(F.concat_ws(":", s.cast("string"), c))


def seeded_hash_sql(seed_expr: str, expr: str) -> str:
    return hash60_sql(f"CAST({seed_expr} AS VARCHAR) || ':' || {expr}")


# ---------------------------------------------------------------------------
# Bit b (0..63) of the md5-derived 64-bit hash of a string, extracted
# hex-nibble-wise: nibble = hex digit (1 + b/4) of md5, bit = nibble
# >> (b%4) & 1.  Used by SimHash; the formula is chosen so both
# engines compute it with plain substr + integer ops.
# ---------------------------------------------------------------------------

# Spark-side: used inside a transform(...) lambda over the bit index,
# so it is expressed as a SQL-expr template over names, not Columns.
def bit_expr_spark(s_expr: str, b_expr: str) -> str:
    return bit_expr_spark_hex(f"md5({s_expr})", b_expr)


def bit_expr_spark_hex(hex_expr: str, b_expr: str) -> str:
    """Same bit formula over an ALREADY-md5'd hex column: transform
    lambdas are evaluated interpreted with no common-subexpression
    hoisting across iterations, so embedding md5() in the per-bit expr
    hashes the same term 64× per row — callers project md5 once and
    pass the column here."""
    nib = f"conv(substr({hex_expr}, 1 + CAST({b_expr} / 4 AS INT), 1), 16, 10)"
    return f"CAST((shiftright(CAST({nib} AS INT), {b_expr} % 4)) & 1 AS INT)"


def bit_expr_duck(s_expr: str, b_expr: str) -> str:
    nib = f"(strpos('0123456789abcdef', substr(md5({s_expr}), 1 + ({b_expr}) // 4, 1)) - 1)"
    return f"(({nib} >> (({b_expr}) % 4)) & 1)"


# ---------------------------------------------------------------------------
# Tokens and word-n-gram shingles over the corpus text.  The synthetic
# corpus joins lowercase words with single spaces, and the engine
# tokenizer (functions/tokenizer.py) reduces to exactly
# split-on-space there; empty tokens are dropped on both sides.
# ---------------------------------------------------------------------------


def tokens_col(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda x: x != "")


TOKENS_SQL = "list_filter(string_split({text}, ' '), x -> x <> '')"


def shingles_col(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty when < n tokens."""
    toks = tokens_col(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(text_expr: str, n: int) -> str:
    toks = TOKENS_SQL.format(text=text_expr)
    return (
        f"[array_to_string(({toks})[i:i+{n - 1}], ' ') "
        f"for i in range(1, len({toks}) - {n - 2})]"
    )


# ---------------------------------------------------------------------------
# Polynomial rolling hash over the text bytes (document fingerprint,
# SURVEY §7 follow-ons "document fingerprinting"):
#   h = fold(chars, 0, (h, ch) -> (h * 31 + ascii(ch)) % 2^31)
# Sequential left fold in both engines → identical value.  The corpus
# text is ASCII so ascii(char) == byte value.
# ---------------------------------------------------------------------------

_MOD = 1 << 31


def rolling_hash_col(text: Column) -> Column:
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % _MOD,
    )


def rolling_hash_sql(text_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(c) AS BIGINT) for c in string_split({text_expr}, '')]), "
        f"(h, c) -> (h * 31 + c) % {_MOD})"
    )
