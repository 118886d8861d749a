"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Training-data-pipeline additions beyond the reference engine.  Design
targets 10^12-doc scale:

* **exact**: one hash-aggregate on the content digest — map-side
  partial agg, one shuffle on a uniformly distributed key (md5), no
  skew by construction.
* **n-gram Jaccard**: candidate generation through the *shingle
  inverted index* (the same structure as the engine's posting lists —
  SURVEY §1.3 applied to shingles instead of terms): docs pair only
  if they share a shingle, never all-pairs.  Head-shingle skew is the
  head-term skew problem and uses the same remedy: a df-cap drops
  stop-shingles from candidate generation (they cannot distinguish
  near-dups) exactly like the salting threshold in the index merge.
* **MinHash-LSH**: k=16 md5-seeded min-hashes per doc, banded 4×4;
  candidates = band-bucket join (shuffle key = (band, 4-tuple), high
  cardinality → uniform); exact Jaccard verifies candidates.  This is
  the standard shingle→minhash→band→bucket-join pipeline; per-doc
  signature state is O(k), never O(shingles).
* **SimHash**: 64-bit tf-weighted signature from md5-nibble bits,
  carried through the band join as ONE packed int64 (8 bytes/row, not
  a 64-int array); a band join with ``max_hamming + 1`` bands finds
  ALL pairs with Hamming distance ≤ max_hamming by pigeonhole (band
  count derived from the radius — complete at any radius ≤ 63);
  ``bit_count(xor)`` verifies.

Every hash is md5-derived (functions/hashing.py) so the DuckDB oracle
reproduces values bit-for-bit.

Scale notes (the honest limits of pair-output LSH):

* **Identical-content clusters**: m copies of one page share every
  band key, so any pair-emitting LSH inherently outputs m(m-1)/2
  rows — that is the OUTPUT size, not an implementation artifact.
  The single hot (band, key) reducer is NOT a straggler: AQE skew-join
  handling (``spark.sql.adaptive.skewJoin.enabled``, on by default)
  splits a skewed partition — even one key — into sub-tasks and
  replicates the matching side.  The quadratic output itself is
  bounded by pipeline order: run :func:`exact_duplicates` first and
  near-dup only canonical survivors (the standard corpus-dedup
  pipeline), which collapses identical-content mass before banding.
* **SimHash banding width**: pigeonhole completeness at radius r
  forces r+1 bands of ≤ ``64 // (r+1)`` bits, so the bucket space
  caps at 2^width per band (65,536 at r=3; 64 at r=10).  Corpora with
  N ≫ 2^width need Manku-style multi-block probing (join keys built
  from COMBINATIONS of blocks, sorted-table probes) — out of scope
  here; prefer MinHash-LSH (band keys are 4×60-bit hashes, effectively
  unbounded cardinality) or radius ≤ 3 at the 10^9+ regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cs6913_web_search_engines_spark.functions import hashing

MINHASH_K = 16
MINHASH_BANDS = 4  # rows per band = MINHASH_K // MINHASH_BANDS = 4
SIMHASH_BITS = 64


def simhash_band_bounds(max_hamming: int) -> list[tuple[int, int]]:
    """(start, width) 1-based slices cutting the 64-bit signature into
    ``max_hamming + 1`` nearly-equal bands.

    Pigeonhole completeness: two signatures within Hamming distance
    ``max_hamming`` differ in ≤ max_hamming bands, so with
    max_hamming+1 bands at least one band matches exactly — the band
    join finds EVERY qualifying pair (no recall gap at any
    max_hamming ≤ 63)."""
    if not 0 <= max_hamming < SIMHASH_BITS:
        raise ValueError(f"max_hamming must be in [0, {SIMHASH_BITS - 1}]")
    bands = max_hamming + 1
    base, rem = divmod(SIMHASH_BITS, bands)
    bounds, start = [], 1
    for j in range(bands):
        w = base + (1 if j < rem else 0)
        bounds.append((start, w))
        start += w
    return bounds


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

# Cap on ids listed per duplicate group: web corpora have giant
# exact-dup groups (empty pages, '404' boilerplate) — an unbounded
# collect_list would hold a 10^8-element aggregation buffer and emit a
# multi-GB string cell for exactly the groups the operator exists to
# find.  Counts stay exact over the FULL group; only the id sample is
# capped.
DUP_IDS_MAX = 100


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """(content_md5, n_dups, canonical_doc_id, dup_doc_ids) for every
    content group with >1 member; canonical = min doc_id (keep-first
    policy, deterministic).  ``dup_doc_ids`` lists the first
    :data:`DUP_IDS_MAX` ids (sorted, comma-joined) — a bounded sample;
    ``n_dups`` is the exact full-group count.  The window ranking is
    sort-based (spills), so no aggregation buffer ever holds a whole
    giant group."""
    w = Window.partitionBy("content_md5").orderBy("doc_id")
    return (
        documents.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("content_md5")
        )
        .withColumn("rn", F.row_number().over(w))
        .groupBy("content_md5")
        .agg(
            F.count("*").cast("int").alias("n_dups"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.when(F.col("rn") <= DUP_IDS_MAX, F.col("doc_id"))
                    )),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("dup_doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_duplicates_sql(docs: str = "documents") -> str:
    return f"""
SELECT content_md5,
       CAST(COUNT(*) AS INT) AS n_dups,
       MIN(doc_id) AS canonical_doc_id,
       array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= {DUP_IDS_MAX})),
                       ',') AS dup_doc_ids
FROM (SELECT doc_id, md5(text) AS content_md5,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM {docs})
GROUP BY content_md5
HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# Shingle table (shared by Jaccard + MinHash)
# ---------------------------------------------------------------------------

def doc_shingles(documents: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) — DISTINCT word n-grams per doc (set
    semantics, as in set-based Jaccard)."""
    return (
        documents.select(
            "doc_id",
            F.explode(hashing.shingles_col(F.col("text"), n)).alias("shingle"),
        )
        .distinct()
    )


def _shingles_cte(docs: str, n: int) -> str:
    return f"""
shingles AS (
    SELECT DISTINCT doc_id, UNNEST({hashing.shingles_sql("text", n)}) AS shingle
    FROM {docs}
)"""


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup pairs
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for doc pairs with set-Jaccard over
    word n-grams ≥ threshold (doc_a < doc_b).

    Candidates come from self-joining the shingle inverted index;
    ``max_shingle_df`` drops shingles appearing in more than that many
    docs from candidate generation (stop-shingle skew cap — at
    threshold t a true near-dup pair always shares a rarer shingle
    unless *all* its shingles are stop-shingles, which the df cap is
    sized against; None = exact).
    """
    sh = doc_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # explicit renames (not .alias) — a self-join of a derived frame
    # silently resolves ambiguous columns to one side otherwise
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    if max_shingle_df is not None:
        # candidates from rare shingles only; verification (the exact
        # intersection count) always uses the FULL shingle sets
        keep = (
            sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df).select("shingle")
        )
        ka = a.join(keep, "shingle")
        kb = b.join(keep, "shingle")
        cands = (
            ka.join(kb, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        inter = (
            cands.join(a, "doc_a")
            .join(b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "sa"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "sb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sa") + F.col("sb") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_sql(docs: str = "documents", n: int = 3,
                      threshold: float = 0.8,
                      max_shingle_df: int | None = None) -> str:
    """Oracle for :func:`ngram_jaccard_pairs`; with ``max_shingle_df``
    it mirrors the capped candidate generation (candidates from rare
    shingles, verification over full shingle sets)."""
    if max_shingle_df is not None:
        cand = f"""
keep AS (
    SELECT shingle FROM shingles GROUP BY shingle
    HAVING COUNT(*) <= {max_shingle_df}),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM shingles a
    JOIN keep k ON k.shingle = a.shingle
    JOIN shingles b ON b.shingle = a.shingle AND a.doc_id < b.doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
    FROM cands c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY 1, 2)"""
    else:
        cand = """
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2)"""
    return f"""
WITH {_shingles_cte(docs, n)},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
{cand}
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter)::DOUBLE, 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(documents: DataFrame, n: int = 3,
                       k: int = MINHASH_K) -> DataFrame:
    """(doc_id, sig array<long>[k]) — sig[i] = min over shingles of
    the i-seeded md5 hash.  Docs with no shingles get no signature
    (they cannot near-dup match)."""
    sh = doc_shingles(documents, n)
    hashed = sh.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: hashing.seeded_hash_col(i, F.col("shingle")),
            )
        ).alias("i", "h"),
    )
    return (
        hashed.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "mh"))).alias("s"))
        .select("doc_id", F.col("s.mh").alias("sig"))
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH-candidate pairs verified with
    exact shingle Jaccard ≥ threshold.

    Candidates = pairs agreeing on ALL rows of ≥1 band.  The bucket
    join shuffles on (band_idx, band_values) — md5-uniform, so no
    reducer hot-spots; verification joins candidates back to the
    shingle index (semi-join pattern, never all-pairs).
    """
    if bands < 1 or bands > k or k % bands:
        # k % bands would silently drop the signature tail from every
        # band; bands > k would make r = 0, every band key empty, and
        # the bucket join an all-pairs explosion
        raise ValueError(
            f"bands must divide k with 1 <= bands <= k "
            f"(got k={k}, bands={bands})")
    r = k // bands
    sig = minhash_signatures(documents, n, k)
    bandtab = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.concat_ws(
                    ",", F.transform(F.slice("sig", j * r + 1, r),
                                     lambda x: x.cast("string"))
                ),
            )
        ).alias("band", "key"),
    )
    a = bandtab.withColumnRenamed("doc_id", "doc_a")
    b = bandtab.withColumnRenamed("doc_id", "doc_b")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = doc_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.withColumnRenamed("doc_id", "doc_a")
    sb = sh.withColumnRenamed("doc_id", "doc_b")
    inter = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_sql(
    docs: str = "documents",
    n: int = 3,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> str:
    r = k // bands
    mh = hashing.seeded_hash_sql("i", "shingle")
    band_keys = ", ".join(
        "array_to_string(sig[{lo}:{hi}], ',')".format(lo=j * r + 1, hi=(j + 1) * r)
        + f" AS k{j}"
        for j in range(bands)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, k{j} AS key FROM bandkeys" for j in range(bands)
    )
    return f"""
WITH {_shingles_cte(docs, n)},
hashed AS (
    SELECT doc_id, UNNEST(range(0, {k})) AS i, shingle FROM shingles),
mh AS (
    SELECT doc_id, i, MIN({mh}) AS mh FROM hashed GROUP BY doc_id, i),
sigs AS (
    SELECT doc_id, list(mh ORDER BY i) AS sig FROM mh GROUP BY doc_id),
bandkeys AS (SELECT doc_id, {band_keys} FROM sigs),
bandtab AS ({band_union}),
cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bandtab a JOIN bandtab b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
    FROM cands c
    JOIN shingles sa ON sa.doc_id = c.doc_a
    JOIN shingles sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
    GROUP BY 1, 2)
SELECT doc_a, doc_b,
       ROUND(n_inter / (na.n_sh + nb.n_sh - n_inter)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE ROUND(n_inter / (na.n_sh + nb.n_sh - n_inter)::DOUBLE, 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _simhash_bitsums(postings: DataFrame) -> DataFrame:
    """postings(doc_id, term, tf) → (doc_id, b, s): the signed
    per-bit contribution sums Σ_terms tf·(2·hashbit_b(term)−1),
    hashbit from the md5 nibble formula (functions/hashing.py).
    One posexplode + one hash-aggregate, all JVM expressions —
    the shared front half of the array and packed signature forms
    (which must stay bit-identical for the parity test to mean
    anything)."""
    contrib = postings.select(
        # md5 projected ONCE per posting row; the transform lambda is
        # interpreted per bit with no cross-iteration hoisting, so an
        # inline md5(term) would hash the same term 64× per row
        "doc_id", "tf", F.md5("term").alias("th"),
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, {m}), b -> tf * (2 * {bit} - 1))".format(
                    m=SIMHASH_BITS - 1,
                    bit=hashing.bit_expr_spark_hex("th", "b"),
                )
            )
        ).alias("b", "c"),
    )
    return contrib.groupBy("doc_id", "b").agg(F.sum("c").alias("s"))


def simhash_signatures(postings: DataFrame) -> DataFrame:
    """postings(doc_id, term, tf) → (doc_id, bits array<int>[64]).

    bit b = 1 iff the bit's contribution sum is positive
    (:func:`_simhash_bitsums`).
    """
    return (
        _simhash_bitsums(postings)
        .withColumn("bit", F.when(F.col("s") > 0, 1).otherwise(0))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("b", "bit"))).alias("a"))
        .select("doc_id", F.col("a.bit").alias("bits"))
    )


def simhash_signatures_packed(postings: DataFrame) -> DataFrame:
    """(doc_id, sig int64) — the 64-bit signature packed into ONE long
    (bit b of ``sig`` = bits[b] of :func:`simhash_signatures`; bit 63
    lands in the sign via two's complement — each power of two appears
    at most once, so the sum never overflows).

    This is the shuffle-width fix for the band join: carrying the
    signature as 8 bytes instead of a 64-element int array cuts the
    candidate shuffle by ~30× and turns the Hamming verify into one
    ``bit_count(xor)`` instruction."""
    return (
        _simhash_bitsums(postings)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("sig")
        )
    )


def _band_key_expr(start: int, width: int):
    """Band ``[start, start+width)`` (1-based over bit positions) of a
    packed ``sig`` as a long key."""
    if width >= SIMHASH_BITS:
        return F.col("sig")
    mask = (1 << width) - 1
    return F.expr(f"shiftrightunsigned(sig, {start - 1}) & {mask}L")


def simhash_pairs(postings: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) for ALL pairs with Hamming(sig) ≤
    max_hamming.

    Band join with ``max_hamming + 1`` bands (simhash_band_bounds):
    any qualifying pair agrees exactly on ≥1 band (pigeonhole), so the
    bucket join is complete at every max_hamming ≤ 63;
    ``bit_count(sig_a ^ sig_b)`` then computes the exact distance.
    More bands = more candidate volume — the price of full recall at
    larger radii.  Both the band shuffle and the candidate join carry
    the signature as one packed int64 (:func:`simhash_signatures_packed`),
    not the 64-int array — 8 bytes/row/side instead of ~260."""
    sig = simhash_signatures_packed(postings)
    bounds = simhash_band_bounds(max_hamming)
    keys = F.array(*[_band_key_expr(s, w) for s, w in bounds])
    bandtab = sig.select(
        "doc_id", "sig", F.posexplode(keys).alias("band", "key")
    )
    a = bandtab.withColumnsRenamed({"doc_id": "doc_a", "sig": "sig_a"})
    b = bandtab.withColumnsRenamed({"doc_id": "doc_b", "sig": "sig_b"})
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sig_a ^ sig_b)").alias("hamming"),
        )
        # hamming is a pure function of the pair, so filtering BEFORE
        # the distinct shuffle is identical output — and band-collision
        # pairs beyond the radius (typically the large majority) never
        # enter the dedup exchange
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_sql(postings_cte: str, max_hamming: int = 3) -> str:
    """DuckDB oracle over a CTE named ``postings`` (doc_id, term, tf);
    mirrors the max_hamming-derived banding of :func:`simhash_pairs`."""
    bit = hashing.bit_expr_duck("term", "b")
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, bits, {j} AS band, "
        f"array_to_string(bits[{s}:{s + w - 1}], '') AS key "
        "FROM sigs"
        for j, (s, w) in enumerate(simhash_band_bounds(max_hamming))
    )
    return f"""
WITH {postings_cte},
contrib AS (
    SELECT doc_id, b, tf * (2 * {bit} - 1) AS c
    FROM (SELECT doc_id, term, tf, UNNEST(range(0, {SIMHASH_BITS})) AS b
          FROM postings)),
bitsum AS (
    SELECT doc_id, b, SUM(c) AS s FROM contrib GROUP BY doc_id, b),
sigs AS (
    SELECT doc_id,
           list(CASE WHEN s > 0 THEN 1 ELSE 0 END ORDER BY b) AS bits
    FROM bitsum GROUP BY doc_id),
bandtab AS ({band_union}),
pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.bits AS ba, b.bits AS bb
    FROM bandtab a JOIN bandtab b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(list_sum([abs(ba[i] - bb[i]) for i in range(1, {SIMHASH_BITS + 1})]) AS INT)
           AS hamming
FROM pairs
WHERE list_sum([abs(ba[i] - bb[i]) for i in range(1, {SIMHASH_BITS + 1})]) <= {max_hamming}
"""
