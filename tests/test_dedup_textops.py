"""Semantics tests for text-analysis + dedup operators (beyond the
oracle-parity gate in test_entry_parity.py): constructed corpora with
known duplicates / near-duplicates / languages."""

import hashlib

import pytest
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.operators import (
    dedup,
    index_build as ib,
    text_analysis as ta,
)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup (1 word)
        (3, "merge sort stream hash join filter scan table window"), # unrelated
        (4, ""),                                                     # empty
        (5, "der hund und die katze ist nicht ein vogel"),           # German markers
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(toy):
    groups = dedup.exact_duplicates(toy).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["canonical_doc_id"] == 0
    assert g["dup_doc_ids"] == "0,1"
    assert g["content_md5"] == hashlib.md5(
        b"the quick brown fox jumps over the lazy dog"
    ).hexdigest()


def test_ngram_jaccard_finds_near_dup(toy):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(toy, n=3, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0                       # identical
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p or 5 in p for p in pairs)


def test_ngram_jaccard_df_cap_keeps_rare_pairs(toy):
    # df<=3 keeps every real pair while pruning nothing here; df<=2
    # drops (0,2) — its shared shingles all have df=3 — but the exact
    # dup (0,1), sharing df=2 shingles, survives with its FULL-set
    # jaccard (verification never uses the capped sets).
    loose = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(
                 toy, n=3, threshold=0.3, max_shingle_df=3).collect()}
    assert (0, 1) in loose and (0, 2) in loose
    tight = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(
                 toy, n=3, threshold=0.3, max_shingle_df=2).collect()}
    assert tight[(0, 1)] == 1.0
    assert (0, 2) not in tight


def test_minhash_lsh_matches_definition(toy):
    # Found pairs must be exactly: signatures agree on ALL rows of >=1
    # band AND full-set jaccard >= threshold.  Exact dups always
    # collide (identical signatures); near-dups collide
    # probabilistically, which the definition check captures without
    # overclaiming recall.
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.minhash_lsh_pairs(toy, n=3, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    sigs = {r["doc_id"]: r["sig"]
            for r in dedup.minhash_signatures(toy, n=3).collect()}
    sh = {r["doc_id"]: set()
          for r in dedup.doc_shingles(toy, 3).collect()}
    for r in dedup.doc_shingles(toy, 3).collect():
        sh[r["doc_id"]].add(r["shingle"])
    r_rows = dedup.MINHASH_K // dedup.MINHASH_BANDS
    expected = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            collide = any(
                sigs[a][j * r_rows:(j + 1) * r_rows]
                == sigs[b][j * r_rows:(j + 1) * r_rows]
                for j in range(dedup.MINHASH_BANDS)
            )
            jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            if collide and round(jac, 6) >= 0.3:
                expected[(a, b)] = round(jac, 6)
    assert pairs == expected


def test_minhash_signature_is_set_based(spark):
    # identical shingle *sets* (different multiplicity) → same
    # signature: both texts have 2-gram set {"a b", "b c", "c b"}
    df = spark.createDataFrame(
        [(0, "a b c b c"), (1, "a b c b")], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["sig"]
            for r in dedup.minhash_signatures(df, n=2).collect()}
    assert sigs[0] == sigs[1]


def test_simhash_identical_docs_distance_zero(toy):
    postings = ib.build_postings(toy)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(postings, max_hamming=16).collect()}
    assert pairs[(0, 1)] == 0
    # near-dup within a few bits; unrelated docs absent at this cutoff
    assert (0, 2) in pairs


def test_simhash_band_bounds_pigeonhole_shape():
    for mh in (0, 3, 10, 16, 63):
        bounds = dedup.simhash_band_bounds(mh)
        assert len(bounds) == mh + 1
        assert sum(w for _, w in bounds) == dedup.SIMHASH_BITS
        assert all(w >= 1 for _, w in bounds)
        # contiguous, 1-based
        pos = 1
        for s, w in bounds:
            assert s == pos
            pos += w
    with pytest.raises(ValueError):
        dedup.simhash_band_bounds(64)
    with pytest.raises(ValueError):
        dedup.simhash_band_bounds(-1)


def test_simhash_pairs_complete_at_radius(toy):
    # the band join must find EXACTLY the pairs within the radius —
    # brute-force all-pairs Hamming over the signatures is the oracle
    postings = ib.build_postings(toy)
    sigs = {r["doc_id"]: r["bits"]
            for r in dedup.simhash_signatures(postings).collect()}
    ids = sorted(sigs)
    for radius in (4, 10):  # > SIMHASH bands-1 recall bound of round 1
        expected = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
                if h <= radius:
                    expected[(a, b)] = h
        got = {(r["doc_a"], r["doc_b"]): r["hamming"]
               for r in dedup.simhash_pairs(postings, max_hamming=radius).collect()}
        assert got == expected, radius


def test_simhash_packed_matches_bits_array(toy):
    postings = ib.build_postings(toy)
    bits = {r["doc_id"]: r["bits"]
            for r in dedup.simhash_signatures(postings).collect()}
    packed = {r["doc_id"]: r["sig"]
              for r in dedup.simhash_signatures_packed(postings).collect()}
    assert set(bits) == set(packed)
    for d, arr in bits.items():
        want = sum(bit << b for b, bit in enumerate(arr))
        if want >= 1 << 63:           # two's-complement reinterpretation
            want -= 1 << 64
        assert packed[d] == want, d


def test_simhash_band_shuffle_carries_no_array(toy):
    # the shuffle-width fix: the band join must NOT move the 64-int
    # bits array — only the packed long (8 bytes/row/side)
    postings = ib.build_postings(toy)
    plan = (dedup.simhash_pairs(postings, max_hamming=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "bits" not in plan
    assert "array<int>" not in plan.lower().replace(" ", "")


def test_quality_and_counts(toy):
    q = {r["doc_id"]: r for r in ta.quality_scores(toy).collect()}
    assert q[4]["n_tokens"] == 0 and q[4]["quality"] == 0.0
    assert q[0]["stopword_ratio"] > 0
    assert q[0]["quality"] == 1.0
    tc = {r["doc_id"]: r for r in ta.token_counts(toy).collect()}
    assert tc[0]["n_ws_tokens"] == 9
    assert tc[4]["n_ws_tokens"] == 0


def test_lang_id(toy):
    langs = {r["doc_id"]: r["lang_pred"] for r in ta.lang_id(toy).collect()}
    assert langs[0] == "en"
    assert langs[5] == "de"
    assert langs[4] == "und"


def test_fingerprints_shift_tolerance(spark):
    # min-shingle fingerprint survives a prefix edit; md5/rolling change
    df = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5 w6 w7 w8"), (1, "zz w1 w2 w3 w4 w5 w6 w7 w8")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r for r in ta.fingerprints(df, shingle_n=4).collect()}
    assert fp[0]["content_md5"] != fp[1]["content_md5"]
    assert fp[0]["roll_hash"] != fp[1]["roll_hash"]
    assert fp[0]["min_shingle_hash"] == fp[1]["min_shingle_hash"]


def test_rolling_hash_matches_python(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    got = ta.fingerprints(df).collect()[0]["roll_hash"]
    h = 0
    for ch in "abc":
        h = (h * 31 + ord(ch)) % (1 << 31)
    assert got == h
