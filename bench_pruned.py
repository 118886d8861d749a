"""Block-max pruning crossover: decoded volume + wall-clock vs corpus size.

The per-round bench records the pruned tier at the 100 k-doc gate
workload, where ANY multi-job plan loses to the segmented tier's two
stages — fixed stage-scheduling cost dominates.  The tier's value is
the scale trend: the exhaustive plan's decoded volume grows linearly
with the corpus while the pruned plan's stays pinned to the segments
that can still beat θ.  This bench measures both at two corpus sizes
(REPLICATE and 4×REPLICATE of the sf docs), same skew shape as
bench.py's skew phase (a high-tf term concentrated in segment 0 — the
Zipf head the uniform synthetic corpus lacks), low vocabulary
expansion (VEXP=2) so common terms carry big, positive-idf posting
lists — the regime block-max pruning exists for.

Output: one JSON line per size with pruned/exhaustive times, decoded
block counts, and the prune ratio.  Appended to SCALING.json-style
history in PRUNED_BENCH.json.

Usage: python bench_pruned.py     # ~5 min on local[32]
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.config import EngineConfig
from cs6913_web_search_engines_spark.engine import QueryEngine
from cs6913_web_search_engines_spark.operators import index_build as ib, pruning
from cs6913_web_search_engines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("PRUNED_BENCH_REPLICATE", "100"))
VEXP = int(os.environ.get("PRUNED_BENCH_VEXP", "2"))
# replicate multipliers per level: 1,4,16 → 0.5 M / 2 M / 8 M docs at
# the default REPLICATE=100 over the 5 k-doc sf0.1 corpus.  Round 3
# measured only 1,4 — where per-job scheduling floors dominate and the
# exhaustive tier wins wall-clock; the ≥16 levels are where the
# exhaustive plan's linearly-growing decode overtakes the pruned
# tier's flat cost (VERDICT r3 #1: demonstrate the crossover).
MULTS = [int(m) for m in
         os.environ.get("PRUNED_BENCH_MULTS", "1,4,16").split(",")]

# Batch size: the reference's own batch workload is 1,097 TREC queries
# (HW3 PDF §4.1); 8 queries keeps both tiers at the per-job scheduling
# floor, so the crossover levels run the realistic batch width where
# the exhaustive plan's work (Σ_q candidate postings) actually bites.
N_QUERIES = int(os.environ.get("PRUNED_BENCH_QUERIES", "8"))

# Corpus shape.  "hothead" (default): one high-tf term concentrated in
# segment 0 — the block-level pruning regime (whole blocks/segments
# drop below θ).  "chunkskew": the hot term ALSO has a long tf=1 tail
# across every block, with tf=50 spikes every ~4 k docs — so almost
# every block survives block-level pruning on its max_tf=50 bound, but
# only the spike CHUNKS inside clear the cut_ub; this is the regime
# chunk-level skipping (VERDICT r3 #2) exists for (web reality: a
# term's tf distribution is skewed *inside* posting-list blocks, e.g.
# boilerplate mentions vs topical pages).  The chunkskew rows make the
# chunk counters a measured quantity instead of pytest-only.
#
# "zipf": a synthetic corpus whose TERM DF DISTRIBUTION is Zipfian
# over a ~200 k-term vocabulary — the shape real web text has (MS
# MARCO: 1.47 M terms) and the uniform 31-word bench vocabulary does
# not (VERDICT r4 #3: every term in ~77 % of docs is structurally
# pruning-hostile, so gate constants calibrated there are suspect on
# real corpora).  Sampling: word slot i of doc d draws rank =
# floor(V^u) with u = hash(d, i)/2^20 uniform — P(rank ≤ r) =
# ln r / ln V, i.e. p(r) ∝ 1/r, classic Zipf s=1 — entirely in Spark
# SQL (xxhash64 + pow), no UDF, deterministic.  Queries mix one head,
# one mid, one tail term, so per-query candidate volumes span the
# gate's whole range in one batch.
SHAPE = os.environ.get("PRUNED_BENCH_SHAPE", "hothead")
ZIPF_VOCAB = 200_000
ZIPF_WORDS = 24
_WORDS = ["data", "fast", "the", "query", "merge", "sort", "spark",
          "filter", "window", "table", "column", "vector", "stream",
          "value", "small", "join", "big", "group", "hash", "customer",
          "order", "slow", "line", "part"]
def _zipf_query(i: int) -> str:
    head = 1 + i % 5
    mid = 50 + (i * 7) % 2000
    tail = 5000 + (i * 131) % (ZIPF_VOCAB - 5000)
    return f"z{head} z{mid} z{tail}"


QUERIES = {
    # chunkskew: single-term queries on the skewed term — cut_ub = θ
    # directly (no other-terms slack), isolating the chunk-bound cut
    f"p{i}": ("hotterm" if SHAPE == "chunkskew"
              else _zipf_query(i) if SHAPE == "zipf"
              else f"hotterm {_WORDS[i % len(_WORDS)]}q{i % VEXP}")
    for i in range(N_QUERIES)
}


def corpus(spark, replicate: int) -> str:
    path = f"/dev/shm/pruned_corpus_{SHAPE}_r{replicate}_v{VEXP}"
    if SHAPE == "zipf":
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            n_docs = replicate * 5000   # parity with replicated shapes
            (
                spark.range(n_docs).withColumnRenamed("id", "doc_id")
                .withColumn(
                    "text",
                    F.expr(
                        "concat_ws(' ', transform(sequence(1, "
                        f"{ZIPF_WORDS}), i -> concat('z', CAST(pow("
                        f"{ZIPF_VOCAB}, (abs(xxhash64(doc_id * 64 + i))"
                        " % 1048576) / 1048576.0) AS LONG))))"
                    ),
                )
                .repartition(64)
                .write.mode("overwrite").parquet(path)
            )
        return path
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rep = spark.range(replicate).withColumnRenamed("id", "copy")
        hot = " ".join(["hotterm"] * 100)
        base = (
            docs0.crossJoin(rep)
            .withColumn("doc_id", F.col("doc_id") * replicate + F.col("copy"))
            .withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', transform(split(text, ' '), "
                    f"w -> concat(w, 'q', CAST(copy % {VEXP} AS STRING))))"
                ),
            )
        )
        if SHAPE == "chunkskew":
            spike = " ".join(["hotterm"] * 50)
            (
                base
                # tf=50 spikes on 16 of every 4096 docs; tf=1 tail on
                # every 4th doc — posting list spans every block, hot
                # chunks are a small minority inside each
                .withColumn(
                    "text",
                    F.when(F.col("doc_id") % 4096 < 16,
                           F.concat(F.col("text"), F.lit(" " + spike)))
                    .when(F.col("doc_id") % 4 == 0,
                          F.concat(F.col("text"), F.lit(" hotterm")))
                    .otherwise(F.col("text")),
                )
                .drop("copy")
                .repartition(64)
                .write.mode("overwrite").parquet(path)
            )
            return path
        (
            base
            .withColumn(
                "text",
                F.when(F.col("doc_id") < 2048,
                       F.concat(F.col("text"), F.lit(" " + hot)))
                .otherwise(F.col("text")),
            )
            .drop("copy")
            .repartition(64)
            .write.mode("overwrite").parquet(path)
        )
    return path


CONJ = os.environ.get("PRUNED_BENCH_CONJ", "") == "1"


def level(spark, replicate: int, cfg: EngineConfig) -> dict:
    """One corpus size: forced-pruned vs forced-exhaustive (segmented
    tier) vs the auto gate, all three EXPLICIT.

    Round-5 methodology fix: rounds 3-4 labeled ``eng.search(local=
    False)`` as "exhaustive", but at ≥ 3 M candidates/query the auto
    gate routes that call to the PRUNED tier — so the big-corpus
    "exhaustive" numbers were the pruned path measured twice and the
    recorded 8-32 M "inversions" compared pruned-cold vs pruned-warm,
    not pruned vs exhaustive (true forced-segmented at 32 M docs ×
    256 q: 8.3 s vs pruned 2.5 s — pruned WINS 3.3×).  Rows now force
    each tier via the explicit flag and record which tier the gate
    picked plus its wall-clock."""
    docs = spark.read.parquet(corpus(spark, replicate))
    n_docs = docs.count()
    out = f"/dev/shm/pruned_idx_{SHAPE}_{replicate}"
    shutil.rmtree(out, ignore_errors=True)
    stats = ib.build_full(spark, docs, out, cfg,
                          checkpoint_runs=False, fused=True)
    eng = QueryEngine(spark, out, cfg)
    eng.search(QUERIES, conjunctive=CONJ, local=False,
               pruned=False).count()             # warm + df memo
    dfs = {t: eng._df_memo[t] for t in eng._df_memo}
    common = dict(
        broadcast_doc_stats=eng.broadcast_doc_stats, blocks=eng.blocks,
        len_lookup=eng.len_lookup, dfs=dfs, conjunctive=CONJ,
    )
    counters: dict = {}
    pruning.search_pruned(          # warm + block accounting
        spark, eng.index_path, eng.lexicon, eng.doc_stats, eng.stats,
        QUERIES, cfg, counters=counters, **common).count()
    t0 = time.time()
    n_pruned = pruning.search_pruned(
        spark, eng.index_path, eng.lexicon, eng.doc_stats, eng.stats,
        QUERIES, cfg, **common).count()
    t_pruned = time.time() - t0
    t0 = time.time()
    n_exh = eng.search(QUERIES, conjunctive=CONJ, local=False,
                       pruned=False).count()
    t_exh = time.time() - t0
    t0 = time.time()
    n_auto = eng.search(QUERIES, conjunctive=CONJ, local=False).count()
    t_auto = time.time() - t0
    assert n_pruned == n_exh == n_auto
    # which tier did the gate pick? (same arithmetic as engine.search)
    from cs6913_web_search_engines_spark.engine import (
        PRUNED_MIN_AVG_CANDIDATES,
        PRUNED_MIN_TOTAL_CANDIDATES,
    )
    from cs6913_web_search_engines_spark.functions import tokenizer
    total_cand = sum(dfs.get(t, 0) for q in QUERIES.values()
                     for t in tokenizer.split_query(q, "hw3"))
    avg_cand = total_cand / max(len(QUERIES), 1)
    chunks_total = chunks_decoded = 0
    if "_chunk_accs" in counters:
        chunks_total = int(counters["_chunk_accs"][0].value)
        chunks_decoded = int(counters["_chunk_accs"][1].value)
    row = {
        "replicate": replicate,
        "n_docs": n_docs,
        "n_postings": stats["n_postings"],
        "conjunctive": CONJ,
        "pruned_sec": round(t_pruned, 3),
        "exhaustive_sec": round(t_exh, 3),
        "auto_sec": round(t_auto, 3),
        "auto_tier": ("pruned"
                      if (avg_cand >= PRUNED_MIN_AVG_CANDIDATES
                          or total_cand >= PRUNED_MIN_TOTAL_CANDIDATES)
                      else "exhaustive"),
        # auto_sec was measured with the adaptive abort in the engine
        # (pruning.PRUNED_ABORT_SURVIVOR_RATIO) — provenance marker
        # for tests/test_gate_routing.py's wall-clock envelope
        "abort_aware": True,
        "avg_candidates": int(avg_cand),
        "total_candidates": int(total_cand),
        "blocks_decoded": counters["survivor_blocks"],
        "blocks_exhaustive": counters["exhaustive_blocks"],
        # what the round-5 planner collected (physical rows) vs the
        # query-tagged width the round-4 planner collected
        "planner_meta_rows": counters.get("planner_meta_rows", 0),
        "planner_meta_rows_tagged": counters["exhaustive_blocks"],
        "prune_ratio": round(
            1.0 - counters["survivor_blocks"]
            / max(counters["exhaustive_blocks"], 1), 4),
        # chunk-granularity accounting (survivor phase): chunks seen in
        # surviving blocks vs chunks actually decoded after the
        # in-kernel bound cut
        "chunks_in_survivors": chunks_total,
        "chunks_decoded": chunks_decoded,
        # driver-planner phase profile (VERDICT r4 #8): metadata probe
        # collect, pandas plan-to-seed, seed decode job, phase-2 plan
        **{k.lstrip("_"): round(v, 3) for k, v in counters.items()
           if k.startswith("_t_")},
    }
    # large levels: drop the /dev/shm index before the next one (the
    # corpus stays — /dev/shm is session-scoped and reruns reuse it)
    if replicate > 400:
        shutil.rmtree(out, ignore_errors=True)
    return row


def main() -> None:
    spark = get_spark(app_name="bench_pruned", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    # warm python workers
    spark.range(0, CPUS * 4, 1, CPUS * 4).mapInPandas(
        lambda it: (pdf for pdf in it), "id long").count()
    levels = [level(spark, REPLICATE * m, cfg) for m in MULTS]
    row = {
        "metric": "block-max pruning crossover (decoded volume vs corpus size)",
        "shape": SHAPE,
        "vexp": VEXP,
        "conjunctive": CONJ,
        "forced_tiers": True,   # round-5 methodology: see level()
        "queries": len(QUERIES),
        "levels": levels,
        "decoded_growth": round(
            levels[-1]["blocks_decoded"]
            / max(levels[0]["blocks_decoded"], 1), 3),
        "exhaustive_growth": round(
            levels[-1]["blocks_exhaustive"]
            / max(levels[0]["blocks_exhaustive"], 1), 3),
        "crossover": any(lv["pruned_sec"] < lv["exhaustive_sec"]
                         for lv in levels),
    }
    print(json.dumps(row))
    hist = []
    if os.path.exists("PRUNED_BENCH.json"):
        with open("PRUNED_BENCH.json") as f:
            hist = json.load(f)
    hist.append(row)
    with open("PRUNED_BENCH.json", "w") as f:
        json.dump(hist, f, indent=1)


if __name__ == "__main__":
    main()
