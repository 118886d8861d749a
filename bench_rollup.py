"""Measure the pruned planner's beyond-cap regimes at forced driver caps.

The driver planner collects physical (term, seg, block) metadata; when
that outgrows ``pruning.PLAN_LOCAL_MAX_META_ROWS`` it retries with the
(term, sseg) ROLLUP probe (SUPERSEG_FACTOR× smaller) and lazy
per-super-segment fetches, and a fetch that outgrows the budget
overflows into the distributed planner mid-plan.  At the bench corpus
sizes the physical rows (~46 k at 32 M docs × 256 queries) never reach
the 1 M default cap, so the beyond-cap regimes are exercised by FORCING
the cap below the physical row count and below the rollup row count —
the same mechanism `tests/test_pruning.py::test_rollup_probed_driver_
planner` pins for correctness, measured here for cost on the same
256-query hothead batch `bench_pruned.py` records.

Honesty note: whether the lazy rollup plan COMPLETES on the driver or
overflows depends on how many super-segments survive θ.  On bound-tied
shapes (hothead's head term has near-identical sseg bounds everywhere)
the union of surviving ssegs across a wide batch is ≈ all of them, the
fetch exceeds any cap below the physical count, and the measured path
is rollup-attempt → clean overflow → distributed replan.  Each row
therefore records the REQUESTED cap and the mode that actually planned
(``mode``), derived from the run's counters — no label is inferred.
Result counts are asserted identical across all paths.

Appends one record to PRUNED_BENCH.json.

Usage:  SPARK_DRIVER_MEM=48g python bench_rollup.py
"""

from __future__ import annotations

import json
import os
import shutil
import time

os.environ.setdefault("PRUNED_BENCH_QUERIES", "256")
os.environ.setdefault("PRUNED_BENCH_SHAPE", "hothead")

import bench_pruned as bp  # noqa: E402  (env must be set first)
from cs6913_web_search_engines_spark.config import EngineConfig  # noqa: E402
from cs6913_web_search_engines_spark.engine import QueryEngine  # noqa: E402
from cs6913_web_search_engines_spark.operators import (  # noqa: E402
    index_build as ib,
    pruning,
)
from cs6913_web_search_engines_spark.session import get_spark  # noqa: E402

REPLICATE = int(os.environ.get("ROLLUP_BENCH_REPLICATE", "6400"))


def timed(fn, repeats: int = 2):
    best, out = float("inf"), None
    for _ in range(repeats):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def mode_of(counters: dict, cap: int) -> str:
    """Which planner actually planned, from the run's counters."""
    rows = int(counters.get("planner_meta_rows", 0))
    if "_t_rollup" not in counters:
        return "driver_full_collect" if rows <= cap else "distributed"
    # rollup was attempted; completed iff the accumulated rows stayed
    # under the cap.  Otherwise: if lazy fetches ran, the plan engaged
    # and overflowed mid-fetch (distributed replan); if not, the
    # rollup itself did not fit and planning went distributed directly.
    if rows <= cap:
        return "driver_rollup_lazy"
    return ("rollup_overflow_to_distributed" if "_t_fetch" in counters
            else "distributed")


def main() -> None:
    spark = get_spark(app_name="bench_rollup",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    docs = spark.read.parquet(bp.corpus(spark, REPLICATE))
    n_docs = docs.count()
    out = f"/dev/shm/rollup_idx_{bp.SHAPE}_{REPLICATE}"
    shutil.rmtree(out, ignore_errors=True)
    stats = ib.build_full(spark, docs, out, cfg,
                          checkpoint_runs=False, fused=True)
    eng = QueryEngine(spark, out, cfg)
    eng.search(bp.QUERIES, local=False, pruned=False).count()  # warm + dfs
    dfs = dict(eng._df_memo)
    common = dict(broadcast_doc_stats=eng.broadcast_doc_stats,
                  blocks=eng.blocks, len_lookup=eng.len_lookup, dfs=dfs)

    def run(counters=None):
        return pruning.search_pruned(
            spark, eng.index_path, eng.lexicon, eng.doc_stats, eng.stats,
            bp.QUERIES, cfg, counters=counters, **common).count()

    default_cap = pruning.PLAN_LOCAL_MAX_META_ROWS
    row = {"metric": "pruned planner modes at forced driver caps",
           "shape": bp.SHAPE, "replicate": REPLICATE, "n_docs": n_docs,
           "n_postings": stats["n_postings"],
           "n_queries": len(bp.QUERIES),
           "superseg_factor": pruning.SUPERSEG_FACTOR}
    counts = {}

    def measure(label: str, cap: int) -> int:
        pruning.PLAN_LOCAL_MAX_META_ROWS = cap
        c: dict = {}
        run(c)                                   # warm this plan shape
        sec, n = timed(run)
        counts[label] = n
        row[label] = {"cap": cap, "sec": round(sec, 3),
                      "mode": mode_of(c, cap),
                      "planner_meta_rows":
                      int(c.get("planner_meta_rows", 0)),
                      **{k.lstrip("_"): round(v, 3)
                         for k, v in c.items() if k.startswith("_t_")}}
        return int(c.get("planner_meta_rows", 0))

    try:
        nphys = measure("full_collect", default_cap)
        measure("forced_rollup_cap", max(nphys // 2, 2))
        measure("forced_distributed_cap", 8)
    finally:
        pruning.PLAN_LOCAL_MAX_META_ROWS = default_cap
        shutil.rmtree(out, ignore_errors=True)
    assert len(set(counts.values())) == 1, counts
    row["n_results"] = counts["full_collect"]
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
