"""Auto-tier gate vs the recorded forced-tier measurements.

VERDICT r4 #1 done-criterion: a pytest pinning the routing decision
per recorded (level, shape, batch) — the auto gate must pick the
measured-faster tier at every forced-tier PRUNED_BENCH.json row where
the two tiers actually differ (>25 % apart; inside that band the
choice is immaterial and shared-VM noise decides the sign).

Only round-5+ records are eligible (``forced_tiers: true``): earlier
rounds labeled the auto engine call "exhaustive", but at ≥3 M
candidates/query the gate routed that call to the pruned tier, so
those rows compared pruned against itself.
"""

import json
import os

import pytest

from cs6913_web_search_engines_spark.engine import (
    PRUNED_MIN_AVG_CANDIDATES,
    PRUNED_MIN_TOTAL_CANDIDATES,
)
from cs6913_web_search_engines_spark.operators.pruning import (
    PRUNED_ABORT_SURVIVOR_RATIO,
)

BENCH = os.path.join(os.path.dirname(__file__), "..", "PRUNED_BENCH.json")


def _rows():
    if not os.path.exists(BENCH):
        pytest.skip("no PRUNED_BENCH.json")
    rows = []
    for rec in json.load(open(BENCH)):
        if not rec.get("forced_tiers"):
            continue
        for lv in rec["levels"]:
            rows.append({**lv, "shape": rec.get("shape", "uniform"),
                         "queries": rec["queries"]})
    if not rows:
        pytest.skip("no forced-tier records yet")
    return rows


def _gate(row) -> str:
    total = row.get("total_candidates",
                    row["avg_candidates"] * row["queries"])
    return ("pruned"
            if (row["avg_candidates"] >= PRUNED_MIN_AVG_CANDIDATES
                or total >= PRUNED_MIN_TOTAL_CANDIDATES)
            else "exhaustive")


def _effective_tier(row) -> str:
    """Where the auto path actually lands: the static gate's pick,
    corrected by the adaptive abort — when the gate picks pruned but
    the planner's survivor ratio exceeds the abort threshold, the
    batch executes on the segmented fallback (the per-shape signal
    the df-only gate cannot see, e.g. the Zipf head-term corpus with
    nothing to prune)."""
    tier = _gate(row)
    survivor_ratio = 1.0 - row["prune_ratio"]
    if tier == "pruned" and survivor_ratio > PRUNED_ABORT_SURVIVOR_RATIO:
        return "exhaustive"
    return tier


def test_gate_picks_measured_faster_tier():
    bad = []
    for r in _rows():
        lo, hi = sorted([r["pruned_sec"], r["exhaustive_sec"]])
        if hi / max(lo, 1e-9) <= 1.25:
            continue  # tiers within noise of each other
        faster = ("pruned" if r["pruned_sec"] < r["exhaustive_sec"]
                  else "exhaustive")
        if _effective_tier(r) != faster:
            bad.append((r["shape"], r["queries"], r["n_docs"],
                        r["pruned_sec"], r["exhaustive_sec"],
                        _effective_tier(r)))
    assert not bad, f"auto routing lands on the slower tier at: {bad}"


def test_auto_wallclock_tracks_min_tier():
    """Where the recorded auto measurement actually exercised the
    CURRENT gate's choice, auto wall-clock must track the faster
    tier (generous noise envelope: ×1.6 + 0.6 s — the auto path adds
    the df-memo probe and gate arithmetic)."""
    checked = 0
    for r in _rows():
        if ("auto_sec" not in r or r.get("auto_tier") != _gate(r)
                or not r.get("abort_aware")):
            continue  # recorded before a recalibration / pre-abort
        best = min(r["pruned_sec"], r["exhaustive_sec"])
        # the abort path pays probe + pandas plan + seed decode
        # before landing on the fallback tier — the recorded phase
        # timings bound that overhead
        overhead = (r.get("t_probe", 0) + r.get("t_plan_seed", 0)
                    + r.get("t_seed_job", 0) + r.get("t_plan_phase2", 0))
        assert r["auto_sec"] <= best * 1.6 + 0.6 + overhead, r
        checked += 1
    assert checked > 0
