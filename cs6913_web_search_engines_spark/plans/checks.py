"""Physical-plan assertions (SURVEY §4: verify, don't hand-schedule).

Helpers that inspect ``df._jdf...executedPlan`` / ``explain`` text so
tests can pin the plan shape we designed for:

* term-shard partition pruning reaches the parquet scan
  (``PartitionFilters`` non-empty on the index read);
* small dimension joins broadcast (``BroadcastHashJoin``);
* scans prune columns (``ReadSchema`` contains only what's selected);
* scoring stays inside WholeStageCodegen (no Python in the hot path).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def has_partition_filter(df: DataFrame, col: str) -> bool:
    txt = plan_text(df)
    for line in txt.splitlines():
        if "PartitionFilters" in line and col in line:
            return True
    return False


def has_pushed_filter(df: DataFrame, col: str) -> bool:
    txt = plan_text(df)
    for line in txt.splitlines():
        if "PushedFilters" in line and col in line:
            return True
    return False


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_text(df)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names appearing in the first ReadSchema of the plan."""
    txt = plan_text(df)
    for line in txt.splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)
            if len(inside) == 2:
                fields = inside[1].rsplit(">", 1)[0]
                return [f.split(":")[0] for f in fields.split(",") if ":" in f]
    return []
