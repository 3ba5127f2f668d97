"""Adaptive per-host salt planning for the politeness pop windows.

The two-level pop (operators/politeness.py pop_budget) takes ONE global
``num_salts`` — sized for the worst host, paid by every host.  At 10^5+
hosts the right knob is per-host: a mega-host with 10^7 pending URLs
wants 64 salt buckets; a host with 40 pending wants 1.  This planner
turns the per-host pending counts into that salt table:

    salts(h) = clamp(ceil(n_pending(h) / target_rows_per_task), 1, max)

so every level-1 window partition holds ~``target_rows_per_task`` rows —
the task-size invariant that keeps the pop stage's sort both parallel
(hot hosts split) and efficient (cold hosts not over-split into
row-sized tasks).  The plan is recomputed per epoch from the same counts
the scheduler already aggregates; the pop consumes it as a broadcast
O(hosts) dimension (salt = url_hash % salts(h), a pure function of host
exactly as pop_budget's per-host budget Column contract requires).

Scale shape: ONE partial-aggregated groupBy on host; pure integer
column arithmetic after it; O(hosts) output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_plan(
    pending: DataFrame,
    target_rows_per_task: int = 100_000,
    max_salts: int = 64,
    host_col: str = "host",
) -> DataFrame:
    """(host, n_pending, salts, rows_per_task) — rows_per_task is the
    resulting expected level-1 partition size, ceil(n_pending / salts)."""
    per = pending.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pending")
    )
    salts = F.least(
        F.lit(max_salts).cast("long"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(n_pending + {target_rows_per_task - 1}) div {target_rows_per_task}"),
        ),
    )
    return (
        per.select(
            F.col(host_col).alias("host"),
            "n_pending",
            salts.cast("long").alias("salts"),
        )
        .withColumn(
            "rows_per_task",
            F.expr("(n_pending + salts - 1) div salts").cast("long"),
        )
    )
