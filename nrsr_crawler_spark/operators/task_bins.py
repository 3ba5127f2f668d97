"""Small-host consolidation: pack the frontier's cold-host tail into
fixed-size scheduling bins.

A 10^5-host frontier is bimodal: a few mega-hosts (handled by salting,
operators/salt_advisor.py) and a huge tail of hosts with a handful of
pending URLs each.  Scheduling the tail one-task-per-host drowns the
cluster in row-sized tasks; the fix is the same start-offset binning the
byte-balanced shard planner uses (operators/shard_plan.py): lay the
hosts' pending counts end-to-end in the deterministic (md5(host), host)
order and assign bin = cum_lo div bin_size — every bin holds ~bin_size
pending URLs across however many small hosts that takes, and a host's
bin is stable under re-planning (pure function of the count table).

Scale shape: the running total is operators/prefix.py
``total_ordered_cumsum`` — bucketed two-level prefix sum, no global
single-task window; binning after it is pure column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.prefix import total_ordered_cumsum


def host_task_bins(
    pending: DataFrame, bin_size: int, host_col: str = "host"
) -> DataFrame:
    """(host, n_pending, cum_lo, bin_id) — bin_id = cum_lo div bin_size
    over the (md5(host), host) total order of per-host pending counts."""
    per = pending.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_pending")
    )
    cum = total_ordered_cumsum(per, host_col, "n_pending", n_buckets=16)
    return cum.select(
        F.col(host_col).alias("host"),
        "n_pending",
        F.col("cum_lo").cast("long").alias("cum_lo"),
        F.expr(f"cum_lo div {bin_size}").cast("long").alias("bin_id"),
    )
