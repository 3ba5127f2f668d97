"""Byte-budget frontier pop: schedule the highest-priority URLs per host
whose CUMULATIVE estimated fetch cost fits the host's per-epoch byte
budget.

The count-budget pop (operators/politeness.py pop_budget) bounds REQUESTS
per host; real bandwidth planning bounds BYTES — a host of 50 MB PDFs
exhausts its pipe long before its request budget.  Greedy-by-pop-order
under a byte cap is the classic fractional-knapsack-without-splitting
heuristic every production crawler ships.

Two-phase, skew-proof:
  1. rank-cap: the salted two-level pop keeps the top ``max_candidates``
     rows per host (WindowGroupLimit physical shape — a mega-host costs
     O(k), never O(host));
  2. bounded cumsum: a running-cost window over the ≤ max_candidates
     survivors per host; rows whose cumulative cost stays ≤ budget are
     taken.

Phase 2's prefix sum is inherently sequential per host, which is exactly
why it must only ever see the phase-1-capped set — documented contract:
``max_candidates`` bounds the window partition size, so the skewed key
costs O(max_candidates · log) per host regardless of frontier skew.

Greedy semantics (first-fit in pop order, no skip-ahead): a huge row
blocks later smaller rows of that host to the NEXT epoch — deliberate,
matching how a sequential fetcher drains its queue; budget is a Column
(pure function of host) or an int.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.politeness import pop_budget, pop_order


def budget_value_pop(
    frontier: DataFrame,
    byte_budget: int | Column,
    cost_col: str = "est_cost_bytes",
    host_col: str = "host",
    max_candidates: int = 1000,
    num_salts: int = 16,
) -> DataFrame:
    """Input needs (host, priority, seq, url_hash, ``cost_col``).  Output:
    the phase-1 survivors with (rk, cum_cost_bytes, taken) — ``taken`` rows
    are this epoch's schedule; untaken survivors carry to the next epoch."""
    budget_col = (
        F.lit(byte_budget) if isinstance(byte_budget, int) else byte_budget
    )
    capped = pop_budget(
        frontier,
        budget=max_candidates,
        host_col=host_col,
        num_salts=num_salts,
        tiebreak=[F.col("url_hash")],
    )
    w = (
        Window.partitionBy(host_col)
        .orderBy(*(pop_order() + [F.col("url_hash")]))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = capped.withColumn(
        "cum_cost_bytes", F.sum(cost_col).over(w).cast("long")
    )
    # first-fit in pop order: taken while the running total fits
    return cum.withColumn("taken", F.col("cum_cost_bytes") <= budget_col)
