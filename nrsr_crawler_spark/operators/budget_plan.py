"""Crawl-cost planning — per-host fetch ETA under politeness delays.

A politeness-limited crawl fetches a host serially at one request per
``delay``; the wall-clock to drain a host's frontier is therefore
n_urls · delay regardless of cluster size — the single number that tells
the scheduler which hosts CANNOT finish inside the crawl window and must
be truncated or boosted (the reference's single-host nrsr.sk crawl is the
degenerate case: its config ceiling of 0.4 fetch/s × ~200k pages ≈ 6 days,
which is why SURVEY §6 calls the sequential loop the bottleneck).

Scale shape: one map-side-combinable count per host + a broadcast join
against the per-host delay dimension (O(hosts) ≪ O(urls)); everything
else is integer column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def host_drain_plan(
    frontier: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    delay_ms_col: str = "delay_ms",
    window_s: int = 86400,
) -> DataFrame:
    """Return (host, n_urls, delay_ms, eta_s, over_budget) — serial drain
    time per host in whole seconds (exact BIGINT floor division) and
    whether it exceeds the crawl window."""
    counts = frontier.groupBy(host_col).agg(F.count(F.lit(1)).alias("n_urls"))
    j = counts.join(broadcast(delays.select(host_col, delay_ms_col)), host_col)
    return (
        j.withColumn(
            "eta_s", F.expr(f"n_urls * {delay_ms_col} div 1000").cast("long")
        )
        .withColumn("over_budget", F.col("eta_s") > window_s)
        .select(host_col, "n_urls", delay_ms_col, "eta_s", "over_budget")
    )
