"""Politeness-compliance audit over a fetch log.

The scheduler PLANS polite fetches (operators/politeness.py budgets,
robots Crawl-delay); this audits what actually HAPPENED: per host, the
inter-arrival gaps between consecutive fetches versus the host's
required delay, counting violations and the worst (minimum) gap.  Run
per epoch it catches scheduler bugs, clock-skewed workers, and retry
storms (operators/retry.py) that bypass pacing — the operational
counterpart of the reference's AUTOTHROTTLE settings.

Scale shape: ONE window partitioned by host (each partition is one
host's fetch times — no global order), one partial-agg groupBy, one
broadcast O(hosts) delay-dimension join.  All integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def politeness_audit(
    fetches: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_us_col: str = "ts_us",
    tiebreak_col: str = "fetch_id",
    delay_ms_col: str = "delay_ms",
) -> DataFrame:
    """Return (host, n_fetches, n_gaps, n_violations, min_gap_ms, ok):
    a gap violates when it is strictly shorter than the host's required
    delay; hosts with a single fetch have no gaps and audit ok."""
    w = Window.partitionBy(host_col).orderBy(ts_us_col, tiebreak_col)
    gapped = fetches.select(
        F.col(host_col).alias("host"),
        (F.col(ts_us_col) - F.lag(ts_us_col).over(w)).cast("long").alias("gap_us"),
    )
    # One pass over the gapped log: join the broadcast delay dimension BELOW
    # the groupBy so the violation count folds into the same aggregation as
    # the per-host rollup — the host-partitioned window sort runs once, not
    # twice.
    per_host = (
        gapped.join(
            broadcast(delays.select(F.col(host_col).alias("host"), delay_ms_col)),
            "host",
        )
        .groupBy("host", delay_ms_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.min("gap_us").alias("_min_gap_us"),
            F.sum(
                F.when(
                    F.col("gap_us").isNotNull()
                    & (F.col("gap_us") < F.col(delay_ms_col) * 1000),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_violations"),
        )
    )
    return per_host.select(
        "host",
        "n_fetches",
        "n_gaps",
        F.col("n_violations"),
        F.expr("_min_gap_us div 1000").cast("long").alias("min_gap_ms"),
        (F.col("n_violations") == 0).alias("ok"),
    )


def robots_coverage(
    candidates: DataFrame,
    rules: list[dict],
    url_col: str = "url",
    host_col: str = "host",
    user_agent: str = "*",
) -> DataFrame:
    """Per-host robots-coverage audit: how much of the pending frontier the
    current ruleset blocks — (host, n_urls, n_allowed, n_blocked,
    blocked_bps).  A ruleset change (or a trap-path explosion) shows as a
    blocked-share jump before any fetch is wasted.

    Scale shape: the allow decision is robots.allowed_expr — a pure codegen
    CASE chain from the driver-side ruleset (rules are O(hosts·prefixes),
    config-sized) — folded into ONE partial-aggregated groupBy on host; no
    join, no UDF, URLs never shuffle (only per-host counts do)."""
    from nrsr_crawler_spark.operators.robots import allowed_expr

    ok = allowed_expr(rules, F.col(url_col), F.col(host_col), user_agent)
    per = candidates.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum(ok.cast("long")).cast("long").alias("n_allowed"),
    )
    return per.select(
        F.col(host_col).alias("host"),
        "n_urls",
        "n_allowed",
        (F.col("n_urls") - F.col("n_allowed")).cast("long").alias("n_blocked"),
        F.expr("((n_urls - n_allowed) * 10000) div n_urls")
        .cast("long")
        .alias("blocked_bps"),
    )
