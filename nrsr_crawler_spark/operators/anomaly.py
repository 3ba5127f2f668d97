"""Fetch-telemetry anomaly detection — per-host error-rate spike report.

The reference crawler's only error handling is Scrapy's retry middleware
(reference ``nrsr/settings.py`` RETRY_TIMES); operationally a web-scale
crawl also needs to NOTICE when a host starts failing — a deploy on the
target site, a ban, a tarpit — and shed its fetch budget before burning the
politeness window on errors.  This operator flags (host, time-bucket)
cells whose error rate exceeds ``factor``× the host's own all-time baseline
rate, with a minimum error-count support so one-off hiccups don't page.

All comparisons are integer cross-multiplications (no ratios, no floats):

    spike  ⇔  err_b · tot_fetches ≥ factor · n_b · tot_errors
              ∧ err_b ≥ min_errors ∧ tot_errors ≥ 1

Scale shape: two map-side-combinable groupBys (host×bucket, then host) and
one join back.  The host-level table is ≤ one row per host — tiny relative
to the log — so the join is broadcast.  Nothing touches response bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def error_spike_report(
    df: DataFrame,
    host_col: str,
    bucket_col: str,
    is_error: Column,
    factor: int = 3,
    min_errors: int = 5,
) -> DataFrame:
    """Return (host, bucket, n_fetches, n_errors, bucket_bps, base_bps)
    for every spiking (host, bucket) cell.  ``bucket_bps``/``base_bps``
    are exact BIGINT basis points (floor division)."""
    err = F.when(is_error, 1).otherwise(0)
    cells = (
        df.select(
            F.col(host_col).alias("host"),
            F.col(bucket_col).alias("bucket"),
            err.alias("_e"),
        )
        .groupBy("host", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum("_e").cast("long").alias("n_errors"),
        )
    )
    hosts = cells.groupBy("host").agg(
        F.sum("n_fetches").alias("tot_fetches"),
        F.sum("n_errors").alias("tot_errors"),
    )
    joined = cells.join(broadcast(hosts), "host")
    spike = (
        (F.col("n_errors") * F.col("tot_fetches"))
        >= (F.lit(factor) * F.col("n_fetches") * F.col("tot_errors"))
    ) & (F.col("n_errors") >= min_errors) & (F.col("tot_errors") >= 1)
    return (
        joined.filter(spike)
        .withColumn("bucket_bps", F.expr("n_errors * 10000 div n_fetches").cast("long"))
        .withColumn("base_bps", F.expr("tot_errors * 10000 div tot_fetches").cast("long"))
        .select("host", "bucket", "n_fetches", "n_errors", "bucket_bps", "base_bps")
    )
