"""Frontier staleness histogram — recrawl telemetry over fetch ages.

The recrawl TTL policy (operators/recrawl.py, CrawlEngine.expire_older_
than) needs its input distribution: how old is the corpus, epoch-wise?
This buckets every URL's last-fetch age into fixed-width epoch bands and
emits counts plus the cumulative share in basis points — the chart a
crawl-ops review reads before choosing a TTL.

Scale shape: one partial-aggregated groupBy on the bucket (≤ age_range /
width rows out), then windows over that BOUNDED bucket table for the
running/total sums — the window input is O(buckets), never O(corpus), so
the deliberately-global window ordering is safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def staleness_histogram(
    frontier: DataFrame, age_col: str = "age_epochs", width: int = 10
) -> DataFrame:
    """(bucket, lo, hi, n_urls, share_bps, cum_share_bps) — bucket =
    age div width; cumulative share runs oldest-last (ascending bucket).
    All exact BIGINT floor division."""
    b = frontier.select(F.expr(f"{age_col} div {width}").cast("long").alias("bucket"))
    hist = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    run = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    whole = Window.partitionBy()
    return (
        hist.withColumn("__cum", F.sum("n_urls").over(run).cast("long"))
        .withColumn("__total", F.sum("n_urls").over(whole).cast("long"))
        .select(
            "bucket",
            (F.col("bucket") * width).cast("long").alias("lo"),
            (F.col("bucket") * width + width - 1).cast("long").alias("hi"),
            "n_urls",
            F.expr("(n_urls * 10000) div __total").cast("long").alias("share_bps"),
            F.expr("(__cum * 10000) div __total").cast("long").alias("cum_share_bps"),
        )
    )
