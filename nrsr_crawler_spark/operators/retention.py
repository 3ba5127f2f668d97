"""Cohort-retention matrix over an event stream.

The events table doubles as the engine's product-analytics surface; the
cohort matrix — users grouped by first-seen period, tracked by activity
in each later period — is the canonical rollup every warehouse derives
from it.  (Crawl reading: replace users with hosts and events with
fetches, and the same matrix answers "of the hosts first crawled in
epoch E, how many still yield fetches k epochs later" — source-decay
telemetry for recrawl planning.)

Scale shape: one groupBy for the first-seen period (partial-agg min), a
distinct on (user, period) — both shuffles on the user key and
mergeable — then a broadcast O(cohorts) size join; exact bps output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def retention_cohorts(
    events: DataFrame, user_col: str, period_col: str
) -> DataFrame:
    """(cohort, offset, n_active, cohort_size, retention_bps) — cohort =
    the user's min period; offset = period − cohort; n_active = distinct
    users of that cohort active at that offset (offset 0 row = the whole
    cohort, retention 10000 by construction)."""
    first = events.groupBy(user_col).agg(F.min(period_col).alias("cohort"))
    active = events.select(user_col, F.col(period_col).alias("p")).distinct()
    joined = active.join(first, user_col)
    per = joined.groupBy("cohort", (F.col("p") - F.col("cohort")).alias("offset")).agg(
        F.countDistinct(user_col).cast("long").alias("n_active")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return per.join(broadcast(sizes), "cohort").select(
        F.col("cohort").cast("long"),
        F.col("offset").cast("long"),
        "n_active",
        "cohort_size",
        F.expr("(n_active * 10000) div cohort_size").cast("long").alias("retention_bps"),
    )
