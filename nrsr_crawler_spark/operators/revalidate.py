"""HTTP conditional-revalidation planning (If-None-Match / 304 strategy).

Per recrawl candidate, decide the cheapest correct action from its fetch
history — the bandwidth-side counterpart of the recrawl TTL policy
(operators/recrawl.py decides WHEN, this decides HOW):

  - ``skip``        age_epochs < min_age — content too fresh to matter
  - ``revalidate``  the server sent a validator (ETag/Last-Modified) and
                    the URL's observed change ratio is low: a conditional
                    GET almost surely answers 304 at ~overhead_bytes cost
  - ``refetch``     no validator, or the URL changes often enough that a
                    conditional round trip usually loses

Change ratio in exact bps: change_count·10000 div fetch_count.  The
estimated bytes saved by a revalidate = size_bytes − overhead_bytes
(floored at 0) — summed over the plan this is the epoch's projected
bandwidth saving, the number a crawl-ops review actually wants.

Reference tie-in: the reference enables HTTPCACHE (settings.py) whose
RFC2616 policy does per-request what this does per-epoch in bulk.

Scale shape: pure codegen column expressions over the recrawl candidate
table — ZERO shuffle, ZERO joins, no UDF (plan-gated no-Exchange); runs
as a projection inside whatever scan feeds the epoch's pop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revalidation_plan(
    candidates: DataFrame,
    min_age_epochs: int = 2,
    change_bps_threshold: int = 2000,
    overhead_bytes: int = 600,
) -> DataFrame:
    """Input: (url_hash, age_epochs, fetch_count ≥ 1, change_count,
    has_validator, size_bytes).  Output adds (change_bps, action,
    est_saved_bytes)."""
    change_bps = F.expr("(change_count * 10000) div fetch_count").cast("long")
    action = (
        F.when(F.col("age_epochs") < min_age_epochs, F.lit("skip"))
        .when(
            F.col("has_validator") & (change_bps < change_bps_threshold),
            F.lit("revalidate"),
        )
        .otherwise(F.lit("refetch"))
    )
    saved = F.when(
        action == "revalidate",
        F.greatest(F.col("size_bytes") - overhead_bytes, F.lit(0)),
    ).otherwise(F.lit(0))
    return candidates.select(
        "*",
        change_bps.alias("change_bps"),
        action.alias("action"),
        saved.cast("long").alias("est_saved_bytes"),
    )
