"""Crawl snapshot diff — classify every URL across two crawl epochs and
roll the result up per host.

The reference re-crawls nrsr.sk listings and lets the upsert sink decide
created-vs-updated per item (reference ``nrsr/pipelines.py:34-145``); a
web-scale recrawl planner additionally needs the URL-level diff between two
whole snapshots — which pages appeared, vanished, changed content, or
stayed byte-identical — because per-host change rates drive the revisit
schedule (Cho & Garcia-Molina's change-frequency estimation; the
``operators/recrawl.py`` priority feeds on exactly this signal).

Classification per URL (full outer join of the two snapshots on url):

  - ``added``     only in the new snapshot
  - ``gone``      only in the old snapshot
  - ``changed``   in both, payload digest differs
  - ``same``      in both, digest equal

Scale shape: one shuffle — the full outer join on url (both sides hash-
partition; AQE handles skew) — then one map-side-combinable groupBy host.
The digests travel, the payloads never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    host_col: str = "host",
) -> DataFrame:
    """Return (url, host, change) for every URL in either snapshot."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("_host_o"),
        F.col(digest_col).alias("_dig_o"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("_host_n"),
        F.col(digest_col).alias("_dig_n"),
    )
    j = o.join(n, "url", "full_outer")
    change = (
        F.when(F.col("_dig_o").isNull(), F.lit("added"))
        .when(F.col("_dig_n").isNull(), F.lit("gone"))
        .when(F.col("_dig_o") == F.col("_dig_n"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url",
        F.coalesce("_host_n", "_host_o").alias("host"),
        change.alias("change"),
    )


def host_change_report(diff: DataFrame) -> DataFrame:
    """Per-host rollup of a ``snapshot_diff`` result:
    (host, n_added, n_gone, n_changed, n_same, change_bps) where
    ``change_bps`` = changed / (changed + same) in basis points, exact
    BIGINT floor division (0 when the host had no surviving URLs)."""
    c = F.col("change")
    agg = diff.groupBy("host").agg(
        F.sum(F.when(c == "added", 1).otherwise(0)).cast("long").alias("n_added"),
        F.sum(F.when(c == "gone", 1).otherwise(0)).cast("long").alias("n_gone"),
        F.sum(F.when(c == "changed", 1).otherwise(0)).cast("long").alias("n_changed"),
        F.sum(F.when(c == "same", 1).otherwise(0)).cast("long").alias("n_same"),
    )
    denom = F.col("n_changed") + F.col("n_same")
    return agg.withColumn(
        "change_bps",
        F.when(denom == 0, F.lit(0))
        .otherwise(F.expr("n_changed * 10000 div (n_changed + n_same)"))
        .cast("long"),
    )
