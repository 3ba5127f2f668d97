"""Change-rate recrawl scheduling (freshness-aware revisit priority).

The reference crawls everything every run; at 10^10 URLs a crawler must
RANK revisits instead: pages that changed between past fetches deserve
fresher recrawls than pages that never change (Cho & Garcia-Molina,
"Effective Page Refresh Policies for Web Crawlers", TODS 2003 — the
uniform-vs-proportional revisit result).  This operator estimates a
per-URL change rate from the observed revisit history and turns it into
an integer recrawl priority:

    n_visits            fetches observed for the URL
    n_changes           consecutive fetch pairs whose content hash differs
    change_bps          n_changes·10⁴ div (n_visits−1); single-visit URLs
                        get 10⁴ (unknown ⇒ assume changing — an explore
                        bonus, Cho & G-M's cold-start choice)
    age                 now_epoch − last fetch epoch
    recrawl_priority    change_bps · age

All integer arithmetic ⇒ hash-exact DuckDB oracle.  Scale shape: ONE
window pass partitioned by url (lag of the content hash — well-mixed
key, no skew) feeding ONE partial-aggregated groupBy; ``now_epoch``
defaults to the history's max epoch, computed as a 1-row aggregate and
broadcast back (never collected per-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def change_rate_priority(
    visits: DataFrame,
    id_col: str = "url_hash",
    epoch_col: str = "epoch",
    content_col: str = "content_hash",
    now_epoch: int | None = None,
) -> DataFrame:
    """Per-URL revisit stats + integer recrawl priority from a revisit log.

    ``visits`` rows are individual fetches: (id, epoch, content hash).
    ``epoch_col`` must be unique per (id, fetch) — it orders the history.
    """
    w = Window.partitionBy(id_col).orderBy(epoch_col)
    seq = visits.select(
        id_col,
        epoch_col,
        F.when(
            F.lag(content_col).over(w).isNotNull()
            & (F.col(content_col) != F.lag(content_col).over(w)),
            1,
        )
        .otherwise(0)
        .alias("__changed"),
    )
    stats = seq.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_visits"),
        F.sum("__changed").alias("n_changes"),
        F.max(epoch_col).alias("last_epoch"),
    )
    if now_epoch is None:
        now = visits.agg(F.max(epoch_col).alias("__now"))
        stats = stats.crossJoin(broadcast(now))
    else:
        stats = stats.withColumn("__now", F.lit(now_epoch).cast("long"))
    return stats.select(
        id_col,
        "n_visits",
        "n_changes",
        F.when(F.col("n_visits") <= 1, F.lit(10000).cast("long"))
        .otherwise(F.expr("n_changes * 10000 div (n_visits - 1)"))
        .alias("change_bps"),
        (F.col("__now") - F.col("last_epoch")).cast("long").alias("age"),
    ).withColumn(
        "recrawl_priority", F.expr("change_bps * age").cast("long")
    )
