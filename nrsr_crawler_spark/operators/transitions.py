"""First-order transition matrix over per-key event sequences.

Session-path mining: P(next event type | current event type) across all
user sessions — the Markov matrix behind funnel analysis, next-page
prediction, and crawl-trap detection by behavioral loops (a template
whose transition mass returns to itself is a cycle).  Probabilities are
exact basis points, so the oracle is hash-exact.

Scale shape: ONE window partitioned by the sequence key (lead of the
next event — each partition is one user's events, no global order), one
partial-agg pair count, and a broadcast O(|types|) row-total join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def transition_matrix(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Return (cur, nxt, n, p_bps) for every observed transition, where
    p_bps = n · 10⁴ div Σ transitions out of ``cur``."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(state_col).alias("cur"),
            F.lead(state_col).over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("cur").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(broadcast(totals), "cur")
        .withColumn("p_bps", F.expr("n * 10000 div _tot").cast("long"))
        .select("cur", "nxt", "n", "p_bps")
    )
