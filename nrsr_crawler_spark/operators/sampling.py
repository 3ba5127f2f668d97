"""Deterministic stratified sampling for training-data mixtures.

A pretraining pipeline balances its corpus by drawing a FIXED quota of
documents per stratum (language × length bucket, source × quality tier, …).
Two properties matter at 100 TB:

 - **determinism** — the sample must be reproducible run-over-run and
   engine-over-engine, so the "random" order is a hash of the document id,
   not an RNG;
 - **no single-reducer stratum** — a naive
   ``row_number() OVER (PARTITION BY stratum)`` funnels each stratum
   through ONE task; with a handful of strata over 10^10 rows that is a
   handful of tasks doing all the work.  The fix is the same two-level
   salted window the politeness pop uses (operators/politeness.py
   pop_budget): level 1 ranks within (stratum, salt) — ``num_salts``-way
   parallel per stratum — and keeps ``k`` per salt (a superset of the true
   top-k, since the global top-k spreads across salts); level 2 re-ranks
   only the ≤ ``num_salts × k`` survivors per stratum.  Both levels are
   WindowGroupLimit-optimizable (rank-limit pushdown, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_topk(
    df: DataFrame,
    strata_cols: list[str],
    order_col: Column,
    k: int,
    num_salts: int = 32,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first ``k`` rows per stratum under the total order
    ``(order_col, *strata_cols-independent tiebreak)`` supplied by the
    caller — ``order_col`` MUST be unique per row (e.g. md5 of the row id)
    or the level-1/level-2 split can disagree with the naive single-window
    result.  Emits ``rank_col`` (1-based rank within the stratum)."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(order_col), F.lit(num_salts)))
    w1 = Window.partitionBy(*strata_cols, "__salt").orderBy(order_col)
    w2 = Window.partitionBy(*strata_cols).orderBy(order_col)
    return (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("__salt", "__r1")
    )
