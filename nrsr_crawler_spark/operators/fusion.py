"""Reciprocal-rank fusion (RRF) of two top-k rankings.

The standard way to combine heterogeneous retrieval/selection signals
(Cormack et al. SIGIR 2009): fused(d) = Σ_lists 1/(c + rank_l(d)).  In a
data pipeline it merges, e.g., a BM25 list with an embedding list, or a
length prior with a quality prior, without score calibration.

Integer form: contribution = SCALE div (c + rank), summed over the lists
the doc appears in — engine-exact.

Scale shape: each input list is already top-k (the callers produce them
via TakeOrdered / WindowGroupLimit paths), so ranks come from windows
over ≤ k rows (bounded by construction); the fuse itself is one
full-outer join of two k-row tables.  Nothing here touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_SCALE = 1_000_000


def rrf_fuse(
    list_a: DataFrame,
    list_b: DataFrame,
    id_col: str,
    order_a: list,
    order_b: list,
    c: int = 60,
) -> DataFrame:
    """Rank each (already top-k, ≤ a few thousand rows) list under its
    ``order_*`` columns and return (id, rank_a, rank_b, rrf_score) for
    ids in either list — absent ranks contribute 0."""
    wa = Window.orderBy(*order_a)  # bounded: list_a is top-k by contract
    wb = Window.orderBy(*order_b)
    ra = list_a.select(F.col(id_col), F.row_number().over(wa).alias("rank_a"))
    rb = list_b.select(F.col(id_col), F.row_number().over(wb).alias("rank_b"))
    j = ra.join(rb, id_col, "full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(), F.expr(f"{RRF_SCALE} div ({c} + rank_a)")
    ).otherwise(F.lit(0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(), F.expr(f"{RRF_SCALE} div ({c} + rank_b)")
    ).otherwise(F.lit(0))
    return j.select(
        id_col,
        "rank_a",
        "rank_b",
        (contrib_a + contrib_b).cast("long").alias("rrf_score"),
    )
