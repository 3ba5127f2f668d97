"""Corpus-composition operators: per-domain quota capping and systematic
weighted sampling — the two standard levers a 100-TB training-data build
uses to shape WHAT goes into the mix (C4 and RefinedWeb cap per-domain
contribution; data mixtures are drawn by weight-proportional sampling).

Both are exact integer kernels with DuckDB-hash-exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.prefix import total_ordered_cumsum


def domain_quota_topk(
    df: DataFrame,
    domain_col: str,
    order_by: list,
    k: int,
) -> DataFrame:
    """Keep at most ``k`` rows per domain, the top ones under ``order_by``
    (a list of Columns giving a deterministic total order within the
    domain).  This is the C4/RefinedWeb "domain diversification" cap: a
    handful of mega-domains otherwise dominate a web corpus.

    Output = input columns + ``rk`` (1-based rank within domain).

    Scale shape: one shuffle on the domain key; the rank-≤-k filter is
    pushed into the shuffle as WindowGroupLimit (plan-gated in
    tests/test_r4b_wave.py::test_domain_quota_plan_uses_window_group_limit),
    so each reducer keeps a k-row heap
    per domain instead of materializing the full partition — skew from a
    mega-domain costs memory O(k), not O(domain)."""
    w = Window.partitionBy(domain_col).orderBy(*order_by)
    return df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def systematic_weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, n_samples: int
) -> DataFrame:
    """Systematic (equal-interval) weighted sampling: lay every row's weight
    end-to-end on a number line in the deterministic order (md5(id), id),
    then take the ``n_samples`` equally spaced positions j·W/n for
    j = 1..n (W = total weight).  A row spanning (cum_lo, cum_hi] is drawn
    once per position it covers — multiplicity ≈ n·weight/W rounded
    deterministically, Σ multiplicity = n exactly, with variance strictly
    lower than independent draws (classic systematic-resampling guarantee).
    The count is computed with pure integer division, so both engines agree
    bit-for-bit.

    Output: (id, weight, multiplicity) for rows with multiplicity ≥ 1,
    where multiplicity = |{j : 1 ≤ j ≤ n, n·cum_lo < j·W ≤ n·cum_hi}|
                       = n·cum_hi div W − n·cum_lo div W.

    Scale shape: the running total uses the two-level bucketed prefix sum
    (operators/prefix.py — no global window funnel); W is a 1-row aggregate
    broadcast back; selection is a pure column expression.  Overflow note:
    n·cum_hi must fit in int64 — for W beyond ~9·10^18/n, widen the two
    div expressions to DECIMAL(38,0) in both engines (semantics unchanged).
    """
    cum = total_ordered_cumsum(df, id_col, weight_col)
    total = cum.agg(F.sum(F.col(weight_col).cast("long")).alias("_w_total"))
    out = cum.crossJoin(broadcast(total))
    mult = F.expr(f"({n_samples} * cum_hi) div _w_total") - F.expr(
        f"({n_samples} * cum_lo) div _w_total"
    )
    return (
        out.withColumn("multiplicity", mult.cast("long"))
        .filter(F.col("multiplicity") >= 1)
        .drop("cum_lo", "cum_hi", "_w_total")
    )
