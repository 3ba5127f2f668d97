"""Training-mixture epoch planning — the table every LLM data report
publishes (GPT-3 Table 2.2, LLaMA Table 1): given the tokens AVAILABLE per
source and the target sampling WEIGHTS, compute each source's token budget
and how many epochs (repetitions) of the source that budget implies.

All integer arithmetic (weights in basis points, epochs in basis points:
10000 = exactly one pass over the source), so the plan is hash-exact
against a DuckDB oracle:

    target_j = B · w_j div 10000              (B = total token budget)
    epochs_bp_j = target_j · 10000 div avail_j
    over_cap_j = epochs_bp_j > max_epochs_bp  (flag, not silently re-split)

The over-cap flag is deliberately a LOUD output instead of an automatic
redistribution: at 100 TB the right response to an over-repeated source is
a human decision (crawl more of it, or accept >max epochs), not a silent
weight shift.

Scale shape: per-source token availability is one map-side-combinable
groupBy over the corpus; the plan itself is |sources| rows of pure column
arithmetic with the budget as literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import token_count


def source_token_counts(df: DataFrame, source_col: str, text_col: str) -> DataFrame:
    """(source, avail_tokens) — one partial-aggregated groupBy."""
    return (
        df.groupBy(F.col(source_col).alias("source"))
        .agg(F.sum(token_count(F.col(text_col))).cast("long").alias("avail_tokens"))
    )


def mixture_epoch_plan(
    avail: DataFrame,
    weights_bp: dict[str, int],
    total_budget_tokens: int,
    max_epochs_bp: int = 40000,
) -> DataFrame:
    """avail: (source, avail_tokens).  weights_bp: source → basis points
    (must cover every source; missing sources get weight 0).  Returns
    (source, avail_tokens, weight_bp, target_tokens, epochs_bp, over_cap)."""
    w: Column = F.lit(0)
    for name, bp in sorted(weights_bp.items()):
        w = F.when(F.col("source") == name, F.lit(int(bp))).otherwise(w)
    out = avail.withColumn("weight_bp", w.cast("long"))
    out = out.withColumn(
        "target_tokens",
        F.expr(f"({total_budget_tokens} * weight_bp) div 10000").cast("long"),
    )
    out = out.withColumn(
        "epochs_bp",
        F.expr("(target_tokens * 10000) div greatest(avail_tokens, 1L)").cast("long"),
    )
    return out.withColumn("over_cap", (F.col("epochs_bp") > max_epochs_bp).cast("int"))
