"""Corpus-mixture drift detection — per-stratum share deltas between two
corpus snapshots.

A training-data pipeline holds its language/source mixture to a spec
(GPT-3 Table 2.2, LLaMA Table 1); a crawl that silently tilts toward one
language or one source family between epochs corrupts the mixture long
before anyone reads a dashboard.  This operator compares the stratum
shares of two snapshots in exact basis points and reports the per-stratum
delta — the L1 mixture distance is one further SUM over the ≤|strata|-row
output.

Scale shape: one map-side-combinable groupBy per snapshot (never a join
of the corpora themselves), a full-outer join of the two O(strata)
share tables, and two 1-row broadcast totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def mixture_drift(
    old: DataFrame, new: DataFrame, stratum_col: str = "lang"
) -> DataFrame:
    """Return (stratum, n_old, n_new, share_old_bps, share_new_bps,
    delta_bps) per stratum present in either snapshot."""
    co = old.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_old")
    )
    cn = new.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    to = co.agg(F.sum("n_old").alias("_to"))
    tn = cn.agg(F.sum("n_new").alias("_tn"))
    j = (
        co.join(cn, "stratum", "full_outer")
        .select(
            "stratum",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
        .crossJoin(broadcast(to))
        .crossJoin(broadcast(tn))
    )
    return (
        j.withColumn("share_old_bps", F.expr("n_old * 10000 div _to").cast("long"))
        .withColumn("share_new_bps", F.expr("n_new * 10000 div _tn").cast("long"))
        .withColumn(
            "delta_bps", F.abs(F.col("share_new_bps") - F.col("share_old_bps"))
        )
        .select(
            "stratum", "n_old", "n_new", "share_old_bps", "share_new_bps", "delta_bps"
        )
    )
