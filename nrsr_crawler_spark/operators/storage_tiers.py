"""Lake storage-tier planning for the image+caption corpus.

At 100 TB the image bytes dominate lake cost; object stores price by
access tier.  This plans the standard hot/warm/cold assignment from the
columns the crawl already tracks — last-access age and access count —
and rolls up the per-tier byte totals the cost review wants:

    hot   age < hot_age            (actively trained-on shards)
    warm  age < cold_age OR access_count ≥ min_hot_accesses
    cold  everything else          (crawled, never re-read)

All thresholds integer; the assignment is a pure codegen CASE (zero
shuffle) and the rollup one partial-aggregated groupBy — the operator
pair mirrors revalidate.py's plan+ledger shape on the storage side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tier_assign(
    objects: DataFrame,
    hot_age: int = 7,
    cold_age: int = 60,
    min_hot_accesses: int = 4,
) -> DataFrame:
    """Input: (object_id, size_bytes, age_epochs, access_count).  Adds
    ``tier``."""
    tier = (
        F.when(F.col("age_epochs") < hot_age, F.lit("hot"))
        .when(
            (F.col("age_epochs") < cold_age)
            | (F.col("access_count") >= min_hot_accesses),
            F.lit("warm"),
        )
        .otherwise(F.lit("cold"))
    )
    return objects.select("*", tier.alias("tier"))


def tier_totals(assigned: DataFrame) -> DataFrame:
    """(tier, n_objects, total_bytes, share_bps) rollup of an assignment."""
    per = assigned.groupBy("tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_objects"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
    )
    total = per.agg(F.sum("total_bytes").cast("long").alias("__t"))
    return per.crossJoin(F.broadcast(total)).select(
        "tier",
        "n_objects",
        "total_bytes",
        F.expr("(total_bytes * 10000) div __t").cast("long").alias("share_bps"),
    )
