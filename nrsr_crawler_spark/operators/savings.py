"""Dedup storage-savings telemetry — bytes reclaimed per source by exact
dedup, before actually deleting anything.

Dedup pipelines justify their cost in reclaimed storage and removed
training repetition; this report prices the exact-dup layer per source
(keep the min-id member of every digest group, charge the rest as
savings) so the pipeline's telemetry can show "source X is 40%
byte-duplicate" next to the filter funnel and cluster histogram
(operators/reports.py).

Scale shape: one partial-agg groupBy (source, digest) — keeper selection
is a min(struct) fold inside the aggregate, the texts themselves never
shuffle (digest + size columns only) — then one O(groups) rollup per
source.  Exact BIGINT arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_savings(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size_col: str,
    source_col: str,
) -> DataFrame:
    """Return (source, n_docs, n_groups, n_dups_removed, total_bytes,
    bytes_saved, savings_bps) per source, where duplicates are exact
    (md5 of ``text_col``) within the source and the min-id member of
    each group is kept."""
    keyed = docs.select(
        F.col(source_col).alias("source"),
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).alias("_id"),
        F.col(size_col).cast("long").alias("_sz"),
    )
    groups = keyed.groupBy("source", "digest").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_sz").cast("long").alias("grp_bytes"),
        F.min(F.struct(F.col("_id"), F.col("_sz"))).alias("_keep"),
    )
    per_group = groups.select(
        "source",
        "n",
        "grp_bytes",
        (F.col("grp_bytes") - F.col("_keep._sz")).cast("long").alias("saved"),
    )
    agg = per_group.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dups_removed"),
        F.sum("grp_bytes").cast("long").alias("total_bytes"),
        F.sum("saved").cast("long").alias("bytes_saved"),
    )
    return agg.withColumn(
        "savings_bps",
        F.when(F.col("total_bytes") == 0, F.lit(0))
        .otherwise(F.expr("bytes_saved * 10000 div total_bytes"))
        .cast("long"),
    )
