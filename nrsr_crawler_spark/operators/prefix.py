"""Distributed total-order prefix sum — the kernel under systematic
weighted sampling (operators/quota.py) and byte-balanced shard planning
(operators/shard_plan.py).

A naive running total is a single unpartitioned window — one reducer sees
every row, which is exactly the global funnel that dies at 100 TB.  The
standard two-level decomposition used here:

 1. rows are assigned to B hash buckets by a deterministic sort key
    (md5 prefix — engine-portable, uniformly mixing);
 2. within-bucket running totals use a window PARTITIONED BY bucket
    (B-way parallel, each partition ~|rows|/B);
 3. bucket totals (B rows) get their own running offset in a tiny window
    and broadcast-join back.

The result is bit-identical to a single global window ordered by
(sort_key, id) — the oracle SQL can therefore use the simple global window
while the Spark side stays funnel-free.  All arithmetic is BIGINT addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def total_ordered_cumsum(
    df: DataFrame, id_col: str, weight_col: str, n_buckets: int = 16
) -> DataFrame:
    """Append ``cum_hi`` (inclusive running total of ``weight_col``) and
    ``cum_lo`` (= cum_hi − weight) over the deterministic total order
    (md5(id) asc, id asc).  ``n_buckets`` uses the first hex chars of the
    md5 key, so it must be a power of 16 divisor (16 or 256); bucket
    boundaries align with the global order by construction."""
    if n_buckets == 16:
        pfx = 1
    elif n_buckets == 256:
        pfx = 2
    else:
        raise ValueError("n_buckets must be 16 or 256 (md5 hex prefix buckets)")
    keyed = df.withColumn("_ok", F.md5(F.col(id_col).cast("string"))).withColumn(
        "_bkt", F.substring("_ok", 1, pfx)
    )
    in_bucket = Window.partitionBy("_bkt").orderBy("_ok", id_col)
    local = keyed.withColumn(
        "_local_hi", F.sum(F.col(weight_col).cast("long")).over(in_bucket)
    )
    totals = keyed.groupBy("_bkt").agg(
        F.sum(F.col(weight_col).cast("long")).alias("_bkt_sum")
    )
    # B rows: running offset over the tiny bucket table, then broadcast back
    off_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_bkt_sum").over(off_w), F.lit(0)).cast("long")
    ).select("_bkt", "_off")
    out = local.join(broadcast(offsets), "_bkt")
    return (
        out.withColumn("cum_hi", (F.col("_off") + F.col("_local_hi")).cast("long"))
        .withColumn(
            "cum_lo", (F.col("cum_hi") - F.col(weight_col).cast("long")).cast("long")
        )
        .drop("_ok", "_bkt", "_local_hi", "_off")
    )
