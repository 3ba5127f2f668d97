"""Byte-balanced training-shard planning (WebDataset/tar-shard style) for
the image+caption table — assign every record to a shard so each shard
holds ≈ ``shard_bytes`` of payload, deterministically and in parallel.

A greedy sequential packer ("fill shard until full, then open the next")
is inherently serial.  The parallel equivalent used by large-scale dataset
builders: fix a deterministic record order, compute each record's running
byte offset, and bin by start offset —

    shard_id = cum_lo div shard_bytes
    offset   = cum_lo − shard_id·shard_bytes

Every shard ends at most one record past the boundary (the classic
start-offset relaxation); shard sizes stay within one max-record of the
target, and the assignment is embarrassingly parallel given the prefix sum.

Scale shape: the running offset is the two-level bucketed prefix sum
(operators/prefix.py — no global-window funnel); everything else is pure
column arithmetic.  The writer side pairs this with
``repartition(shard_id).sortWithinPartitions(offset)`` +
``maxRecordsPerFile`` (operators/shards.py) so each shard lands as one
contiguous file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.prefix import total_ordered_cumsum


def byte_shard_plan(
    df: DataFrame, id_col: str, size_col: str, shard_bytes: int
) -> DataFrame:
    """Input: any table with an id and a payload byte size.  Output: input
    columns + (cum_lo, shard_id, shard_offset) under the deterministic
    (md5(id), id) stream order."""
    cum = total_ordered_cumsum(df, id_col, size_col)
    return (
        cum.withColumn("shard_id", F.expr(f"cum_lo div {shard_bytes}").cast("long"))
        .withColumn(
            "shard_offset",
            (F.col("cum_lo") - F.col("shard_id") * shard_bytes).cast("long"),
        )
        .drop("cum_hi")
    )
