"""Hypertable-style time-bucket rollup with INCREMENTAL maintenance — the
continuous-aggregate archetype (TimescaleDB continuous aggregates; Spark has
``window()`` but no built-in incremental refresh).

Two pieces:

 - :func:`time_rollup` — one-shot: bucket the time axis (integer
   microsecond floor division — engine-exact), groupBy (bucket, keys), emit
   MERGEABLE partial-aggregate state: ``n`` (count), ``sum_centi``
   (integer-cents sum — float sums are not reproducible across engines,
   scaled-integer sums are), ``vmin``/``vmax``.
 - :func:`merge_rollups` — incremental refresh: combine any number of
   rollup states (base materialization + new epoch deltas) into the same
   shape; algebraic merge (count/sum add, min/max fold), so refreshing an
   epoch costs O(delta), never a rescan of history — the same
   base-plus-tail pattern the epoch lake's seen-set and typed stores use.

Scale shape (10^12 events): the one-shot pass is a single
partial-aggregated groupBy on (bucket, keys) — well-mixed keys, map-side
combine does most of the work; the merge pass groups only rollup ROWS
(|buckets|·|keys|, orders of magnitude smaller than events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column, width_seconds: int) -> Column:
    """Bucket start as a timestamp — floor(us / width)·width, exact integer
    arithmetic (cast covers NTZ; session TZ pinned UTC)."""
    width_us = width_seconds * 1_000_000
    us = F.unix_micros(ts.cast("timestamp"))
    return F.timestamp_micros((us - F.pmod(us, F.lit(width_us))).cast("long"))


def time_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    width_seconds: int = 3600,
) -> DataFrame:
    """(bucket, *keys, n, sum_centi, vmin, vmax) — mergeable partials."""
    centi = F.round(F.col(value_col) * 100).cast("long")
    return (
        df.select(
            time_bucket(F.col(ts_col), width_seconds).alias("bucket"),
            *[F.col(k) for k in key_cols],
            centi.alias("__c"),
        )
        .groupBy("bucket", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__c").alias("sum_centi"),
            F.min("__c").alias("vmin"),
            F.max("__c").alias("vmax"),
        )
    )


def merge_rollups(*rollups: DataFrame) -> DataFrame:
    """Algebraic merge of rollup states (same schema): counts and sums add,
    min/max fold — O(rollup rows), independent of underlying event count."""
    it = iter(rollups)
    combined = next(it)
    for r in it:
        combined = combined.unionByName(r)
    group_cols = [c for c in combined.columns if c not in ("n", "sum_centi", "vmin", "vmax")]
    return combined.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_centi").alias("sum_centi"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
