"""Temporal join operators Spark lacks as built-ins: AS-OF join and
(binned) RANGE join — the two custom-operator archetypes the task brief
names.  Both are compositions of existing DataFrame ops (no UDF), shaped
for 100 TB.

AS-OF JOIN — "which right-side version was in effect at this left row's
time?" (e.g. the robots.txt / policy snapshot in force at fetch time).
Implemented with the union trick: tag both sides, sort per key by
(ts, side, version-tiebreak) INSIDE one window, carry the last right-side
payload forward, keep left rows.  One exchange on the key, one window —
the same cost as a groupBy; never a per-row lookup, never a range
cross-product.  Right-side rows at ts equal to the left row's ts match
(inclusive as-of, the DuckDB/kdb convention).

RANGE JOIN — "which right-side intervals contain this left point?"
Spark plans a bare ``l.ts BETWEEN r.start AND r.end`` as a broadcast
nested-loop; at 10^9 × 10^6 that's the wrong plan.  The scale path bins
the time axis: each interval explodes into the bins it overlaps, each
point maps to one bin, the join becomes an EQUI-join on (key, bin) with a
residual filter.  Work = Σ interval_span/bin + points — linear, shuffled
on well-mixed (key, bin) keys.  Bin width trades explode volume against
per-bin candidate counts; intervals longer than ~1000 bins should go to a
broadcast side-table instead (documented, not silently slow).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    """Microsecond instant — exact integer time axis (cast covers NTZ
    inputs; session TZ is pinned UTC)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row: the payload of the LATEST right row with
    ``right.ts <= left.ts`` on the same key (null payload when no right row
    precedes it).  Right-side (key, ts) pairs should be unique — enforce
    upstream (e.g. keep one snapshot per key+ts) so "latest" is well
    defined; among equal timestamps the one with the greater tiebreak
    struct wins deterministically.

    Output: every left column + ``payload_cols`` (+ ``matched_ts``).
    """
    lt = left.withColumn("__t", _us(F.col(left_ts))).withColumn("__side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            _us(F.col(right_ts)).alias("__t"),
            F.struct(
                _us(F.col(right_ts)).alias("ts"),
                *[F.col(c).alias(c) for c in payload_cols],
            ).alias("__payload"),
        )
        .withColumn("__side", F.lit(0))
    )
    lcols = [c for c in left.columns]
    both = lt.select(
        *lcols, "__t", "__side", F.lit(None).cast(rt.schema["__payload"].dataType).alias("__payload")
    ).unionByName(
        rt.select(
            *[
                F.col(key).alias(c) if c == key else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                for c in lcols
            ],
            "__t",
            "__side",
            "__payload",
        )
    )
    # right rows sort BEFORE left rows at equal __t (side 0 < 1) → inclusive
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side", F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).select(
        *lcols,
        F.timestamp_micros(F.col("__match.ts")).alias("matched_ts"),
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
    return out


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows to every interval row (same key) with
    ``start <= point <= end`` (inclusive both ends) — as an equi-join on
    (key, time bin) plus a residual filter.

    Output: all point columns + all interval columns (key deduplicated).
    """
    binsz = bin_seconds * 1_000_000
    p = points.withColumn("__pt", _us(F.col(point_ts))).withColumn(
        "__bin", F.floor(F.col("__pt") / binsz)
    )
    iv = (
        intervals.withColumn("__s", _us(F.col(start_ts)))
        .withColumn("__e", _us(F.col(end_ts)))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s") / binsz), F.floor(F.col("__e") / binsz)
                )
            ),
        )
    )
    icols = [c for c in intervals.columns if c != key]
    joined = p.join(iv, [key, "__bin"]).filter(
        (F.col("__pt") >= F.col("__s")) & (F.col("__pt") <= F.col("__e"))
    )
    return joined.select(*points.columns, *icols)
