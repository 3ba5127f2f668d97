"""Window-shaped operators (SURVEY §2.5, §2.6).

The reference computes these imperatively; here they are Spark windows:

 - ``carry_last_header`` — the daily_clubs sessionization: each vote cell
   belongs to the most recent club-header row above it
   (/root/reference/nrsr/spiders/votings.py:219-244).
 - ``topk_per_group`` — frontier pop order: Scrapy-1.5 LIFO priority pop with
   a per-host budget (settings.py:30-33; SURVEY §2.6 O3).
 - ``positional_slice`` — ``tr[position()>1 and position()<last()]``
   (votings.py:141; SURVEY §2.2 P5).

Scale note: a window partitioned by a single dominant host key is the skew
hazard; the frontier uses the two-level salted variant in
operators/politeness.py.  These generic helpers assume reasonable key
cardinality (they shuffle once on the partition key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def carry_last_header(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    header_col: str,
    out_col: str = "header",
) -> DataFrame:
    """Assign every row the most recent non-null ``header_col`` at or above it
    in ``order_col`` order (votings.py:228-241 club grouping)."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(header_col, ignorenulls=True).over(w))


def topk_per_group(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic top-k rows per group (order_cols must be a total order)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def positional_slice(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Rows strictly between the first and last of each group —
    ``position()>1 and position()<last()``."""
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    wall = Window.partitionBy(*part_cols)
    return (
        df.withColumn("__pos", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wall))
        .filter((F.col("__pos") > 1) & (F.col("__pos") < F.col("__n")))
        .drop("__pos", "__n")
    )


def gap_sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization (the classic event-analytics window): events
    of one key belong to the same session while consecutive gaps stay within
    ``gap_seconds``; a larger gap opens the next session.  Emits one row per
    session: ``(key, session_seq, n_events, start_ts, end_ts)`` with
    ``session_seq`` 1-based in time order.

    Time arithmetic runs on ``unix_micros`` (exact integers — microsecond
    timestamps survive any engine); ordering ties break on ``id_col``.

    Scale shape: two windows partitioned by the key (lag + running sum) and
    one groupBy — all on the same partitioning, so Catalyst plans ONE
    exchange; keys are users/hosts (well-mixed, no single-reducer funnel).
    """
    # cast covers TIMESTAMP_NTZ inputs (session TZ is pinned UTC, so the
    # NTZ→instant mapping is the identity)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us, F.col(id_col))
    brk = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(us, F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.withColumn("__brk", brk)
        .withColumn("session_seq", F.sum("__brk").over(run))
        .groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
    )
