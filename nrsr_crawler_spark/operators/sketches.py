"""Count-min sketch — mergeable approximate counting (Cormode &
Muthukrishnan 2005), the sketch archetype the task brief asks for.

Why a crawler/training pipeline wants it: per-key frequency questions at
10^10 scale (how hot is this host? how often does this token/URL template
occur?) where the exact groupBy answer is huge but the CONSUMER only needs
point estimates with a bounded overestimate.  The sketch is a fixed
``d × w`` counter grid: item x increments cell ``(r, h_r(x))`` for each of
``d`` independent row hashes; the point estimate is the MIN over the item's
``d`` cells — never an underestimate, overestimate bounded by
``ε ≈ e/w · N`` with probability ``1 − e^−d``.

Portability: the row hashes are md5-nibble decodes (``h_r(x)`` = first two
hex chars of ``md5(r || ':' || x)`` → 0..255 for w=256) — byte-identical in
any engine, so the sketch table AND every estimate have exact DuckDB
oracles (same construction the simhash operator uses).

Scale shape: building is one explode (×d, d small) + one partial-aggregated
groupBy on (r, c) — at most d·w result rows regardless of input size; the
counter grid is trivially mergeable across partitions/epochs (counts add —
same algebra as rollup.merge_rollups).  Estimation joins items to d·w
counters — a broadcast of the GRID, never of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(item: Column, r: int, w: int) -> Column:
    """Row-r cell index in [0, w) — md5-nibble decode, engine-portable.
    w must be a power of 16 ≤ 16^8 (whole hex chars keep both engines'
    decodes trivially identical)."""
    n_hex = max(1, (w - 1).bit_length() // 4 + (1 if (w - 1).bit_length() % 4 else 0))
    hexs = F.substring(F.md5(F.concat(F.lit(f"{r}:"), item)), 1, n_hex)
    return F.conv(hexs, 16, 10).cast("long") % w


def cm_build(df: DataFrame, item_col: str, d: int = 4, w: int = 256) -> DataFrame:
    """Build the sketch: (r, c, cnt) counter grid over all item occurrences."""
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cell(item, r, w).alias("c"))
            for r in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .select(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (d, w): counts add."""
    it = iter(sketches)
    combined = next(it)
    for s in it:
        combined = combined.unionByName(s)
    return combined.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame, items: DataFrame, item_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point estimates: (item, cm_est) = min over the item's d cells.
    Missing cells count 0 (item never seen)."""
    item = F.col(item_col)
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("r"), _cell(item, r, w).alias("c"))
            for r in range(d)
        ]
    )
    probed = items.select(item, F.explode(cells).alias("rc")).select(
        item, F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
    )
    return (
        probed.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_est"))
    )
