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


# -- HyperLogLog (Flajolet et al. 2007) ---------------------------------------
#
# The cardinality companion to the count-min grid above: how many DISTINCT
# items (URLs, tokens, hosts) at 10^10 scale, in m integers of state.  Same
# portability discipline: the item hash is an md5 hex decode and the
# register update is MAX — so the register table AND the integer estimate
# have exact DuckDB oracles (no floating point anywhere).
#
# Construction (p register bits, m = 2^p registers):
#   register(x) = first-2-hex-chars(md5(x)) mod m      (256 % m == 0 ⇒ uniform)
#   rho(x)      = leading-zero bits of the NEXT 8 hex chars (a uniform 32-bit
#                 value) + 1, in [1, 33]
#   registers   = groupBy(register).agg(MAX(rho))  — partial-aggregated, at
#                 most m result rows regardless of input size; mergeable
#                 across partitions/epochs by the same MAX.
#
# rho is computed WITHOUT log/bin builtins (hex-string arithmetic identical
# in any engine): leading zero NIBBLES via ltrim(s, '0'), plus the intra-
# nibble zeros of the first non-zero hex char (3/2/1/0 for 1, 2-3, 4-7,
# 8-f).
#
# Estimate (exact integer rational): E = alpha_m · m² / Σ 2^(−rho_j)
#   = alpha_m · m² · 2³³ / S  with  S = Σ_j 2^(33 − rho_j)  (rho_j = 0 for
# unseen registers), an int64-exact floor division with alpha_m in thousandths
# (alpha_64 = 709/1000).  Small-range/bias corrections are deliberately
# omitted — the oracle states the same raw formula, and the operator's tests
# assert the ±~13% (1.04/√m) relative-error envelope on known cardinalities.

HLL_P = 6  # 64 registers — alpha_64 = 0.709 (Flajolet et al., Fig. 3)
_HLL_ALPHA_MILLI = {16: 673, 32: 697, 64: 709}


def _hll_register(item: Column, m: int) -> Column:
    """Register index in [0, m): first-2-hex-chars decode mod m (m | 256)."""
    return F.conv(F.substring(F.md5(item), 1, 2), 16, 10).cast("long") % m


def _hll_rho(item: Column) -> Column:
    """Leading-zero bits of the 32-bit value at md5 hex chars 3..10, + 1.

    Pure string arithmetic (length/ltrim/locate) so the DuckDB oracle is
    byte-identical: zero-nibbles = 8 − length(ltrim(s,'0')); the first
    non-zero char contributes 3−⌊log2 v⌋ more zeros, stated as a locate()
    rank over the hex alphabet (v=1 → 3, v∈{2,3} → 2, v∈4..7 → 1, else 0).
    All-zero string (x = 0) → rho = 33, the conventional cap."""
    s = F.substring(F.md5(item), 3, 8)
    t = F.regexp_replace(s, "^0+", "")  # hex digits from the first non-zero one
    nib_zeros = (F.lit(8) - F.length(t)) * 4
    first = F.substring(t, 1, 1)
    inner = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(F.length(t) == 0, F.lit(33)).otherwise(
        (nib_zeros + inner + 1).cast("int")
    )


def hll_build(df: DataFrame, item_col: str, p: int = HLL_P) -> DataFrame:
    """Build the register table: (register, rho_max) — ≤ 2^p rows."""
    m = 1 << p
    item = F.col(item_col)
    return (
        df.select(
            _hll_register(item, m).alias("register"), _hll_rho(item).alias("rho")
        )
        .groupBy("register")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables built with the same p: rho_max maxes."""
    it = iter(registers)
    combined = next(it)
    for r in it:
        combined = combined.unionByName(r)
    return combined.groupBy("register").agg(F.max("rho_max").alias("rho_max"))


def hll_lc_table(m: int) -> dict[int, int]:
    """Linear-counting lookup: V zero registers → round(m·ln(m/V)).

    The small-range correction (Flajolet et al. §4: when the raw estimate
    is ≤ 5m/2 and V > 0, linear counting is more accurate) needs ln —
    floating point.  But V has only m−1 possible non-zero values, so the
    whole correction is a PRECOMPUTED integer table emitted as literals
    into both the Spark expression and the SQL oracle: deterministic and
    hash-exact in any engine, no runtime floats."""
    import math

    return {v: round(m * math.log(m / v)) for v in range(1, m)}


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> DataFrame:
    """Single-row integer estimate: (m, registers_set, hll_est, hll_est_corrected).

    hll_est = (alpha_milli · m² · 2³³) // (1000 · S),
    S = Σ_set 2^(33−rho_max) + (m − set)·2³³ — all int64-exact
    (alpha·m²·2³³ ≤ 709·4096·2³³ ≈ 2.5e16 < 2^63).

    hll_est_corrected applies the standard small-range switch: when
    hll_est ≤ 5m/2 and some register is still zero, use linear counting
    (integer lookup, :func:`hll_lc_table`); else the raw estimate."""
    m = 1 << p
    alpha = _HLL_ALPHA_MILLI[m]
    lc = hll_lc_table(m)
    lc_case = "case (" + f"{m} - count(1)) " + " ".join(
        f"when {v} then {e}L" for v, e in lc.items()
    ) + " end"
    raw = (
        f"cast({alpha * m * m * (1 << 33)} div "
        f"(1000 * (sum(__w) + ({m} - count(1)) * {1 << 33})) as long)"
    )
    return registers.withColumn(
        "__w", F.expr("shiftleft(cast(1 as long), 33 - rho_max)")
    ).agg(
        F.lit(m).alias("m"),
        F.count(F.lit(1)).cast("long").alias("registers_set"),
        F.expr(raw).alias("hll_est"),
        F.expr(
            f"cast(case when {raw} <= {5 * m // 2} and count(1) < {m} "
            f"then {lc_case} else {raw} end as long)"
        ).alias("hll_est_corrected"),
    )
