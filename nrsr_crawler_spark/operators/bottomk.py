"""Deterministic weighted bottom-k sampling (without replacement).

The mixture/curriculum samplers in ``operators/sampling.py`` draw BY
QUOTA (fixed counts per stratum); this kernel draws BY WEIGHT — k rows
where a row's selection odds scale with its weight — the primitive under
"sample 1M docs proportional to quality score" and under distributed
weighted reservoir sampling (Efraimidis–Spirakis 2006: key = u^(1/w),
keep the k largest).  Here the E–S key is replaced by an integer
equivalent with identical ordering semantics:

    priority(row) = h(id) div weight,   h uniform in [0, 2^32)

(dividing a uniform hash by the weight is the one-sided integer analogue
of the E–S transform: doubling the weight halves the expected priority,
so heavier rows win more bottom-k slots; exact E–S would exponentiate).
Deterministic — same ids, same sample — and engine-portable: both Spark
and DuckDB read h as the first 8 md5 hex chars.

Scale shape: priority is a pure column expression; the bottom-k is
``orderBy(priority, id).limit(k)`` which Spark executes as
TakeOrderedAndProject — a per-partition k-heap + k-way driver merge,
never a global sort (plan-gated in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_u32(col) -> F.Column:
    """First 8 md5 hex chars as a uniform BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def weighted_bottom_k(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Return (id, weight, priority) for the k sampled rows.  ``weight``
    must be a positive integer column; ties break on id (total order)."""
    pri = F.expr(
        f"conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10) "
        f"div cast({weight_col} as bigint)"
    ).cast("long")
    return (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias(weight_col),
            pri.alias("priority"),
        )
        .orderBy("priority", id_col)
        .limit(k)
    )
