"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``nrsr_crawler_spark``; this module is a thin
stable shim over ``nrsr_crawler_spark.entry_queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from nrsr_crawler_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: URL-frontier schedule+dedup pass over sf0.001 —
    canonicalize → fingerprint → exact dedup → seen anti-join → per-host
    politeness pop (the §3.1 epoch inner loop, minus fetch)."""
    from nrsr_crawler_spark.plans.flagship import frontier_schedule_dedup

    return frontier_schedule_dedup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/aliases)."""
    return dict(ORACLES)
