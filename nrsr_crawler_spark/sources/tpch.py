"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under the sf dir.

Local-parallelism note: the driver's files are written as a SINGLE parquet
row group each, so a raw ``spark.read.parquet`` scan has parallelism 1 no
matter how small ``files.maxPartitionBytes`` is set — parquet splits are
assigned whole row groups (measured: the entire canon+partial-agg map side
of the frontier bench pinned ~2 cores of 32).  At 100 TB a table has tens of
thousands of row groups and this cannot happen, so ``load`` restores the
cluster-like scan shape by round-robin repartitioning the (narrow, pruned)
scan output to the default parallelism for the fact-sized tables.  Filters
and column pruning still reach the scan — Catalyst pushes both through
repartition nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimension-sized tables stay single-partition (they broadcast anyway)
_SMALL = {"region", "nation", "supplier", "customer", "part"}


def load(spark: SparkSession, sf_dir: str, name: str, widen: bool | None = None) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if widen is None:
        widen = name not in _SMALL
    if widen:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
