"""Training-shard writer: deterministic, size-balanced output sharding.

The last step of a training-data pipeline: deduped/gated records must land
in a FIXED number of balanced shards with deterministic membership (so a
re-run reshards identically and downstream loaders can address shard i of
n), bounded file sizes, and stable intra-shard order.  The reference stores
crawl output row-at-a-time in MongoDB (pipelines.py); sharded bulk output
is the engine addition the 100 TB corpus needs.

Shard assignment is the repo's oracle-portable construction: the first 4
hex chars of md5(key) → 16-bit int → pmod n_shards (instr/substring
arithmetic only, so DuckDB mirrors it bit-exactly; same idiom as
dedup.simhash16).  md5 mixing gives multinomial balance — at m rows into n
shards the max/mean shard skew concentrates at 1 + O(sqrt(n ln n / m)),
negligible for m ≫ n (asserted empirically in tests).

The write path is pure Spark machinery: one hash repartition on shard_id
(the only shuffle), sortWithinPartitions for stable order + run-length-
friendly encodings, partitionBy(shard_id) + maxRecordsPerFile for bounded
files.  No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHARDS = 16


def _hex4_to_int(h: Column) -> Column:
    digits = "0123456789abcdef"
    nib = lambda i: (F.instr(F.lit(digits), F.substring(h, i, 1)) - 1).cast("long")  # noqa: E731
    return nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)


def shard_of(key: Column, n_shards: int = DEFAULT_SHARDS) -> Column:
    """Deterministic shard id in [0, n_shards) from a key (stringified —
    decimal form for ints, identical in any engine)."""
    return F.pmod(_hex4_to_int(F.md5(key.cast("string"))), F.lit(n_shards)).cast("int")


def assign_shards(df: DataFrame, key_col: str, n_shards: int = DEFAULT_SHARDS) -> DataFrame:
    return df.withColumn("shard_id", shard_of(F.col(key_col), n_shards))


def shard_stats(
    df: DataFrame, key_col: str, weight: Column, n_shards: int = DEFAULT_SHARDS
) -> DataFrame:
    """Per-shard manifest row: count, total weight, key range.  One
    map-side-combinable aggregation over the assignment projection."""
    return (
        assign_shards(df, key_col, n_shards)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(weight).alias("total_weight"),
            F.min(key_col).alias("first_key"),
            F.max(key_col).alias("last_key"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    order_col: str | None = None,
    n_shards: int = DEFAULT_SHARDS,
    max_records_per_file: int = 100_000,
) -> None:
    """Write ``path/shard_id=i/part-*.parquet``: one shuffle on shard_id,
    deterministic intra-shard order, files capped at max_records_per_file."""
    out = assign_shards(df, key_col, n_shards).repartition(n_shards, "shard_id")
    out = out.sortWithinPartitions("shard_id", order_col or key_col)
    (
        out.write.option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard_id")
        .mode("overwrite")
        .parquet(path)
    )


def oracle_shard_sql(key_expr: str, n_shards: int = DEFAULT_SHARDS) -> str:
    """DuckDB mirror of shard_of() for oracle queries."""
    nib = "(strpos('0123456789abcdef', substr(md5(CAST({k} AS VARCHAR)), {i}, 1)) - 1)"
    h4 = " + ".join(
        f"{nib.format(k=key_expr, i=i + 1)} * {m}" for i, m in enumerate((4096, 256, 16, 1))
    )
    return f"(({h4}) % {n_shards})"
