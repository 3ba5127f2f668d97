"""Rendezvous (highest-random-weight) shard assignment for frontier state.

The frontier's per-host state (politeness clocks, pending queues, seen
segments) lives on a fixed shard so one executor owns a host's pacing.
When the cluster resizes N → 4N, naive ``hash(host) % S`` reshuffles
~every host; rendezvous hashing (Thaler & Ravishankar 1998) moves a host
ONLY when one of the newly added shards wins its argmax — movement is
exactly the mass the new shards must absorb, and NO host ever moves
between two surviving shards.  That invariant is what makes a live
resize cheap: old shards only ever LOSE state, never trade it.

This is the engine's two-cluster-size story (north rule: N and 4N
executors) expressed as a data-layout operator with an exact oracle.

Weight = the md5 hex prefix of ``host ':' shard`` — engine-portable
string arithmetic (same trick as the sketches battery), argmax via ONE
max_by per host.

Scale shape: explode hosts × S (S = shard count, a few hundred at most —
the explode is bounded by the CLUSTER size, not the corpus), one
partial-aggregated max_by groupBy per assignment; the N-vs-4N comparison
is a projection on the joined pair of assignments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _weight(host_col: str, shard: F.Column) -> F.Column:
    # 12 hex chars = 48 bits — collision-free in practice and exactly
    # reproducible as DuckDB md5()[1:12]
    return F.substring(
        F.md5(F.concat(F.col(host_col), F.lit(":"), shard.cast("string"))), 1, 12
    )


def rendezvous_assign(
    hosts: DataFrame, n_shards: int, host_col: str = "host", out_col: str = "shard"
) -> DataFrame:
    """(host, shard) — shard = argmax_s md5(host ':' s) over s ∈ [0, S)."""
    s = F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("s")
    exploded = hosts.select(F.col(host_col), s).select(
        host_col, F.col("s"), _weight(host_col, F.col("s")).alias("w")
    )
    return exploded.groupBy(host_col).agg(
        F.max_by("s", "w").cast("long").alias(out_col)
    )


def resize_plan(
    hosts: DataFrame, n_shards: int, growth: int = 4, host_col: str = "host"
) -> DataFrame:
    """Per host: (host, shard_small, shard_large, moved) for S → growth·S.

    Invariant (tested, and the reason rendezvous is the right layout): a
    moved host's ``shard_large`` is ALWAYS ≥ n_shards — hosts only move
    INTO new shards; surviving shards never exchange hosts."""
    small = rendezvous_assign(hosts, n_shards, host_col, "shard_small")
    large = rendezvous_assign(hosts, n_shards * growth, host_col, "shard_large")
    return small.join(large, host_col).select(
        host_col,
        "shard_small",
        "shard_large",
        (F.col("shard_small") != F.col("shard_large")).alias("moved"),
    )
