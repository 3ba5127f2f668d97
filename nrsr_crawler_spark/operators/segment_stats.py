"""Seen-set segment occupancy — health telemetry for the partitioned
URL-seen store.

The seen set shards by ``segment_id = url_hash % n_segments``
(operators/seen.py); each segment owns one Bloom/cuckoo bitset sized for
its expected key share.  If canonicalization breaks (variant URLs stop
collapsing) or a crawl trap floods one hash region, segments drift from
the uniform load the sizing assumed — and an over-full segment's FP rate
quietly leaves its budget (the failure mode operators/bloom_sim.py
measures from the other side).  This emits the per-segment key counts
and load factor vs the uniform expectation, in exact basis points.

Scale shape: ONE partial-aggregated groupBy on the segment id (≤
n_segments rows out) + a broadcast 1-row total; the key table itself
never moves — only per-segment counts do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def segment_occupancy(
    seen: DataFrame, n_segments: int, hash_col: str = "url_hash"
) -> DataFrame:
    """(segment_id, n_keys, share_bps, load_bps) per segment.

    ``load_bps`` = n_keys · n_segments · 10⁴ div total — exactly 10000
    for a perfectly uniform segment, >10000 for hot segments; the bitset
    sizing headroom review reads this column directly."""
    per = seen.select(
        F.pmod(F.col(hash_col), F.lit(n_segments)).cast("long").alias("segment_id")
    ).groupBy("segment_id").agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    total = per.agg(F.sum("n_keys").cast("long").alias("__total"))
    return per.crossJoin(broadcast(total)).select(
        "segment_id",
        "n_keys",
        F.expr("(n_keys * 10000) div __total").cast("long").alias("share_bps"),
        F.expr(f"(n_keys * {n_segments} * 10000) div __total")
        .cast("long")
        .alias("load_bps"),
    )
