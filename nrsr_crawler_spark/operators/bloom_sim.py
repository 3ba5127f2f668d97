"""Bloom-filter calibration over a URL sample — observed false-positive
rate and bit occupancy for a given (m, k) sizing.

The frontier's URL-seen set (operators/seen.py bloom segments,
operators/cuckoo.py) is sized from an FPR target; this telemetry operator
CHECKS the sizing against reality by simulating the exact filter on a
labeled sample: insert one URL set, probe a disjoint one, count probes
whose k positions are all occupied.  Run per-epoch on a fixed-size sample
(the bit table is ≤ m rows — the simulation is bounded by the filter
size, not the corpus), it catches both under-sized filters (FPR drifting
above target as n grows) and broken canonicalization (occupancy jumping
when variant URLs stop collapsing).

Positions are k independent md5-substring hashes mod m — the same
engine-portable arithmetic the sketches battery certifies, so a DuckDB
oracle replays the simulation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _positions(url_col: str, m: int, k: int) -> F.Column:
    """Array of k bit positions for a URL (md5 4-hex-char slices mod m).

    Each position is derived from a 4-hex-char md5 slice (max 65535), so
    m > 65536 would silently bias every position into [0, 65536) and never
    set higher bits; k > 8 would run past the 32-char md5 digest.  Fail
    loudly instead of returning skewed occupancy/FPR.
    """
    if m > 65536:
        raise ValueError(f"m={m} exceeds 65536 (4-hex-char slice range)")
    if k > 8:
        raise ValueError(f"k={k} exceeds 8 (32-char md5 digest / 4 chars each)")
    return F.array(
        *[
            F.conv(F.substring(F.md5(F.col(url_col)), 1 + 4 * i, 4), 16, 10).cast(
                "long"
            )
            % m
            for i in range(k)
        ]
    )


def bloom_calibration(
    inserted: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    m: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Return ONE row: (m, k, n_bits_set, occupancy_bps, n_probes, n_fp,
    fp_bps).  ``probes`` must be disjoint from ``inserted`` (true
    negatives), so every hit is a false positive."""
    bits = (
        inserted.select(F.explode(_positions(url_col, m, k)).alias("pos"))
        .distinct()
    )
    probe_pos = probes.select(
        F.col(url_col).alias("_u"), F.explode(_positions(url_col, m, k)).alias("pos")
    )
    hit = probe_pos.join(
        broadcast(bits.withColumn("_set", F.lit(1))), "pos", "left"
    )
    per_probe = hit.groupBy("_u").agg(
        F.countDistinct("pos").alias("n_pos"),
        F.countDistinct(F.when(F.col("_set").isNotNull(), F.col("pos"))).alias(
            "n_hit"
        ),
    )
    probe_stats = per_probe.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == F.col("n_pos"), 1).otherwise(0))
        .cast("long")
        .alias("n_fp"),
    )
    bit_stats = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    return (
        probe_stats.crossJoin(broadcast(bit_stats))
        .select(
            F.lit(m).cast("long").alias("m"),
            F.lit(k).cast("long").alias("k"),
            "n_bits_set",
            F.expr(f"n_bits_set * 10000 div {m}").cast("long").alias("occupancy_bps"),
            "n_probes",
            "n_fp",
            F.expr("n_fp * 10000 div n_probes").cast("long").alias("fp_bps"),
        )
    )
