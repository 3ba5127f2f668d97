"""Aspect-ratio bucketing for multimodal training batches.

Diffusion/vision training batches must share one resolution, so pipelines
assign every image to the nearest of a fixed bucket list (NovelAI aspect
bucketing; SDXL appendix I) and shard per bucket.  The reference crawler has
no analogue — this is an engine training-data-pipeline addition (driver
brief: multimodal columns with typed metadata).

Nearest-bucket metric (integer-exact so the DuckDB oracle hash-matches):
for image (w, h) and bucket (bw, bh), ``dist = |w·bh − h·bw|`` — the
cross-multiplied aspect difference scaled by h·bh.  Argmin over buckets,
ties → lowest bucket index.  (The true ratio distance |w/h − bw/bh| divides
by bh, which varies per bucket; the cross form keeps arithmetic in BIGINT.
Both are zero exactly when aspects match, which is the invariant training
cares about — the bucket list is dense enough that the tie-shape difference
is cosmetic.)

Scale shape: the bucket list is a ~13-element literal array — assignment is
pure whole-stage-codegen column expressions (one ``array_min`` over a
transformed literal array per row), no join, no shuffle.  The per-bucket
rollup is one partial-aggregated groupBy on ≤|buckets| keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# SDXL-ish 1024-base bucket list (w, h), ~2:1 portrait through ~2:1 landscape
DEFAULT_BUCKETS: tuple[tuple[int, int], ...] = (
    (512, 2048),
    (576, 1664),
    (704, 1408),
    (768, 1344),
    (832, 1216),
    (896, 1152),
    (1024, 1024),
    (1152, 896),
    (1216, 832),
    (1344, 768),
    (1408, 704),
    (1664, 576),
    (2048, 512),
)


def assign_aspect_buckets(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: tuple[tuple[int, int], ...] = DEFAULT_BUCKETS,
) -> DataFrame:
    """Adds (bucket_id, bucket_w, bucket_h) — nearest bucket by the integer
    cross-aspect metric, ties to the lowest bucket index."""
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    # array of (dist, idx) structs over the literal bucket list; struct
    # ordering is lexicographic, so array_min = argmin dist, tie -> min idx
    cands = F.array(
        *[
            F.struct(
                F.abs(w * F.lit(bh) - h * F.lit(bw)).alias("dist"),
                F.lit(i).alias("idx"),
            )
            for i, (bw, bh) in enumerate(buckets)
        ]
    )
    best = F.array_min(cands)
    bw_arr = F.array(*[F.lit(bw) for bw, _ in buckets])
    bh_arr = F.array(*[F.lit(bh) for _, bh in buckets])
    return (
        df.withColumn("bucket_id", best.getField("idx"))
        .withColumn("bucket_w", F.element_at(bw_arr, F.col("bucket_id") + 1))
        .withColumn("bucket_h", F.element_at(bh_arr, F.col("bucket_id") + 1))
    )


def bucket_stats(assigned: DataFrame) -> DataFrame:
    """Per-bucket rollup: image count + total source pixels (batch-planning
    metadata: count/bucket drives per-bucket shard sizing)."""
    return assigned.groupBy("bucket_id", "bucket_w", "bucket_h").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum(F.col("w").cast("long") * F.col("h").cast("long")).alias("total_px"),
    )
