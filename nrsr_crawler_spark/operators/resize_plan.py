"""Training-resolution ladder assignment for an image corpus.

Diffusion/ViT training buckets images into a fixed resolution ladder
(SDXL trains at 256/512/1024-class resolutions; ViT patchification wants
side multiples of the patch size).  ``operators/buckets.py`` picks the
nearest ASPECT bucket; this planner picks the RESOLUTION tier — the
largest ladder step the image can cover without upscaling — plus the
exact integer downscale factor the resize worker must apply, and rejects
images smaller than the lowest tier (upscaling destroys training value;
LAION-style pipelines drop them).

Pure column expressions over the (w, h) metadata columns of the
input-hint image table: zero shuffle, zero Python, plan-gated.  The
actual pixel resample is the Arrow-UDF worker's job (sources/images.py
codecs); this operator only PLANS it, so 10^10 rows cost one map pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LADDER = (256, 512, 1024)


def resolution_ladder_plan(
    images: DataFrame,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    ladder: Sequence[int] = DEFAULT_LADDER,
) -> DataFrame:
    """Return (image_id, w, h, tier, scale_bps):

    - ``tier``      largest ladder step ≤ min(w, h), or 0 (reject) when the
                    image is smaller than the lowest step;
    - ``scale_bps`` tier · 10000 div min(w, h) — the downscale the resize
                    worker applies to the short side (≤ 10000 by
                    construction, 0 for rejects).
    """
    steps = sorted(ladder)
    short = F.least(F.col(w_col).cast("long"), F.col(h_col).cast("long"))
    tier = F.lit(0).cast("long")
    for s in steps:
        tier = F.when(short >= s, F.lit(s).cast("long")).otherwise(tier)
    out = images.select(
        F.col(id_col),
        F.col(w_col).cast("int").alias(w_col),
        F.col(h_col).cast("int").alias(h_col),
        tier.alias("tier"),
        short.alias("_short"),
    )
    return out.withColumn(
        "scale_bps",
        F.when(F.col("tier") == 0, F.lit(0))
        .otherwise(F.expr("tier * 10000 div _short"))
        .cast("long"),
    ).drop("_short")
