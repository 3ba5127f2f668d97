"""Multimodal pair filtering: joint image-content × caption-text gate.

The LAION-style sample filter a 100 TB image+caption corpus runs before
training: an (image, caption) pair survives only if the DECODED image passes
the content gate (operators/image_quality.py — not flat / clipped /
low-entropy) AND the caption passes a text gate (token-count bounds, not
shouty).  Everything here is a composition of existing kernels + pure
column expressions — one broadcast-or-colocated equi-join on image_id, no
new Python.

Reason precedence is deterministic (image flag first, then caption reason)
so the drop ledger is reproducible and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import token_count

DEFAULT_MIN_TOKENS = 2
DEFAULT_MAX_TOKENS = 64
DEFAULT_MAX_UPPER_BPS = 5000


def caption_reason(
    caption: Column,
    min_tokens: int = DEFAULT_MIN_TOKENS,
    max_tokens: int = DEFAULT_MAX_TOKENS,
    max_upper_bps: int = DEFAULT_MAX_UPPER_BPS,
) -> Column:
    """'short' | 'long' | 'shouty' | 'ok' — integer-exact thresholds
    (upper-case ratio in bps over the raw length, same floor-division
    convention as the quality suite)."""
    n_tok = token_count(caption)
    upper = F.length(caption) - F.length(F.regexp_replace(caption, r"[A-Z]", ""))
    upper_bps = (upper * 10000).cast("long") / F.greatest(F.length(caption), F.lit(1))
    return (
        F.when(n_tok < min_tokens, F.lit("short"))
        .when(n_tok > max_tokens, F.lit("long"))
        .when(upper_bps >= max_upper_bps, F.lit("shouty"))
        .otherwise(F.lit("ok"))
    )


def pair_gate(
    gated_images: DataFrame,
    captions: DataFrame,
    caption_col: str = "caption",
    **caption_thresholds,
) -> DataFrame:
    """gated_images: output of image_quality.quality_gate (has image_id,
    flag); captions: (image_id, caption).  → per-pair verdict row:
    (image_id, image_flag, caption_reason, keep, drop_reason)."""
    cap = captions.withColumn(
        "caption_reason", caption_reason(F.col(caption_col), **caption_thresholds)
    )
    joined = gated_images.select(
        "image_id", F.col("flag").alias("image_flag")
    ).join(cap.select("image_id", "caption_reason"), "image_id")
    keep = (F.col("image_flag") == "ok") & (F.col("caption_reason") == "ok")
    drop = (
        F.when(F.col("image_flag") != "ok", F.concat(F.lit("image_"), F.col("image_flag")))
        .when(F.col("caption_reason") != "ok", F.concat(F.lit("caption_"), F.col("caption_reason")))
        .otherwise(F.lit(None).cast("string"))
    )
    return joined.select(
        "image_id",
        "image_flag",
        "caption_reason",
        keep.cast("int").alias("keep"),
        drop.alias("drop_reason"),
    )
