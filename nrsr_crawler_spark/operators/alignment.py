"""Image–text alignment gating (DataComp/LAION-style CLIP-score filter).

Web image+caption corpora are filtered by an alignment score between the
image and its caption (LAION-5B kept pairs with CLIP cosine ≥ 0.28;
DataComp's best baselines are score-threshold sweeps).  The container has
no vision model, so the SCORING KERNEL here is the pluggable piece: a
deterministic hash-overlap score between the caption's token buckets and
the image's 64-bit perceptual-hash signature stands in for CLIP, while
the Spark-side shape — explode captions to tokens, probe one signature
bit per token bucket, one map-side-combinable distinct-aggregate per
image, integer basis-point threshold — is exactly the real pipeline's
(swap ``score`` for a Pandas-UDF model call and nothing else moves).

Score: tokens hash to buckets 0..63; bucket b "hits" when bit b of the
image's phash is set; score_bps = 10000 · |distinct hit buckets| /
|distinct buckets|.  Exact integer arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def alignment_gate(
    images: DataFrame,
    id_col: str = "image_id",
    caption_col: str = "caption",
    phash_col: str = "phash",
    threshold_bps: int = 5000,
) -> DataFrame:
    """Return (image_id, n_buckets, n_hits, score_bps, aligned) per image
    with a non-empty caption.  ``aligned`` = score_bps ≥ threshold_bps.

    One explode + one groupBy(image) distinct-aggregate; captions never
    join anything — the phash rides along in the grouping key, so the
    whole gate is a single shuffle on image_id."""
    tok = F.explode(F.split(F.lower(F.trim(F.col(caption_col))), r"\s+")).alias("tok")
    toks = images.select(F.col(id_col), F.col(phash_col), tok).filter(
        F.col("tok") != ""
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 2), 16, 10).cast("long") % 64
    ).alias("bucket")
    # SQL form: the Python F.shiftright only takes a literal bit count,
    # but a column shift amount is fine in the SQL function
    hit = F.expr(f"(shiftright({phash_col}, cast(bucket as int)) & 1) = 1")
    probed = toks.select(id_col, phash_col, bucket).withColumn("hit", hit)
    agg = probed.groupBy(id_col).agg(
        F.countDistinct("bucket").cast("long").alias("n_buckets"),
        F.countDistinct(F.when(F.col("hit"), F.col("bucket"))).cast("long").alias(
            "n_hits"
        ),
    )
    return (
        agg.withColumn(
            "score_bps", F.expr("n_hits * 10000 div n_buckets").cast("long")
        )
        .withColumn("aligned", F.col("score_bps") >= threshold_bps)
        .select(id_col, "n_buckets", "n_hits", "score_bps", "aligned")
    )
