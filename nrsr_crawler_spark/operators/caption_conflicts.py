"""Caption-conflict resolution over near-duplicate image groups.

When the crawl lands the SAME image (equal perceptual hash) from several
pages, the captions usually differ — alt text vs figure caption vs
filename junk.  A training table wants ONE canonical caption per visual
group plus the conflict telemetry (how many groups disagree, how badly):
LAION and DataComp both dedup on image identity first and then must pick
the surviving caption; keeping the md5-min caption makes the election
deterministic and engine-portable (no quality model in the loop, and any
engine replays the same winner).

Scale shape: ONE partial-aggregated groupBy on the hash — counts,
distinct-caption count, and the min-(md5(caption), caption) struct fold
all combine map-side; no window, no join, no caption ever shuffles more
than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def caption_conflicts(
    images: DataFrame,
    hash_col: str = "phash",
    id_col: str = "image_id",
    caption_col: str = "caption",
) -> DataFrame:
    """Per visual group: (``hash_col``, n_images, n_captions,
    canonical_caption, keeper_id, conflict).

    canonical_caption = the caption with the smallest (md5, caption) pair
    in the group; keeper_id = the smallest image id carrying it."""
    pick = F.struct(
        F.md5(F.col(caption_col)).alias("m"),
        F.col(caption_col).alias("c"),
        F.col(id_col).alias("i"),
    )
    return images.groupBy(hash_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_images"),
        F.countDistinct(caption_col).cast("long").alias("n_captions"),
        F.min(pick)["c"].alias("canonical_caption"),
        F.min(pick)["i"].alias("keeper_id"),
        (F.countDistinct(caption_col) > 1).alias("conflict"),
    )
