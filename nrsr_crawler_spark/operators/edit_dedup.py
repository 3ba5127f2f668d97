"""Edit-distance near-duplicate pairs over short strings (titles,
captions, anchor texts).

Shingle/minhash dedup (operators/dedup.py) targets documents; for SHORT
strings a 1–2 character edit is a whole-shingle change and Jaccard
collapses, so record-linkage practice uses blocking + edit-distance
verification instead (Fellegi–Sunter tradition): candidates share a cheap
blocking key, and only candidates pay the O(len²) Levenshtein.

Blocking key here = the string's first ``prefix_len`` characters —
sound for suffix-area edits, and the standard recall tradeoff (an edit
INSIDE the prefix escapes the block) is the documented price of never
forming the quadratic all-pairs product.  Hot blocks (shared boilerplate
prefixes) are dropped at ``max_block`` with the same stop-shingle
semantics the Jaccard path uses — a capped block is a loud recall note,
not a blowup.

Scale shape: one groupBy for block sizes, a semi-join drop of hot
blocks, one equi-join on the block key (quadratic only WITHIN a capped
block), JVM ``levenshtein`` verify — no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def edit_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_edits: int = 2,
    prefix_len: int = 12,
    max_block: int = 64,
) -> DataFrame:
    """Return (id_a, id_b, edits) for same-block pairs with Levenshtein
    distance ≤ ``max_edits`` (id_a < id_b)."""
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_blk"),
    ).filter(F.col("_t").isNotNull())
    sizes = keyed.groupBy("_blk").agg(F.count(F.lit(1)).alias("_n"))
    cool = keyed.join(
        broadcast(sizes.filter(F.col("_n") <= max_block).select("_blk")), "_blk"
    )
    a = cool.select(
        F.col("_blk"), F.col("_id").alias("id_a"), F.col("_t").alias("_ta")
    )
    b = cool.select(
        F.col("_blk"), F.col("_id").alias("id_b"), F.col("_t").alias("_tb")
    )
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("edits", F.levenshtein("_ta", "_tb").cast("int"))
        .filter(F.col("edits") <= max_edits)
        .select("id_a", "id_b", "edits")
    )
