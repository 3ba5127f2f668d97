"""Vocabulary-growth (Heaps-law) curve over a document corpus.

Tokenizer and dedup planning both need the V(N) curve — how many NEW
types appear as the corpus grows (Heaps 1978: V ≈ K·N^β).  A flattening
curve says the corpus is saturating (more data, same vocabulary — likely
duplication); a too-steep curve says noisy/unnormalized text.  This
computes the exact curve at ``n_checkpoints`` equal-width corpus
prefixes under the deterministic doc-id order.

Scale shape: one explode, one groupBy(token) min (partial-combined — the
token table never materializes per-doc counts), one tiny per-bucket agg,
and a window over ≤ n_checkpoints rows (bounded by construction, NOT by
data size).  The max-id scalar is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.text import tokens


def vocab_growth(
    docs: DataFrame, id_col: str, text_col: str, n_checkpoints: int = 10
) -> DataFrame:
    """Return (bucket, cum_tokens, cum_vocab): cumulative token count and
    cumulative distinct-type count at each corpus-prefix checkpoint
    (bucket = id·n div (max_id+1), so buckets are equal id-ranges)."""
    toks = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    mx = docs.agg(F.max(id_col).alias("_mx"))
    with_b = toks.crossJoin(broadcast(mx)).withColumn(
        "bucket", F.expr(f"_id * {n_checkpoints} div (_mx + 1)").cast("long")
    )
    first = with_b.groupBy("tok").agg(F.min("bucket").alias("bucket"))
    new_per = first.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_new"))
    tok_per = with_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    joined = tok_per.join(new_per, "bucket", "left").select(
        "bucket",
        F.col("n_tokens"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    # ≤ n_checkpoints rows — the unpartitioned window is bounded by the
    # checkpoint count, never by corpus size
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("n_new").over(w).cast("long").alias("cum_vocab"),
    )
