"""Context-window sequence packing: assign every document a contiguous
token span inside fixed-size training sequences.

LLM pretraining concatenates documents (with separators handled by the
tokenizer) and slices the stream into fixed ``seq_len`` windows; the packing
manifest — which sequences a document lands in, and how many window
boundaries split it — drives shard assembly and attention-mask construction.
The reference crawler has no analogue; this is an engine
training-data-pipeline addition (driver brief).

Semantics (exact, oracle-friendly): within each ``group_col`` stream,
documents are concatenated in ``id_col`` order; ``start_offset`` is the
running token sum before the doc, sequence ids are ``offset div seq_len``:

    start_seq = start_offset div L
    end_seq   = (start_offset + n_tokens - 1) div L   (empty docs: start_seq)
    n_splits  = end_seq - start_seq                    (boundaries crossed)

Scale shape: the running sum is a window partitioned by ``group_col`` — the
packing stream is per group (per source/shard), NEVER a global single-task
window; at 100 TB the group key is (source, shard_id) so each stream packs
independently and in parallel, which is also what training ingestion wants
(one packed stream per shard file).  One shuffle on the group key, then
pure column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import token_count


def seq_packing(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Packing manifest: (id, group, n_tokens, start_offset, start_seq,
    end_seq, n_splits) per document."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(id_col),
        F.col(group_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    off = toks.withColumn(
        "start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    )
    start_seq = F.expr(f"start_offset div {seq_len}")
    end_seq = F.when(F.col("n_tokens") == 0, start_seq).otherwise(
        F.expr(f"(start_offset + n_tokens - 1) div {seq_len}")
    )
    return off.select(
        id_col,
        group_col,
        "n_tokens",
        "start_offset",
        start_seq.alias("start_seq"),
        end_seq.alias("end_seq"),
        (end_seq - start_seq).cast("long").alias("n_splits"),
    )


def packing_stats(manifest: DataFrame, seq_len: int) -> DataFrame:
    """Per-group rollup: total tokens, sequences produced, docs split by a
    window boundary, and tail padding of the final sequence."""
    total = F.sum("n_tokens")
    # ceil-div on integral values (exact while totals stay < 2^53)
    n_seqs = ((total + F.lit(seq_len - 1)) / F.lit(seq_len)).cast("long")
    return manifest.groupBy("source").agg(
        total.alias("total_tokens"),
        n_seqs.alias("n_seqs"),
        F.sum(F.when(F.col("n_splits") > 0, 1).otherwise(0)).alias("docs_split"),
        (n_seqs * seq_len - total).cast("long").alias("tail_padding"),
    )
