"""Integer-exact n-gram LM scoring: CCNet-style perplexity filtering and
TF-IDF keyword extraction, with every logarithm computed as an exact
integer bit-length (no floats anywhere, so both kernels are hash-gated
against DuckDB oracles).

The log₂ primitive: for x ≥ 1, floor(log₂ x) = length(bin(x)) − 1 — both
Spark and DuckDB render ``bin()`` as the minimal binary string, so the
value is engine-exact by construction.  Fixed-point precision comes from
pre-scaling: floor(log₂(a/b)·1) ≈ length(bin((a·256) div b)) − 9 gives
Q0 bits with ≤1-bit truncation — plenty for a quality FILTER, whose only
job is thresholding.

Perplexity filter (CCNet — Wenzek et al. 2020, "CCNet: Extracting high
quality monolingual datasets from web crawl data"): train a small LM on a
trusted in-domain corpus slice, score every candidate document by
bits-per-token under that LM, keep the low-perplexity (fluent) tail.  Here
the LM is an add-one-smoothed bigram model and the score is

    bits(w₁w₂) = floor(log₂( (c₁(w₁)+V)·256 div (c₂(w₁,w₂)+1) )) − 8
    doc score  = Σ bits  /  n_bigrams        (integer div, Q0 bits)

c₂/c₁ counted on the training slice only; V = training vocabulary size.
Unseen bigrams cost ≈ log₂(c₁+V) bits — exactly add-one smoothing.

Scale shape (100 TB): bigrams form INSIDE the token array (map-side
transform, no per-doc shuffle); candidate docs pre-aggregate to
(doc, w₁, w₂, tf) before joining the model, so the join input is the
distinct-bigram count, not the token count; the c₂ model join is a single
equi-join on (w₁, w₂) (both sides hash-partitioned — at web scale the
model is the smaller side and broadcastable after frequency pruning);
c₁ derives from c₂ by one more partial-aggregated groupBy; V is a 1-row
aggregate broadcast.  Nothing ever re-shuffles the corpus text itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.text import token_count, tokens


def floor_log2(x: Column) -> Column:
    """floor(log₂ x) for x ≥ 1, integer-exact in Spark and DuckDB."""
    return (F.length(F.bin(x.cast("long"))) - 1).cast("long")


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2, tf) — per-document adjacent-pair counts, plus
    n_bigrams carried on every row (0-bigram docs produce no rows)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("tk"),
        token_count(F.col(text_col)).alias("n"),
    )
    bg = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("n") >= 2,
                F.expr("transform(sequence(0, n - 2), i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"),
            ).otherwise(F.expr("array()").cast("array<struct<w1:string,w2:string>>"))
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    return bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))


def bigram_bits_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    train_pred: Column,
) -> DataFrame:
    """Score every document by add-one-smoothed bigram bits-per-bigram under
    the LM trained on the ``train_pred`` slice.  Returns
    (doc_id, n_bigrams, bits_total, bits_avg) — bits_avg is the perplexity
    exponent (log₂ PPL) in whole bits; docs with <2 tokens score 0."""
    train = df.filter(train_pred)
    tr_bg = _doc_bigrams(train, id_col, text_col)
    c2 = tr_bg.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        train.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    cand = _doc_bigrams(df, id_col, text_col)
    scored = (
        cand.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(broadcast(vocab))
    )
    bits = floor_log2(
        F.expr("((coalesce(c1, 0L) + v) * 256) div (coalesce(c2, 0L) + 1)")
    ) - F.lit(8)
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.sum(bits * F.col("tf")).cast("long").alias("bits_total"),
    )
    # docs with zero bigrams still belong in the output (score 0)
    all_docs = df.select(F.col(id_col).alias("doc_id")).distinct()
    return all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("bits_total", F.lit(0)).cast("long").alias("bits_total"),
        F.expr("CAST(coalesce(bits_total, 0L) div greatest(coalesce(n_bigrams, 0L), 1L) AS BIGINT)").alias(
            "bits_avg"
        ),
    )


def tfidf_keywords(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document with integer-exact idf:

        idf_q8(t) = floor(log₂( (N+1)·256 div (df(t)+1) ))    (Q8 bits)
        score(d,t) = tf(d,t) · idf_q8(t)

    Output (doc_id, term, tf, idf_q8, score, rk), rk 1..k by
    (score desc, term asc).

    Scale shape: term counts partial-aggregate map-side; df(t) is one more
    groupBy over the distinct (doc, term) pairs; N is a 1-row broadcast;
    the per-doc top-k window is partitioned by doc_id and prunes via
    WindowGroupLimit (plan-gated), so no reducer ever holds more than k
    rows per document."""
    from pyspark.sql import Window

    tf = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)  # '' would tokenize to ['']
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(broadcast(n_docs))
        .withColumn("idf_q8", floor_log2(F.expr("((n_docs + 1) * 256) div (df + 1)")))
        .withColumn("score", (F.col("tf") * F.col("idf_q8")).cast("long"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"), "idf_q8", "score", F.col("rk").cast("int").alias("rk"))
    )
