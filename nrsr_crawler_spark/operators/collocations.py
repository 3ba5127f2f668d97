"""PMI collocation mining — top adjacent-token pairs by pointwise mutual
information, integer-exact.

Collocations (multi-word units like "supreme court") drive tokenizer
merge decisions and phrase-aware dedup; PMI = log p(a,b)/(p(a)p(b)) is
the classic score (Church & Hanks 1990).  Floats would break the oracle
gate, so the score keeps the integer RATIO q = (c_ab·N) div (c_a·c_b)
(the linear-domain PMI argument) and derives whole-bit PMI as
floor(log₂ q) via minimal-binary-string length — both engines agree
bit-for-bit on all of it.

Scale shape: bigrams form INSIDE the token array (map-side transform —
the bigram_coherence precedent); one partial-agg groupBy each for
bigram and unigram counts; the ≥min_count bigram table joins the
unigram table on each side; N is a 1-row broadcast; final top-k is
TakeOrderedAndProject under the deterministic (q desc, pair) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.text import token_count, tokens


def pmi_collocations(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Return the top-``k`` (w1, w2, c_ab, ratio_q, pmi_bits) collocations
    with c_ab ≥ min_count and ratio_q ≥ 2 (i.e. PMI ≥ 1 bit)."""
    # ONE corpus pass for both gram orders (r5 replan: the corpus was
    # previously tokenized + exploded twice — once per order): unigrams and
    # bigrams are tagged structs in a single concatenated array, so one
    # explode + one partial-aggregated groupBy produces the whole count
    # table.  The (tag, gram) table is vocab-sized — persisted so the two
    # downstream branches (uni / big) don't re-scan the corpus.
    base = docs.select(
        tokens(F.col(text_col)).alias("tk"),
        token_count(F.col(text_col)).alias("n"),
    )
    uni_arr = F.expr(
        "transform(filter(tk, w -> w != ''), w -> struct(0 AS t, w AS g))"
    )
    bg_arr = F.when(
        F.col("n") >= 2,
        F.expr(
            "transform(sequence(0, n - 2),"
            " i -> struct(1 AS t, concat(tk[i], ' ', tk[i + 1]) AS g))"
        ),
    ).otherwise(F.expr("array()").cast("array<struct<t:int,g:string>>"))
    counts = (
        base.select(F.explode(F.concat(uni_arr, bg_arr)).alias("x"))
        .groupBy(F.col("x.t").alias("t"), F.col("x.g").alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    uni = counts.filter(F.col("t") == 0).select(F.col("g").alias("w"), "c")
    big = (
        counts.filter(F.col("t") == 1)
        .select(F.col("g").alias("b"), F.col("c").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
        .withColumn("w1", F.split("b", " ")[0])
        .withColumn("w2", F.split("b", " ")[1])
    )
    n_total = uni.agg(F.sum("c").alias("_N"))
    joined = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(broadcast(n_total))
    )
    scored = joined.withColumn(
        "ratio_q", F.expr("(c_ab * _N) div (c_a * c_b)").cast("long")
    ).filter(F.col("ratio_q") >= 2)
    return (
        scored.withColumn(
            "pmi_bits", (F.length(F.bin(F.col("ratio_q"))) - 1).cast("long")
        )
        .select("w1", "w2", F.col("c_ab").cast("long").alias("c_ab"), "ratio_q", "pmi_bits")
        .orderBy(F.desc("ratio_q"), "w1", "w2")
        .limit(k)
    )
