"""Pipeline telemetry reports: the staged filter funnel and the dedup
cluster-size histogram — the two tables every large-scale dataset paper
publishes (C4 Table 1's per-filter attrition, the near-dup cluster-size
distributions in Lee et al. 2107.06499), and the numbers an operator
watches to catch a filter suddenly eating the corpus.

Both are pure aggregation layers over existing kernels — one pass, no new
shuffle shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import token_count, tokens


def quality_funnel(df: DataFrame, id_col: str, text_col: str, lang_col: str) -> DataFrame:
    """Cumulative keep counts through a 5-stage quality gate chain:

      0 all        every document
      1 lang       lang == 'en'
      2 length     ≥ 50 tokens
      3 wordlen    mean word length in [3, 12] chars (10·chars/token bounds,
                   cross-multiplied integers — no division)
      4 repetition most frequent token ≤ 20% of the document (·5 ≤ n)

    Output: (stage_idx, stage, n_kept, n_dropped_here) — n_dropped_here is
    the attrition attributable to that stage GIVEN the earlier gates, which
    is how funnel tables are read.

    Scale shape: flags are pure column expressions over one corpus pass;
    the only shuffle is the per-doc top-token groupBy (partial-aggregated);
    the funnel itself is a single global aggregate emitting 5 rows via
    ``stack``.  Mean word length uses n_chars-style len(text) so the gate
    needs no second tokenization."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        token_count(F.col(text_col)).alias("n_tok"),
        F.length(F.trim(F.col(text_col))).alias("n_chr"),
        tokens(F.col(text_col)).alias("tk"),
    )
    top = (
        base.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top1"))
    )
    flagged = base.join(top, "doc_id", "left").select(
        "doc_id",
        (F.col("lang") == "en").alias("g1"),
        (F.col("n_tok") >= 50).alias("g2"),
        (
            (F.col("n_chr") * 10 >= F.col("n_tok") * 30)
            & (F.col("n_chr") * 10 <= F.col("n_tok") * 120)
        ).alias("g3"),
        (F.coalesce(F.col("top1"), F.lit(0)) * 5 <= F.col("n_tok")).alias("g4"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("k0"),
        F.sum(F.col("g1").cast("long")).cast("long").alias("k1"),
        F.sum((F.col("g1") & F.col("g2")).cast("long")).cast("long").alias("k2"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3")).cast("long")).cast("long").alias("k3"),
        F.sum((F.col("g1") & F.col("g2") & F.col("g3") & F.col("g4")).cast("long")).cast("long").alias("k4"),
    )
    return agg.selectExpr(
        "stack(5, 0, 'all', k0, CAST(NULL AS BIGINT),"
        "         1, 'lang', k1, k0 - k1,"
        "         2, 'length', k2, k1 - k2,"
        "         3, 'wordlen', k3, k2 - k3,"
        "         4, 'repetition', k4, k3 - k4)"
        " AS (stage_idx, stage, n_kept, n_dropped_here)"
    ).select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("n_kept").cast("long"),
        F.col("n_dropped_here").cast("long"),
    )


def cluster_size_histogram(groups: DataFrame, rep_col: str = "rep") -> DataFrame:
    """Histogram of near-dup cluster sizes from a (member, rep) CC table:
    (cluster_size, n_clusters, n_docs).  The shape every dedup report
    publishes — a fat tail here means a template/boilerplate family the
    shingle stop-list should have caught.

    Two partial-aggregated groupBys; output is O(max cluster size) rows."""
    sizes = groups.groupBy(F.col(rep_col).alias("rep")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        )
    )
