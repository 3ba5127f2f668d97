"""Per-language stopword induction by document frequency.

Quality heuristics (Gopher's stopword-presence rule, C4's line filters)
and indexers both need per-language stopword lists; for crawled corpora
in less-resourced languages the practical source is the corpus itself —
the terms that appear in nearly every document ARE the function words
(Luhn 1958's upper cut).  This induces them: per-language document
frequency, keep terms above a df floor, rank the top k.

Scale shape: explode → per-doc distinct terms (map-side array_distinct,
so the shuffle carries each (doc, term) once) → one partial-agg groupBy
(lang, term) → broadcast O(langs) doc totals → per-lang top-k through a
rank window that prunes via WindowGroupLimit (k-row heap per language).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from nrsr_crawler_spark.operators.text import tokens


def induce_stopwords(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    k: int = 20,
    min_df_bps: int = 2000,
) -> DataFrame:
    """Return (lang, term, df, df_bps, rank): the ≤k highest-df terms per
    language whose document frequency clears ``min_df_bps`` basis points
    of that language's documents."""
    per_doc = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("term"),
    ).filter(F.col("term") != "")
    df_tbl = per_doc.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    totals = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    scored = df_tbl.join(broadcast(totals), "lang").withColumn(
        "df_bps", F.expr("df * 10000 div _n_docs").cast("long")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("df"), "term")
    return (
        scored.filter(F.col("df_bps") >= min_df_bps)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "term", "df", "df_bps", "rank")
    )
