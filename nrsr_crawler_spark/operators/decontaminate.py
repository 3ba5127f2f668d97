"""Benchmark decontamination: flag corpus documents that share an n-token
window with any document of an evaluation/benchmark set.

Standard LLM-training-data hygiene (GPT-3 appendix C / Lee et al.
arXiv:2107.06499 §Decontamination): before training, any document whose
text overlaps an eval-suite document in a length-n token window is dropped
(or the span is excised) so benchmark numbers measure generalization, not
memorization.  The reference crawler has no analogue — this is one of the
engine's training-data-pipeline additions (driver brief).

Semantics here: window = n consecutive whitespace tokens, keyed by
md5(space-joined window) so the DuckDB oracle is hash-exact.  A corpus doc
is ``contaminated`` iff ≥1 of its windows also occurs in the eval set;
``eval_hit_windows`` counts how many of its windows hit.

Scale shape (100 TB corpus, MB-scale eval suites): the eval side is tiny by
construction (benchmark suites are ~10⁴-10⁶ windows), so its DISTINCT gram
keys are broadcast and the corpus-side probe is a map-side broadcast join —
the corpus is never shuffled.  The corpus gram explode is linear and
map-side; the per-doc rollup is one partial-aggregated groupBy on doc id.
If an eval suite ever outgrew broadcast, the same plan degrades gracefully
to a shuffled shingle join (the ``dedup.ngram_jaccard`` shape) — flip
``broadcast_eval=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import tokens


def _gram_keys(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id_col, gkey) — one row per n-token window, md5-keyed.

    Guard: ``F.sequence(1, size-n+1)`` DESCENDS when size < n — emit []
    instead (same guard as text.duplicated_span_stats).
    """
    tk = tokens(F.col(text_col))
    grams_arr = F.when(
        F.size(tk) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tk, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(grams_arr).alias("gkey"))


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per corpus doc: (id_col, n_windows, eval_hit_windows, contaminated).

    ``corpus`` and ``eval_set`` both carry (id_col, text_col); a row of
    ``corpus`` is contaminated iff any of its n-token windows appears in ANY
    eval document.  Output covers every corpus row (0-window docs included,
    uncontaminated by definition).
    """
    eval_grams = _gram_keys(eval_set, id_col, text_col, n).select("gkey").distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    corpus_grams = _gram_keys(corpus, id_col, text_col, n)
    hits = (
        corpus_grams.join(
            eval_grams.withColumn("hit", F.lit(1)), "gkey", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("eval_hit_windows"),
        )
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("eval_hit_windows", F.lit(0)).cast("long").alias("eval_hit_windows"),
            (F.coalesce("eval_hit_windows", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )
