"""Corpus retrieval scoring — integer-exact BM25 top-k.

Why the pipeline needs it: targeted data selection ranks corpus documents
against seed queries (domain prompts, eval-adjacent probes) and keeps the
most relevant slice — the lexical counterpart of the embedding-ANN
operators (DSIR/data-selection pipelines do exactly this with hashed-ngram
or BM25 relevance).

Why an INTEGER variant: classic BM25 is float (ln idf, float length
normalization) and float summation order is engine-specific, so scores
could never be hash-gated against a DuckDB oracle.  Every factor here is
scaled-integer floor division — bit-identical in any engine:

    idf_milli(t)  = (10⁶ · (N − df_t)) div N            (rational idf)
    dl_part(d)    = (750 · dl_d · N) div T               (b = 0.75; avgdl = T/N
                                                          folded in exactly)
    denom(t, d)   = tf · 1000 + (1200 · (250 + dl_part)) div 1000   (k1 = 1.2)
    score(t, d)   = (idf_milli · tf · 2200) div denom    ((k1+1)·1000 = 2200)
    score(q, d)   = Σ_{t ∈ q} score(t, d)                (integer sum)

The rational idf (1 − df/N instead of ln((N−df+.5)/(df+.5)+1)) preserves
the monotone rare-term-wins ordering BM25 cares about; the tf saturation
and length normalization are the standard Robertson forms exactly, modulo
the documented floor divisions.

Scale shape (100 TB): postings = explode to (term, doc, tf) — one linear
shuffle keyed on term (well-mixed); df is a partial-aggregated groupBy on
the same key; the query set is a literal broadcast (≤ dozens of terms), so
scoring touches ONLY postings of query terms (semi-join pruned before any
wide work); per-query top-k is a bounded window over candidates.  N and T
are two scalars (one metadata-grade aggregate, broadcast back).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.text import tokens


def term_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, id, tf, dl) postings — tf per (doc, term), dl = doc token count."""
    tk = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    dl = df.select(F.col(id_col), F.size(tokens(F.col(text_col))).alias("dl"))
    tf = tk.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(dl, id_col)


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """Integer-BM25 top-k documents per query (module docstring math).

    ``queries`` maps query_id → term list (literals — model state).  Output:
    ``(query_id, id, score, rank)``, rank 1-based by (score desc, id asc).
    """
    post = term_postings(df, id_col, text_col)
    stats = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).alias("t_tokens"),
    )
    qrows = [(qid, t) for qid, terms in sorted(queries.items()) for t in terms]
    qdf = F.broadcast(
        post.sparkSession.createDataFrame(qrows, "query_id string, term string")
    )
    cand = post.join(qdf, "term").crossJoin(F.broadcast(stats))
    df_t = cand.groupBy("term").agg(F.countDistinct(id_col).alias("df_t"))
    scored = (
        cand.join(F.broadcast(df_t), "term")
        .withColumn(
            "idf_milli", F.expr("(1000000 * (n_docs - df_t)) div n_docs")
        )
        .withColumn("dl_part", F.expr("(750 * dl * n_docs) div t_tokens"))
        .withColumn(
            "term_score",
            F.expr(
                "(idf_milli * tf * 2200) div "
                "(tf * 1000 + (1200 * (250 + dl_part)) div 1000)"
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("term_score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def positional_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, pos) — 1-based token positions (the positional index a
    phrase query needs; one explode, keys shuffle on well-mixed terms)."""
    return df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos0", "term")
    ).select(F.col(id_col), "term", (F.col("pos0") + 1).alias("pos"))


def phrase_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrases: dict[str, list[str]],
    k: int = 5,
) -> DataFrame:
    """Exact phrase search over a positional index: a ``phrase_id`` matches
    at position ``p`` iff term_i sits at ``p + i`` for every term of the
    phrase (the classic positional-postings adjacency join).  Returns the
    top ``k`` docs per phrase by occurrence count (ties → smaller id), with
    the exact integer count — fully oracle-checkable.

    Scale shape (100 TB): the phrase set is a literal broadcast (≤ dozens
    of terms); postings are semi-join pruned to phrase terms BEFORE any
    wide work, then the adjacency join is an equi-join on
    ``(id, adjusted_pos)`` — candidate positions of term 0 only, never a
    scan of non-matching positions; per-phrase top-k is a bounded window."""
    post = positional_postings(df, id_col, text_col)
    rows = [
        (pid, i, t)
        for pid, terms in sorted(phrases.items())
        for i, t in enumerate(terms)
    ]
    spark = df.sparkSession
    pt = spark.createDataFrame(rows, "phrase_id string, term_idx int, term string")
    # prune to phrase vocabulary, then anchor on term 0 and check adjacency:
    # each (phrase term i at pos) normalizes to its would-be anchor pos - i
    cand = post.join(F.broadcast(pt), "term").select(
        F.col(id_col), "phrase_id", "term_idx", (F.col("pos") - F.col("term_idx")).alias("anchor")
    )
    n_terms = pt.groupBy("phrase_id").agg(F.count(F.lit(1)).alias("n_terms"))
    hits = (
        cand.groupBy(id_col, "phrase_id", "anchor")
        .agg(F.count_distinct("term_idx").alias("n_found"))
        .join(F.broadcast(n_terms), "phrase_id")
        .filter(F.col("n_found") == F.col("n_terms"))
        .groupBy("phrase_id", id_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("phrase_id").orderBy(
        F.col("n_occurrences").desc(), F.col(id_col)
    )
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("phrase_id", F.col(id_col), "n_occurrences", "rank")
    )
