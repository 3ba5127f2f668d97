"""Deterministic stratified sampling for training-data mixtures.

A pretraining pipeline balances its corpus by drawing a FIXED quota of
documents per stratum (language × length bucket, source × quality tier, …).
Two properties matter at 100 TB:

 - **determinism** — the sample must be reproducible run-over-run and
   engine-over-engine, so the "random" order is a hash of the document id,
   not an RNG;
 - **no single-reducer stratum** — a naive
   ``row_number() OVER (PARTITION BY stratum)`` funnels each stratum
   through ONE task; with a handful of strata over 10^10 rows that is a
   handful of tasks doing all the work.  The fix is the same two-level
   salted window the politeness pop uses (operators/politeness.py
   pop_budget): level 1 ranks within (stratum, salt) — ``num_salts``-way
   parallel per stratum — and keeps ``k`` per salt (a superset of the true
   top-k, since the global top-k spreads across salts); level 2 re-ranks
   only the ≤ ``num_salts × k`` survivors per stratum.  Both levels are
   WindowGroupLimit-optimizable (rank-limit pushdown, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stratified_topk(
    df: DataFrame,
    strata_cols: list[str],
    order_col: Column,
    k: int,
    num_salts: int = 32,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first ``k`` rows per stratum under the total order
    ``(order_col, *strata_cols-independent tiebreak)`` supplied by the
    caller — ``order_col`` MUST be unique per row (e.g. md5 of the row id)
    or the level-1/level-2 split can disagree with the naive single-window
    result.  Emits ``rank_col`` (1-based rank within the stratum)."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(order_col), F.lit(num_salts)))
    w1 = Window.partitionBy(*strata_cols, "__salt").orderBy(order_col)
    w2 = Window.partitionBy(*strata_cols).orderBy(order_col)
    return (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("__salt", "__r1")
    )


def temperature_quotas(
    df: DataFrame, strata_col: str, n_total: int, weight_scale: int = 1_000_000
) -> DataFrame:
    """Per-stratum quotas for temperature-smoothed mixture sampling
    (multilingual-pretraining upsampling à la XLM-R / mC4: stratum s with
    count c_s gets share ∝ c_s^(1/T)).  T is fixed at 2 — the weight is
    ``round(sqrt(c_s)·scale)`` — because IEEE sqrt is correctly rounded and
    therefore bit-identical in any engine, which keeps the quota table (and
    every downstream pick) DuckDB-oracle-exact; arbitrary T needs ``pow``,
    whose last-ulp behavior is engine-specific.  Quota = ⌊n_total·w_s/Σw⌋
    (truncation under-allocates ≤|strata| rows — documented, deterministic).

    Scale shape: one partial-aggregated count per stratum (|strata| rows),
    a 1-row total, both broadcastable — model state, not data."""
    cnts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    weighted = cnts.withColumn(
        "w", F.round(F.sqrt(F.col("n_stratum")) * weight_scale).cast("long")
    )
    tot = weighted.agg(F.sum("w").alias("tot"))
    return weighted.crossJoin(tot).select(
        strata_col,
        "n_stratum",
        F.expr(f"({n_total} * w) div tot").alias("quota"),
    )


def temperature_mixture_sample(
    df: DataFrame, id_col: str, strata_col: str, n_total: int
) -> DataFrame:
    """Draw the temperature-smoothed training mixture: within each stratum
    documents are ordered by ``md5(id)`` (deterministic pseudo-randomness —
    reproducible run-over-run and engine-over-engine) and the first
    ``quota`` are kept.  Output: ``(id, stratum, pick_rank, quota)``.

    Scale shape: ranking reuses :func:`stratified_topk`'s two-level salted
    window (no single-reducer stratum at 10^10 rows); the quota table is a
    |strata|-row broadcast."""
    ranked = stratified_topk(
        df.select(F.col(id_col), F.col(strata_col)).withColumn(
            "__ord", F.md5(F.col(id_col).cast("string"))
        ),
        [strata_col],
        F.col("__ord"),
        k=n_total,
        rank_col="pick_rank",
    )
    q = temperature_quotas(df, strata_col, n_total)
    return (
        ranked.join(F.broadcast(q), strata_col)
        .filter(F.col("pick_rank") <= F.col("quota"))
        .select(F.col(id_col), F.col(strata_col), "pick_rank", "quota")
    )


def curriculum_order(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    difficulty: Column,
) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009, easy→hard) with
    stratified round-robin interleave: within each stratum documents rank by
    ``(difficulty asc, id)``; the global order key is
    ``within_rank · n_strata + stratum_index``, so consecutive positions
    rotate through strata (no domain runs — the mixture stays uniform at
    every curriculum prefix) while difficulty rises monotonically within
    each stratum.

    Output: ``(id, stratum, difficulty, within_rank, order_key)`` —
    ``order_key`` is a TOTAL order (unique: one row per (rank, stratum));
    shard writers sort by it, no global enumeration is ever materialized.

    Scale shape (100 TB): one window partitioned per stratum (parallel
    across strata; for a mega-stratum swap in stratified_topk's salted
    two-level split — same contract) plus a |strata|-row broadcast of dense
    stratum indexes.  No global window, no UDF."""
    idx = (
        df.select(F.col(strata_col).alias("stratum"))
        .distinct()
        .withColumn(
            "__sidx",
            F.row_number().over(Window.orderBy("stratum")) - 1,
        )
    )
    n_strata = idx.count()
    w = Window.partitionBy(strata_col).orderBy(difficulty, F.col(id_col))
    ranked = df.select(
        F.col(id_col),
        F.col(strata_col).alias("stratum"),
        difficulty.alias("difficulty"),
        F.row_number().over(w).alias("within_rank"),
    )
    return ranked.join(F.broadcast(idx), "stratum").select(
        F.col(id_col),
        "stratum",
        F.col("difficulty").cast("long").alias("difficulty"),
        F.col("within_rank").cast("long").alias("within_rank"),
        ((F.col("within_rank") - 1) * n_strata + F.col("__sidx"))
        .cast("long")
        .alias("order_key"),
    )


# -- DSIR-style hashed-feature importance weighting ----------------------------

def importance_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document by
    how much its hashed token-feature distribution looks like a TARGET
    corpus (the high-quality domain you want more of) relative to the raw
    corpus.

    DSIR proper uses log-likelihood ratios of hashed n-gram features; this
    runs the integer linear-domain analogue so the result is exact and
    hash-gated against a DuckDB oracle: bucket(w) = first-16-bits of
    md5(w) mod ``n_buckets`` (portable, no engine hash);
    ratio[b] = (target_count[b]+1) · scale div (raw_count[b]+1) (add-1
    smoothed); doc score = Σ_tokens ratio[bucket(token)]; avg_weight =
    score div n_tokens (length-normalized, so long docs don't auto-win).
    Resampling = take the top-k by avg_weight (deterministic tie-break on
    id) instead of Gumbel sampling — reproducible run-over-run.

    Returns (id, n_tokens, score, avg_weight).

    Scale shape (10^10 docs): token explode is map-side; both histograms
    partial-aggregate down to ``n_buckets`` rows; the ratio table is a
    broadcast join back onto the token stream; one per-doc groupBy ends the
    plan.  No window, no driver loop, no UDF.
    """
    from nrsr_crawler_spark.operators.dedup import _hex4_to_int

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        ).withColumn("b", _hex4_to_int(F.md5(F.col("w"))) % n_buckets)

    raw_t = toks(docs)
    raw_hist = raw_t.groupBy("b").agg(F.count(F.lit(1)).alias("rc"))
    tgt_hist = toks(target).groupBy("b").agg(F.count(F.lit(1)).alias("tc"))
    ratio = (
        raw_hist.join(tgt_hist, "b", "left")
        .select(
            "b",
            F.expr(f"(coalesce(tc, 0L) + 1L) * {scale}L div (rc + 1L)").alias("ratio"),
        )
    )
    return (
        raw_t.join(F.broadcast(ratio), "b")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("ratio").alias("score"))
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            "score",
            F.expr("score div n_tokens").alias("avg_weight"),
        )
    )
