"""Per-host politeness budget pop (SURVEY §2.6 O3, north_star).

The reference serializes fetches per IP (`DOWNLOAD_DELAY = 2.5`,
`CONCURRENT_REQUESTS_PER_IP = 1` — /root/reference/nrsr/settings.py:30-33) and
pops its queue priority-then-LIFO.  The engine's equivalent: each epoch pops
at most ``budget`` URLs per host, in ``(priority DESC, seq DESC)`` order
(LIFO ⇒ depth-first, matching Scrapy 1.5's in-memory LIFO queue).

Skew is the whole problem at 10^10 URLs: the reference crawls ONE host, so a
naive ``Window.partitionBy(host)`` puts the entire frontier in a single task.
``pop_budget`` is therefore two-level (both levels exact):

  1. rank within (host, salt) where salt = url_hash % S — S× parallel; any
     row in a host's global top-``budget`` is necessarily within the
     top-``budget`` of its salt bucket, so keeping rank ≤ budget per bucket
     loses nothing;
  2. re-rank the ≤ S·budget survivors per host and keep ``budget``.

Level-2 input is tiny (S·budget rows/host), so the skewed key no longer
matters.  Result is byte-identical to the naive single window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pop_order() -> list[Column]:
    """Scrapy-1.5 pop order: priority DESC then LIFO (seq DESC)."""
    return [F.col("priority").desc(), F.col("seq").desc()]


def pop_budget(
    frontier: DataFrame,
    budget: int | Column,
    host_col: str = "host",
    salt_col: str = "url_hash",
    num_salts: int = 16,
    rank_col: str = "rk",
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """Exact top-``budget`` rows per host by :func:`pop_order`, skew-proof.

    ``frontier`` needs columns: host, priority, seq, and ``salt_col`` (any
    well-distributed long, normally the url fingerprint).  ``tiebreak``
    columns are appended to the pop order — the order MUST be total per host
    or the two-level decomposition (and any distributed rank) is
    nondeterministic; pass e.g. ``[F.col("canon_url")]`` when ``seq`` alone
    may tie.

    ``budget`` may be a Column for PER-HOST budgets (robots Crawl-delay:
    budget_h = ⌊epoch_seconds/delay_h⌋ — see ``robots.crawl_delay_budgets``).
    It must be a pure function of ``host_col`` (constant within a host), or
    the two-level decomposition is no longer exact.

    Sizing ``num_salts``: for a frontier dominated by FEW hosts, level-1
    parallelism is ``distinct_hosts × num_salts`` — size it to ≥2× the
    cluster's core count or the window sort becomes the pipeline's serial
    bottleneck (profiled on the single-host bench: 16 salts capped the
    dominant stage at 16-way).  The result is salt-count-independent, so
    this is purely a physical knob.
    """
    order = pop_order() + list(tiebreak or [])
    budget_col = F.lit(budget) if isinstance(budget, int) else budget
    salted = frontier.withColumn("__salt", F.pmod(F.col(salt_col), F.lit(num_salts)))
    w1 = Window.partitionBy(host_col, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= budget_col)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= budget_col
    )


def autothrottle_delays(
    latencies: DataFrame,
    host_col: str = "host",
    order_col: str = "epoch",
    latency_col: str = "latency_ms",
    start_delay_ms: int = 5000,
    min_delay_ms: int = 2500,
    max_delay_ms: int = 60000,
    target_concurrency_milli: int = 1000,
) -> DataFrame:
    """Scrapy AutoThrottle recurrence per host → final download delay.

    The reference ships AutoThrottle configured-but-commented
    (/root/reference/nrsr/settings.py:94-103: START_DELAY=5, MAX_DELAY=60,
    TARGET_CONCURRENCY=1.0) — like robots.txt, the engine implements the
    capability; the reference-parity default is simply "off".  Scrapy's
    update rule per observed response (autothrottle.py in Scrapy 1.5):

        target = latency / target_concurrency
        delay' = clamp((delay + target) / 2, min_delay, max_delay)

    reproduced here in integer milliseconds (``target_concurrency`` scaled
    by 1000) so the DuckDB oracle is hash-exact: ``target = lat_ms·1000 //
    tc_milli``; ``delay' = greatest(min, least(max, (delay + target) // 2))``.

    Scale shape: one partial-aggregated groupBy on ``host_col`` collecting
    the (order, latency) sequence, then a per-host ``F.aggregate`` fold —
    the sequence recurrence is inherently ordered, so it folds INSIDE the
    row (array), never as a cross-row window; per-host state is bounded by
    observations/host per throttle window (cap upstream with a recent-epoch
    filter at petabyte scale).
    """
    lats = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(latency_col).alias("l")))
    )
    def fold(acc, x):
        # target = lat·1000 // tc_milli; delay' = clamp((acc + target) // 2)
        # (all values < 2^27, so the double-division round-trips are exact)
        target = (x * 1000 / F.lit(target_concurrency_milli)).cast("long")
        return F.greatest(
            F.lit(min_delay_ms).cast("long"),
            F.least(
                F.lit(max_delay_ms).cast("long"),
                ((acc + target) / 2).cast("long"),
            ),
        )
    return (
        latencies.groupBy(host_col)
        .agg(lats.alias("__lats"))
        .select(
            F.col(host_col),
            F.aggregate(
                F.transform(F.col("__lats"), lambda s: s.getField("l").cast("long")),
                F.lit(start_delay_ms).cast("long"),
                fold,
            ).alias("delay_ms"),
        )
    )


def autothrottle_budgets(delays: DataFrame, epoch_ms: int) -> DataFrame:
    """(host, delay_ms) → (host, budget): fetches a host absorbs per epoch
    window under its throttled delay — ⌊epoch_ms/delay⌋, floor 1 (same
    shape as robots.crawl_delay_budgets; feed the collected dict into
    ``robots.budget_expr`` / ``CrawlEngine(host_budgets=...)``)."""
    return delays.select(
        "host",
        F.greatest(
            F.lit(1).cast("long"), (F.lit(epoch_ms) / F.col("delay_ms")).cast("long")
        ).alias("budget"),
    )


def pop_budget_slim(
    frontier: DataFrame,
    budget: int | Column,
    host_col: str = "host",
    salt_col: str = "url_hash",
    num_salts: int = 16,
    rank_col: str = "rk",
    tiebreak_cols: list[str] | None = None,
    key_col: str = "url_hash",
) -> DataFrame:
    """Shuffle-lean :func:`pop_budget`: identical result, a fraction of the
    exchanged bytes (VERDICT r2 next #2 — the engine is memory-bandwidth
    bound, and the pop windows re-shuffle the WHOLE pending set every epoch).

    The two window exchanges run over ONLY the ordering columns
    (key/host/priority/seq + tiebreaks ≈ 40 B/row instead of the full row
    with url/canon/lineage strings ≈ 200 B), then the ≤ budget×hosts winners
    are broadcast back onto the full frontier — a map-side hash join, no
    extra exchange of the big side.

    Preconditions:
     - ``key_col`` is unique per frontier row (true post-dedup: the pending
       set is keyed by url fingerprint), so the rejoin is 1:1;
     - ``tiebreak_cols`` must make the per-host order total, same as
       ``pop_budget`` — the fingerprint itself is the natural choice: 8
       bytes, always present, distinct per row.
    """
    tiebreak_cols = list(tiebreak_cols or [])
    slim_cols = list(dict.fromkeys([key_col, host_col, "priority", "seq", salt_col] + tiebreak_cols))
    popped = pop_budget(
        frontier.select(*slim_cols),
        budget,
        host_col=host_col,
        salt_col=salt_col,
        num_salts=num_salts,
        rank_col=rank_col,
        tiebreak=[F.col(c) for c in tiebreak_cols],
    )
    keys = popped.select(key_col, rank_col)
    return frontier.join(F.broadcast(keys), key_col)
