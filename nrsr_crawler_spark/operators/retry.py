"""Fetch-failure retry policy (Scrapy RetryMiddleware parity).

The reference runs Scrapy's default downloader-middleware stack, which
includes ``RetryMiddleware`` (scrapy.downloadermiddlewares.retry, enabled by
default — /root/reference/nrsr/settings.py:62-66 never disables it): a
request failing with a retryable error is re-scheduled up to ``RETRY_TIMES``
(default 2) more times with ``RETRY_PRIORITY_ADJUST`` (default −1) applied,
then dropped with a ``retry/max_reached`` stat.

Spark-first shape: retries are NOT extra frontier rows — the URL stays in
the pending set with its original lineage ``seq`` (so the crawl order stays
certified) and only a tiny driver-tracked ``(url_hash, attempt)`` side state
grows, bounded by the number of URLs currently mid-retry (≤ one pop batch),
never by crawl history.  Nothing new crosses the O(pending) pop exchanges.

:func:`resolve_attempts` is the same policy as a batch operator over an
attempt log — one map-side-combinable groupBy, no windows, no shuffle
beyond the keyed aggregate — used by the ``o4_retry_resolve`` oracle query
and reusable for offline fetch-log analytics at 10^10 attempts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_RETRIES = 2  # Scrapy RETRY_TIMES
DEFAULT_PRIORITY_ADJUST = -1  # Scrapy RETRY_PRIORITY_ADJUST


def resolve_attempts(
    log: DataFrame,
    max_retries: int = DEFAULT_MAX_RETRIES,
    priority_adjust: int = DEFAULT_PRIORITY_ADJUST,
    key_col: str = "url_hash",
    attempt_col: str = "attempt",
    ok_col: str = "ok",
    base_priority_col: str | None = None,
) -> DataFrame:
    """Collapse a per-attempt outcome log to one row per URL under the
    RETRY_TIMES policy.

    Input: one row per (url, attempt 0..N, ok flag).  Attempts beyond the
    policy horizon (``attempt > max_retries``) are ignored — the crawler
    would never have issued them.  Output per key:

     - ``n_attempts``  — fetches actually issued: up to and including the
       first success, capped at ``max_retries + 1``;
     - ``final_status``— ``'ok'`` if some attempt ≤ max_retries succeeded,
       else ``'failed'`` (dropped after exhausting retries);
     - ``final_priority_adjust`` — total additive priority drift the last
       issued attempt carried: ``(n_attempts − 1) × priority_adjust``.
    """
    att = F.col(attempt_col)
    considered = log.filter(att <= F.lit(max_retries))
    first_ok = F.min(F.when(F.col(ok_col), att)).alias("__first_ok")
    aggs = [first_ok]
    if base_priority_col is not None:
        aggs.append(F.first(F.col(base_priority_col)).alias("__prio"))
    out = considered.groupBy(key_col).agg(*aggs)
    n_attempts = (
        F.when(F.col("__first_ok").isNotNull(), F.col("__first_ok") + 1)
        .otherwise(F.lit(max_retries + 1))
        .cast("int")
    )
    cols = [
        F.col(key_col),
        n_attempts.alias("n_attempts"),
        F.when(F.col("__first_ok").isNotNull(), F.lit("ok"))
        .otherwise(F.lit("failed"))
        .alias("final_status"),
        ((n_attempts - 1) * F.lit(priority_adjust)).alias("final_priority_adjust"),
    ]
    if base_priority_col is not None:
        cols.append(
            (F.col("__prio") + (n_attempts - 1) * F.lit(priority_adjust)).alias(
                "final_priority"
            )
        )
    return out.select(*cols)


def is_transient_failure(attempt: Column, fail_times: Column) -> Column:
    """True when this fetch attempt fails: the deterministic page metadata
    says the first ``fail_times`` attempts return a retryable error (the
    sandbox stand-in for 5xx/timeout; a NULL ``fail_times`` means the page
    always succeeds — the zero-cost default when the column is absent)."""
    return fail_times.isNotNull() & (attempt < fail_times)
