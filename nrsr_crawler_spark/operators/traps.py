"""Crawl-trap detection: URL-template explosion guard for the frontier.

A crawler trap is a (host, URL-shape) family that generates unbounded
distinct URLs — infinite calendars, per-request session ids, faceted-search
permutations.  The reference crawler never needs this (it enumerates a
bounded government site by construction: /root/reference/nrsr/spiders/*.py
derive every URL from a finite id space), but a frontier designed for a
10^10-URL crawl does: without a trap guard the priority queue fills with
one host's synthetic infinities and politeness starves real work.

Classic web-crawler practice (Heritrix's "pathological path" rule, IRLbot's
budget enforcement — public literature): collapse each URL to a TEMPLATE by
replacing every maximal digit run with a placeholder, count frontier URLs
per (host, template), and flag templates whose population explodes past a
budget.  Flagged templates are then demoted (or dropped) at schedule time.

Scale shape: one groupBy on (host, template) over the already-deduplicated
frontier — a linear aggregation with map-side partial combine; the flagged
set is tiny (it is a list of URL *shapes*, not URLs) so the demotion join
broadcasts.  No windows, no skew: a hot template is exactly what the
partial aggregate compresses best (one row per partition survives the map
side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# every maximal digit run -> 'N': /cal/2026/08/18 and /cal/1999/01/02 share
# a template; session ids with hex digits keep their alpha residue, which is
# still per-URL-distinct enough to explode the template only when the WHOLE
# shape explodes (a hex id like 'a3f9' templates to 'aNfN' — distinct per
# id — so the family is caught at the HOST level by template_count instead)
_DIGIT_RUN = "[0-9]+"


def url_template(url: Column) -> Column:
    """Collapse maximal digit runs to ``N`` — the URL's shape."""
    return F.regexp_replace(url, _DIGIT_RUN, "N")


def tpl_hash(host: Column, canon_url: Column) -> Column:
    """8-byte fingerprint of (host, template) — stored on each frontier row
    so the trap guard needs NO string columns at schedule time: template
    counting aggregates this long, and pop-time demotion is a broadcast
    join on it (the slim pop exchange stays URL-string-free)."""
    return F.xxhash64(host, url_template(canon_url))


def trap_templates(
    frontier: DataFrame,
    max_urls: int,
    url_col: str = "canon_url",
    host_col: str = "host",
) -> DataFrame:
    """(host, template, n_urls) for templates exceeding ``max_urls`` distinct
    frontier entries.  ``frontier`` must already be URL-deduplicated (the
    post-:func:`frontier.prepare_candidates` set is), so ``count(*)`` counts
    distinct URLs without a second dedup pass."""
    return (
        frontier.select(
            F.col(host_col).alias("host"),
            url_template(F.col(url_col)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .filter(F.col("n_urls") > max_urls)
    )


def demote_traps(
    frontier: DataFrame,
    traps: DataFrame,
    penalty: int = 1_000_000,
    url_col: str = "canon_url",
    host_col: str = "host",
    priority_col: str = "priority",
) -> DataFrame:
    """Push trap-template URLs to the back of the queue: broadcast-join the
    flagged (host, template) set and SUBTRACT ``penalty`` from their
    priority (:func:`politeness.pop_order` pops priority DESC, so lower =
    later).  Demotion, not deletion — if the rest of the frontier drains,
    trapped URLs still crawl under the same politeness budget, so a false
    positive costs latency, never coverage."""
    flagged = F.broadcast(
        traps.select(
            F.col("host").alias("__trap_host"),
            F.col("template").alias("__trap_tpl"),
            F.lit(True).alias("__trap"),
        )
    )
    tagged = frontier.withColumn("__tpl", url_template(F.col(url_col))).join(
        flagged,
        (F.col(host_col) == F.col("__trap_host")) & (F.col("__tpl") == F.col("__trap_tpl")),
        "left",
    )
    return tagged.withColumn(
        priority_col,
        F.when(F.col("__trap"), F.col(priority_col) - penalty).otherwise(
            F.col(priority_col)
        ),
    ).drop("__trap", "__tpl", "__trap_host", "__trap_tpl")
