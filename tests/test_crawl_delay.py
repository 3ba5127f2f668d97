"""robots Crawl-delay → per-host pop budgets inside the crawl engine
(epoch_seconds): pacing caps fetches per epoch without changing the final
fetch SET, and hosts without a declared delay keep the flat budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
from nrsr_crawler_spark.sources.synthetic_site import (
    PAGES_SCHEMA,
    SEED_URL,
    generate_site,
    site_rows,
)

# delay 2.5 s on the one crawled host; epoch window 5 s → 2 fetches/epoch
PACED_RULES = [
    {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": 2.5},
]


def _pages(spark):
    site = generate_site(periods=1, pages_per_period=2, details_per_page=3, members_per_period=2)
    return spark.createDataFrame(site_rows(site), PAGES_SCHEMA)


def test_crawl_delay_paces_without_changing_fetch_set(spark, tmp_path):
    pages = _pages(spark)
    flat = CrawlEngine(
        spark, pages, str(tmp_path / "flat"), budget_per_host=100, typed_items=False
    )
    flat.run([SEED_URL])
    paced = CrawlEngine(
        spark,
        pages,
        str(tmp_path / "paced"),
        budget_per_host=100,
        robots_rules=PACED_RULES,
        epoch_seconds=5.0,
        typed_items=False,
    )
    paced.run([SEED_URL])

    flat_log = flat.lake.read_all(spark, "fetch_log")
    paced_log = paced.lake.read_all(spark, "fetch_log")
    # same fetch SET (pacing reorders epochs, never drops or adds URLs)
    assert (
        flat_log.select("url_hash").exceptAll(paced_log.select("url_hash")).count() == 0
    )
    assert (
        paced_log.select("url_hash").exceptAll(flat_log.select("url_hash")).count() == 0
    )
    # budget actually bit: ≤ ⌊5/2.5⌋ = 2 fetches per epoch (single-host
    # site), so the paced crawl needs strictly more epochs than the flat one
    per_epoch = paced_log.groupBy("epoch").agg(F.count(F.lit(1)).alias("n"))
    assert all(r.n <= 2 for r in per_epoch.collect())
    n_flat = flat_log.select("epoch").distinct().count()
    n_paced = paced_log.select("epoch").distinct().count()
    assert n_paced > n_flat


def test_no_delay_rules_keep_flat_budget(spark, tmp_path):
    """epoch_seconds set but no crawl_delay in the ruleset ⇒ no pacing."""
    pages = _pages(spark)
    eng = CrawlEngine(
        spark,
        pages,
        str(tmp_path / "lake"),
        budget_per_host=100,
        robots_rules=[
            {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": None}
        ],
        epoch_seconds=5.0,
        typed_items=False,
    )
    assert eng._budget_expr is None
