"""Change-rate recrawl priority (operators/recrawl.py) + the engine's
recrawl_candidates surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.operators.recrawl import change_rate_priority


def test_change_rate_priority_semantics(spark):
    rows = [
        # url 1: 3 visits, content changes both times → bps 10000
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # url 2: 3 visits, never changes → bps 0, priority 0 despite age
        (2, 5, "x"), (2, 15, "x"), (2, 25, "x"),
        # url 3: 1 visit → explore bonus bps 10000
        (3, 12, "y"),
        # url 4: 4 visits, 1 change → bps 3333
        (4, 1, "p"), (4, 2, "p"), (4, 3, "q"), (4, 4, "q"),
    ]
    df = spark.createDataFrame(rows, "url_hash long, epoch long, content_hash string")
    out = {
        r.url_hash: (r.n_visits, r.n_changes, r.change_bps, r.age, r.recrawl_priority)
        for r in change_rate_priority(df).collect()
    }
    # now_epoch defaults to max(epoch) = 30
    assert out[1] == (3, 2, 10000, 0, 0)
    assert out[2] == (3, 0, 0, 5, 0)
    assert out[3] == (1, 0, 10000, 18, 180000)
    assert out[4] == (4, 1, 3333, 26, 86658)


def test_explicit_now_epoch(spark):
    df = spark.createDataFrame([(1, 10, "a")], "url_hash long, epoch long, content_hash string")
    (row,) = change_rate_priority(df, now_epoch=110).collect()
    assert (row.age, row.recrawl_priority) == (100, 1000000)


def test_engine_recrawl_candidates_static_site(spark, tmp_path):
    """On a static page table, multi-visit URLs converge to priority 0 (they
    never change) while single-visit URLs keep the explore bonus."""
    from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
    from nrsr_crawler_spark.sources.synthetic_site import (
        PAGES_SCHEMA,
        SEED_URL,
        generate_site,
        site_rows,
    )

    site = generate_site(periods=1, pages_per_period=2, details_per_page=2, members_per_period=2)
    pages = spark.createDataFrame(site_rows(site), PAGES_SCHEMA)
    eng = CrawlEngine(
        spark, pages, str(tmp_path / "lake"), budget_per_host=100, typed_items=False
    )
    eng.run([SEED_URL])
    cands = eng.recrawl_candidates()
    # everything fetched exactly once → explore bonus everywhere
    assert cands.filter(F.col("n_visits") != 1).count() == 0
    assert cands.filter(F.col("change_bps") != 10000).count() == 0
    # refetch one URL, then re-rank: the refetched URL now has 2 visits of
    # identical content → change_bps 0; everything else keeps the bonus
    victim = cands.orderBy("url_hash").limit(1).select("url_hash")
    victim_key = victim.collect()[0].url_hash
    eng.expire(victim, mode="refetch")
    eng.run()
    cands2 = {r.url_hash: r for r in eng.recrawl_candidates().collect()}
    assert cands2[victim_key].n_visits == 2
    assert cands2[victim_key].change_bps == 0
    assert cands2[victim_key].recrawl_priority == 0
    assert all(r.change_bps == 10000 for k, r in cands2.items() if k != victim_key)
