"""Sitemap source (sources/sitemap.py): block parsing tolerates real-world
XML noise; candidates keep the freshest lastmod per canonical URL."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.sources.sitemap import (
    freshness_priority,
    parse_sitemap,
    parse_sitemap_index,
    sitemap_candidates,
    sitemaps_from_robots,
)

MESSY = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
        xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
  <url>
    <loc>
      https://www.nrsr.sk/web/Default.aspx?ID=1
    </loc>
    <lastmod>2024-05-01</lastmod>
  </url>
  <url><loc>HTTPS://WWW.NRSR.SK/web/Default.aspx?ID=1#top</loc><lastmod>2024-06-02</lastmod></url>
  <url>
    <loc>https://www.nrsr.sk/web/Press.aspx?PressID=9</loc>
  </url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>not a url at all</loc><lastmod>garbage-date</lastmod></url>
</urlset>
"""


def _pages(spark):
    return spark.createDataFrame(
        [("https://www.nrsr.sk/sitemap.xml", MESSY)], "url string, body binary"
    )


def test_parse_sitemap_tolerates_noise(spark):
    rows = parse_sitemap(_pages(spark)).orderBy("entry_idx").collect()
    # the loc-less block is dropped; the garbage entry parses (loc kept,
    # lastmod NULL) and dies later at canonicalization
    assert [r.entry_idx for r in rows] == [0, 1, 2, 4]
    assert rows[0].loc == "https://www.nrsr.sk/web/Default.aspx?ID=1"
    assert str(rows[0].lastmod) == "2024-05-01"
    assert rows[2].lastmod is None
    assert rows[3].loc == "not a url at all" and rows[3].lastmod is None


def test_sitemap_candidates_latest_lastmod_and_priorities(spark):
    got = {r.canon_url: r for r in sitemap_candidates(_pages(spark)).collect()}
    # messy duplicate (uppercase + fragment) collapsed; freshest lastmod kept
    assert set(got) == {
        "https://www.nrsr.sk/web/Default.aspx?ID=1",
        "https://www.nrsr.sk/web/Press.aspx?PressID=9",
    }
    dup = got["https://www.nrsr.sk/web/Default.aspx?ID=1"]
    assert str(dup.lastmod) == "2024-06-02"
    undated = got["https://www.nrsr.sk/web/Press.aspx?PressID=9"]
    assert undated.lastmod is None and undated.priority == -1
    # dated beats undated under priority-DESC pop order
    assert dup.priority > undated.priority


def test_freshness_priority_is_days_since_epoch(spark):
    row = spark.createDataFrame([("1970-01-11",)], "d string").select(
        freshness_priority(F.to_date("d")).alias("p")
    ).collect()[0]
    assert row.p == 10


INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://www.nrsr.sk/sitemap_members.xml</loc>
    <lastmod>2024-02-01</lastmod>
  </sitemap>
  <sitemap><loc>https://www.nrsr.sk/sitemap_press.xml</loc></sitemap>
</sitemapindex>
"""

ROBOTS = b"""User-agent: *
Disallow: /private/
Sitemap: https://www.nrsr.sk/sitemap_index.xml
  sitemap:   https://www.nrsr.sk/sitemap_extra.xml
Crawl-delay: 2
"""


def test_parse_sitemap_index(spark):
    pages = spark.createDataFrame(
        [("https://www.nrsr.sk/sitemap_index.xml", INDEX)], "url string, body binary"
    )
    rows = parse_sitemap_index(pages, keep_cols=("url",)).orderBy("entry_idx").collect()
    assert [r.loc for r in rows] == [
        "https://www.nrsr.sk/sitemap_members.xml",
        "https://www.nrsr.sk/sitemap_press.xml",
    ]
    assert str(rows[0].lastmod) == "2024-02-01" and rows[1].lastmod is None
    # an index's <sitemap> blocks must not leak into the page parser
    assert parse_sitemap(pages).count() == 0


def test_sitemaps_from_robots(spark):
    pages = spark.createDataFrame(
        [("https://www.nrsr.sk/robots.txt", ROBOTS)], "url string, body binary"
    )
    rows = sitemaps_from_robots(pages).orderBy("entry_idx").collect()
    assert [r.loc for r in rows] == [
        "https://www.nrsr.sk/sitemap_index.xml",
        "https://www.nrsr.sk/sitemap_extra.xml",
    ]


def _sitemap_pages(spark):
    body = (
        '<?xml version="1.0"?>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        + "".join(
            f" <url><loc>https://www.nrsr.sk/web/d.aspx?ID={i}</loc>"
            f"<lastmod>2024-0{i}-01</lastmod></url>\n"
            for i in (1, 2, 3)
        )
        + "".join(
            f" <url><loc>https://www.nrsr.sk/web/u.aspx?ID={i}</loc></url>\n"
            for i in (1, 2, 3)
        )
        + "</urlset>\n"
    ).encode()
    return spark.createDataFrame(
        [("https://www.nrsr.sk/sitemap.xml", body)], "url string, body binary"
    )


def test_engine_enqueue_sitemaps_freshness_order_and_idempotence(spark, tmp_path):
    from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
    from nrsr_crawler_spark.sources.synthetic_site import PAGES_SCHEMA

    leaf_rows = [
        (f"https://www.nrsr.sk/web/{p}.aspx?ID={i}", "leaf", 7, b"<html>x</html>", None, None, None)
        for p in ("d", "u")
        for i in (1, 2, 3)
    ]
    eng = CrawlEngine(
        spark,
        spark.createDataFrame(leaf_rows, PAGES_SCHEMA),
        str(tmp_path / "lake"),
        budget_per_host=3,
        num_salts=4,
        n_segments=4,
        typed_items=False,
    )
    assert eng.enqueue_sitemaps(_sitemap_pages(spark)) == 6
    stats = eng.run()
    assert stats.fetched == 6
    log = eng.lake.read_all(spark, "fetch_log")
    ep = {r.canon_url: r.epoch for r in log.select("canon_url", "epoch").collect()}
    # dated entries (freshness priority > -1) fill the first pop exactly
    assert {u: e for u, e in ep.items() if "/d.aspx" in u} == {
        f"https://www.nrsr.sk/web/d.aspx?ID={i}": 1 for i in (1, 2, 3)
    }
    assert all(e == 2 for u, e in ep.items() if "/u.aspx" in u)
    # re-feeding the same sitemap enqueues nothing (anti-join vs frontier)
    assert eng.enqueue_sitemaps(_sitemap_pages(spark)) == 0
