"""Typed item extraction through the CRAWL LOOP (VERDICT r1 gap #1): the
engine must land member/press/voting items — parsed from reference-shaped
HTML inside the epoch loop — in per-type stores keyed by the reference's
natural keys, matching values derived independently from the site fixture."""

from __future__ import annotations

from datetime import datetime

import pytest

from nrsr_crawler_spark.functions.urls import canonicalize_py
from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
from nrsr_crawler_spark.sources.synthetic_site import (
    PAGES_SCHEMA,
    SEED_URL,
    generate_site,
    robots_rules,
    site_rows,
)

RULES = robots_rules(permissive=False)


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    site = generate_site(periods=2, pages_per_period=2, details_per_page=3, members_per_period=3)
    pages = spark.createDataFrame(site_rows(site), PAGES_SCHEMA)
    lake = str(tmp_path_factory.mktemp("typed") / "lake")
    engine = CrawlEngine(spark, pages, lake, budget_per_host=100, robots_rules=RULES)
    engine.run([SEED_URL])
    return site, engine


def test_press_store_matches_fixture(crawled):
    site, engine = crawled
    got = {
        r["press_num"]: r
        for r in engine.typed_store("press").collect()
    }
    expected = {p.payload["press_num"]: p for p in site.values()
                if p.kind == "detail" and p.payload and p.payload.get("type") == "press"}
    assert set(got) == set(expected)
    for num, page in expected.items():
        r = got[num]
        d = page.payload["press_num"]
        day, month, year = d % 28 + 1, d % 12 + 1, int(f"201{page.period_num % 10}")
        assert r["type"] == "press"
        assert r["title"] == page.payload["title"]
        assert r["press_type"] == ("zákon" if d % 2 == 0 else "iný typ")
        assert r["press_date"] == datetime(year, month, day, 12, 0)
        assert r["period_num"] == page.period_num
        assert r["url"] == canonicalize_py(page.url)


def test_member_store_matches_fixture(crawled):
    site, engine = crawled
    got = {
        (r["external_id"], r["period_num"]): r
        for r in engine.typed_store("member").collect()
    }
    expected = {
        (p.payload["external_id"], p.period_num): p
        for p in site.values()
        if p.kind == "detail_member" and p.payload and p.payload.get("type") == "member"
    }
    assert set(got) == set(expected)
    for (m, per), page in expected.items():
        r = got[(m, per)]
        assert r["forename"] == page.payload["forename"]
        assert r["surname"] == page.payload["surname"]
        assert r["title"] == ""
        assert r["email"] == f"member{m}@nrsr.sk"
        assert r["born"] == datetime(1950 + m % 40, m % 12 + 1, m % 28 + 1, 12, 0)
        assert r["nationality"] == "slovenská"
        assert r["url"] == canonicalize_py(page.url)


def test_voting_store_matches_fixture(crawled):
    site, engine = crawled
    got = {r["external_id"]: r for r in engine.typed_store("voting").collect()}
    expected = {
        p.payload["external_id"]: p
        for p in site.values()
        if p.kind == "voting"
    }
    assert set(got) == set(expected)
    for ext, page in expected.items():
        r = got[ext]
        pl = page.payload
        assert r["session_num"] == pl["session_num"]
        assert r["voting_num"] == pl["voting_num"]
        assert r["press_num"] is None
        assert r["result"] == pl["result"]
        assert r["period_num"] == page.period_num
        assert r["datetime"] == datetime(
            2010 + ext % 10, ext % 12 + 1, ext % 28 + 1, ext % 24, ext % 60, ext % 59
        )
        # votes: parsed from the HTML table (club-header carry), output
        # sorted by member id (O1)
        exp_votes = sorted((m, v, c) for m, v, c, _href in pl["votes"])
        assert [(v["external_id"], v["vote"], v["club"]) for v in r["votes"]] == exp_votes


def test_typed_deltas_resume_identically(spark, tmp_path):
    site = generate_site(periods=1, pages_per_period=2, details_per_page=2, members_per_period=2)
    pages = spark.createDataFrame(site_rows(site), PAGES_SCHEMA)

    full = CrawlEngine(spark, pages, str(tmp_path / "full"), budget_per_host=50, robots_rules=RULES)
    full.run([SEED_URL])
    part = CrawlEngine(spark, pages, str(tmp_path / "part"), budget_per_host=50, robots_rules=RULES)
    part.run([SEED_URL], max_epochs=2)
    resumed = CrawlEngine(spark, pages, str(tmp_path / "part"), budget_per_host=50, robots_rules=RULES)
    resumed.run()

    for t in ("items_member", "items_voting", "items_press"):
        a = sorted(map(repr, full.lake.read_all(spark, t).collect()))
        b = sorted(map(repr, resumed.lake.read_all(spark, t).collect()))
        assert a == b, t
