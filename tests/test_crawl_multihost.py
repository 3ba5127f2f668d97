"""Multi-host golden crawl (VERDICT r3 next #7): per-host budget
interleaving, per-host robots Crawl-delay budgets, cross-host discovery —
everything the single-host fixture (faithful to nrsr.sk) never exercises —
asserted exactly against the pure-Python epoch simulator
(testing/simulator.simulate_epochs)."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest

from nrsr_crawler_spark.operators import robots as robots_ops
from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
from nrsr_crawler_spark.sources.multihost_site import (
    DEFAULT_HOSTS,
    generate_multihost_site,
    multihost_robots_rules,
    seed_urls,
)
from nrsr_crawler_spark.sources.synthetic_site import PAGES_SCHEMA, site_rows
from nrsr_crawler_spark.testing.simulator import robots_allow_py, simulate_epochs

RULES = multihost_robots_rules()
EPOCH_SECONDS = 8.0
DEFAULT_BUDGET = 16
# host k declares Crawl-delay k+1 s → budgets ⌊8/δ⌋ = {8, 4, 2, 2}
BUDGETS = robots_ops.crawl_delay_budgets(RULES, EPOCH_SECONDS, DEFAULT_BUDGET)


def _allow(canon: str) -> bool:
    return robots_allow_py(RULES, canon)


def _pages_df(spark, site):
    return spark.createDataFrame(site_rows(site), PAGES_SCHEMA)


@pytest.fixture(scope="module")
def multihost(spark, tmp_path_factory):
    site = generate_multihost_site(periods=2, pages_per_period=2, details_per_page=2)
    golden = simulate_epochs(
        site,
        seed_urls(),
        budget_per_host=DEFAULT_BUDGET,
        host_budgets=BUDGETS,
        allow=_allow,
    )
    engine = CrawlEngine(
        spark,
        _pages_df(spark, site),
        str(tmp_path_factory.mktemp("mh") / "lake"),
        budget_per_host=DEFAULT_BUDGET,
        robots_rules=RULES,
        epoch_seconds=EPOCH_SECONDS,
    )
    engine.run(seed_urls())
    return site, golden, engine


def test_budgets_differ_across_hosts():
    # fixture sanity: the Crawl-delay rules derive ≥3 distinct budgets
    assert len(BUDGETS) == len(DEFAULT_HOSTS)
    assert len(set(BUDGETS.values())) >= 3


def test_multihost_exact_fetch_order(multihost):
    _, golden, engine = multihost
    got = [
        (r["epoch"], r["pop_rank"], r["canon_url"], r["url_hash"], r["depth"])
        for r in engine.fetch_order().collect()
    ]
    exp = [
        (o["epoch"], o["pop_rank"], o["canon_url"], o["url_hash"], o["depth"])
        for o in golden.order
    ]
    assert got == exp


def test_multihost_seen_set_matches(multihost):
    _, golden, engine = multihost
    assert {r["canon_url"] for r in engine.seen_set().collect()} == golden.seen
    # every host contributed, and no disallowed URL was admitted
    hosts_seen = {urlsplit(c).hostname for c in golden.seen}
    assert hosts_seen == set(DEFAULT_HOSTS)
    assert not any("/web/private" in c for c in golden.seen)


def test_per_host_budget_never_exceeded(multihost):
    _, golden, engine = multihost
    counts: dict[tuple, int] = {}
    for r in engine.fetch_order().collect():
        host = (urlsplit(r["canon_url"]).hostname or "").lower()
        key = (r["epoch"], host)
        counts[key] = counts.get(key, 0) + 1
    assert counts, "engine fetched nothing"
    for (epoch, host), n in counts.items():
        assert n <= BUDGETS.get(host, DEFAULT_BUDGET), (epoch, host, n)
    # exact per-(epoch, host) pop counts match the simulator
    exp = {k: v for k, v in golden.pops.items() if v > 0}
    assert counts == exp
    # the budget actually BINDS somewhere (a vacuous bound proves nothing):
    # at least one (epoch, host) hits its cap exactly
    assert any(n == BUDGETS[host] for (_, host), n in counts.items())


def test_cross_host_discovery(spark, tmp_path):
    """Seed ONE host only: the others are reachable only through the
    absolute cross-host detail links — the engine must discover and
    interleave them under their own budgets."""
    site = generate_multihost_site(periods=1, pages_per_period=2, details_per_page=2)
    seeds = [seed_urls()[0]]
    golden = simulate_epochs(
        site, seeds, budget_per_host=3, host_budgets={}, allow=_allow
    )
    engine = CrawlEngine(
        spark,
        _pages_df(spark, site),
        str(tmp_path / "lake"),
        budget_per_host=3,
        robots_rules=RULES,
    )
    engine.run(seeds)
    got = [
        (r["epoch"], r["pop_rank"], r["canon_url"]) for r in engine.fetch_order().collect()
    ]
    exp = [(o["epoch"], o["pop_rank"], o["canon_url"]) for o in golden.order]
    assert got == exp
    fetched_hosts = {urlsplit(c).hostname for _, _, c in got}
    assert len(fetched_hosts) >= 2, "cross-host links never followed"


def test_multihost_resume_is_identical(spark, tmp_path):
    site = generate_multihost_site(periods=1, pages_per_period=2, details_per_page=2)
    pages = _pages_df(spark, site)
    kw = dict(
        budget_per_host=DEFAULT_BUDGET, robots_rules=RULES, epoch_seconds=EPOCH_SECONDS
    )
    full = CrawlEngine(spark, pages, str(tmp_path / "full"), **kw)
    full.run(seed_urls())
    part = CrawlEngine(spark, pages, str(tmp_path / "part"), **kw)
    part.run(seed_urls(), max_epochs=2)
    resumed = CrawlEngine(spark, pages, str(tmp_path / "part"), **kw)
    resumed.run()
    for table in ("frontier", "fetch_log", "edges"):
        a = sorted(map(tuple, full.lake.read_all(spark, table).collect()))
        b = sorted(map(tuple, resumed.lake.read_all(spark, table).collect()))
        assert a == b, table
