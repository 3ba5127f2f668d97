"""Engine-level crawl-trap guard: templates whose frontier population
exceeds ``trap_max_urls`` are demoted at pop time (operators/traps.py wired
through CrawlEngine), so bounded pages crawl first while trap URLs still
drain afterwards — demotion, never deletion."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
from nrsr_crawler_spark.sources.synthetic_site import PAGES_SCHEMA

BASE = "https://www.nrsr.sk/web/"
SEED = BASE + "start.aspx"
# details FIRST in the seed body: under plain LIFO (guard off) the
# higher-seq calendar children pop first, so the guard-on ordering below is
# attributable to the demotion, not to enqueue order
DETAILS = [f"{BASE}detail.aspx?ID={i}" for i in range(5)]
CALS = [f"{BASE}cal.aspx?day={i}" for i in range(60)]


def _pages(spark):
    body = "".join(f'<a href="{u}">x</a>' for u in DETAILS + CALS).encode()
    rows = [(SEED, "seed", 7, body, None, None, None)] + [
        (u, "leaf", 7, b"<html>leaf</html>", None, None, None)
        for u in DETAILS + CALS
    ]
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _fetch_epochs(engine):
    log = engine.lake.read_all(engine.spark, "fetch_log")
    return {
        r["canon_url"]: r["epoch"]
        for r in log.select("canon_url", "epoch").collect()
    }


def _run(spark, tmp, name, max_epochs=100000, **kw):
    eng = CrawlEngine(
        spark,
        _pages(spark),
        str(tmp / name),
        budget_per_host=5,
        num_salts=4,
        n_segments=4,
        typed_items=False,
        **kw,
    )
    stats = eng.run(seeds=[SEED], max_epochs=max_epochs)
    return eng, stats


def test_trap_guard_demotes_exploding_template(spark, tmp_path):
    eng, stats = _run(spark, tmp_path, "guarded", trap_max_urls=20)
    assert stats.fetched == 1 + len(DETAILS) + len(CALS)  # coverage preserved
    ep = _fetch_epochs(eng)
    det_ep = {ep[u] for u in DETAILS}
    cal_ep = {ep[u] for u in CALS}
    # the 60-URL cal template is flagged after the seed epoch enqueues it;
    # all 5 bounded detail pages fill the very next pop (budget 5) and every
    # calendar URL crawls strictly later
    assert det_ep == {2}
    assert min(cal_ep) >= 3


def test_guard_off_pops_lifo(spark, tmp_path):
    eng, stats = _run(spark, tmp_path, "plain")
    assert stats.fetched == 1 + len(DETAILS) + len(CALS)
    ep = _fetch_epochs(eng)
    # plain LIFO: the last-enqueued calendar children pop first
    assert min(ep[u] for u in CALS) == 2
    assert min(ep[u] for u in DETAILS) > 2


def test_trap_guard_survives_resume(spark, tmp_path):
    """Kill after the flagging epoch, resume with a fresh engine: the count
    store rebuilds from the frontier and the demotion still applies."""
    eng, _ = _run(spark, tmp_path, "resume", trap_max_urls=20, max_epochs=2)
    eng2 = CrawlEngine(
        spark,
        _pages(spark),
        str(tmp_path / "resume"),
        budget_per_host=5,
        num_salts=4,
        n_segments=4,
        typed_items=False,
        trap_max_urls=20,
    )
    eng2.run()
    ep = _fetch_epochs(eng2)
    assert {ep[u] for u in DETAILS} == {2}
    assert min(ep[u] for u in CALS) >= 3
    assert len(ep) == 1 + len(DETAILS) + len(CALS)
