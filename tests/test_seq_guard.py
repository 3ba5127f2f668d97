"""The ``seq`` bit-packing bound is a hard, guarded invariant
(plans/epoch_loop.py docstring): >2^parent_bits popped parents per epoch or
>=2^child_bits links on one page would alias the packed lineage — the engine
must fail loud, not silently degrade."""

from __future__ import annotations

import pytest

from nrsr_crawler_spark.plans.epoch_loop import CrawlEngine
from nrsr_crawler_spark.sources.synthetic_site import PAGES_SCHEMA

BASE = "https://www.nrsr.sk/web/"


def _pages(spark, rows):
    return spark.createDataFrame(rows, PAGES_SCHEMA)


def _page_row(url, hrefs):
    body = ("<html><body>" + "\n".join(f'<a href="{h}">x</a>' for h in hrefs) + "</body></html>").encode()
    return (url, "detail", 1, body, hrefs, None, None)


def test_child_idx_overflow_raises(spark, tmp_path):
    # child_bits=2 → cap 4 children per page; the seed page links 5
    hrefs = [f"{BASE}p{i}" for i in range(5)]
    rows = [_page_row(f"{BASE}seed", hrefs)] + [_page_row(h, []) for h in hrefs]
    eng = CrawlEngine(
        spark, _pages(spark, rows), str(tmp_path / "lake"),
        budget_per_host=10, seq_child_bits=2,
    )
    with pytest.raises(RuntimeError, match="child_idx .* exceeds"):
        eng.run([f"{BASE}seed"])


def test_parent_count_overflow_raises(spark, tmp_path):
    # parent_bits=1 → cap 2 popped parents per epoch; epoch 1 pops 3
    hrefs = [f"{BASE}p{i}" for i in range(3)]
    rows = [_page_row(f"{BASE}seed", hrefs)] + [_page_row(h, []) for h in hrefs]
    eng = CrawlEngine(
        spark, _pages(spark, rows), str(tmp_path / "lake"),
        budget_per_host=10, seq_parent_bits=1,
    )
    with pytest.raises(RuntimeError, match="popped parents exceed"):
        eng.run([f"{BASE}seed"])


def test_multihost_parent_ordinals_unique(spark, tmp_path):
    """ADVICE r2: per-host pop rank aliases across hosts — the packed seq
    must use a globally unique parent ordinal, so fetch_log pop_rank (=grk)
    is unique within each epoch even when several hosts pop in parallel, and
    children of same-ranked parents on different hosts get distinct seqs."""
    hosts = [f"https://h{i}.nrsr.sk/web/" for i in range(3)]
    rows, seeds = [], []
    for b in hosts:
        hrefs = [f"{b}p{i}" for i in range(2)]
        rows.append(_page_row(f"{b}seed", hrefs))
        rows += [_page_row(h, []) for h in hrefs]
        seeds.append(f"{b}seed")
    eng = CrawlEngine(spark, _pages(spark, rows), str(tmp_path / "lake"), budget_per_host=10)
    eng.run(seeds)
    log = eng.lake.read_all(spark, "fetch_log").collect()
    by_epoch: dict[int, list[int]] = {}
    for r in log:
        by_epoch.setdefault(r["epoch"], []).append(r["pop_rank"])
    for epoch, ranks in by_epoch.items():
        assert len(ranks) == len(set(ranks)), f"epoch {epoch}: pop_rank aliases {sorted(ranks)}"
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), "grk must be dense 1..n"
    # child seqs never alias: every enqueued frontier row has a distinct seq
    fr = eng.lake.read_all(spark, "frontier").select("seq").collect()
    seqs = [r["seq"] for r in fr]
    assert len(seqs) == len(set(seqs))


def test_at_boundary_passes(spark, tmp_path):
    # exactly 2^child_bits children (idx 0..3) and 2^parent_bits parents: fine
    hrefs = [f"{BASE}p{i}" for i in range(4)]
    rows = [_page_row(f"{BASE}seed", hrefs)] + [_page_row(h, []) for h in hrefs]
    eng = CrawlEngine(
        spark, _pages(spark, rows), str(tmp_path / "lake"),
        budget_per_host=10, seq_child_bits=2, seq_parent_bits=2,
    )
    stats = eng.run([f"{BASE}seed"])
    assert stats.fetched == 5
