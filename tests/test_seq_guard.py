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
    with pytest.raises(RuntimeError, match="pop rank .* exceeds"):
        eng.run([f"{BASE}seed"])


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
