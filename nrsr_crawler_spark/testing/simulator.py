"""Pure-Python model of the reference crawler's scheduler semantics
(SURVEY §2.6 O3, §5 item 2) — the golden oracle for crawl ordering.

Scrapy 1.5 with the reference's settings behaves as:
  - priority queue, all requests priority 0 (no spider sets ``priority=``),
    in-memory LIFO queue ⇒ depth-first pop order;
  - dupefilter records the request fingerprint AT SCHEDULE TIME and drops
    re-discovered URLs (/root/reference/nrsr/settings.py:114);
  - ``CONCURRENT_REQUESTS_PER_IP = 1`` + ``DOWNLOAD_DELAY = 2.5`` on a single
    host ⇒ fetches are strictly sequential, and a response's callback runs
    (children get scheduled) before the next fetch completes
    (settings.py:30-33).

So: pop newest scheduled request; fetch; schedule its children in document
order (each passing the dupefilter); repeat.  The engine must reproduce this
order and final seen set (north_rule); tests compare against this model.
"""

from __future__ import annotations

from dataclasses import dataclass

from nrsr_crawler_spark.functions.hashing import xxh64_str
from nrsr_crawler_spark.functions.urls import canonicalize_py
from nrsr_crawler_spark.sources.synthetic_site import BASE, SitePage


@dataclass
class GoldenCrawl:
    order: list[dict]          # fetch_seq, url, canon_url, url_hash, depth, parent_url
    seen: set[str]             # canonical URLs admitted by the dupefilter


def _canon(url: str) -> str | None:
    c = canonicalize_py(url)
    if c is None:
        return None
    return c


def resolve_href(href: str) -> str:
    """Reference href resolution: absolute pass-through, else BASE_URL concat
    (members.py:76 — the reference never uses urljoin)."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    return BASE + href


def simulate(
    site: dict[str, SitePage],
    seeds: list[str],
    allow=lambda canon_url: True,
) -> GoldenCrawl:
    """Run the reference-semantics crawl over the synthetic site."""
    stack: list[tuple[str, str, int, str | None]] = []  # (url, canon, depth, parent)
    seen: set[str] = set()
    order: list[dict] = []

    def schedule(url: str, depth: int, parent: str | None) -> None:
        c = _canon(url)
        if c is None or not allow(c) or c in seen:
            return
        seen.add(c)  # dupefilter records at schedule time
        stack.append((url, c, depth, parent))

    for s in seeds:
        schedule(s, 0, None)

    fetch_seq = 0
    while stack:
        url, canon, depth, parent = stack.pop()
        order.append(
            {
                "fetch_seq": fetch_seq,
                "url": url,
                "canon_url": canon,
                "url_hash": xxh64_str(canon),
                "depth": depth,
                "parent_url": parent,
            }
        )
        fetch_seq += 1
        page = site.get(url) or site.get(canon)
        if page is None:
            continue  # 404: no children
        for href in page.child_hrefs:
            schedule(resolve_href(href), depth + 1, canon)
    return GoldenCrawl(order=order, seen=seen)
