"""Deterministic MULTI-host synthetic site (VERDICT r3 next #7).

The reference crawls exactly one host (www.nrsr.sk — every spider's
``allowed_domains``, e.g. /root/reference/nrsr/spiders/members.py:20), so the
single-host golden fixture (sources/synthetic_site.py) is faithful to it.
This fixture exists to exercise what the single-host crawl never touches:
per-host budget interleaving (politeness.pop_budget's two-level window
across MANY partitions), per-host robots rules and Crawl-delay budgets
(operators/robots.py), the global pop ordinal ``grk`` across hosts
(epoch_loop._with_global_rank), and salted host shards.

Topology per host (indexed k over ``hosts``):
  seed  https://{host}/web/Default.aspx?sid=zakony/sslp
    → listing grids per period with overlapping ``PageNum`` windows (the
      same dedup pressure as the single-host fixture)
      → detail pages with press payloads, cross-linking details on the
        SAME host and — the multi-host part — a detail on the NEXT host
        (absolute href), so hosts discover each other and budgets interleave
  every grid also links one robots-disallowed URL (``/web/private{k}/…``)
  and one malformed href (dropped by canonicalization).

All hrefs are ABSOLUTE: href resolution must be host-independent off the
single-host path (the engine's ``base_url`` concat never fires here).

Per-host robots rules declare DIFFERENT Crawl-delays (host k: ``k+1``
seconds), so ``CrawlEngine(epoch_seconds=…)`` derives a different pop
budget per host — tests assert no (epoch, host) ever exceeds its own.
"""

from __future__ import annotations

from nrsr_crawler_spark.sources.synthetic_site import SitePage

DEFAULT_HOSTS = ["archiv.nrsr.sk", "data.nrsr.sk", "foto.nrsr.sk", "www.nrsr.sk"]


def _seed_url(host: str) -> str:
    return f"https://{host}/web/Default.aspx?sid=zakony/sslp"


def _list_url(host: str, period: int, page: int) -> str:
    if page == 1:
        return f"https://{host}/web/Default.aspx?sid=zakony&CisObdobia={period}"
    return f"https://{host}/web/Default.aspx?sid=zakony&CisObdobia={period}&PageNum={page}"


def _detail_url(host: str, period: int, ext_id: int) -> str:
    return f"https://{host}/web/Default.aspx?sid=zakony/cpt&CisObdobia={period}&ID={ext_id}"


def disallowed_prefix(k: int) -> str:
    return f"/web/private{k}"


def generate_multihost_site(
    hosts: list[str] | None = None,
    periods: int = 2,
    pages_per_period: int = 3,
    details_per_page: int = 3,
) -> dict[str, SitePage]:
    """Build the multi-host page graph.  Fully deterministic in its args."""
    hosts = list(hosts or DEFAULT_HOSTS)
    site: dict[str, SitePage] = {}

    def put(p: SitePage) -> None:
        site[p.url] = p

    # per-host detail ids are globally distinct so cross-host links are
    # unambiguous: host k, period p, slot i → 1000·(k+1) + 100·p + i
    def ext_id(k: int, p: int, i: int) -> int:
        return 1000 * (k + 1) + 100 * p + i

    for k, host in enumerate(hosts):
        put(
            SitePage(
                url=_seed_url(host),
                kind="seed",
                period_num=0,
                child_hrefs=[_list_url(host, p, 1) for p in range(1, periods + 1)],
            )
        )
        for p in range(1, periods + 1):
            period_ids = [
                ext_id(k, p, g * details_per_page + i)
                for g in range(pages_per_period)
                for i in range(details_per_page)
            ]
            for page in range(1, pages_per_period + 1):
                hrefs: list[str] = []
                # overlapping pagination window [page-1 .. page+2] — the same
                # grid is discovered from several grids (dedup pressure)
                for q in range(max(1, page - 1), min(pages_per_period, page + 2) + 1):
                    if q != page:
                        hrefs.append(_list_url(host, p, q))
                ids_here = period_ids[(page - 1) * details_per_page: page * details_per_page]
                hrefs.extend(_detail_url(host, p, i) for i in ids_here)
                # robots-disallowed + malformed (both must never be fetched)
                hrefs.append(f"https://{host}{disallowed_prefix(k)}/p{p}g{page}")
                hrefs.append("javascript:__doPostBack('grid','Page$%d')" % page)
                put(
                    SitePage(
                        url=_list_url(host, p, page),
                        kind="list" if page == 1 else "page",
                        period_num=p,
                        child_hrefs=hrefs,
                    )
                )
            # detail pages: same-host cross links + ONE next-host link
            nk = (k + 1) % len(hosts)
            for i, d in enumerate(period_ids):
                cross = [
                    _detail_url(host, p, period_ids[(i * 7 + 3) % len(period_ids)]),
                    _detail_url(host, p, period_ids[(i + 1) % len(period_ids)]),
                ]
                if i % 2 == 0:  # half the details link across hosts
                    cross.append(_detail_url(hosts[nk], p, ext_id(nk, p, i)))
                put(
                    SitePage(
                        url=_detail_url(host, p, d),
                        kind="detail",
                        period_num=p,
                        child_hrefs=cross,
                        payload={
                            "type": "press",
                            "press_num": d,
                            "period_num": p,
                            "title": f"Tlač {d}",
                            "date": f"{(d % 28) + 1}. {(d % 12) + 1}. 201{p % 10}",
                        },
                    )
                )
            # disallowed pages exist in the table but must never be fetched
            for page in range(1, pages_per_period + 1):
                put(
                    SitePage(
                        url=f"https://{host}{disallowed_prefix(k)}/p{p}g{page}",
                        kind="detail",
                        period_num=p,
                        child_hrefs=[],
                        payload={"type": "private", "period_num": p},
                    )
                )
    return site


def multihost_robots_rules(hosts: list[str] | None = None) -> list[dict]:
    """Per-host rules: host k disallows its own private subtree and declares
    Crawl-delay = k+1 seconds — four DIFFERENT per-host budgets under one
    ``epoch_seconds``."""
    hosts = list(hosts or DEFAULT_HOSTS)
    rules: list[dict] = []
    for k, host in enumerate(hosts):
        rules.append(
            {
                "host": host,
                "user_agent": "*",
                "rule": "disallow",
                "path_prefix": disallowed_prefix(k),
                "crawl_delay": float(k + 1),
            }
        )
        rules.append(
            {
                "host": host,
                "user_agent": "*",
                "rule": "allow",
                "path_prefix": "/",
                "crawl_delay": float(k + 1),
            }
        )
    return rules


def seed_urls(hosts: list[str] | None = None) -> list[str]:
    return [_seed_url(h) for h in (hosts or DEFAULT_HOSTS)]
