"""Deterministic synthetic nrsr.sk site fixture (FIXTURES.md §2/§3/§4).

Generates, from an integer seed, a page graph mirroring the reference's
traversal topology (SURVEY §3.1):

  seed page (sid=zakony/sslp)
    → one list page per period (ASP.NET period form, members.py:26-70)
      → paginated result grids with overlapping ``Page$N`` link windows
        (votings.py:81-140 — each grid links a window around itself, so the
        same page URL is discovered from several grids → dedup pressure)
        → detail pages (votings.py:141-158), each also cross-linking a few
          other details (duplicate discovery), occasionally a
          robots-disallowed URL and a malformed href
            → member detail pages carry an image reference
              (members.py:136-137)

Pages are materialized as rows ``(url, kind, period_num, body binary,
payload json, image_id)``; ``body`` is minimal HTML whose hrefs/payload the
parse stage (operators/parse.py) extracts — the fetch stage is a
deterministic lookup into this table instead of HTTP.

Everything is pure-Python dict construction (test-scale fixture); the Spark
DataFrame is created once and written to parquet by tests/bench.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

BASE = "https://www.nrsr.sk/web/"
SEED_URL = BASE + "Default.aspx?sid=zakony/sslp"
DISALLOWED_PREFIX = "/web/private"

FORENAMES = ["Ján", "Eva", "Peter", "Mária", "Jozef", "Anna", "Milan", "Zuzana"]
SURNAMES = ["Novák", "Kováč", "Horváth", "Tóth", "Varga", "Szabó", "Molnár", "Baláž"]


@dataclass
class SitePage:
    url: str
    kind: str                      # seed | list | page | detail | detail_member
    period_num: int
    child_hrefs: list[str] = field(default_factory=list)  # raw hrefs, in document order
    payload: dict | None = None
    image_id: str | None = None

    def body_html(self) -> bytes:
        links = "\n".join(f'<a href="{h}">x</a>' for h in self.child_hrefs)
        payload = (
            f'<script id="payload" type="application/json">{json.dumps(self.payload, sort_keys=True, ensure_ascii=False)}</script>'
            if self.payload is not None
            else ""
        )
        img = f'<img id="photo" src="{self.image_id}"/>' if self.image_id else ""
        return (
            f"<html><body><!--kind={self.kind} period={self.period_num}-->\n"
            f"{links}\n{payload}\n{img}\n</body></html>"
        ).encode("utf-8")


def _list_url(period: int, page: int) -> str:
    if page == 1:
        return f"{BASE}Default.aspx?sid=zakony&CisObdobia={period}"
    return f"{BASE}Default.aspx?sid=zakony&CisObdobia={period}&PageNum={page}"


def _detail_url(period: int, ext_id: int) -> str:
    return f"{BASE}Default.aspx?sid=zakony/cpt&CisObdobia={period}&ID={ext_id}"


def _member_url(period: int, member_id: int) -> str:
    return f"{BASE}Default.aspx?sid=poslanci/poslanec&PoslanecID={member_id}&CisObdobia={period}"


def generate_site(
    periods: int = 2,
    pages_per_period: int = 3,
    details_per_page: int = 4,
    members_per_period: int = 3,
    seed: int = 42,
) -> dict[str, SitePage]:
    """Build the page graph.  Fully deterministic in its arguments."""
    site: dict[str, SitePage] = {}

    def put(p: SitePage) -> None:
        site[p.url] = p

    # seed → period list pages (relative hrefs, resolved by the parser like
    # '{}{}'.format(BASE_URL, href) — members.py:76)
    put(
        SitePage(
            url=SEED_URL,
            kind="seed",
            period_num=0,
            child_hrefs=[_list_url(p, 1) for p in range(1, periods + 1)],
        )
    )

    ext_id = 100
    member_seq = 10
    for p in range(1, periods + 1):
        period_detail_ids: list[int] = []
        for page in range(1, pages_per_period + 1):
            hrefs: list[str] = []
            # pagination window: links to pages [page-1 .. page+2] — overlap ⇒
            # the same grid URL is discovered from several grids (dedup, A2/J4)
            for q in range(max(1, page - 1), min(pages_per_period, page + 2) + 1):
                if q != page:
                    hrefs.append(_list_url(p, q))
            # detail rows on this grid
            ids_here = []
            for _ in range(details_per_page):
                ext_id += 1
                ids_here.append(ext_id)
            period_detail_ids.extend(ids_here)
            hrefs.extend(_detail_url(p, i) for i in ids_here)
            # a malformed href (dropped by canon) and a robots-disallowed link
            hrefs.append("javascript:__doPostBack('grid','Page$%d')" % page)
            hrefs.append(f"https://www.nrsr.sk{DISALLOWED_PREFIX}/p{p}g{page}")
            # member profiles linked from the first grid of the period
            if page == 1:
                for m in range(members_per_period):
                    member_seq += 1
                    hrefs.append(_member_url(p, member_seq))
            put(
                SitePage(
                    url=_list_url(p, page),
                    kind="list" if page == 1 else "page",
                    period_num=p,
                    child_hrefs=hrefs,
                )
            )
        # detail pages: payload + cross-links to 2 other details of the period
        for i, d in enumerate(period_detail_ids):
            cross = [
                _detail_url(p, period_detail_ids[(i * 7 + 3) % len(period_detail_ids)]),
                _detail_url(p, period_detail_ids[(i + 1) % len(period_detail_ids)]),
            ]
            put(
                SitePage(
                    url=_detail_url(p, d),
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
        # robots-disallowed pages exist but must never be fetched
        for page in range(1, pages_per_period + 1):
            put(
                SitePage(
                    url=f"https://www.nrsr.sk{DISALLOWED_PREFIX}/p{p}g{page}",
                    kind="detail",
                    period_num=p,
                    child_hrefs=[],
                    payload={"type": "private", "period_num": p},
                )
            )

    # member detail pages with image refs + captions (members.py:92-137)
    member_seq2 = 10
    for p in range(1, periods + 1):
        for m in range(members_per_period):
            member_seq2 += 1
            fn = FORENAMES[(member_seq2 + seed) % len(FORENAMES)]
            sn = SURNAMES[(member_seq2 * 3 + seed) % len(SURNAMES)]
            put(
                SitePage(
                    url=_member_url(p, member_seq2),
                    kind="detail_member",
                    period_num=p,
                    child_hrefs=[],
                    payload={
                        "type": "member",
                        "external_id": member_seq2,
                        "period_num": p,
                        "forename": fn,
                        "surname": sn,
                        "caption": f"Poslanec {fn} {sn} ({p}. obdobie)",
                    },
                    image_id=f"img{member_seq2:010d}",
                )
            )
    return site


def robots_rules(permissive: bool = False) -> list[dict]:
    """FIXTURES.md §4 — reference default is permissive (ROBOTSTXT_OBEY=False,
    settings.py:22); the restrictive variant disallows a subtree."""
    if permissive:
        return [{"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": None}]
    return [
        {"host": "www.nrsr.sk", "user_agent": "*", "rule": "disallow", "path_prefix": DISALLOWED_PREFIX, "crawl_delay": 2.5},
        {"host": "www.nrsr.sk", "user_agent": "*", "rule": "allow", "path_prefix": "/", "crawl_delay": 2.5},
    ]


def site_rows(site: dict[str, SitePage]) -> list[tuple]:
    """Rows for the ``pages`` DataFrame: (url, kind, period_num, body,
    child_urls, payload, image_id)."""
    return [
        (
            p.url,
            p.kind,
            p.period_num,
            p.body_html(),
            p.child_hrefs,
            json.dumps(p.payload, sort_keys=True, ensure_ascii=False) if p.payload is not None else None,
            p.image_id,
        )
        for p in site.values()
    ]


PAGES_SCHEMA = (
    "url string, kind string, period_num int, body binary, "
    "child_urls array<string>, payload string, image_id string"
)
