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
    kind: str                      # seed | list | page | detail | detail_member | voting
    period_num: int
    child_hrefs: list[str] = field(default_factory=list)  # raw hrefs, in document order
    payload: dict | None = None
    image_id: str | None = None

    def _typed_markup(self) -> str:
        """Reference-shaped typed markup (parsed by operators/parse_typed.py)
        rendered from the payload dict — member field spans
        (members.py:79-143), press field spans, and the voting vote TABLE
        with a <th> header row and club-header rows (votings.py:219-244).
        For voting pages the member links in the table ARE the page's child
        hrefs (in document order), like the reference's member hrefs."""
        p = self.payload
        if p is None:
            return ""
        if p.get("type") == "member":
            m = p["external_id"]
            return (
                f'<div id="member" data-period="{self.period_num}">'
                f'<span class="external_id">{m}</span>'
                f'<span class="forename">{p["forename"]}</span>'
                f'<span class="surname">{p["surname"]}</span>'
                f'<span class="email"> mailto:member{m}@nrsr.sk </span>'
                f'<span class="born"> {m % 28 + 1}. {m % 12 + 1}. {1950 + m % 40} </span>'
                f'<span class="nationality">slovenská</span></div>'
            )
        if p.get("type") == "press":
            d = p["press_num"]
            press_type = "zákon" if d % 2 == 0 else "iný typ"
            return (
                f'<div id="press" data-period="{self.period_num}">'
                f'<span class="press_num">{d}</span>'
                f'<span class="title"> {p["title"]} </span>'
                f'<span class="press_type">{press_type}</span>'
                f'<span class="press_date">{p["date"]}</span></div>'
            )
        if p.get("type") == "voting":
            rows = ['<tr><th>Poslanec</th><th>Hlas</th></tr>']
            club = None
            for mid, vote, c, href in p["votes"]:
                if c != club:
                    club = c
                    rows.append(f'<tr><td class="club">{c}</td></tr>')
                rows.append(
                    f'<tr><td class="member"><a href="{href}">Poslanec {mid}</a></td>'
                    f'<td class="vote"> [{vote}] </td></tr>'
                )
            return (
                f'<div id="voting" data-period="{self.period_num}">'
                f'<span class="external_id">{p["external_id"]}</span>'
                f'<span class="session_num">{p["session_num"]}</span>'
                f'<span class="voting_num">{p["voting_num"]}</span>'
                f'<span class="dt"> {p["dt"]} </span>'
                f'<span class="result">{p["result"]}</span></div>'
                f'<table id="votes">{"".join(rows)}</table>'
            )
        return ""

    def body_html(self) -> bytes:
        # voting pages: child links live inside the vote table (document
        # order = table order); other kinds render a plain link list
        links = (
            "" if self.kind == "voting"
            else "\n".join(f'<a href="{h}">x</a>' for h in self.child_hrefs)
        )
        payload = (
            f'<script id="payload" type="application/json">{json.dumps(self.payload, sort_keys=True, ensure_ascii=False)}</script>'
            if self.payload is not None
            else ""
        )
        img = f'<img id="photo" src="{self.image_id}"/>' if self.image_id else ""
        return (
            f"<html><body><!--kind={self.kind} period={self.period_num}-->\n"
            f"{links}\n{payload}\n{img}\n{self._typed_markup()}\n</body></html>"
        ).encode("utf-8")


def _list_url(period: int, page: int) -> str:
    if page == 1:
        return f"{BASE}Default.aspx?sid=zakony&CisObdobia={period}"
    return f"{BASE}Default.aspx?sid=zakony&CisObdobia={period}&PageNum={page}"


def _detail_url(period: int, ext_id: int) -> str:
    return f"{BASE}Default.aspx?sid=zakony/cpt&CisObdobia={period}&ID={ext_id}"


def _member_url(period: int, member_id: int) -> str:
    return f"{BASE}Default.aspx?sid=poslanci/poslanec&PoslanecID={member_id}&CisObdobia={period}"


def _voting_url(period: int, ext_id: int) -> str:
    return f"{BASE}Default.aspx?sid=schodze/hlasovanie/hlasklub&ID={ext_id}&CisObdobia={period}"


VOTE_LETTERS = ["Z", "P", "?", "N", "0"]


def _voting_payload(period: int, ext: int, member_ids: list[int]) -> dict:
    """Deterministic voting record: votes over the period's members, table
    order = club-grouped then member-id order (the club-header-carry shape)."""
    votes = sorted(
        (
            (m, VOTE_LETTERS[(m + ext) % 5], f"Klub {m % 2}", _member_url(period, m))
            for m in member_ids
        ),
        key=lambda t: (t[2], t[0]),
    )
    return {
        "type": "voting",
        "external_id": ext,
        "session_num": ext % 50 + 1,
        "voting_num": ext % 997,
        "dt": f"{ext % 28 + 1}. {ext % 12 + 1}. {2010 + ext % 10} {ext % 24}:{ext % 60:02d}:{ext % 59:02d}",
        "result": ["Návrh prešiel", "Návrh neprešiel", "Parlament nebol uznášaniaschopný"][ext % 3],
        "period_num": period,
        "votes": votes,
    }


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
            # a voting detail page hangs off every grid (votings.py:141-158)
            voting_ext = 9000 + p * 50 + page
            hrefs.append(_voting_url(p, voting_ext))
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
        # voting pages: typed vote table over the period's members; the
        # member links in the table are the page's children (document order)
        period_member_ids = [
            10 + (p - 1) * members_per_period + i for i in range(1, members_per_period + 1)
        ]
        for page in range(1, pages_per_period + 1):
            voting_ext = 9000 + p * 50 + page
            vp = _voting_payload(p, voting_ext, period_member_ids)
            put(
                SitePage(
                    url=_voting_url(p, voting_ext),
                    kind="voting",
                    period_num=p,
                    child_hrefs=[v[3] for v in vp["votes"]],
                    payload=vp,
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


def inject_failures(
    pages,
    transient_every: int = 3,
    transient_times: int = 1,
    permanent_urls: list[str] | None = None,
    permanent_times: int = 1_000_000,
    exempt: list[str] | None = None,
):
    """Deterministic fetch-failure metadata for retry tests (operators/
    retry.py): adds a ``fail_times`` column — the number of initial attempts
    that return a transient error (the sandbox 5xx stand-in).

    Every page whose url fingerprint satisfies ``pmod(h, transient_every)
    == 1`` fails ``transient_times`` times then succeeds; URLs listed in
    ``permanent_urls`` fail forever (``permanent_times`` ≫ max_retries) and
    exhaust the retry budget; ``exempt`` URLs (e.g. the seed) never fail.
    Pure column expressions, no shuffle."""
    from pyspark.sql import functions as F

    h = F.xxhash64(F.col("url"))
    ft = F.when(
        F.pmod(h, F.lit(transient_every)) == 1, F.lit(transient_times)
    ).otherwise(F.lit(None).cast("int"))
    if permanent_urls:
        ft = F.when(F.col("url").isin(*permanent_urls), F.lit(permanent_times)).otherwise(ft)
    if exempt:
        ft = F.when(F.col("url").isin(*exempt), F.lit(None).cast("int")).otherwise(ft)
    return pages.withColumn("fail_times", ft)
