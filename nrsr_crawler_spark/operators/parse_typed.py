"""Typed item extraction: reference-shaped HTML → ITEM_SPECS structs
(SURVEY §2.2 P1 depth + §2.10 — the per-spider field projections feeding the
keyed sink, end-to-end).

Mirrors the reference parse callbacks over real page markup:
 - member fields from labelled spans → MemberItem
   (/root/reference/nrsr/spiders/members.py:79-143; items.py:43-78);
 - voting metadata + the votes TABLE with club-header rows — positional row
   slicing (skip the header row, votings.py:219) and club-header CARRY
   (a club cell sets the current club for subsequent member rows,
   votings.py:219-244) happen INSIDE the parse kernel over raw HTML;
 - press fields (presses.py direct item construction; items.py:193-204).

Split of work (the ItemLoader re-expression, SURVEY §1.4):
 - the Arrow-batched ``mapInPandas`` kernel does ONLY extraction — regex
   field projections into multi-valued string arrays (XPath stand-ins),
   document order preserved;
 - fold semantics (TakeFirst / Join / MapCompose(cleaner)) and typing are
   pure Column expressions over those arrays (functions/cleaners.py +
   items.apply_fold) — JVM-side, codegen.

Input contract: a DataFrame with ``page_url string`` + ``body binary``
(plus any passthrough columns); one output row per matched page.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nrsr_crawler_spark.functions import cleaners as C

_SPAN_RE = re.compile(r'<span class="([a-z_]+)">(.*?)</span>', re.S)
_DIV_RE = re.compile(r'<div id="(member|voting|press|debate|billstep)"[^>]*data-period="(\d+)"')
_TR_RE = re.compile(r"<tr>(.*?)</tr>", re.S)
_CLUB_TD_RE = re.compile(r'<td class="club">(.*?)</td>', re.S)
_MEMBER_TD_RE = re.compile(r'<td class="member">(.*?)</td>', re.S)
_VOTE_TD_RE = re.compile(r'<td class="vote">(.*?)</td>', re.S)
_HREF_RE = re.compile(r'href="([^"]*)"')
_CHANGES_TABLE_RE = re.compile(r'<table id="changes">(.*?)</table>', re.S)
_TD_RE = re.compile(r"<td>(.*?)</td>", re.S)
_A_TEXT_RE = re.compile(r"<a[^>]*>(.*?)</a>", re.S)

MEMBER_RAW_SCHEMA = (
    "page_url string, period_num long, external_id array<string>, "
    "forename array<string>, surname array<string>, title array<string>, "
    "email array<string>, born array<string>, nationality array<string>"
)
VOTING_RAW_SCHEMA = (
    "page_url string, period_num long, external_id array<string>, "
    "session_num array<string>, voting_num array<string>, press_num array<string>, "
    "dt array<string>, result array<string>, "
    "votes array<struct<href:string, vote_raw:string, club:string>>"
)
PRESS_RAW_SCHEMA = (
    "page_url string, period_num long, press_num array<string>, "
    "title array<string>, press_type array<string>, press_date array<string>"
)
DEBATE_RAW_SCHEMA = (
    "page_url string, period_num long, external_id array<string>, "
    "debater_name array<string>, debater_party array<string>, "
    "session_num array<string>, press_num array<string>, "
    "appearance_type array<string>, when array<string>"
)

_MEMBER_FIELDS = ("external_id", "forename", "surname", "title", "email", "born", "nationality")
_VOTING_FIELDS = ("external_id", "session_num", "voting_num", "press_num", "dt", "result")
_PRESS_FIELDS = ("press_num", "title", "press_type", "press_date")
_DEBATE_FIELDS = (
    "external_id", "debater_name", "debater_party", "session_num",
    "press_num", "appearance_type", "when",
)
BILL_STEP_RAW_SCHEMA = (
    "page_url string, period_num long, main_label array<string>, "
    "body_label array<string>, meeting_session_num array<string>, "
    "meeting_resolution array<string>, coordinator_label array<string>, "
    "coordinator_meeting_date array<string>, coordinator_name array<string>, "
    "step_result array<string>, act_num_label array<string>, "
    "changes array<struct<date_raw:string, author:string, detail:string, "
    "attachment_title:string, attachment_url:string>>"
)
_BILL_STEP_FIELDS = (
    "main_label", "body_label", "meeting_session_num", "meeting_resolution",
    "coordinator_label", "coordinator_meeting_date", "coordinator_name",
    "step_result", "act_num_label",
)


def _spans(text: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for cls, val in _SPAN_RE.findall(text):
        out.setdefault(cls, []).append(val)
    return out


def _kind_and_period(text: str):
    m = _DIV_RE.search(text)
    return (m.group(1), int(m.group(2))) if m else (None, None)


def _extract_kind(pages: DataFrame, kind: str, fields, schema: str, extra=None) -> DataFrame:
    """Shared raw extractor: pages of ``kind`` → one row of multi-valued
    string arrays per page (document order)."""

    def _gen(batches):
        for pdf in batches:
            rows = {"page_url": [], "period_num": []}
            for f in fields:
                rows[f] = []
            if extra is not None:
                rows[extra[0]] = []
            for url, body in zip(pdf["page_url"], pdf["body"]):
                if body is None:
                    continue
                text = bytes(body).decode("utf-8", errors="replace")
                k, period = _kind_and_period(text)
                if k != kind:
                    continue
                sp = _spans(text)
                rows["page_url"].append(url)
                rows["period_num"].append(period)
                for f in fields:
                    rows[f].append(sp.get(f, []))
                if extra is not None:
                    rows[extra[0]].append(extra[1](text))
            if rows["page_url"]:  # empty pandas frames infer float64 for
                yield pd.DataFrame(rows)  # list columns and break Arrow

    return pages.select("page_url", "body").mapInPandas(_gen, schema=schema)


def _parse_votes_table(text: str) -> list[dict]:
    """The votings.py:219-244 kernel: iterate table rows POSITIONALLY
    (rows[1:] slices off the <th> header row — P5), a club cell sets the
    carried current club, member rows emit (href, raw vote, carried club)."""
    votes: list[dict] = []
    rows = _TR_RE.findall(text)
    club = None
    for row in rows[1:]:  # positional slice: skip the header row
        m_club = _CLUB_TD_RE.search(row)
        if m_club:
            club = m_club.group(1).strip()
            continue
        m_member = _MEMBER_TD_RE.search(row)
        m_vote = _VOTE_TD_RE.search(row)
        if m_member and m_vote:
            href = _HREF_RE.search(m_member.group(1))
            votes.append(
                {
                    "href": href.group(1) if href else None,
                    "vote_raw": m_vote.group(1),
                    "club": club,
                }
            )
    return votes


def _parse_changes_table(text: str) -> list[dict]:
    """The bills.py:198-211 kernel: BillStepChangeItem rows by POSITIONAL td
    index — td1 noisy date text (prefix-matched later, bills.py:203-205),
    td2 author text, td3/td5 hrefs, td4 anchor text."""
    m = _CHANGES_TABLE_RE.search(text)
    if not m:
        return []
    out: list[dict] = []
    for row in _TR_RE.findall(m.group(1)):
        tds = _TD_RE.findall(row)
        if len(tds) < 5:
            continue
        detail = _HREF_RE.search(tds[2])
        atitle = _A_TEXT_RE.search(tds[3])
        aurl = _HREF_RE.search(tds[4])
        out.append(
            {
                "date_raw": tds[0].strip(),
                "author": tds[1],
                "detail": detail.group(1) if detail else None,
                "attachment_title": atitle.group(1) if atitle else None,
                "attachment_url": aurl.group(1) if aurl else None,
            }
        )
    return out


def extract_member_raw(pages: DataFrame) -> DataFrame:
    return _extract_kind(pages, "member", _MEMBER_FIELDS, MEMBER_RAW_SCHEMA)


def extract_voting_raw(pages: DataFrame) -> DataFrame:
    return _extract_kind(
        pages, "voting", _VOTING_FIELDS, VOTING_RAW_SCHEMA,
        extra=("votes", _parse_votes_table),
    )


def extract_press_raw(pages: DataFrame) -> DataFrame:
    return _extract_kind(pages, "press", _PRESS_FIELDS, PRESS_RAW_SCHEMA)


def extract_debate_raw(pages: DataFrame) -> DataFrame:
    return _extract_kind(pages, "debate", _DEBATE_FIELDS, DEBATE_RAW_SCHEMA)


def extract_bill_step_raw(pages: DataFrame) -> DataFrame:
    return _extract_kind(
        pages, "billstep", _BILL_STEP_FIELDS, BILL_STEP_RAW_SCHEMA,
        extra=("changes", _parse_changes_table),
    )


# -- folds: ItemLoader output-processor semantics as Column expressions --------

def _tf(col: str):
    return C.take_first(F.col(col))


def fold_member(raw: DataFrame) -> DataFrame:
    """MemberItem fold (items.py:43-78): TakeFirst on ids/names/born; Join on
    title/email/nationality with MapCompose cleaners applied BEFORE the fold;
    born parses the Slovak date with noon-normalization (F7)."""
    clean_ws = lambda arr: F.transform(arr, C.filter_whitespaces)  # noqa: E731
    return raw.select(
        F.lit("member").alias("type"),
        C.try_int(_tf("external_id")).alias("external_id"),
        C.filter_whitespaces(_tf("forename")).alias("forename"),
        C.filter_whitespaces(_tf("surname")).alias("surname"),
        F.array_join(clean_ws(F.col("title")), " ").alias("title"),
        F.array_join(F.transform(F.col("email"), lambda x: C.filter_mailto(C.filter_whitespaces(x))), " ").alias("email"),
        C.parse_date_noon(_tf("born")).alias("born"),
        F.array_join(clean_ws(F.col("nationality")), " ").alias("nationality"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_voting(raw: DataFrame) -> DataFrame:
    """VotingItem fold (items.py:218-237): scalars TakeFirst; ``votes`` is
    the nested array<struct> — vote text goes through MapCompose(filter_vote)
    (the bracket strip, items.py:17-18) and the member id is the PoslanecID
    query param of the href (votings.py:198-205)."""
    votes = F.transform(
        F.col("votes"),
        lambda v: F.struct(
            F.regexp_extract(v["href"], r"PoslanecID=(\d+)", 1).try_cast("long").alias("external_id"),
            C.filter_vote(v["vote_raw"]).alias("vote"),
            v["club"].alias("club"),
        ),
    )
    return raw.select(
        F.lit("voting").alias("type"),
        C.try_int(_tf("external_id")).alias("external_id"),
        C.try_int(_tf("session_num")).alias("session_num"),
        C.try_int(_tf("voting_num")).alias("voting_num"),
        C.try_int(_tf("press_num")).alias("press_num"),  # NULL when the page has no press ref
        C.parse_datetime(_tf("dt")).alias("datetime"),
        C.filter_whitespaces(_tf("result")).alias("result"),
        F.array_sort(votes).alias("votes"),  # O1 deterministic output sort
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_press(raw: DataFrame) -> DataFrame:
    """PressItem fold (items.py:193-204; presses.py constructs the item with
    direct single-valued assignment, so extraction arrays are TakeFirst-ed)."""
    return raw.select(
        F.lit("press").alias("type"),
        C.try_int(_tf("press_num")).alias("press_num"),
        C.filter_whitespaces(_tf("title")).alias("title"),
        C.filter_whitespaces(_tf("press_type")).alias("press_type"),
        C.parse_date_noon(_tf("press_date")).alias("press_date"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_debate(raw: DataFrame) -> DataFrame:
    """DebateAppearanceItem fold (items.py:90-111): list-typed ``press_num``
    (KEEP fold → array<long>, the missing_presses.py:47 pain point), Join on
    appearance_type, and the F8b time-range split
    (debate_appearances.py:159-164) producing (start, end) timestamps."""
    tr = C.time_range(C.filter_whitespaces(_tf("when")))
    return raw.select(
        F.lit("debate_appearance").alias("type"),
        C.try_int(_tf("external_id")).alias("external_id"),
        C.filter_whitespaces(_tf("debater_name")).alias("debater_name"),
        C.filter_whitespaces(_tf("debater_party")).alias("debater_party"),
        C.try_int(_tf("session_num")).alias("session_num"),
        F.transform(F.col("press_num"), C.try_int).alias("press_num"),  # KEEP: list-typed
        F.array_join(F.transform(F.col("appearance_type"), C.filter_whitespaces), " ").alias("appearance_type"),
        tr["start"].alias("start"),
        tr["end"].alias("end"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_bill_step(raw: DataFrame) -> DataFrame:
    """BillStepItem fold (items.py:255-302 via bills.py:162-234): identity
    from the URL QUERY (MasterID→bill_id, WorkitemID→external_id — F9),
    presence-conditional meeting/coordinator scalars (NULL when the panel is
    absent), the reference's coordinator-date cleanup — ``.replace(', ','')``
    then ``.replace('\\xa0','')`` BEFORE strptime (bills.py:184-187) — and
    the nested ``changes`` array with the date-PREFIX regex
    ``(\\d+\\. \\d+\\. \\d+).*`` + noon-normalize (bills.py:203-205),
    document order preserved (no sort — the reference appends in row order)."""
    coord_raw = _tf("coordinator_meeting_date")
    coord_clean = F.replace(
        F.replace(coord_raw, F.lit(", "), F.lit("")), F.lit("\xa0"), F.lit("")
    )
    changes = F.transform(
        F.col("changes"),
        lambda ch: F.struct(
            C.parse_date_noon(
                F.regexp_extract(ch["date_raw"], r"(\d+\. \d+\. \d+).*", 1)
            ).alias("date"),
            ch["author"].alias("author"),
            ch["detail"].alias("detail"),
            ch["attachment_title"].alias("attachment_title"),
            ch["attachment_url"].alias("attachment_url"),
        ),
    )
    return raw.select(
        F.lit("bill_step").alias("type"),
        F.regexp_extract(F.col("page_url"), r"MasterID=(\d+)", 1).try_cast("long").alias("bill_id"),
        F.regexp_extract(F.col("page_url"), r"WorkitemID=(\d+)", 1).try_cast("long").alias("external_id"),
        C.filter_whitespaces(_tf("main_label")).alias("main_label"),
        C.filter_whitespaces(_tf("body_label")).alias("body_label"),
        C.try_int(_tf("meeting_session_num")).alias("meeting_session_num"),
        C.filter_whitespaces(_tf("meeting_resolution")).alias("meeting_resolution"),
        C.filter_whitespaces(_tf("coordinator_label")).alias("coordinator_label"),
        C.parse_date_noon(coord_clean).alias("coordinator_meeting_date"),
        # bills.py:188-190: name only read when the date label exists
        F.when(coord_raw.isNotNull(), C.filter_whitespaces(_tf("coordinator_name"))).alias("coordinator_name"),
        C.filter_whitespaces(_tf("step_result")).alias("step_result"),
        C.filter_whitespaces(_tf("act_num_label")).alias("act_num_label"),
        changes.alias("changes"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def daily_clubs(voting: DataFrame) -> DataFrame:
    """DailyClubItem semantics (votings.py:225-243 + items.py:36-40): per
    voting, group the carried club → sorted member-id lists — computed from
    the parsed votes array with pure Column ops (A1 header-carry, derived
    from HTML instead of a pre-relational table)."""
    clubs = F.array_sort(F.array_distinct(F.transform(F.col("votes"), lambda v: v["club"])))
    per_club = F.transform(
        clubs,
        lambda c: F.struct(
            c.alias("club"),
            F.array_sort(
                F.transform(
                    F.filter(F.col("votes"), lambda v: v["club"] == c),
                    lambda v: v["external_id"],
                )
            ).alias("member_ids"),
        ),
    )
    return voting.select(
        F.lit("daily_club").alias("type"),
        F.col("period_num"),
        F.to_date(F.col("datetime")).alias("date"),
        F.col("external_id").alias("voting_external_id"),
        per_club.alias("clubs"),
    )
