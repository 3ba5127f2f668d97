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

# Kernel regexes are ATTRIBUTE-ORDER/WHITESPACE tolerant (real markup — and
# tests/test_markup_fuzz.py — permutes attribute order, varies inter-attribute
# whitespace and injects benign extra attributes): a tag is matched by name +
# the presence of the identifying attribute anywhere inside the SAME tag
# ([^>]* never crosses '>'), never by an exact serialization.


def _tag_body(tag: str, attr: str, value: str):
    """``<tag ... attr="value" ...>(body)</tag>`` with attrs in any order."""
    return re.compile(
        r"<%s\b[^>]*\b%s=\"%s\"[^>]*>(.*?)</%s>" % (tag, attr, re.escape(value), tag),
        re.S,
    )


_SPAN_RE = re.compile(r'<span\b[^>]*\bclass="([a-z_]+)"[^>]*>(.*?)</span>', re.S)
_DIV_TAG_RE = re.compile(r"<div\b[^>]*>")
_ID_ATTR_RE = re.compile(r'\bid="([^"]*)"')
_PERIOD_ATTR_RE = re.compile(r'\bdata-period="(\d+)"')
_DIALECTS = frozenset(
    (
        "member", "voting", "press", "debate", "billstep", "session",
        "committee", "commsched", "bill", "mchange", "amendment",
        "interpellation", "hoq",
    )
)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr>", re.S)
_CLUB_TD_RE = _tag_body("td", "class", "club")
_MEMBER_TD_RE = _tag_body("td", "class", "member")
_VOTE_TD_RE = _tag_body("td", "class", "vote")
_HREF_RE = re.compile(r'\bhref="([^"]*)"')
_CHANGES_TABLE_RE = _tag_body("table", "id", "changes")
_TD_RE = re.compile(r"<td\b[^>]*>(.*?)</td>", re.S)
_A_TEXT_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_A_TAG_BODY_RE = re.compile(r"<a\b([^>]*)>(.*?)</a>", re.S)
_A_OPEN_RE = re.compile(r"<a\b([^>]*)>")
_PROGRAM_TABLE_RE = _tag_body("table", "id", "program")
_CLASS_ATTR_RE = re.compile(r'\bclass="([^"]*)"')
_IMG_ALT_RE = re.compile(r'<img\b[^>]*\balt="([^"]*)"')
_STRONG_RE = re.compile(r"<strong\b[^>]*>(.*?)</strong>", re.S)
_I_RE = re.compile(r"<i\b[^>]*>(.*?)</i>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_H1_RE = re.compile(r"<h1\b[^>]*>(.*?)</h1>", re.S)
_MEMBER_DIV_RE = _tag_body("div", "class", "member_name")
_SPAN_TEXT_RE = re.compile(r"<span\b[^>]*>(.*?)</span>", re.S)
_SESS_RE = re.compile(r'<div\b[^>]*\bclass="sess"[^>]*>(.*?)<!--/sess-->', re.S)
_MCH_TABLE_RE = _tag_body("table", "id", "mch")
_STATUS_DIV_RE = _tag_body("div", "id", "status")
_DATE_SPAN_RE = _tag_body("span", "class", "date")
_TIME_RE = _tag_body("strong", "class", "time")
_PLACE_RE = _tag_body("div", "class", "place")
_LI_RE = re.compile(r"<li\b[^>]*>(.*?)</li>", re.S)

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
SESSION_RAW_SCHEMA = (
    "page_url string, period_num long, name array<string>, "
    "attachments array<struct<href:string, name:string>>, "
    "program array<struct<state:string, progpoint_raw:string, "
    "parlpress_raw:string, parlpress_href:string, "
    "text1:string, text2:string, text3:string>>"
)
COMMITTEE_RAW_SCHEMA = (
    "page_url string, period_num long, description array<string>, "
    "h1_name string, "
    "members array<struct<href:string, role:string>>"
)
COMMSCHED_RAW_SCHEMA = (
    "page_url string, period_num long, committee_name array<string>, "
    "sessions array<struct<date:string, time:string, place:array<string>, "
    "points:array<struct<press_raw:string, text:string>>>>"
)
_BILL_FIELDS = (
    "proposer", "delivered", "press_num", "current_state", "current_result",
    "category_name",
)
BILL_RAW_SCHEMA = (
    "page_url string, period_num long, proposer array<string>, "
    "delivered array<string>, press_num array<string>, "
    "current_state array<string>, current_result array<string>, "
    "category_name array<string>"
)
MCHANGE_RAW_SCHEMA = (
    "page_url string, period_num long, "
    "changes array<struct<date_raw:string, href:string, change_type:string, "
    "change_reason:string>>"
)
_AMEND_FIELDS = ("submitter", "session_num", "date", "press_num")
AMEND_RAW_SCHEMA = (
    "page_url string, period_num long, submitter array<string>, "
    "session_num array<string>, date array<string>, press_num array<string>, "
    "other_submitters array<string>, signed_members array<string>, "
    "votelink string"
)
_INTERP_FIELDS = (
    "status", "asked_by", "description", "recipients", "date",
    "interpellation_session_num", "responded_by", "response_session_num",
    "press_num",
)
INTERP_RAW_SCHEMA = (
    "page_url string, period_num long, status array<string>, "
    "asked_by array<string>, description array<string>, "
    "recipients array<string>, date array<string>, "
    "interpellation_session_num array<string>, responded_by array<string>, "
    "response_session_num array<string>, press_num array<string>"
)
_HOQ_FIELDS = (
    "question_by", "question_date", "answer_date", "recipient", "question",
    "answer_by", "answer",
)
HOQ_RAW_SCHEMA = (
    "page_url string, period_num long, question_by array<string>, "
    "question_date array<string>, answer_date array<string>, "
    "recipient array<string>, question array<string>, "
    "answer_by array<string>, answer array<string>, status_raw string"
)


def _spans(text: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for cls, val in _SPAN_RE.findall(text):
        out.setdefault(cls, []).append(val)
    return out


def _kind_and_period(text: str):
    """First <div> carrying both a dialect id and data-period — attributes in
    any order (must agree with ``kind_expr``'s JVM dispatch, which also keys
    on the dialect div regardless of attribute order)."""
    for m in _DIV_TAG_RE.finditer(text):
        tag = m.group(0)
        mid = _ID_ATTR_RE.search(tag)
        if mid and mid.group(1) in _DIALECTS:
            mp = _PERIOD_ATTR_RE.search(tag)
            if mp:
                return mid.group(1), int(mp.group(1))
    return None, None


def _extract_kind(
    pages: DataFrame, kind: str, fields, schema: str, extra=None,
    kind_col: str | None = None,
) -> DataFrame:
    """Shared raw extractor: pages of ``kind`` → one row of multi-valued
    string arrays per page (document order).  ``extra``: one ``(name, fn)``
    or a list of them — fn(text) computes a non-span column (nested tables,
    h1 text, ...).

    Prefilter (keeps other dialects' bodies out of the Arrow transfer — with
    K dialects extracted per epoch this cuts serialized bytes K× versus
    shipping every body to every kernel; the kernel still re-checks the full
    dialect marker):
     - ``kind_col`` given: the caller computed a dialect tag ONCE per body
       (``with_kind`` / the epoch loop's single ``regexp_extract`` pass) and
       this extractor filters on tag equality — one full-body scan total per
       epoch instead of one per dialect (VERDICT r2 finding #3);
     - else: a JVM-side ``contains`` on the id attribute marker (the closing
       quote excludes prefix dialects, e.g. bill vs billstep)."""
    extras = [] if extra is None else ([extra] if isinstance(extra, tuple) else list(extra))
    marker = f'id="{kind}"'

    def _gen(batches):
        for pdf in batches:
            rows = {"page_url": [], "period_num": []}
            for f in fields:
                rows[f] = []
            for name, _ in extras:
                rows[name] = []
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
                for name, fn in extras:
                    rows[name].append(fn(text))
            if rows["page_url"]:  # empty pandas frames infer float64 for
                yield pd.DataFrame(rows)  # list columns and break Arrow

    if kind_col is not None:
        pre = pages.filter(F.col(kind_col) == kind)
    else:
        pre = pages.filter(F.contains(F.col("body").cast("string"), F.lit(marker)))
    return pre.select("page_url", "body").mapInPandas(_gen, schema=schema)


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


def _parse_attachments(text: str) -> list[dict]:
    """sessions.py:83-88: the program-document anchors → (href, name)."""
    out: list[dict] = []
    for attrs, body in _A_TAG_BODY_RE.findall(text):
        cls = _CLASS_ATTR_RE.search(attrs)
        if not cls or cls.group(1) != "att":
            continue
        href = _HREF_RE.search(attrs)
        out.append({"href": href.group(1) if href else None, "name": body})
    return out


def _parse_program_table(text: str) -> list[dict]:
    """sessions.py:90-130: program-point rows by POSITIONAL td — td1 img alt
    (state; NULL when no img), td2 noisy progpoint text, td3 anchor
    (parlpress text + href), td4 strong/i/plain text triple."""
    m = _PROGRAM_TABLE_RE.search(text)
    if not m:
        return []
    out: list[dict] = []
    for row in _TR_RE.findall(m.group(1)):
        tds = _TD_RE.findall(row)
        if len(tds) < 4:
            continue
        alt = _IMG_ALT_RE.search(tds[0])
        href = _HREF_RE.search(tds[2])
        press_txt = _A_TEXT_RE.search(tds[2])
        strongs = _STRONG_RE.findall(tds[3])
        italics = _I_RE.findall(tds[3])
        plain = _TAG_RE.sub("", _STRONG_RE.sub("", _I_RE.sub("", tds[3])))
        out.append(
            {
                "state": alt.group(1).strip() if alt else None,
                "progpoint_raw": tds[1],
                "parlpress_raw": press_txt.group(1) if press_txt else None,
                "parlpress_href": href.group(1) if href else None,
                "text1": " ".join(strongs).strip(),
                "text2": " ".join(italics).strip(),
                "text3": plain.strip(),
            }
        )
    return out


def _parse_h1(text: str) -> str | None:
    m = _H1_RE.search(text)
    return m.group(1) if m else None


def _parse_members_list(text: str) -> list[dict]:
    """committees.py:55-65: member_name blocks → (profile href, role text)."""
    out: list[dict] = []
    for block in _MEMBER_DIV_RE.findall(text):
        href = _HREF_RE.search(block)
        role = _SPAN_TEXT_RE.search(block)
        out.append(
            {
                "href": href.group(1) if href else None,
                "role": role.group(1) if role else None,
            }
        )
    return out


def _parse_sessions(text: str) -> list[dict]:
    """committee_schedules.py:84-111: one page yields one item per session
    block — date/time raw STRINGS (they are the natural key,
    pipelines.py:123-128), multi-valued place, and the points <ul> where the
    anchor text is int-cast-null-on-fail later."""
    out: list[dict] = []
    for block in _SESS_RE.findall(text):
        date = _DATE_SPAN_RE.search(block)
        tm = _TIME_RE.search(block)
        points = []
        for li in _LI_RE.findall(block):
            a = _A_TEXT_RE.search(li)
            txt = _TAG_RE.sub("", _A_TEXT_RE.sub("", li))
            points.append(
                {"press_raw": a.group(1) if a else None, "text": txt.strip()}
            )
        out.append(
            {
                "date": date.group(1) if date else None,
                "time": tm.group(1) if tm else None,
                "place": _PLACE_RE.findall(block),
                "points": points,
            }
        )
    return out


def _parse_mch_rows(text: str) -> list[dict]:
    """member_changes.py:141-159 kernel: result-grid rows by positional td —
    td1 date text, td2 anchor href (PoslanecID), td3/td4 type/reason."""
    m = _MCH_TABLE_RE.search(text)
    if not m:
        return []
    out: list[dict] = []
    for row in _TR_RE.findall(m.group(1)):
        tds = _TD_RE.findall(row)
        if len(tds) < 4:
            continue
        href = _HREF_RE.search(tds[1])
        out.append(
            {
                "date_raw": tds[0],
                "href": href.group(1) if href else None,
                "change_type": tds[2],
                "change_reason": tds[3],
            }
        )
    return out


def _parse_ul(ul_id: str):
    ul_re = _tag_body("ul", "id", ul_id)

    def fn(text: str) -> list[str]:
        m = ul_re.search(text)
        if not m:
            return []
        return [
            s.group(1)
            for li in _LI_RE.findall(m.group(1))
            if (s := _SPAN_TEXT_RE.search(li))
        ]

    return fn


def _parse_votelink(text: str) -> str | None:
    for m in _A_OPEN_RE.finditer(text):
        attrs = m.group(1)
        mid = _ID_ATTR_RE.search(attrs)
        if mid and mid.group(1) == "votelink":
            href = _HREF_RE.search(attrs)
            return href.group(1) if href else None
    return None


def _parse_status_div(text: str) -> str | None:
    m = _STATUS_DIV_RE.search(text)
    return m.group(1) if m else None


def extract_member_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(pages, "member", _MEMBER_FIELDS, MEMBER_RAW_SCHEMA, kind_col=kind_col)


def extract_voting_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "voting", _VOTING_FIELDS, VOTING_RAW_SCHEMA,
        extra=("votes", _parse_votes_table), kind_col=kind_col)


def extract_press_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(pages, "press", _PRESS_FIELDS, PRESS_RAW_SCHEMA, kind_col=kind_col)


def extract_debate_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(pages, "debate", _DEBATE_FIELDS, DEBATE_RAW_SCHEMA, kind_col=kind_col)


def extract_bill_step_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "billstep", _BILL_STEP_FIELDS, BILL_STEP_RAW_SCHEMA,
        extra=("changes", _parse_changes_table), kind_col=kind_col)


def extract_session_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "session", ("name",), SESSION_RAW_SCHEMA,
        extra=[("attachments", _parse_attachments), ("program", _parse_program_table)], kind_col=kind_col)


def extract_committee_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "committee", ("description",), COMMITTEE_RAW_SCHEMA,
        extra=[("h1_name", _parse_h1), ("members", _parse_members_list)], kind_col=kind_col)


def extract_commsched_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "commsched", ("committee_name",), COMMSCHED_RAW_SCHEMA,
        extra=[("sessions", _parse_sessions)], kind_col=kind_col)


def extract_bill_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(pages, "bill", _BILL_FIELDS, BILL_RAW_SCHEMA, kind_col=kind_col)


def extract_member_change_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "mchange", (), MCHANGE_RAW_SCHEMA,
        extra=[("changes", _parse_mch_rows)], kind_col=kind_col)


def extract_amendment_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "amendment", _AMEND_FIELDS, AMEND_RAW_SCHEMA,
        extra=[
            ("other_submitters", _parse_ul("subm")),
            ("signed_members", _parse_ul("signed")),
            ("votelink", _parse_votelink),
        ], kind_col=kind_col)


def extract_interpellation_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(pages, "interpellation", _INTERP_FIELDS, INTERP_RAW_SCHEMA, kind_col=kind_col)


def extract_hoq_raw(pages: DataFrame, kind_col: str | None = None) -> DataFrame:
    return _extract_kind(
        pages, "hoq", _HOQ_FIELDS, HOQ_RAW_SCHEMA,
        extra=[("status_raw", _parse_status_div)], kind_col=kind_col)


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


def fold_session(raw: DataFrame) -> DataFrame:
    """SessionItem fold (sessions.py:71-131): id from the URL query,
    attachment (url, name) structs with BASE_URL resolve (sessions.py:83-88),
    and program_points with the reference's noisy int cleanup —
    ``.replace('\\xfd','').strip().replace('.','')`` for progpoint,
    ``.replace('\\xfd','').strip()`` for parlpress, both null-on-fail — and
    the text TRIPLE [strong-join, i-join, plain-join] (sessions.py:96-130)."""
    base = F.lit("https://www.nrsr.sk/web/")
    atts = F.col("attachments")
    prog_int = lambda c: F.replace(  # noqa: E731
        F.trim(F.replace(c, F.lit("\xfd"), F.lit(""))), F.lit("."), F.lit("")
    ).try_cast("long")
    press_int = lambda c: F.trim(F.replace(c, F.lit("\xfd"), F.lit(""))).try_cast("long")  # noqa: E731
    program = F.transform(
        F.col("program"),
        lambda p: F.struct(
            p["state"].alias("state"),
            prog_int(p["progpoint_raw"]).alias("progpoint"),
            press_int(p["parlpress_raw"]).alias("parlpress"),
            F.concat(base, p["parlpress_href"]).alias("parlpress_url"),
            F.array(p["text1"], p["text2"], p["text3"]).alias("text"),
        ),
    )
    return raw.select(
        F.lit("session").alias("type"),
        F.regexp_extract(F.col("page_url"), r"ID=(\d+)", 1).try_cast("long").alias("external_id"),
        _tf("name").alias("name"),
        F.transform(atts, lambda a: a["href"]).alias("attachments_urls"),
        F.transform(
            atts,
            lambda a: F.struct(
                F.concat(base, a["href"]).alias("url"), F.trim(a["name"]).alias("name")
            ),
        ).alias("attachment_names"),
        program.alias("program_points"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_committee(raw: DataFrame) -> DataFrame:
    """CommitteeItem fold (committees.py:45-66): id from the URL query,
    ``//h1`` name stripped, KEEP-fold description list, and the nested
    members — role stripped + PoslanecID pulled from each member's profile
    href (committees.py:55-65)."""
    members = F.transform(
        F.col("members"),
        lambda m: F.struct(
            F.trim(m["role"]).alias("role"),
            F.regexp_extract(m["href"], r"PoslanecID=(\d+)", 1).try_cast("long").alias("external_id"),
        ),
    )
    return raw.select(
        F.lit("committee").alias("type"),
        F.regexp_extract(F.col("page_url"), r"ID=(\d+)", 1).try_cast("long").alias("external_id"),
        F.trim(F.col("h1_name")).alias("name"),
        F.col("description"),
        members.alias("members"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_commsched(raw: DataFrame) -> DataFrame:
    """CommitteeScheduleItem fold (committee_schedules.py:77-111): one OUTPUT
    ROW PER SESSION BLOCK (explode — the reference yields one item per
    session div), date/time kept as RAW STRINGS (they are the natural key,
    pipelines.py:123-128), multi-valued place, and points with the int-cast-
    null-on-fail press ref (committee_schedules.py:101-104)."""
    exploded = raw.select(
        F.col("page_url"),
        F.col("period_num"),
        _tf("committee_name").alias("committee_name"),
        F.explode(F.col("sessions")).alias("s"),
    )
    points = F.transform(
        F.col("s")["points"],
        lambda p: F.struct(
            C.try_int(p["press_raw"]).alias("press_num"),
            F.array(p["text"]).alias("text"),
        ),
    )
    return exploded.select(
        F.lit("committeeschedule").alias("type"),
        F.col("committee_name"),
        F.col("s")["date"].alias("date"),
        F.col("s")["time"].alias("time"),
        F.col("s")["place"].alias("place"),
        points.alias("points"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_bill(raw: DataFrame) -> DataFrame:
    """BillItem fold (bills.py:97-152): MasterID identity, F7 dual-format
    noon date for ``delivered`` (parse_date_noon covers both the primary and
    the ValueError-fallback format), press_num TakeFirst→int with the
    absent-span→NULL TypeError path."""
    return raw.select(
        F.lit("bill").alias("type"),
        F.regexp_extract(F.col("page_url"), r"MasterID=(\d+)", 1).try_cast("long").alias("external_id"),
        _tf("proposer").alias("proposer"),
        C.parse_date_noon(_tf("delivered")).alias("delivered"),
        C.try_int(_tf("press_num")).alias("press_num"),
        _tf("current_state").alias("current_state"),
        _tf("current_result").alias("current_result"),
        _tf("category_name").alias("category_name"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_member_change(raw: DataFrame) -> DataFrame:
    """MemberChangeItem fold (member_changes.py:141-159): EXPLODE the result
    grid — one output row per change row — external_id from the td2 anchor's
    PoslanecID param, F7 noon date, type/reason text."""
    exploded = raw.select(
        "page_url", "period_num", F.explode(F.col("changes")).alias("ch")
    )
    return exploded.select(
        F.lit("member_change").alias("type"),
        F.regexp_extract(F.col("ch")["href"], r"PoslanecID=(\d+)", 1)
        .try_cast("long")
        .alias("external_id"),
        C.parse_date_noon(F.col("ch")["date_raw"]).alias("date"),
        F.col("ch")["change_type"].alias("change_type"),
        F.col("ch")["change_reason"].alias("change_reason"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_amendment(raw: DataFrame) -> DataFrame:
    """AmendmentItem fold (amendments.py:188-258): LOWERCASE ``id`` query
    param, the date-PREFIX regex over noisy text (amendments.py:233-236),
    KEEP-fold submitter/signature lists, voting_external_id from the link's
    ?ID= — NULL when the link is absent (amendments.py:243-250)."""
    return raw.select(
        F.lit("amendment").alias("type"),
        F.regexp_extract(F.col("page_url"), r"[?&]id=(\d+)", 1).try_cast("long").alias("external_id"),
        _tf("submitter").alias("submitter"),
        C.try_int(_tf("session_num")).alias("session_num"),
        C.parse_date_noon(
            F.regexp_extract(_tf("date"), r"(\d+\. \d+\. \d+).*", 1)
        ).alias("date"),
        C.try_int(_tf("press_num")).alias("press_num"),
        F.col("other_submitters"),
        F.col("signed_members"),
        F.regexp_extract(F.col("votelink"), r"ID=(\d+)", 1).try_cast("long").alias("voting_external_id"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_interpellation(raw: DataFrame) -> DataFrame:
    """InterpellationItem fold (interpellations.py:189-290): flat TakeFirst
    spans, F7 dual-format noon date, three independent int-null-on-fail
    session/press refs (absent span → NULL, the TypeError path)."""
    return raw.select(
        F.lit("interpellation").alias("type"),
        F.regexp_extract(F.col("page_url"), r"ID=(\d+)", 1).try_cast("long").alias("external_id"),
        _tf("status").alias("status"),
        _tf("asked_by").alias("asked_by"),
        _tf("description").alias("description"),
        _tf("recipients").alias("recipients"),
        C.parse_date_noon(_tf("date")).alias("date"),
        C.try_int(_tf("interpellation_session_num")).alias("interpellation_session_num"),
        _tf("responded_by").alias("responded_by"),
        C.try_int(_tf("response_session_num")).alias("response_session_num"),
        C.try_int(_tf("press_num")).alias("press_num"),
        F.col("period_num"),
        F.col("page_url").alias("url"),
    )


def fold_hoq(raw: DataFrame) -> DataFrame:
    """HourOfQuestionsItem fold (hour_of_questions.py:175-240): MasterID
    identity, status = ``text.split(':')[1]`` of the status div (the
    split-on-colon F13, line 186 — NOT stripped, matching the reference),
    and the two NBSP-noised dates — ``replace('\\xa0','')`` before parse,
    NULL when the span is absent."""
    d = lambda col: C.parse_date_noon(F.replace(_tf(col), F.lit("\xa0"), F.lit("")))  # noqa: E731
    return raw.select(
        F.lit("hour_of_questions").alias("type"),
        F.regexp_extract(F.col("page_url"), r"MasterID=(\d+)", 1).try_cast("long").alias("external_id"),
        F.element_at(F.split(F.col("status_raw"), ":"), 2).alias("status"),
        _tf("question_by").alias("question_by"),
        d("question_date").alias("question_date"),
        d("answer_date").alias("answer_date"),
        _tf("recipient").alias("recipient"),
        _tf("question").alias("question"),
        _tf("answer_by").alias("answer_by"),
        _tf("answer").alias("answer"),
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


# -- single-pass kind dispatch (SURVEY §2.10; VERDICT r2 top_next) -------------
#
# The epoch loop computes ONE dialect tag per fetched body (``kind_expr`` —
# a single JVM regexp pass), then routes each body to exactly one extractor
# keyed on that tag: 13 dialects cost one full-body scan per epoch, not 13.
# Alternation order matters only for prefix pairs (billstep before bill);
# the leftmost dialect <div> wins, same as ``_kind_and_period``'s search.

# dialect tag → (sink item_type = merge_sink.NATURAL_KEYS key, extractor, fold)
TYPED_SINKS: dict[str, tuple[str, object, object]] = {
    "member": ("member", extract_member_raw, fold_member),
    "voting": ("voting", extract_voting_raw, fold_voting),
    "press": ("press", extract_press_raw, fold_press),
    "debate": ("debate_appearance", extract_debate_raw, fold_debate),
    "billstep": ("bill_step", extract_bill_step_raw, fold_bill_step),
    "session": ("session", extract_session_raw, fold_session),
    "committee": ("committee", extract_committee_raw, fold_committee),
    "commsched": ("committeeschedule", extract_commsched_raw, fold_commsched),
    "bill": ("bill", extract_bill_raw, fold_bill),
    "mchange": ("member_change", extract_member_change_raw, fold_member_change),
    "amendment": ("amendment", extract_amendment_raw, fold_amendment),
    "interpellation": ("interpellation", extract_interpellation_raw, fold_interpellation),
    "hoq": ("hour_of_questions", extract_hoq_raw, fold_hoq),
}

_KIND_ALTERNATION = (
    "billstep|bill|commsched|committee|member|voting|press|debate|session"
    "|mchange|amendment|interpellation|hoq"
)
# the dialect marker is a <div> whose id attribute names the dialect; the
# [^>]* keeps the match inside one tag so e.g. <a id="votelink"> or
# <div id="status"> (hoq sub-div) never claim the page
KIND_RE = r'<div[^>]*id="(' + _KIND_ALTERNATION + r')"'


def kind_expr(body_col) -> F.Column:
    """Dialect tag of a page body ('' when no dialect div) — compute once per
    fetched body, feed every extractor via ``kind_col``."""
    return F.regexp_extract(body_col.cast("string"), KIND_RE, 1)
