"""Scalar cleaning functions — Spark column re-expressions of SURVEY §2.8.

Each helper cites the reference behavior it reproduces.  All are pure column
expressions (JVM, codegen) — the reference ran these per-row in Python via
ItemLoader ``MapCompose`` processors (/root/reference/nrsr/items.py:6-18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def filter_whitespaces(c: Column) -> Column:
    """F1: ``value.replace('\\xa0','').strip()`` (items.py:9-10)."""
    return F.trim(F.replace(c, F.lit("\xa0"), F.lit("")))


def filter_mailto(c: Column) -> Column:
    """F2: strip ``mailto:`` prefix (items.py:13-14)."""
    return F.replace(c, F.lit("mailto:"), F.lit(""))


def filter_vote(c: Column) -> Column:
    """F3: ``value.strip()[1:-1]`` — strip surrounding brackets (items.py:17-18)."""
    t = F.trim(c)
    return F.substring(t, 2, F.length(t) - 2)


def vote_bracket(c: Column) -> Column:
    """F4: ``re.match(r'(\\[)(.*)([\\]]).*', v).groups()[1]`` (votings.py:209)."""
    return F.regexp_extract(c, r"\[(.*)\].*", 1)


def page_token(href: Column) -> Column:
    """F5: extract the ``Page$N`` postback token from a pagination href then
    take the part after the last ``$`` (votings.py:88-91)."""
    m = F.regexp_extract(href, r".*(Page.*[0-9]).*", 1)
    return F.element_at(F.split(m, r"\$"), -1)


def first_int(c: Column) -> Column:
    """F6: ``re.search(r'(\\d+)', s)`` → long (votings.py:145,180)."""
    return F.regexp_extract(c, r"(\d+)", 1).try_cast("long")


def parse_date_noon(c: Column) -> Column:
    """F7: ``strptime('%d. %m. %Y')`` with ``'%d.%m.%Y'`` fallback, then
    noon-normalize (hour=12, minute=0, second=0) — bills.py:114-121,
    missing_presses.py:85-98 and 19 further sites."""
    d = F.coalesce(
        F.try_to_timestamp(F.trim(c), F.lit("d. M. yyyy")),
        F.try_to_timestamp(F.trim(c), F.lit("d.M.yyyy")),
    )
    return F.try_to_timestamp(
        F.concat(F.date_format(d, "yyyy-MM-dd"), F.lit(" 12:00:00"))
    )


def parse_datetime(c: Column) -> Column:
    """F8: ``'%d. %m. %Y %H:%M[:%S]'`` (votings.py:171-175)."""
    t = F.trim(c)
    return F.coalesce(
        F.try_to_timestamp(t, F.lit("d. M. yyyy H:mm:ss")),
        F.try_to_timestamp(t, F.lit("d. M. yyyy H:mm")),
    )


def time_range(c: Column) -> Column:
    """F8b: split ``'12. 3. 2019 10:05:33 - 10:07:01'`` into (start, end)
    timestamps (debate_appearances.py:159-164, regex at 160)."""
    date = F.regexp_extract(c, r"^([0-9]{1,2}\. [0-9]{1,2}\. [0-9]{4}) (.*) \- (.*)$", 1)
    t1 = F.regexp_extract(c, r"^([0-9]{1,2}\. [0-9]{1,2}\. [0-9]{4}) (.*) \- (.*)$", 2)
    t2 = F.regexp_extract(c, r"^([0-9]{1,2}\. [0-9]{1,2}\. [0-9]{4}) (.*) \- (.*)$", 3)
    return F.struct(
        parse_datetime(F.concat_ws(" ", date, t1)).alias("start"),
        parse_datetime(F.concat_ws(" ", date, t2)).alias("end"),
    )


def try_int(c: Column) -> Column:
    """F12: ``int(x)`` in try/except → None (presses.py:183-187)."""
    return F.trim(c).try_cast("long")


def clean_text(c: Column) -> Column:
    """F13: strip + drop ``\\xfd`` / ``&nbsp;`` artifacts (sessions.py:102-120)."""
    out = F.replace(c, F.lit("\xfd"), F.lit(""))
    out = F.replace(out, F.lit("&nbsp;"), F.lit(""))
    return F.trim(out)


def join_nonnull(*cols: Column, sep: str = " ") -> Column:
    """ItemLoader ``Join()`` semantics (items.py:48-51): space-join of the
    extracted values, skipping nulls."""
    return F.concat_ws(sep, *cols)


def take_first(arr: Column) -> Column:
    """ItemLoader ``TakeFirst()`` (items.py:22-28): first non-null element;
    NULL for an empty extraction (try_element_at — ANSI-safe)."""
    return F.try_element_at(F.filter(arr, lambda x: x.isNotNull()), F.lit(1))
