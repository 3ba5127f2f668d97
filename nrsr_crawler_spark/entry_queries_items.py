"""Typed item extraction queries (SURVEY §2.10 end-to-end): reference-shaped
HTML pages built from TPC-H columns → page bytes → mapInPandas parse →
ItemLoader folds → (for the merge query) the natural-key upsert sink — while
the DuckDB oracle derives the EXPECTED typed rows relationally from the same
columns.  A hash match certifies the whole pipeline: markup generation,
regex field projection, positional slicing + club-header carry, MapCompose
cleaners, TakeFirst/Join folds, date parsing, and merge classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nrsr_crawler_spark.entry_queries import query
from nrsr_crawler_spark.operators import merge_sink, parse_typed as PT
from nrsr_crawler_spark.sources import typed_pages as TP
from nrsr_crawler_spark.sources.tpch import load

_URL = "https://www.nrsr.sk/web/"


@query(
    "items_member_fold",
    """
    SELECT 'member' AS type,
           c_custkey AS external_id,
           'F' || (c_custkey % 100) AS forename,
           'S' || c_custkey AS surname,
           CASE WHEN c_custkey % 3 = 1 THEN 'Ing.'
                WHEN c_custkey % 3 = 2 THEN 'Ing. PhD.'
                ELSE '' END AS title,
           'member' || c_custkey || '@nrsr.sk' AS email,
           make_timestamp(1950 + c_custkey % 40, c_custkey % 12 + 1, c_custkey % 28 + 1, 12, 0, 0) AS born,
           'slovenská' AS nationality,
           c_custkey % 8 + 1 AS period_num,
           'https://www.nrsr.sk/web/Default.aspx?sid=poslanci/poslanec&PoslanecID='
               || c_custkey || '&CisObdobia=' || (c_custkey % 8 + 1) AS url
    FROM customer WHERE c_custkey <= 300
    """,
)
def items_member_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member pages → MemberItem rows (members.py:79-143): TakeFirst ids,
    Join-folded multi-valued title/email (with filter_mailto/whitespace
    MapCompose), F7 noon-normalized Slovak birth date."""
    pages = TP.member_pages(load(spark, sf_dir, "customer"), max_key=300)
    return PT.fold_member(PT.extract_member_raw(pages))


@query(
    "items_voting_votes",
    """
    WITH v AS (
        SELECT l_orderkey AS ext,
               l_orderkey * 10 + l_linenumber AS mid,
               (['Z','P','?','N','0'])[(l_linenumber % 5) + 1] AS vote,
               'Klub ' || (l_suppkey % 4) AS club
        FROM lineitem WHERE l_orderkey <= 300
    ),
    vs AS (
        SELECT ext, COUNT(*) AS n_votes,
               string_agg(mid || '=' || vote, ';' ORDER BY mid) AS votes_str
        FROM v GROUP BY ext
    ),
    cl AS (
        SELECT ext, club, string_agg(mid, '|' ORDER BY mid) AS mids
        FROM v GROUP BY ext, club
    ),
    cs AS (
        SELECT ext, string_agg(club || ':' || mids, ';' ORDER BY club) AS clubs_str
        FROM cl GROUP BY ext
    )
    SELECT 'voting' AS type,
           ext AS external_id,
           ext % 50 + 1 AS session_num,
           ext % 997 AS voting_num,
           make_timestamp(ext % 10 + 2010, ext % 12 + 1, ext % 28 + 1, ext % 24, ext % 60, ext % 59) AS "datetime",
           CASE WHEN ext % 3 = 0 THEN 'Návrh prešiel'
                WHEN ext % 3 = 1 THEN 'Návrh neprešiel'
                ELSE 'Parlament nebol uznášaniaschopný' END AS result,
           ext % 8 + 1 AS period_num,
           vs.n_votes, vs.votes_str, cs.clubs_str
    FROM vs JOIN cs USING (ext)
    """,
)
def items_voting_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voting pages → VotingItem + nested votes + the daily-clubs aggregate,
    ALL derived from the HTML vote table inside the parse kernel
    (votings.py:160-244): positional header slice (P5), club-header carry
    (A1), bracket-stripped votes (F3/F4), PoslanecID href param (F9)."""
    pages = TP.voting_pages(load(spark, sf_dir, "lineitem"), max_key=300)
    v = PT.fold_voting(PT.extract_voting_raw(pages))
    dc = PT.daily_clubs(v).select(
        F.col("voting_external_id").alias("external_id"),
        F.array_join(
            F.transform(
                F.col("clubs"),
                lambda c: F.concat(
                    c["club"], F.lit(":"),
                    F.array_join(F.transform(c["member_ids"], lambda m: m.cast("string")), "|"),
                ),
            ),
            ";",
        ).alias("clubs_str"),
    )
    return v.join(dc, "external_id").select(
        "type",
        "external_id",
        "session_num",
        "voting_num",
        "datetime",
        "result",
        "period_num",
        F.size("votes").cast("long").alias("n_votes"),
        F.array_join(
            F.transform(F.col("votes"), lambda x: F.concat(x["external_id"], F.lit("="), x["vote"])),
            ";",
        ).alias("votes_str"),
        "clubs_str",
    )


@query(
    "items_debate_fold",
    """
    SELECT 'debate_appearance' AS type,
           o_orderkey AS external_id,
           'F' || (o_orderkey % 100) || ' S' || o_orderkey AS debater_name,
           'Klub ' || (o_orderkey % 4) AS debater_party,
           o_orderkey % 50 + 1 AS session_num,
           CASE WHEN o_orderkey % 2 = 0
                THEN (o_orderkey % 500) || ',' || (o_orderkey % 500 + 1)
                ELSE CAST(o_orderkey % 500 AS VARCHAR) END AS press_nums_str,
           'Vystúpenie v rozprave' AS appearance_type,
           make_timestamp(2015 + o_orderkey % 10, o_orderkey % 12 + 1, o_orderkey % 28 + 1,
                          o_orderkey % 24, o_orderkey % 60, o_orderkey % 59) AS start_ts,
           make_timestamp(2015 + o_orderkey % 10, o_orderkey % 12 + 1, o_orderkey % 28 + 1,
                          o_orderkey % 24, o_orderkey % 60, o_orderkey % 59 + 1) AS end_ts,
           o_orderkey % 8 + 1 AS period_num
    FROM orders WHERE o_orderkey <= 300
    """,
)
def items_debate_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debate pages → DebateAppearanceItem rows
    (debate_appearances.py:155-214): the F8b time-range split into
    (start, end) timestamps, the LIST-typed press_num (KEEP fold,
    items.py:100 / missing_presses.py:47), and Join-folded
    appearance_type."""
    pages = TP.debate_pages(load(spark, sf_dir, "orders"), max_key=300)
    d = PT.fold_debate(PT.extract_debate_raw(pages))
    return d.select(
        "type",
        "external_id",
        "debater_name",
        "debater_party",
        "session_num",
        F.array_join(F.transform(F.col("press_num"), lambda x: x.cast("string")), ",").alias("press_nums_str"),
        "appearance_type",
        F.col("start").alias("start_ts"),
        F.col("end").alias("end_ts"),
        "period_num",
    )


@query(
    "items_bill_step_changes",
    """
    WITH ch AS (
        SELECT o_orderkey AS o, i
        FROM orders, (VALUES (1), (2), (3)) t(i)
        WHERE o_orderkey <= 300 AND i <= o_orderkey % 4
    ),
    agg AS (
        SELECT o, COUNT(*) AS n_changes,
               string_agg(
                   strftime(make_timestamp(2000 + (o + i) % 20, (o + i) % 12 + 1,
                                           (o + i) % 28 + 1, 12, 0, 0),
                            '%Y-%m-%d %H:%M:%S')
                   || '~A' || ((o * 7 + i) % 50)
                   || '~/web/Default.aspx?sid=zakony/zmena&ID=' || (o * 10 + i)
                   || '~Príloha ' || i
                   || '~/web/dok/' || (o * 10 + i),
                   ';' ORDER BY i) AS changes_str
        FROM ch GROUP BY o
    )
    SELECT 'bill_step' AS type,
           o_orderkey % 120 + 1 AS bill_id,
           o_orderkey AS external_id,
           'Krok ' || (o_orderkey % 7) AS main_label,
           'Podanie ' || (o_orderkey % 5) AS body_label,
           CASE WHEN o_orderkey % 5 <> 0 THEN o_orderkey % 50 + 1 END AS meeting_session_num,
           CASE WHEN o_orderkey % 5 <> 0 THEN 'U-' || (o_orderkey * 3 % 1000) END AS meeting_resolution,
           'Výbor ' || (o_orderkey % 13) AS coordinator_label,
           CASE WHEN o_orderkey % 4 <> 3
                THEN make_timestamp(2005 + o_orderkey % 15, o_orderkey % 12 + 1,
                                    o_orderkey % 28 + 1, 12, 0, 0) END AS coordinator_meeting_date,
           CASE WHEN o_orderkey % 4 <> 3 THEN 'GV ' || (o_orderkey % 9) END AS coordinator_name,
           'výsledok ' || (o_orderkey % 4) AS step_result,
           CAST(o_orderkey % 300 + 1 AS VARCHAR) AS act_num_label,
           COALESCE(agg.n_changes, 0) AS n_changes,
           COALESCE(agg.changes_str, '') AS changes_str,
           o_orderkey % 8 + 1 AS period_num
    FROM orders LEFT JOIN agg ON agg.o = o_orderkey
    WHERE o_orderkey <= 300
    """,
)
def items_bill_step_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-step pages → BillStepItem + nested BillStepChangeItem rows
    (bills.py:162-234): identity from the URL query (F9), two
    presence-conditional span groups (meeting panel; coordinator date+name),
    the reference's ', '/NBSP date cleanup, and the positional-td changes
    table with a date-prefix regex — the most deeply nested typed item."""
    pages = TP.bill_step_pages(load(spark, sf_dir, "orders"), max_key=300)
    d = PT.fold_bill_step(PT.extract_bill_step_raw(pages))
    return d.select(
        "type",
        "bill_id",
        "external_id",
        "main_label",
        "body_label",
        "meeting_session_num",
        "meeting_resolution",
        "coordinator_label",
        "coordinator_meeting_date",
        "coordinator_name",
        "step_result",
        "act_num_label",
        F.size("changes").cast("long").alias("n_changes"),
        F.array_join(
            F.transform(
                F.col("changes"),
                lambda ch: F.concat_ws(
                    "~",
                    F.date_format(ch["date"], "yyyy-MM-dd HH:mm:ss"),
                    ch["author"], ch["detail"], ch["attachment_title"], ch["attachment_url"],
                ),
            ),
            ";",
        ).alias("changes_str"),
        "period_num",
    )


@query(
    "items_typed_merge",
    """
    SELECT 'press' AS type,
           p_partkey AS press_num,
           p_partkey % 8 + 1 AS period_num,
           'Tlač ' || p_partkey AS title,
           CASE WHEN p_partkey % 2 = 0 THEN 'zákon' ELSE 'iný typ' END AS press_type,
           make_timestamp(1990 + p_partkey % 30, p_partkey % 12 + 1, p_partkey % 28 + 1, 12, 0, 0) AS press_date,
           CASE WHEN p_partkey <= 200 THEN 'insert'
                WHEN p_partkey % 3 = 0 THEN 'update'
                ELSE 'unchanged' END AS action
    FROM part WHERE p_partkey <= 400
    """,
)
def items_typed_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Press pages parsed into PressItem rows and MERGED into a pre-existing
    typed store by the press natural key (pipelines.py:37-131 dispatch →
    merge_sink.NATURAL_KEYS): keys ≤200 are new (insert), 200<k≤400 exist —
    mutated titles (k%3=0) classify update, the rest unchanged; store rows
    >400 are untouched (keep, not emitted)."""
    part = load(spark, sf_dir, "part")
    batch = PT.fold_press(PT.extract_press_raw(TP.press_pages(part, max_key=400)))

    p = F.col("p_partkey")
    current = part.filter((p > 200) & (p <= 600)).select(
        F.lit("press").alias("type"),
        p.alias("press_num"),
        F.when(p % 3 == 0, F.concat(F.lit("OLD Tlač "), p)).otherwise(
            F.concat(F.lit("Tlač "), p)
        ).alias("title"),
        F.when(p % 2 == 0, F.lit("zákon")).otherwise(F.lit("iný typ")).alias("press_type"),
        F.make_timestamp(
            (p % 30 + 1990), (p % 12 + 1), (p % 28 + 1), F.lit(12), F.lit(0), F.lit(0)
        ).alias("press_date"),
        (p % 8 + 1).alias("period_num"),
        F.concat(F.lit(_URL + "Default.aspx?sid=zakony/cpt&ID="), p).alias("url"),
    )
    keys = merge_sink.natural_keys_for("press")
    res = merge_sink.merge_upsert(current, batch, keys)
    return res.actions.join(batch, list(keys)).select(
        "type", "press_num", "period_num", "title", "press_type", "press_date", "action"
    )
