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


_NN = lambda c: F.coalesce(c.cast("string"), F.lit("-"))  # noqa: E731


@query(
    "items_session_program",
    """
    WITH att AS (
        SELECT s_suppkey AS s, i,
               'dok/' || (s_suppkey * 10 + i) AS href,
               'https://www.nrsr.sk/web/dok/' || (s_suppkey * 10 + i)
                   || '|Dokument ' || i AS att_e
        FROM supplier, (VALUES (1), (2)) t(i)
        WHERE s_suppkey <= 300 AND i <= s_suppkey % 3
    ),
    atta AS (SELECT s, string_agg(href, ';' ORDER BY i) AS urls_str,
                    string_agg(att_e, ';' ORDER BY i) AS atts_str
             FROM att GROUP BY s),
    pr AS (
        SELECT s_suppkey AS s, i,
               CASE WHEN (s_suppkey + i) % 3 <> 0 THEN 'Prerokovaný bod' ELSE '-' END AS state,
               CASE WHEN (s_suppkey + i) % 5 = 0 THEN '-' ELSE CAST(i AS VARCHAR) END AS progpoint,
               CASE WHEN (s_suppkey + i) % 7 = 0 THEN '-'
                    ELSE CAST((s_suppkey * 3 + i) % 500 AS VARCHAR) END AS parlpress,
               'https://www.nrsr.sk/web/Default.aspx?sid=zakony/cpt&ID='
                   || ((s_suppkey * 3 + i) % 500) AS purl,
               'T1 ' || i || '/T2 ' || i || '/T3 ' || i AS txt
        FROM supplier, (VALUES (1), (2), (3)) t(i)
        WHERE s_suppkey <= 300 AND i <= s_suppkey % 4
    ),
    pra AS (SELECT s, COUNT(*) AS n_points,
                   string_agg(state || '|' || progpoint || '|' || parlpress || '|'
                              || purl || '|' || txt, ';' ORDER BY i) AS prog_str
            FROM pr GROUP BY s)
    SELECT 'session' AS type,
           s_suppkey AS external_id,
           'Schôdza ' || s_suppkey AS name,
           COALESCE(atta.urls_str, '') AS urls_str,
           COALESCE(atta.atts_str, '') AS atts_str,
           COALESCE(pra.n_points, 0) AS n_points,
           COALESCE(pra.prog_str, '') AS prog_str,
           s_suppkey % 8 + 1 AS period_num
    FROM supplier
    LEFT JOIN atta ON atta.s = s_suppkey
    LEFT JOIN pra ON pra.s = s_suppkey
    WHERE s_suppkey <= 300
    """,
)
def items_session_program(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session pages → SessionItem + nested program_points (sessions.py:71-131):
    attachment (url, name) structs, the ``\\xfd``/dot int cleanups null-on-
    fail, conditional img-alt state, and the strong/i/plain text TRIPLE —
    all parsed positionally from the program table."""
    pages = TP.session_pages(load(spark, sf_dir, "supplier"), max_key=300)
    d = PT.fold_session(PT.extract_session_raw(pages))
    prog_str = F.array_join(
        F.transform(
            F.col("program_points"),
            lambda p: F.concat_ws(
                "|",
                _NN(p["state"]), _NN(p["progpoint"]), _NN(p["parlpress"]),
                p["parlpress_url"], F.array_join(p["text"], "/"),
            ),
        ),
        ";",
    )
    return d.select(
        "type",
        "external_id",
        "name",
        F.array_join(F.col("attachments_urls"), ";").alias("urls_str"),
        F.array_join(
            F.transform(
                F.col("attachment_names"),
                lambda a: F.concat_ws("|", a["url"], a["name"]),
            ),
            ";",
        ).alias("atts_str"),
        F.size("program_points").cast("long").alias("n_points"),
        prog_str.alias("prog_str"),
        "period_num",
    )


@query(
    "items_committee_members",
    """
    WITH m AS (
        SELECT n_nationkey AS n, i,
               (CASE WHEN i = 1 THEN 'predseda' ELSE 'člen' END)
                   || ':' || (n_nationkey * 100 + i) AS m_e
        FROM nation, (VALUES (1), (2), (3), (4), (5)) t(i)
        WHERE i <= n_nationkey % 5 + 1
    ),
    ma AS (SELECT n, COUNT(*) AS n_members,
                  string_agg(m_e, ';' ORDER BY i) AS members_str
           FROM m GROUP BY n)
    SELECT 'committee' AS type,
           n_nationkey AS external_id,
           'Výbor NR SR ' || n_nationkey AS name,
           'Popis ' || n_nationkey || ' a;Popis ' || n_nationkey || ' b' AS desc_str,
           ma.n_members, ma.members_str,
           n_nationkey % 8 + 1 AS period_num
    FROM nation JOIN ma ON ma.n = n_nationkey
    """,
)
def items_committee_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committee pages → CommitteeItem + nested members (committees.py:45-66):
    ``<h1>`` name, KEEP-fold description, per-member role + PoslanecID from
    the profile href."""
    pages = TP.committee_pages(load(spark, sf_dir, "nation"))
    d = PT.fold_committee(PT.extract_committee_raw(pages))
    return d.select(
        "type",
        "external_id",
        "name",
        F.array_join(F.col("description"), ";").alias("desc_str"),
        F.size("members").cast("long").alias("n_members"),
        F.array_join(
            F.transform(
                F.col("members"), lambda m: F.concat_ws(":", m["role"], m["external_id"])
            ),
            ";",
        ).alias("members_str"),
        "period_num",
    )


@query(
    "items_commsched_points",
    """
    WITH sess AS (
        SELECT c_custkey AS c, j
        FROM customer, (VALUES (1), (2)) t(j) WHERE c_custkey <= 200
    ),
    p AS (
        SELECT c, j, i,
               (CASE WHEN (c + i + j) % 7 = 0 THEN '-'
                     ELSE CAST((c * 3 + i + j) % 500 AS VARCHAR) END)
                   || ':bod ' || i AS p_e
        FROM sess, (VALUES (1), (2)) t2(i)
        WHERE i <= (c + j) % 3
    ),
    pa AS (SELECT c, j, COUNT(*) AS n_points,
                  string_agg(p_e, ';' ORDER BY i) AS points_str
           FROM p GROUP BY c, j)
    SELECT 'committeeschedule' AS type,
           'Výbor NR SR č. ' || (c % 12) AS committee_name,
           ((c + j) % 28 + 1) || '. ' || ((c + j) % 12 + 1) || '. ' || (2020 + (c + j) % 5) AS "date",
           ((c + j) % 12 + 8) || ':00' AS "time",
           'Miestnosť ' || (c % 40) || ';budova NR SR' AS place_str,
           COALESCE(pa.n_points, 0) AS n_points,
           COALESCE(pa.points_str, '') AS points_str,
           c % 8 + 1 AS period_num,
           'https://www.nrsr.sk/web/Default.aspx?sid=vybory/zasadnutia&ID=' || c AS url
    FROM sess LEFT JOIN pa USING (c, j)
    """,
)
def items_commsched_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committee-schedule pages → one CommitteeScheduleItem PER SESSION BLOCK
    (committee_schedules.py:77-111): raw-string date/time natural key,
    multi-valued place, points with int-cast-null-on-fail press refs — the
    same points shape the missing_presses anti-join unwinds (J3)."""
    pages = TP.commsched_pages(load(spark, sf_dir, "customer"), max_key=200)
    d = PT.fold_commsched(PT.extract_commsched_raw(pages))
    return d.select(
        "type",
        "committee_name",
        "date",
        "time",
        F.array_join(F.col("place"), ";").alias("place_str"),
        F.size("points").cast("long").alias("n_points"),
        F.array_join(
            F.transform(
                F.col("points"),
                lambda p: F.concat_ws(
                    ":", _NN(p["press_num"]), F.element_at(p["text"], 1)
                ),
            ),
            ";",
        ).alias("points_str"),
        "period_num",
        "url",
    )


@query(
    "items_bill_fold",
    """
    SELECT 'bill' AS type,
           p_partkey AS external_id,
           CASE WHEN p_partkey % 2 = 0 THEN 'Vláda SR' ELSE 'Poslanci NR SR' END AS proposer,
           make_timestamp(2010 + p_partkey % 10, p_partkey % 12 + 1,
                          p_partkey % 28 + 1, 12, 0, 0) AS delivered,
           CASE WHEN p_partkey % 9 <> 0 THEN p_partkey % 500 END AS press_num,
           'Stav ' || (p_partkey % 6) AS current_state,
           'Výsledok ' || (p_partkey % 4) AS current_result,
           'Kategória ' || (p_partkey % 5) AS category_name,
           p_partkey % 8 + 1 AS period_num
    FROM part WHERE p_partkey <= 300
    """,
)
def items_bill_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill pages → BillItem rows (bills.py:97-152): F7 dual-format delivered
    date (fallback format exercised when p%6=0), absent-span→NULL press."""
    pages = TP.bill_pages(load(spark, sf_dir, "part"), max_key=300)
    d = PT.fold_bill(PT.extract_bill_raw(pages))
    return d.drop("url")


@query(
    "items_member_change_explode",
    """
    SELECT 'member_change' AS type,
           c_custkey * 10 + i AS external_id,
           make_timestamp(2006 + (c_custkey + i) % 15, (c_custkey + i) % 12 + 1,
                          (c_custkey + i) % 28 + 1, 12, 0, 0) AS "date",
           CASE WHEN (c_custkey + i) % 2 = 0 THEN 'Mandát sa uplatňuje'
                ELSE 'Mandát zaniknutý' END AS change_type,
           'Dôvod ' || i AS change_reason,
           c_custkey % 8 + 1 AS period_num
    FROM customer, (VALUES (1), (2), (3)) t(i)
    WHERE c_custkey <= 150 AND i <= c_custkey % 3 + 1
    """,
)
def items_member_change_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Member-change listing pages → one MemberChangeItem PER GRID ROW
    (member_changes.py:141-159): explode, PoslanecID from the row's anchor,
    F7 noon date — the 5-column natural key type (pipelines.py:44-51)."""
    pages = TP.member_change_pages(load(spark, sf_dir, "customer"), max_key=150)
    d = PT.fold_member_change(PT.extract_member_change_raw(pages))
    return d.drop("url")


@query(
    "items_amendment_fold",
    """
    WITH o AS (SELECT o_orderkey AS o FROM orders WHERE o_orderkey <= 250),
    subm AS (SELECT o, string_agg('P' || (o * 10 + j), ';' ORDER BY j) AS s
             FROM o, (VALUES (1), (2)) t(j) WHERE j <= o % 3 GROUP BY o),
    sgn AS (SELECT o, string_agg('S' || (o * 20 + j), ';' ORDER BY j) AS s
            FROM o, (VALUES (1), (2), (3)) t(j) WHERE j <= o % 4 GROUP BY o)
    SELECT 'amendment' AS type,
           o AS external_id,
           'F' || (o % 100) || ' S' || o AS submitter,
           o % 50 + 1 AS session_num,
           make_timestamp(2012 + o % 10, o % 12 + 1, o % 28 + 1, 12, 0, 0) AS "date",
           o % 500 AS press_num,
           COALESCE(subm.s, '') AS other_submitters_str,
           COALESCE(sgn.s, '') AS signed_members_str,
           CASE WHEN o % 5 <> 0 THEN (o * 7) % 10000 END AS voting_external_id,
           o % 8 + 1 AS period_num
    FROM o LEFT JOIN subm USING (o) LEFT JOIN sgn USING (o)
    """,
)
def items_amendment_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Amendment pages → AmendmentItem rows (amendments.py:188-258):
    lowercase ?id= identity, date-prefix regex over noisy text, KEEP-fold
    submitter/signature lists, absent-votelink→NULL voting ref."""
    pages = TP.amendment_pages(load(spark, sf_dir, "orders"), max_key=250)
    d = PT.fold_amendment(PT.extract_amendment_raw(pages))
    return d.select(
        "type", "external_id", "submitter", "session_num", "date", "press_num",
        F.array_join(F.col("other_submitters"), ";").alias("other_submitters_str"),
        F.array_join(F.col("signed_members"), ";").alias("signed_members_str"),
        "voting_external_id", "period_num",
    )


@query(
    "items_interpellation_fold",
    """
    SELECT 'interpellation' AS type,
           p_partkey AS external_id,
           CASE WHEN p_partkey % 2 = 0 THEN 'uzavretá' ELSE 'otvorená' END AS status,
           'F' || (p_partkey % 100) || ' S' || p_partkey AS asked_by,
           'Interpelácia ' || p_partkey AS description,
           'minister ' || (p_partkey % 15) AS recipients,
           make_timestamp(2008 + p_partkey % 12, p_partkey % 12 + 1,
                          p_partkey % 28 + 1, 12, 0, 0) AS "date",
           CASE WHEN p_partkey % 7 <> 0 THEN p_partkey % 50 + 1 END AS interpellation_session_num,
           'minister ' || (p_partkey % 15) AS responded_by,
           CASE WHEN p_partkey % 8 <> 0 THEN p_partkey % 50 + 2 END AS response_session_num,
           CASE WHEN p_partkey % 9 <> 0 THEN p_partkey % 500 END AS press_num,
           p_partkey % 8 + 1 AS period_num
    FROM part WHERE p_partkey <= 250
    """,
)
def items_interpellation_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpellation pages → InterpellationItem rows
    (interpellations.py:189-290): F7 dual-format date plus three independent
    absent-span→NULL int fields."""
    pages = TP.interpellation_pages(load(spark, sf_dir, "part"), max_key=250)
    d = PT.fold_interpellation(PT.extract_interpellation_raw(pages))
    return d.drop("url")


@query(
    "items_hoq_fold",
    """
    SELECT 'hour_of_questions' AS type,
           c_custkey AS external_id,
           ' ' || (CASE WHEN c_custkey % 2 = 0 THEN 'zodpovedaná'
                        ELSE 'nezodpovedaná' END) AS status,
           'F' || (c_custkey % 100) || ' S' || c_custkey AS question_by,
           CASE WHEN c_custkey % 10 <> 0
                THEN make_timestamp(2012 + c_custkey % 8, c_custkey % 12 + 1,
                                    c_custkey % 28 + 1, 12, 0, 0) END AS question_date,
           CASE WHEN c_custkey % 6 <> 0
                THEN make_timestamp(2013 + c_custkey % 8, c_custkey % 12 + 1,
                                    c_custkey % 28 + 1, 12, 0, 0) END AS answer_date,
           'minister ' || (c_custkey % 15) AS recipient,
           'Otázka ' || c_custkey AS question,
           'minister ' || (c_custkey % 15) AS answer_by,
           'Odpoveď ' || c_custkey AS answer,
           c_custkey % 8 + 1 AS period_num
    FROM customer WHERE c_custkey <= 120
    """,
)
def items_hoq_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-questions pages → HourOfQuestionsItem rows
    (hour_of_questions.py:175-240): the split-on-colon status (UNstripped,
    line 186) and NBSP-noised dates with absent-span→NULL."""
    pages = TP.hoq_pages(load(spark, sf_dir, "customer"), max_key=120)
    d = PT.fold_hoq(PT.extract_hoq_raw(pages))
    return d.drop("url")


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
