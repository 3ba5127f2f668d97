"""Deterministic reference-shaped HTML pages derived from the TPC-H tables
(fixture for the typed-extraction queries, FIXTURES.md style: no external
data, both engines derive from the same columns).

Each generator builds ``(page_url, body binary)`` rows whose markup mirrors
the reference's page structure (labelled field spans; the votings vote table
with a header row and club-header rows interleaved with member rows —
votings.py:219-244).  Every embedded value is a pure expression over the
source row, so a DuckDB oracle can derive the EXPECTED typed items
relationally while the Spark query goes page-bytes → parse UDF → fold —
an end-to-end hash-gate on the whole extraction pipeline.

All HTML assembly is JVM-side column concatenation (format_string/concat/
collect_list) — the only Python in the pipeline is the parse kernel itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "https://www.nrsr.sk/web/"

VOTE_LETTERS = ["Z", "P", "?", "N", "0"]


def _body(html_col):
    return F.encode(F.concat(F.lit("<html><body>"), html_col, F.lit("</body></html>")), "utf-8")


def member_pages(customer: DataFrame, max_key: int = 300) -> DataFrame:
    """Member detail pages from ``customer`` (members.py:79-143 shape).

    Field derivations (mirrored by the oracle SQL):
      external_id=c_custkey; forename='F'||ck%100; surname='S'||ck;
      titles: ck%3 of ['Ing.','PhD.'] (multi-valued → Join fold);
      email='mailto:member<ck>@nrsr.sk' (MapCompose(filter_mailto));
      born=(ck%28+1). (ck%12+1). (1950+ck%40) (Slovak date → F7 noon);
      period=ck%8+1."""
    ck = F.col("c_custkey")
    titles = F.when(ck % 3 == 1, F.lit('<span class="title">Ing.</span>')).when(
        ck % 3 == 2, F.lit('<span class="title">Ing.</span><span class="title">PhD.</span>')
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="member" data-period="%d">'
            '<span class="external_id">%d</span>'
            '<span class="forename">F%d</span>'
            '<span class="surname">S%d</span>',
            (ck % 8 + 1).cast("int"), ck, (ck % 100).cast("int"), ck,
        ),
        titles,
        F.format_string(
            '<span class="email"> mailto:member%d@nrsr.sk </span>'
            '<span class="born"> %d. %d. %d </span>'
            '<span class="nationality">slovenská</span></div>',
            ck, (ck % 28 + 1).cast("int"), (ck % 12 + 1).cast("int"), (ck % 40 + 1950).cast("int"),
        ),
    )
    return customer.filter(ck <= max_key).select(
        F.concat(
            F.lit(BASE + "Default.aspx?sid=poslanci/poslanec&PoslanecID="), ck,
            F.lit("&CisObdobia="), (ck % 8 + 1),
        ).alias("page_url"),
        _body(html).alias("body"),
    )


def voting_pages(lineitem: DataFrame, max_key: int = 300) -> DataFrame:
    """Voting pages from ``lineitem`` (votings.py:141-244 shape): metadata
    spans + the votes table — a <th> header row (positionally sliced off by
    the parser), club-header rows, then member rows in club-grouped order.

    Derivations: voting external_id=o=l_orderkey; member_id=o*10+l_linenumber
    (unique per voting); vote=VOTE_LETTERS[l_linenumber%5] rendered ' [X] '
    (bracket + whitespace → MapCompose(filter_vote)); club='Klub '||l_suppkey%4;
    session=o%50+1; voting_num=o%997; result by o%3; datetime components from
    o (Slovak 'd. M. yyyy H:mm:ss')."""
    o = F.col("l_orderkey")
    member_id = o * 10 + F.col("l_linenumber")
    vote = F.element_at(F.array(*[F.lit(v) for v in VOTE_LETTERS]), (F.col("l_linenumber") % 5 + 1).cast("int"))
    club = F.concat(F.lit("Klub "), (F.col("l_suppkey") % 4))
    member_row = F.format_string(
        '<tr><td class="member"><a href="%sDefault.aspx?sid=poslanci/poslanec&PoslanecID=%d">Poslanec %d</a></td>'
        '<td class="vote"> [%s] </td></tr>',
        F.lit(BASE), member_id, member_id, vote,
    )
    # club block: header row + that club's member rows in member_id order
    per_club = (
        lineitem.filter(o <= max_key)
        .select(o.alias("ext"), club.alias("club"), member_id.alias("mid"), member_row.alias("row"))
        .groupBy("ext", "club")
        .agg(F.array_sort(F.collect_list(F.struct("mid", "row"))).alias("rows"))
        .select(
            "ext", "club",
            F.concat(
                F.format_string('<tr><td class="club">%s</td></tr>', F.col("club")),
                F.array_join(F.transform(F.col("rows"), lambda r: r["row"]), ""),
            ).alias("block"),
        )
    )
    table = per_club.groupBy("ext").agg(
        F.array_sort(F.collect_list(F.struct("club", "block"))).alias("blocks")
    ).select(
        "ext",
        F.concat(
            F.lit('<table id="votes"><tr><th>Poslanec</th><th>Hlas</th></tr>'),
            F.array_join(F.transform(F.col("blocks"), lambda b: b["block"]), ""),
            F.lit("</table>"),
        ).alias("table_html"),
    )
    e = F.col("ext")
    result = (
        F.when(e % 3 == 0, F.lit("Návrh prešiel"))
        .when(e % 3 == 1, F.lit("Návrh neprešiel"))
        .otherwise(F.lit("Parlament nebol uznášaniaschopný"))
    )
    meta = F.format_string(
        '<div id="voting" data-period="%d">'
        '<span class="external_id">%d</span>'
        '<span class="session_num">%d</span>'
        '<span class="voting_num">%d</span>'
        '<span class="dt"> %d. %d. %d %d:%02d:%02d </span>'
        '<span class="result">%s</span></div>',
        (e % 8 + 1).cast("int"), e, (e % 50 + 1).cast("int"), (e % 997).cast("int"),
        (e % 28 + 1).cast("int"), (e % 12 + 1).cast("int"), (e % 10 + 2010).cast("int"),
        (e % 24).cast("int"), (e % 60).cast("int"), (e % 59).cast("int"),
        result,
    )
    return table.select(
        F.concat(
            F.lit(BASE + "Default.aspx?sid=schodze/hlasovanie/hlasklub&ID="), e,
        ).alias("page_url"),
        _body(F.concat(meta, F.col("table_html"))).alias("body"),
    )


def debate_pages(orders: DataFrame, max_key: int = 300) -> DataFrame:
    """Debate-appearance pages from ``orders`` (debate_appearances.py:155-214
    shape): MULTI-VALUED press_num spans (list-typed field, items.py:100),
    two appearance_type spans (Join fold), and the 'd. M. yyyy H:mm:ss -
    H:mm:ss' time-range span (F8b).

    Derivations: external_id=o; start=(o%24):(o%60):(o%59); end = same time
    +1 second; press nums [o%500] plus [o%500+1] when o is even."""
    o = F.col("o_orderkey")
    second_press = F.when(
        o % 2 == 0, F.format_string('<span class="press_num">%d</span>', (o % 500 + 1))
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="debate" data-period="%d">'
            '<span class="external_id">%d</span>'
            '<span class="debater_name"> F%d S%d </span>'
            '<span class="debater_party">Klub %d</span>'
            '<span class="session_num">%d</span>'
            '<span class="press_num">%d</span>',
            (o % 8 + 1).cast("int"), o, (o % 100).cast("int"), o,
            (o % 4).cast("int"), (o % 50 + 1).cast("int"), (o % 500).cast("int"),
        ),
        second_press,
        F.format_string(
            '<span class="appearance_type">Vystúpenie</span>'
            '<span class="appearance_type">v rozprave</span>'
            '<span class="when"> %d. %d. %d %d:%02d:%02d - %d:%02d:%02d </span></div>',
            (o % 28 + 1).cast("int"), (o % 12 + 1).cast("int"), (o % 10 + 2015).cast("int"),
            (o % 24).cast("int"), (o % 60).cast("int"), (o % 59).cast("int"),
            (o % 24).cast("int"), (o % 60).cast("int"), (o % 59 + 1).cast("int"),
        ),
    )
    return orders.filter(o <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=schodze/rozprava&ID="), o).alias("page_url"),
        _body(html).alias("body"),
    )


def bill_step_pages(orders: DataFrame, max_key: int = 300) -> DataFrame:
    """Bill-step detail pages from ``orders`` (bills.py:162-234 shape): the
    MasterID/WorkitemID identity lives in the URL QUERY (F9 — parse_step
    pulls both from ``response.url``), labelled scalar spans with TWO
    presence-conditional groups (the ``meeting_panel`` block, bills.py:169-175,
    and the coordinator date+name pair, bills.py:184-190 — name is only
    extracted when the date label exists), and the nested CHANGES table
    (BillStepChangeItem rows, bills.py:198-211) parsed by POSITIONAL ``td``
    index with a date-PREFIX regex over noisy cell text (bills.py:203-205).

    Derivations (o = o_orderkey): bill_id=o%120+1 (MasterID), external_id=o
    (WorkitemID); meeting spans present iff o%5≠0 (session=o%50+1,
    resolution='U-'||o*3%1000); coordinator date present iff o%4≠3 — the raw
    label carries the reference's ', ' + NBSP noise and pairs with
    coordinator_name='GV '||o%9; n_changes=o%4, change i∈[1..n]:
    date=(o+i)%28+1. (o+i)%12+1. 2000+(o+i)%20 (+' - doplnenie' noise),
    author='A'||(o*7+i)%50, detail/attachment urls from o*10+i."""
    o = F.col("o_orderkey")
    meeting = F.when(
        o % 5 != 0,
        F.format_string(
            '<span class="meeting_session_num">%d</span>'
            '<span class="meeting_resolution">U-%d</span>',
            (o % 50 + 1).cast("int"), (o * 3 % 1000).cast("int"),
        ),
    ).otherwise(F.lit(""))
    coordinator = F.when(
        o % 4 != 3,
        F.format_string(
            '<span class="coordinator_meeting_date">%d. %d. %d, \xa0</span>'
            '<span class="coordinator_name">GV %d</span>',
            (o % 28 + 1).cast("int"), (o % 12 + 1).cast("int"),
            (o % 15 + 2005).cast("int"), (o % 9).cast("int"),
        ),
    ).otherwise(F.lit(""))
    n_changes = (o % 4).cast("int")
    change_rows = F.when(
        n_changes >= 1,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_changes),
                lambda i: F.format_string(
                    "<tr><td> %d. %d. %d - doplnenie </td>"
                    "<td>A%d</td>"
                    '<td><a href="/web/Default.aspx?sid=zakony/zmena&ID=%d"></a></td>'
                    "<td><a>Príloha %d</a></td>"
                    '<td><a href="/web/dok/%d"></a></td></tr>',
                    ((o + i) % 28 + 1).cast("int"), ((o + i) % 12 + 1).cast("int"),
                    ((o + i) % 20 + 2000).cast("int"),
                    ((o * 7 + i) % 50).cast("int"),
                    (o * 10 + i).cast("int"), i.cast("int"), (o * 10 + i).cast("int"),
                ),
            ),
            "",
        ),
    ).otherwise(F.lit(""))
    changes_table = F.when(
        n_changes >= 1,
        F.concat(F.lit('<table id="changes">'), change_rows, F.lit("</table>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="billstep" data-period="%d">'
            '<span class="main_label">Krok %d</span>'
            '<span class="body_label">Podanie %d</span>',
            (o % 8 + 1).cast("int"), (o % 7).cast("int"), (o % 5).cast("int"),
        ),
        meeting,
        F.format_string(
            '<span class="coordinator_label">Výbor %d</span>', (o % 13).cast("int")
        ),
        coordinator,
        F.format_string(
            '<span class="step_result">výsledok %d</span>'
            '<span class="act_num_label">%d</span></div>',
            (o % 4).cast("int"), (o % 300 + 1).cast("int"),
        ),
        changes_table,
    )
    return orders.filter(o <= max_key).select(
        F.concat(
            F.lit(BASE + "Default.aspx?sid=zakony/zakon&MasterID="), (o % 120 + 1),
            F.lit("&WorkitemID="), o,
        ).alias("page_url"),
        _body(html).alias("body"),
    )


def press_pages(part: DataFrame, max_key: int = 400) -> DataFrame:
    """Press detail pages from ``part`` (presses.py shape): press_num=p;
    period=p%8+1; title='Tlač '||p; press_type by p%2; date from p."""
    p = F.col("p_partkey")
    html = F.format_string(
        '<div id="press" data-period="%d">'
        '<span class="press_num">%d</span>'
        '<span class="title"> Tlač %d </span>'
        '<span class="press_type">%s</span>'
        '<span class="press_date">%d. %d. %d</span></div>',
        (p % 8 + 1).cast("int"), p, p,
        F.when(p % 2 == 0, F.lit("zákon")).otherwise(F.lit("iný typ")),
        (p % 28 + 1).cast("int"), (p % 12 + 1).cast("int"), (p % 30 + 1990).cast("int"),
    )
    return part.filter(p <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=zakony/cpt&ID="), p).alias("page_url"),
        _body(html).alias("body"),
    )
