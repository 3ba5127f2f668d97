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


def session_pages(supplier: DataFrame, max_key: int = 300) -> DataFrame:
    """Session detail pages from ``supplier`` (sessions.py:71-131 shape):
    ?ID= identity, program-document anchors, and the program table whose rows
    carry the reference's noise — ``\\xfd`` + trailing dot in the progpoint
    cell, ``\\xfd`` in the parlpress anchor, img-alt state only on some rows,
    and the strong/i/plain text triple in td4.

    Derivations (s = s_suppkey): name='Schôdza '||s; attachments i∈[1..s%3]
    href='dok/'||s*10+i name='Dokument '||i; program rows i∈[1..s%4]:
    state present iff (s+i)%3≠0, progpoint=i but UNPARSEABLE when (s+i)%5=0,
    parlpress=(s*3+i)%500 but 'bez' (→NULL) when (s+i)%7=0."""
    s = F.col("s_suppkey")
    atts = F.when(
        (s % 3).cast("int") >= 1,
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (s % 3).cast("int")),
                lambda i: F.format_string(
                    '<a class="att" href="dok/%d"> Dokument %d </a>',
                    (s * 10 + i).cast("int"), i.cast("int"),
                ),
            ),
            "",
        ),
    ).otherwise(F.lit(""))

    def prog_row(i):
        state_td = F.when(
            (s + i) % 3 != 0, F.lit('<img alt=" Prerokovaný bod "/>')
        ).otherwise(F.lit(""))
        pp = F.when((s + i) % 5 == 0, F.lit("x")).otherwise(i.cast("string"))
        press = ((s * 3 + i) % 500).cast("int")
        ptxt = F.when((s + i) % 7 == 0, F.lit("bez")).otherwise(press.cast("string"))
        return F.concat(
            F.lit("<tr><td>"), state_td, F.lit("</td>"),
            F.lit("<td> "), pp, F.lit("\xfd. </td>"),
            F.format_string('<td><a href="Default.aspx?sid=zakony/cpt&ID=%d">', press),
            ptxt, F.lit("\xfd</a></td>"),
            F.format_string(
                "<td><strong>T1 %d</strong><i>T2 %d</i>T3 %d</td></tr>",
                i.cast("int"), i.cast("int"), i.cast("int"),
            ),
        )

    program = F.when(
        (s % 4).cast("int") >= 1,
        F.concat(
            F.lit('<table id="program">'),
            F.array_join(
                F.transform(F.sequence(F.lit(1), (s % 4).cast("int")), prog_row), ""
            ),
            F.lit("</table>"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="session" data-period="%d">'
            '<span class="name">Schôdza %d</span>',
            (s % 8 + 1).cast("int"), s,
        ),
        atts,
        program,
        F.lit("</div>"),
    )
    return supplier.filter(s <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=schodze/schodza&ID="), s).alias("page_url"),
        _body(html).alias("body"),
    )


def committee_pages(nation: DataFrame) -> DataFrame:
    """Committee detail pages from ``nation`` (committees.py:45-66 shape):
    ?ID= identity, ``<h1>`` name (stripped), KEEP-fold description spans, and
    the nested member list — each block carries the member's profile href
    (PoslanecID pulled from the query) and a role span.

    Derivations (n = n_nationkey): members i∈[1..n%5+1] with
    external_id=n*100+i, role='predseda' for i=1 else 'člen'."""
    n = F.col("n_nationkey")
    members = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (n % 5 + 1).cast("int")),
            lambda i: F.concat(
                F.format_string(
                    '<div class="member_name">'
                    '<a href="/web/Default.aspx?sid=poslanci/poslanec&PoslanecID=%d"></a>',
                    (n * 100 + i).cast("int"),
                ),
                F.lit("<span> "),
                F.when(i == 1, F.lit("predseda")).otherwise(F.lit("člen")),
                F.lit(" </span></div>"),
            ),
        ),
        "",
    )
    html = F.concat(
        F.format_string(
            '<div id="committee" data-period="%d">'
            "<h1> Výbor NR SR %d </h1>"
            '<span class="description">Popis %d a</span>'
            '<span class="description">Popis %d b</span>',
            (n % 8 + 1).cast("int"), n, n, n,
        ),
        members,
        F.lit("</div>"),
    )
    return nation.select(
        F.concat(F.lit(BASE + "Default.aspx?sid=vybory/vybor&ID="), n).alias("page_url"),
        _body(html).alias("body"),
    )


def commsched_pages(customer: DataFrame, max_key: int = 200) -> DataFrame:
    """Committee-schedule pages from ``customer``
    (committee_schedules.py:77-111 shape): ONE PAGE → TWO session blocks
    (the reference yields one item per session div), date/time raw strings
    (the natural key), two place lines, and a points <ul> whose anchor text
    int-casts null-on-fail.

    Derivations (c = c_custkey, j∈{1,2}): date=(c+j)%28+1. (c+j)%12+1.
    2020+(c+j)%5; time=((c+j)%12+8)||':00'; points i∈[1..(c+j)%3] with
    press=(c*3+i+j)%500 but 'bez tlače' (→NULL) when (c+i+j)%7=0."""
    c = F.col("c_custkey")

    def sess_block(j):
        points = F.when(
            ((c + j) % 3).cast("int") >= 1,
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), ((c + j) % 3).cast("int")),
                    lambda i: F.concat(
                        F.lit("<li><a>"),
                        F.when(
                            (c + i + j) % 7 == 0, F.lit("bez tlače")
                        ).otherwise(((c * 3 + i + j) % 500).cast("string")),
                        F.format_string("</a> bod %d</li>", i.cast("int")),
                    ),
                ),
                "",
            ),
        ).otherwise(F.lit(""))
        return F.concat(
            F.format_string(
                '<div class="sess"><span class="date">%d. %d. %d</span>'
                '<strong class="time">%d:00</strong>'
                '<div class="place">Miestnosť %d</div>'
                '<div class="place">budova NR SR</div>'
                '<ul class="points">',
                ((c + j) % 28 + 1).cast("int"), ((c + j) % 12 + 1).cast("int"),
                ((c + j) % 5 + 2020).cast("int"), ((c + j) % 12 + 8).cast("int"),
                (c % 40).cast("int"),
            ),
            points,
            F.lit("</ul></div><!--/sess-->"),
        )

    html = F.concat(
        F.format_string(
            '<div id="commsched" data-period="%d">'
            '<h3><span class="committee_name">Výbor NR SR č. %d</span></h3>',
            (c % 8 + 1).cast("int"), (c % 12).cast("int"),
        ),
        sess_block(F.lit(1)),
        sess_block(F.lit(2)),
        F.lit("</div>"),
    )
    return customer.filter(c <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=vybory/zasadnutia&ID="), c).alias("page_url"),
        _body(html).alias("body"),
    )


def bill_pages(part: DataFrame, max_key: int = 300) -> DataFrame:
    """Bill detail pages from ``part`` (bills.py:97-152 parse_item shape):
    MasterID identity in the URL query, the F7 date in BOTH reference
    formats — 'd. m. yyyy' normally, 'd.m.yyyy' when p%6=0 (the ValueError
    fallback, bills.py:114-121) — and a press span ABSENT when p%9=0 (the
    TypeError→None path, bills.py:123-128)."""
    p = F.col("p_partkey")
    delivered = F.when(
        p % 6 == 0,
        F.format_string(
            "%d.%d.%d", (p % 28 + 1).cast("int"), (p % 12 + 1).cast("int"),
            (p % 10 + 2010).cast("int"),
        ),
    ).otherwise(
        F.format_string(
            "%d. %d. %d", (p % 28 + 1).cast("int"), (p % 12 + 1).cast("int"),
            (p % 10 + 2010).cast("int"),
        )
    )
    press = F.when(
        p % 9 != 0,
        F.format_string('<span class="press_num">%d</span>', (p % 500).cast("int")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="bill" data-period="%d">'
            '<span class="proposer">%s</span>'
            '<span class="delivered">', (p % 8 + 1).cast("int"),
            F.when(p % 2 == 0, F.lit("Vláda SR")).otherwise(F.lit("Poslanci NR SR")),
        ),
        delivered,
        F.lit("</span>"),
        press,
        F.format_string(
            '<span class="current_state">Stav %d</span>'
            '<span class="current_result">Výsledok %d</span>'
            '<span class="category_name">Kategória %d</span></div>',
            (p % 6).cast("int"), (p % 4).cast("int"), (p % 5).cast("int"),
        ),
    )
    return part.filter(p <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=zakony/zakon&MasterID="), p).alias("page_url"),
        _body(html).alias("body"),
    )


def member_change_pages(customer: DataFrame, max_key: int = 150) -> DataFrame:
    """Member-change listing pages from ``customer``
    (member_changes.py:141-159 shape): ONE PAGE → MANY change rows from a
    result grid — per row the member id lives in the td2 anchor's
    PoslanecID query param, td1 is the F7 date, td3/td4 the change
    type/reason.  Rows i∈[1..c%3+1], external_id=c*10+i."""
    c = F.col("c_custkey")
    rows = F.array_join(
        F.transform(
            F.sequence(F.lit(1), (c % 3 + 1).cast("int")),
            lambda i: F.format_string(
                "<tr><td>%d. %d. %d</td>"
                '<td><a href="/web/Default.aspx?sid=poslanci/poslanec&PoslanecID=%d">F S</a></td>'
                "<td>%s</td><td>Dôvod %d</td></tr>",
                ((c + i) % 28 + 1).cast("int"), ((c + i) % 12 + 1).cast("int"),
                ((c + i) % 15 + 2006).cast("int"),
                (c * 10 + i).cast("int"),
                F.when((c + i) % 2 == 0, F.lit("Mandát sa uplatňuje")).otherwise(
                    F.lit("Mandát zaniknutý")
                ),
                i.cast("int"),
            ),
        ),
        "",
    )
    html = F.concat(
        F.format_string('<div id="mchange" data-period="%d">', (c % 8 + 1).cast("int")),
        F.lit('<table id="mch">'), rows, F.lit("</table></div>"),
    )
    return customer.filter(c <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=poslanci/zmeny&PeriodID="), c).alias("page_url"),
        _body(html).alias("body"),
    )


def amendment_pages(orders: DataFrame, max_key: int = 250) -> DataFrame:
    """Amendment detail pages from ``orders`` (amendments.py:188-258 shape):
    LOWERCASE ``id`` query param, submitter/session/date grid (the date
    carries trailing noise prefix-matched by ``(\\d+\\. \\d+\\. \\d+).*``,
    amendments.py:233-236), other_submitters + signed_members <li> lists,
    and the voting link (?ID=) present iff o%5≠0."""
    o = F.col("o_orderkey")

    def li_list(ul_id: str, n, fmt: str, base):
        return F.when(
            n >= 1,
            F.concat(
                F.format_string('<ul id="%s">', F.lit(ul_id)),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), n),
                        lambda i: F.format_string(
                            "<li><span>" + fmt + "</span></li>", (base + i).cast("int")
                        ),
                    ),
                    "",
                ),
                F.lit("</ul>"),
            ),
        ).otherwise(F.lit(""))

    votelink = F.when(
        o % 5 != 0,
        F.format_string(
            '<a id="votelink" href="/web/Default.aspx?sid=schodze/hlasovanie&ID=%d"></a>',
            ((o * 7) % 10000).cast("int"),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="amendment" data-period="%d">'
            '<span class="submitter">F%d S%d</span>'
            '<span class="session_num">%d</span>'
            '<span class="date">%d. %d. %d o 10:00</span>'
            '<span class="press_num">%d</span>',
            (o % 8 + 1).cast("int"), (o % 100).cast("int"), o,
            (o % 50 + 1).cast("int"),
            (o % 28 + 1).cast("int"), (o % 12 + 1).cast("int"), (o % 10 + 2012).cast("int"),
            (o % 500).cast("int"),
        ),
        li_list("subm", (o % 3).cast("int"), "P%d", o * 10),
        li_list("signed", (o % 4).cast("int"), "S%d", o * 20),
        votelink,
        F.lit("</div>"),
    )
    return orders.filter(o <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=zakony/pdn&id="), o).alias("page_url"),
        _body(html).alias("body"),
    )


def interpellation_pages(part: DataFrame, max_key: int = 250) -> DataFrame:
    """Interpellation detail pages from ``part``
    (interpellations.py:189-290 shape): flat labelled spans with the F7
    dual-format date (fallback format when p%6=0) and three independent
    int-null-on-fail fields whose spans are conditionally ABSENT
    (interpellation_session_num p%7=0, response_session_num p%8=0,
    press_num p%9=0 — the TypeError path)."""
    p = F.col("p_partkey")
    date = F.when(
        p % 6 == 0,
        F.format_string(
            "%d.%d.%d", (p % 28 + 1).cast("int"), (p % 12 + 1).cast("int"),
            (p % 12 + 2008).cast("int"),
        ),
    ).otherwise(
        F.format_string(
            "%d. %d. %d", (p % 28 + 1).cast("int"), (p % 12 + 1).cast("int"),
            (p % 12 + 2008).cast("int"),
        )
    )
    opt = lambda cond, cls, val: F.when(  # noqa: E731
        cond, F.format_string('<span class="%s">%d</span>', F.lit(cls), val.cast("int"))
    ).otherwise(F.lit(""))
    html = F.concat(
        F.format_string(
            '<div id="interpellation" data-period="%d">'
            '<span class="status">%s</span>'
            '<span class="asked_by">F%d S%d</span>'
            '<span class="description">Interpelácia %d</span>'
            '<span class="recipients">minister %d</span>'
            '<span class="date">',
            (p % 8 + 1).cast("int"),
            F.when(p % 2 == 0, F.lit("uzavretá")).otherwise(F.lit("otvorená")),
            (p % 100).cast("int"), p, p, (p % 15).cast("int"),
        ),
        date,
        F.lit("</span>"),
        opt(p % 7 != 0, "interpellation_session_num", p % 50 + 1),
        F.format_string('<span class="responded_by">minister %d</span>', (p % 15).cast("int")),
        opt(p % 8 != 0, "response_session_num", p % 50 + 2),
        opt(p % 9 != 0, "press_num", p % 500),
        F.lit("</div>"),
    )
    return part.filter(p <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=zakony/interpelacia&ID="), p).alias("page_url"),
        _body(html).alias("body"),
    )


def hoq_pages(customer: DataFrame, max_key: int = 120) -> DataFrame:
    """Hour-of-questions pages from ``customer``
    (hour_of_questions.py:175-240 shape): MasterID identity, the status DIV
    whose value is ``text.split(':')[1]`` (the split-on-colon F13,
    hour_of_questions.py:186), and the two dates carrying a trailing NBSP
    stripped by ``.replace('\\xa0','')`` before strptime — each date span
    conditionally ABSENT (question c%10=0, answer c%6=0 → None)."""
    c = F.col("c_custkey")

    def date_span(cond, cls, year_base):
        return F.when(
            cond,
            F.concat(
                F.format_string(
                    '<span class="%s">%d. %d. %d', F.lit(cls),
                    (c % 28 + 1).cast("int"), (c % 12 + 1).cast("int"),
                    (c % 8 + year_base).cast("int"),
                ),
                F.lit("\xa0</span>"),
            ),
        ).otherwise(F.lit(""))

    html = F.concat(
        F.format_string(
            '<div id="hoq" data-period="%d">'
            '<div id="status">Stav: %s</div>'
            '<span class="question_by">F%d S%d</span>',
            (c % 8 + 1).cast("int"),
            F.when(c % 2 == 0, F.lit("zodpovedaná")).otherwise(F.lit("nezodpovedaná")),
            (c % 100).cast("int"), c,
        ),
        date_span(c % 10 != 0, "question_date", F.lit(2012)),
        date_span(c % 6 != 0, "answer_date", F.lit(2013)),
        F.format_string(
            '<span class="recipient">minister %d</span>'
            '<span class="question">Otázka %d</span>'
            '<span class="answer_by">minister %d</span>'
            '<span class="answer">Odpoveď %d</span></div>',
            (c % 15).cast("int"), c, (c % 15).cast("int"), c,
        ),
    )
    return customer.filter(c <= max_key).select(
        F.concat(F.lit(BASE + "Default.aspx?sid=schodze/otazky&MasterID="), c).alias("page_url"),
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
